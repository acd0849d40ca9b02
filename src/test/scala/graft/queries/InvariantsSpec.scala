package graft.queries

import org.apache.spark.sql.Row

import graft.SparkSpec

/** The `q*_invariants` companion queries (oracle-checked reductions of the
  * golden-pinned operators) must report ZERO violations at every scale —
  * this pins the violation columns at sf0.001 so a regression in an
  * underlying operator (fabricated similarity, broken canonical order,
  * missed exact-duplicate, malformed BPE stream) fails in-repo before the
  * driver's DuckDB gate sees it. The count/first-last EQUALITY columns are
  * data-scale-dependent and are asserted by the gate itself at sf0.01.
  */
class InvariantsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Violation-counter columns by query: all must be 0 on every row. */
  private val violationCols: Map[String, Seq[String]] = Map(
    "q35_lttb_invariants" -> Seq("n_x_not_in_input", "n_y_not_in_input"),
    "q28_minhash_invariants" -> Seq("n_noncanonical", "n_below_threshold",
      "n_unknown_id", "n_jaccard_mismatch", "n_missing_exact"),
    "q92_contam_invariants" -> Seq("n_below_threshold", "n_unknown_id",
      "n_jaccard_mismatch", "n_multi_per_corpus"),
    "q50_ivf_invariants" -> Seq("n_dup_pairs", "n_unknown_id", "n_cosine_mismatch"),
    "q80_ivf_trained_invariants" -> Seq("n_dup_pairs", "n_unknown_id", "n_cosine_mismatch"),
    "q38_embedding_invariants" -> Seq("n_noncanonical", "n_below_threshold",
      "n_dup_pairs", "n_unknown_id", "n_cosine_mismatch"),
    "q104_bpe_invariants" -> Seq("n_dup_merges"),
    "q111_pq_invariants" -> Seq("n_dup_pairs", "n_unknown_id", "n_adc_mismatch"),
    "q146_decontam_invariants" -> Seq("n_unsound_drops", "n_missed_high_j",
      "n_unknown_kept", "n_dup_kept"))

  violationCols.foreach { case (name, cols) =>
    test(s"$name reports zero violations") {
      val rows = graft.SparkEntry.queries(name)(spark, sf).collect()
      rows.length should be > 0
      rows.foreach { r =>
        cols.foreach { c =>
          withClue(s"$name.$c: ") { r.getAs[Long](c) shouldBe 0L }
        }
      }
    }
  }

  test("q105_bpe_encode_invariants: every doc reconstructs and ok_len holds") {
    val rows = graft.SparkEntry.queries("q105_bpe_encode_invariants")(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r => r.getAs[Boolean]("ok_len") shouldBe true }
  }

  test("q108_sketch_invariants: sketch bounds hold per source") {
    val rows = graft.SparkEntry.queries("q108_sketch_invariants")(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[Boolean]("ok_distinct") shouldBe true
      r.getAs[Boolean]("ok_p50") shouldBe true
    }
  }

  test("q142_recall_invariants: recall arithmetic consistent for every query") {
    val rows = graft.SparkEntry.queries("q142_recall_invariants")(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r => r.getAs[Boolean]("ok") shouldBe true }
  }

  test("q92_contam_invariants: every planted leak found (self pairs = bench items)") {
    val Array(r: Row) =
      graft.SparkEntry.queries("q92_contam_invariants")(spark, sf).collect()
    r.getAs[Long]("n_self_pairs") shouldBe r.getAs[Long]("n_bench_items")
    r.getAs[Long]("n_bench_items") should be > 0L
  }

  test("every invariants query has an oracle (no new golden surface)") {
    val names = graft.SparkEntry.queries.keys.filter(_.endsWith("_invariants"))
    names should not be empty
    names.foreach { n =>
      withClue(s"$n missing oracleSql: ") {
        graft.SparkEntry.oracleSql.contains(n) shouldBe true
      }
    }
  }

  // ---- negative firing: each violation counter must TRIP on a corrupted
  // input — a verifier that can only report zero is no verifier. Drives
  // the extracted check functions directly with hand-built frames.

  import spark.implicits._

  private val tQuick = "the quick brown fox jumps over the lazy dog"
  private val tRain = "rain in spain falls mainly on the plain today"
  private def docs3 =
    Seq((1L, tQuick), (2L, tQuick), (3L, tRain)).toDF("id", "text")
  private def pairsDf(rows: (Long, Long, Double)*) =
    rows.toDF("id_a", "id_b", "jaccard")

  private def mhc(pairs: org.apache.spark.sql.DataFrame): Row =
    QueriesInvariants.minhashChecks(pairs, docs3).collect().head

  test("minhashChecks: clean exact-dup pair reports zero everywhere") {
    val r = mhc(pairsDf((1L, 2L, 1.0)))
    Seq("n_noncanonical", "n_below_threshold", "n_unknown_id",
      "n_jaccard_mismatch", "n_missing_exact").foreach { c =>
      withClue(c) { r.getAs[Long](c) shouldBe 0L }
    }
    r.getAs[Long]("n_exact_dup_pairs") shouldBe 1L
  }

  test("minhashChecks: each corrupted pairs frame fires its counter") {
    mhc(pairsDf((2L, 1L, 1.0))).getAs[Long]("n_noncanonical") shouldBe 1L
    mhc(pairsDf((1L, 2L, 1.0), (1L, 3L, 0.3)))
      .getAs[Long]("n_below_threshold") shouldBe 1L
    mhc(pairsDf((1L, 2L, 1.0), (1L, 99L, 0.9)))
      .getAs[Long]("n_unknown_id") shouldBe 1L
    // 0.9 is not the true shingle Jaccard of the two distinct texts
    mhc(pairsDf((1L, 2L, 1.0), (1L, 3L, 0.9)))
      .getAs[Long]("n_jaccard_mismatch") shouldBe 1L
    val empty = mhc(pairsDf())
    empty.getAs[Long]("n_missing_exact") shouldBe 1L
    empty.getAs[Long]("n_exact_dup_pairs") shouldBe 1L
  }

  private def cc(out: org.apache.spark.sql.DataFrame): Row = {
    val corpus = Seq((10L, tQuick), (11L, tRain)).toDF("corpus_id", "t_c")
    val bench = Seq((10L, tQuick), (12L, tRain)).toDF("benchmark_id", "t_b")
    QueriesInvariants.contamChecks(out, corpus, bench).collect().head
  }
  private def outDf(rows: (Long, Long, Double)*) =
    rows.toDF("corpus_id", "benchmark_id", "jaccard")

  test("contamChecks: clean self-pair output reports zero everywhere") {
    val r = cc(outDf((10L, 10L, 1.0)))
    Seq("n_below_threshold", "n_unknown_id", "n_jaccard_mismatch",
      "n_multi_per_corpus").foreach { c =>
      withClue(c) { r.getAs[Long](c) shouldBe 0L }
    }
    r.getAs[Long]("n_self_pairs") shouldBe 1L
    r.getAs[Long]("n_bench_items") shouldBe 2L
  }

  test("contamChecks: each corrupted output frame fires its counter") {
    cc(outDf((10L, 10L, 1.0), (11L, 12L, 0.2)))
      .getAs[Long]("n_below_threshold") shouldBe 1L
    cc(outDf((99L, 10L, 1.0))).getAs[Long]("n_unknown_id") shouldBe 1L
    // 11 vs 12 share the SAME text (jaccard 1.0), so a reported 0.8 is a
    // fabricated score
    cc(outDf((11L, 12L, 0.8))).getAs[Long]("n_jaccard_mismatch") shouldBe 1L
    cc(outDf((10L, 10L, 1.0), (10L, 12L, 1.0)))
      .getAs[Long]("n_multi_per_corpus") shouldBe 1L
  }

  test("q146's doc-side shingle pass is materialized below its join (no codegen deferral)") {
    // Whole-stage codegen defers a Project's expressions to first USE —
    // without a materialization barrier the per-doc shingle kernel
    // would evaluate INSIDE the broadcast nested-loop join's per-pair
    // loop, once per benchmark row per doc (55+ min at the 100x
    // layout; see the localCheckpoint comment in the query). With the
    // barrier, the doc-side shingle projection runs in the checkpoint's
    // own job and is ABSENT from this plan: the only shingle_hashes
    // left is the benchmark (broadcast) side's. A cleanup that drops
    // the barrier puts the doc projection back into this plan → 2
    // occurrences → this fails.
    val df = graft.SparkEntry.queries("q146_decontam_invariants")(spark, sf)
    df.collect() // materialize so AQE finalizes the physical plan
    val shingleLines = df.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("shingle_hashes")).toSeq
    // the benchmark projection legitimately appears (possibly twice —
    // AQE prints reused exchanges' subtrees again); the doc side must not
    shingleLines should not be empty
    withClue("expected only the broadcast benchmark side to shingle in-plan: ") {
      all(shingleLines) should include("AS ref_sh")
    }
  }
}
