package graft.queries

import graft.SparkSpec

/** Parallelism sweeps for the OLDER golden-pinned queries (q28 MinHash
  * pairs, q35 LTTB, q38 hyperplane-LSH embedding dups, q50 IVF ANN, q92
  * cross-corpus contamination): each runs under two different
  * shuffle-partition counts and must produce the identical row multiset,
  * so a scheduler or partitioning change can't silently invalidate the
  * committed golden parquet. The newer goldens (q80/q104/q105/q108/q111)
  * carry equivalent sweeps in their operator specs (SimilaritySpec,
  * BpeSpec, DocsSketchSpec); q146's sweep below varies the gate's input
  * partitioning instead (its streaming runner pins replay partitions).
  *
  * `newSession()` shares the context but takes a fresh per-session SQL
  * conf, so the partition override is isolated from the shared test
  * session.
  */
class GoldenReshardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def rowsWith(name: String, parts: Int): Seq[String] = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", parts)
    graft.SparkEntry.queries(name)(s, sfDir)
      .collect().map(_.toString).sorted.toSeq
  }

  for (q <- Seq("q28_minhash_pairs", "q35_lttb", "q38_embedding_dups",
    "q50_ivf_ann", "q92_cross_contam"))
    test(s"$q golden is stable across shuffle-partition counts") {
      val a = rowsWith(q, 4)
      val b = rowsWith(q, 7)
      a.nonEmpty shouldBe true
      b shouldBe a
    }

  // q146's streaming runner pins its replay shuffle partitions internally
  // (withReplayPartitions), so a shuffle-partition sweep of the QUERY
  // would compare two identical runs. The result-determining computation
  // is the gate itself (the parity spec ties stream ≡ batch), so the
  // sweep that means something varies the gate's INPUT partitioning.
  test("q146 gate result is stable across input partitioning (batch spelling)") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val ref = graft.sources.Tables.plantedBenchmark(spark, sfDir)
      .select(col("text"))
    def ids(parts: Int): Seq[Long] =
      graft.streaming.StreamingOps
        .nearDupGate(docs.repartition(parts), ref, "text")
        .select(col("doc_id").cast("long")).collect()
        .map(_.getLong(0)).sorted.toSeq
    val a = ids(3)
    a.nonEmpty shouldBe true
    ids(11) shouldBe a
  }
}
