package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exercises every size-gated driver/distributed routing flip on BOTH
  * sides of its gate at a REAL grown corpus (round-11 VERDICT item 1):
  * the sf-scale oracle always lands on one side of each gate, so a bug
  * on the other side — or a divergence between the two paths — is
  * invisible to the correctness gate until real data crosses the
  * threshold. This probe runs each operator twice on the
  * [[ScaleGrowthProbe]] grown layout (10× documents), once with the gate
  * forced to the driver path and once forced distributed, and compares
  * order-independent fingerprints (count + bit_xor(hash(*))).
  *
  * Covered gates:
  *  - `Dedup.connectedComponents(smallGraphEdges)` — driver union-find
  *    vs distributed pointer-jumping label propagation
  *  - `GraphOps.pageRank(smallGraphEdges)` — driver loop vs distributed
  *    integer-fixed-point iteration
  *  - `Bpe.train(smallVocabWords)` — driver merge loop vs distributed
  *    pair-count rounds (merge lists compared exactly, order included)
  *  - `Dedup.incrementalDedup` — bloom-pre-pruned split anti-join
  *    (forced with `minBloomItems = 0`: the grown seen side sits under
  *    the default small-side floor) vs plain co-partitioned anti-join
  *    (forced with `maxBloomItems = 0`)
  *  - `Curation.importanceWeights` — broadcast-map scoring vs the
  *    keyed-join fallback (gated on the vocabulary count)
  *
  * Usage: runMain graft.tools.RoutingFlipProbe [grownDir]
  * Prints one JSON line; every `*_match` must be true.
  */
object RoutingFlipProbe {

  def fingerprint(df: DataFrame): (Long, Long) = {
    val r = df.selectExpr("count(1)", "coalesce(bit_xor(hash(*)), 0L)").head()
    (r.getLong(0), r.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Bpe, Dedup, GraphOps}

    val docs = graft.sources.Tables.documents(spark, dir).localCheckpoint(false)
    // a real near-dup edge list: the grown corpus's 10-copy families give
    // ~45 edges per original document (~250k edges at copies=10)
    val pairs = Dedup.minHashDupPairs(docs, "doc_id", "text")
      .localCheckpoint(false)
    val nEdges = pairs.count()

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      (body, (System.nanoTime() - t0) / 1e9)
    }

    // 1. connected components: force driver (gate above the edge count)
    //    vs force distributed (gate at 0)
    val (ccD, ccDriverS) = timed(fingerprint(Dedup.connectedComponents(
      pairs, "id_a", "id_b", smallGraphEdges = Long.MaxValue)))
    val (ccX, ccDistS) = timed(fingerprint(Dedup.connectedComponents(
      pairs, "id_a", "id_b", smallGraphEdges = 0L)))

    // 2. pageRank over the same (directed) edge list
    val (prD, prDriverS) = timed(fingerprint(GraphOps.pageRank(
      pairs, "id_a", "id_b", iterations = 8, smallGraphEdges = Long.MaxValue)))
    val (prX, prDistS) = timed(fingerprint(GraphOps.pageRank(
      pairs, "id_a", "id_b", iterations = 8, smallGraphEdges = 0L)))

    // 3. BPE training: the merge SEQUENCE is the contract (ordered)
    val (bpeD, bpeDriverS) = timed(Bpe.train(
      docs, "text", numMerges = 60, smallVocabWords = Long.MaxValue))
    val (bpeX, bpeDistS) = timed(Bpe.train(
      docs, "text", numMerges = 60, smallVocabWords = 0L))

    // 4. incremental dedup: copies 0-4 are the seen corpus, 5-9 the batch
    //    (the copy suffix makes cross-copy texts distinct, so real drops
    //    come from the base copy-0 rows duplicated inside the batch)
    val seen = docs.filter(col("doc_id") < 5000000L)
    val batch = docs.filter(col("doc_id") >= 5000000L)
    val (incB, incBloomS) = timed(fingerprint(Dedup.incrementalDedup(
      batch, seen, "doc_id", "text", minBloomItems = 0L)))
    val (incP, incPlainS) = timed(fingerprint(Dedup.incrementalDedup(
      batch, seen, "doc_id", "text", maxBloomItems = 0L)))

    // 5. bloom WIN regime (the r10 review observation only measured the
    //    LOSS regime at a broadcast-small seen side): a seen corpus too
    //    large to broadcast plus a mostly-new batch — the steady-state
    //    ingest shape the gate's scaladoc claims the bloom serves. The
    //    grown corpus's seen half is still broadcast-small, so this
    //    section synthesizes the shape: 2M distinct seen texts (~24 MB of
    //    keys, over the 10 MB broadcast threshold) and a 2M-row batch
    //    with 1% true dups. Texts are padded to ≈0.9 KB: what the bloom
    //    route saves is batch bytes crossing the NETWORK (broadcast-back
    //    ≈ 2B vs plain ≈ 4B — see the incrementalDedup scaladoc's
    //    byte accounting). MEASURED VERDICT: it does NOT win on
    //    local[32] (12.2 vs 5.4 s padded; 4.7/11.8 vs 2.6/4.3 s for the
    //    earlier split spelling) — page-cached local shuffles make the
    //    plain spelling's extra bytes nearly free while the bloom route
    //    pays real fixed costs (seen-side filter build, batch
    //    checkpoint, broadcasts). This section exists to pin OUTPUT
    //    IDENTITY in the unbroadcastable-seen regime and to keep the
    //    honest local cost on record.
    def pad(c: org.apache.spark.sql.Column) =
      concat(c, lit(" "), repeat(sha2(c.cast("string"), 256), 14))
    val synSeen = spark.range(2000000L)
      .select(col("id").as("doc_id"),
        pad(concat(lit("seen doc corpus text item "), col("id"))).as("text"))
    val synBatch = spark.range(2000000L, 4000000L)
      .select(col("id").as("doc_id"),
        when(col("id") % 100 === 0,
            pad(concat(lit("seen doc corpus text item "), col("id") - 2000000L)))
          .otherwise(pad(concat(lit("fresh doc corpus text item "), col("id"))))
          .as("text"))
    val (winB, winBloomS) = timed(fingerprint(Dedup.incrementalDedup(
      synBatch, synSeen, "doc_id", "text", minBloomItems = 0L)))
    val (winP, winPlainS) = timed(fingerprint(Dedup.incrementalDedup(
      synBatch, synSeen, "doc_id", "text", maxBloomItems = 0L)))

    // 6. importanceWeights: broadcast-map scoring (vocab under the gate)
    //    vs the keyed-join fallback (gate at 0) — both fold each doc's
    //    weights in code-point token order, so rows must be IDENTICAL
    import graft.operators.Curation
    val iwTarget = docs.filter(col("doc_id") % 97 === 0)
    val iwCorpus = docs.filter(col("doc_id") % 97 =!= 0)
    val (iwB, iwMapS) = timed(fingerprint(Curation.importanceWeights(
      iwCorpus, iwTarget, "doc_id", "text",
      maxBroadcastVocab = Long.MaxValue)))
    val (iwJ, iwJoinS) = timed(fingerprint(Curation.importanceWeights(
      iwCorpus, iwTarget, "doc_id", "text", maxBroadcastVocab = 0L)))

    def j(m: (Long, Long)) = s"""{"rows":${m._1},"xh":${m._2}}"""
    println(
      s"""{"dir":"$dir","edges":$nEdges,""" +
      s""""cc_match":${ccD == ccX},"cc_driver":${j(ccD)},"cc_dist":${j(ccX)},""" +
      s""""pr_match":${prD == prX},"pr_driver":${j(prD)},"pr_dist":${j(prX)},""" +
      s""""bpe_match":${bpeD == bpeX},"bpe_merges":${bpeD.length},""" +
      s""""inc_match":${incB == incP},"inc_bloom":${j(incB)},"inc_plain":${j(incP)},""" +
      s""""win_match":${winB == winP},"win_bloom":${j(winB)},"win_plain":${j(winP)},""" +
      s""""iw_match":${iwB == iwJ},"iw_map":${j(iwB)},"iw_join":${j(iwJ)},""" +
      f""""secs":{"cc":[$ccDriverS%.2f,$ccDistS%.2f],"pr":[$prDriverS%.2f,$prDistS%.2f],""" +
      f""""bpe":[$bpeDriverS%.2f,$bpeDistS%.2f],"inc":[$incBloomS%.2f,$incPlainS%.2f],""" +
      f""""win":[$winBloomS%.2f,$winPlainS%.2f],"iw":[$iwMapS%.2f,$iwJoinS%.2f]}}""")
    spark.stop()
  }
}
