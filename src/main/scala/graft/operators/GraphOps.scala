package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph analytics for corpus curation. PageRank over the
  * crawl's host link graph is the classic page/domain quality prior
  * (Page et al. 1999; Common Crawl publishes exactly this host-level
  * ranking), used to weight or gate documents by the standing of the
  * site they came from — it sits beside the Gopher/C4 shape filters as a
  * graph-derived quality signal.
  */
object GraphOps {

  /** Fixed-point PageRank: `iterations` synchronous power iterations of
    * `r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)/outdeg(u) + dangling/N)` carried
    * out entirely in scaled INTEGER arithmetic (ranks are longs in units
    * of `scale⁻¹`; d = dampNum/dampDen). Integer sums are associative and
    * commutative regardless of partial-aggregation merge order, so the
    * result is BIT-DETERMINISTIC across runs, parallelism, and engines —
    * a floating-point PageRank's ranks differ in ulps between schedules,
    * which a cross-engine hash gate cannot tolerate. Truncating integer
    * division leaks a few units of mass per step (bounded by
    * edges + 2 per iteration, out of `scale` ≈ 10¹²); every engine
    * replaying the same operations leaks identically.
    *
    * Self-loops and duplicate edges are removed; null endpoints never
    * enter the graph. Dangling mass (nodes with no out-edges) is
    * redistributed uniformly, the standard correction. Returns
    * (node, rank) with Σ rank ≈ scale.
    *
    * Scale shape: the edge table (with its precomputed out-degree)
    * shuffles ONCE into the iteration's join key and is reused by every
    * round; each iteration is one equi-join (src = node) + one map-side-
    * combined sum by dst — contributions cross the shuffle as 8-byte
    * longs. Ranks persist per round (lineage cut); the only driver-side
    * values are the node count and the per-round dangling scalar. No
    * collect of anything proportional to the graph.
    */
  def pageRank(edges0: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, scale: Long = 1000000000000L,
               dampNum: Long = 85, dampDen: Long = 100,
               loopPartitions: Int = 8): DataFrame = {
    require(iterations >= 1, "pageRank: iterations must be >= 1")
    // Static planning scoped over the power iterations (the
    // [[graft.operators.Dedup.connectedComponents]] convention): AQE
    // would re-coalesce every round's contribution shuffle into several
    // stage-jobs and re-derive the reducer layout each round, while the
    // whole design shuffles the edge table ONCE into the iteration's
    // join key for reuse. `loopPartitions` pins the loop layout — the
    // HOST graph is orders smaller than the page corpus, so the default
    // is small; size it to edge-set cardinality for page-level graphs.
    val spark = edges0.sparkSession
    val aqePrev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partPrev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", loopPartitions.toString)
    try pageRankImpl(edges0, srcCol, dstCol, iterations, scale, dampNum, dampDen)
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqePrev)
      spark.conf.set("spark.sql.shuffle.partitions", partPrev)
    }
  }

  private def pageRankImpl(edges0: DataFrame, srcCol: String, dstCol: String,
                           iterations: Int, scale: Long,
                           dampNum: Long, dampDen: Long): DataFrame = {
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ew = edges.join(outdeg, Seq("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    if (n == 0) {
      edges.unpersist()
      ew.unpersist()
      val out = nodes.withColumn("rank", lit(0L))
      nodes.unpersist()
      return out
    }
    val r0 = scale / n
    val base = ((dampDen - dampNum) * (scale / n)) / dampDen
    val srcs = outdeg.select(col("src").as("node"))
    // localCheckpoint per round (the BPE/k-means iterative convention):
    // ONE eager action per iteration, lineage cut so round k's plan does
    // not replay rounds 1..k−1. The dangling mass rides the plan as a
    // broadcast 1-row aggregate — no per-round driver collect.
    var ranks = nodes.withColumn("r", lit(r0)).localCheckpoint()
    for (_ <- 1 to iterations) {
      val dang = ranks.join(srcs, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
      val in = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst").as("node"), expr("r div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("m"))
      ranks = nodes.join(in, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .selectExpr("node",
          s"CAST($base AS BIGINT) + ($dampNum * (coalesce(m, CAST(0 AS BIGINT)) + " +
            s"(dang div CAST($n AS BIGINT)))) div $dampDen AS r")
        .localCheckpoint()
    }
    edges.unpersist()
    ew.unpersist()
    nodes.unpersist()
    ranks.select(col("node"), col("r").as("rank"))
  }
}
