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
               loopPartitions: Int = 8,
               smallGraphEdges: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "pageRank: iterations must be >= 1")
    // Scale-adaptive routing (the connectedComponents/Bpe.train
    // convention): the deduplicated edge list is checkpointed and counted
    // once; a graph under `smallGraphEdges` edges runs the SAME integer
    // fixed-point iteration in-driver — every operation is an exact long
    // sum or integral division, so the result is bit-identical to the
    // distributed loop (spec-asserted), without iterations × fixed
    // per-round scheduling cost. Host graphs are orders smaller than
    // page corpora; page-level graphs exceed the bound and take the
    // pinned-layout distributed loop. `smallGraphEdges = 0` forces it.
    val cleaned = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    if (smallGraphEdges > 0) {
      val pinned = cleaned.localCheckpoint(false)
      if (pinned.count() <= smallGraphEdges)
        return pageRankDriver(pinned, iterations, scale, dampNum, dampDen)
      // reuse the checkpointed cleaned edge list for the loop
      return pageRankDistributed(pinned, iterations, scale,
        dampNum, dampDen, loopPartitions)
    }
    pageRankDistributed(cleaned, iterations, scale,
      dampNum, dampDen, loopPartitions)
  }

  /** In-driver power iteration over a bounded, cleaned edge list; node
    * type stays generic (host strings or ids). Bit-identical to the
    * distributed loop: same r0/base integral divisions, same per-round
    * dangling redistribution, same contribution sums.
    */
  private def pageRankDriver(cleaned: DataFrame, iterations: Int,
                             scale: Long, dampNum: Long,
                             dampDen: Long): DataFrame = {
    val spark = cleaned.sparkSession
    val e = cleaned.collect().map(r => (r.get(0), r.get(1)))
    val outdeg = new java.util.HashMap[Any, Long]()
    e.foreach { case (s, _) => outdeg.merge(s, 1L, (a: Long, b: Long) => a + b) }
    val nodeSet = new java.util.LinkedHashSet[Any]()
    e.foreach { case (s, d) => nodeSet.add(s); nodeSet.add(d) }
    val nodes = nodeSet.toArray
    val n = nodes.length.toLong
    val nodeType = cleaned.schema("src").dataType
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", nodeType),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType, nullable = false)))
    if (n == 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    val r0 = scale / n
    val base = ((dampDen - dampNum) * (scale / n)) / dampDen
    var ranks = new java.util.HashMap[Any, Long]()
    nodes.foreach(nd => ranks.put(nd, r0))
    for (_ <- 1 to iterations) {
      var dang = 0L
      nodes.foreach { nd =>
        if (!outdeg.containsKey(nd)) dang += ranks.get(nd)
      }
      val m = new java.util.HashMap[Any, Long]()
      e.foreach { case (s, d) =>
        m.merge(d, ranks.get(s) / outdeg.get(s), (a: Long, b: Long) => a + b)
      }
      val next = new java.util.HashMap[Any, Long]()
      nodes.foreach { nd =>
        next.put(nd,
          base + (dampNum * (m.getOrDefault(nd, 0L) + dang / n)) / dampDen)
      }
      ranks = next
    }
    val rows = nodes.map(nd => org.apache.spark.sql.Row(nd, ranks.get(nd)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq,
        math.max(1, rows.length / 500000 + 1)), outSchema)
  }

  private def pageRankDistributed(cleaned: DataFrame,
               iterations: Int, scale: Long,
               dampNum: Long, dampDen: Long,
               loopPartitions: Int): DataFrame = {
    // Static planning scoped over the power iterations (the
    // [[graft.operators.Dedup.connectedComponents]] convention): AQE
    // would re-coalesce every round's contribution shuffle into several
    // stage-jobs and re-derive the reducer layout each round, while the
    // whole design shuffles the edge table ONCE into the iteration's
    // join key for reuse. `loopPartitions` pins the loop layout — the
    // HOST graph is orders smaller than the page corpus, so the default
    // is small; size it to edge-set cardinality for page-level graphs.
    val spark = cleaned.sparkSession
    val aqePrev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partPrev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", loopPartitions.toString)
    try pageRankImpl(cleaned, iterations, scale, dampNum, dampDen)
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqePrev)
      spark.conf.set("spark.sql.shuffle.partitions", partPrev)
    }
  }

  private def pageRankImpl(cleaned: DataFrame,
                           iterations: Int, scale: Long,
                           dampNum: Long, dampDen: Long): DataFrame = {
    // input is pre-cleaned (select/filter/distinct) by [[pageRank]]
    val edges = cleaned
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
