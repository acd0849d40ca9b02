package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, Array(1.0, 0.0, 0.0, 0.0)),
    (2L, Array(0.9, 0.1, 0.0, 0.0)),
    (3L, Array(0.0, 1.0, 0.0, 0.0)),
    (4L, Array(0.0, 0.0, 1.0, 0.0)),
    (5L, Array(1.0, 0.05, 0.0, 0.0))
  ).toDF("id", "v")

  test("bruteForceTopK returns exact cosine top-k in rank order") {
    val q = Seq((100L, Array(1.0, 0.0, 0.0, 0.0))).toDF("qid", "qv")
    val out = Similarity.bruteForceTopK(corpus, "id", "v", q, "qid", "qv", k = 3)
      .as[(Long, Long, Double)].collect().sortBy(-_._3)
    out.length shouldBe 3
    out(0)._2 shouldBe 1L
    out(0)._3 shouldBe 1.0
    out.map(_._2).toSet shouldBe Set(1L, 5L, 2L) // the three closest
  }

  test("bruteForceTopK handles multiple queries independently") {
    val q = Seq(
      (100L, Array(1.0, 0.0, 0.0, 0.0)),
      (200L, Array(0.0, 0.0, 1.0, 0.0))
    ).toDF("qid", "qv")
    val out = Similarity.bruteForceTopK(corpus, "id", "v", q, "qid", "qv", k = 1)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    out.map(r => (r._1, r._2)) shouldBe Array((100L, 1L), (200L, 4L))
  }

  test("top-k runs as partial+final aggregation, not a per-query window") {
    val q = Seq((100L, Array(1.0, 0.0, 0.0, 0.0))).toDF("qid", "qv")
    val out = Similarity.bruteForceTopK(corpus, "id", "v", q, "qid", "qv", k = 3)
    val plan = out.queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should include("ObjectHashAggregate")
    plan should include("partial_topk_by_score")
  }

  test("aggregate top-k matches the window formulation across partitions") {
    // 600 candidates over 8 partitions: partial heaps must merge correctly,
    // including exact-score ties broken by ascending id
    val big = spark.range(0, 600, 1, 8)
      .selectExpr("id", "array(cast(1.0 - (id % 100) / 100.0 as double), cast((id % 7) / 10.0 as double)) as v")
    val q = Seq((1L, Array(1.0, 0.0))).toDF("qid", "qv")
    val agg = Similarity.bruteForceTopK(big, "id", "v", q, "qid", "qv", k = 25)
      .as[(Long, Long, Double)].collect().toSeq
    // reference result via the window fallback on a registry-free session
    val scored = big.selectExpr("id as neighbor_id", "v as cv")
      .crossJoin(q.selectExpr("qid as query_id", "qv"))
      .selectExpr("query_id", "neighbor_id",
        "aggregate(zip_with(qv, cv, (x, y) -> x * y), cast(0.0 as double), (a, b) -> a + b) " +
          "/ (sqrt(aggregate(qv, cast(0.0 as double), (a, b) -> a + b * b)) * " +
          "sqrt(aggregate(cv, cast(0.0 as double), (a, b) -> a + b * b)))  as cosine")
    val win = scored
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"cosine".desc, $"neighbor_id".asc)))
      .filter($"rk" <= 25)
      .selectExpr("query_id", "neighbor_id", "round(cosine, 6) as cosine")
      .as[(Long, Long, Double)].collect().toSeq
    agg.sortBy(x => (-x._3, x._2)) shouldBe win.sortBy(x => (-x._3, x._2))
  }

  test("multi-probe ivfTopK is a superset and recovers cross-hyperplane neighbours") {
    import org.apache.spark.sql.functions.{col => f}
    // 60 corpus vectors in pairs (v, v + small noise): some pairs straddle
    // exactly one hyperplane; single-probe misses those neighbours
    val big = spark.range(0, 60)
      .selectExpr("id",
        """array(cast(sin(id * 0.7) as double), cast(cos(id * 1.3) as double),
                 cast(sin(id * 2.1 + 1.0) as double), cast(cos(id * 0.9 + 2.0) as double)) as v""")
    val queries = big.limit(8).selectExpr("id + 1000 as qid", "v as qv")
    def ids(multi: Boolean) =
      // k >= corpus size: no top-k truncation, so probing strictly adds
      Similarity.ivfTopK(big, "id", "v", queries, "qid", "qv",
          dim = 4, k = 60, nBits = 3, multiProbe = multi)
        .select(f("query_id"), f("neighbor_id"))
        .as[(Long, Long)].collect().toSet
    val single = ids(false)
    val multi = ids(true)
    single.subsetOf(multi) shouldBe true
    multi.size should be > single.size // fixture straddles >= 1 hyperplane
  }

  test("ivfTopK finds the self-match (same vector shares its bucket)") {
    val q = Seq((100L, Array(0.9, 0.1, 0.0, 0.0))).toDF("qid", "qv")
    val out = Similarity.ivfTopK(corpus, "id", "v", q, "qid", "qv",
        dim = 4, k = 5, nBits = 2)
      .as[(Long, Long, Double)].collect()
    out.map(_._2) should contain(2L)
    // results are a subset of the exact ones' ids (bucket pruning only removes)
    val exact = Similarity.bruteForceTopK(corpus, "id", "v", q, "qid", "qv", k = 5)
      .as[(Long, Long, Double)].collect().map(_._2).toSet
    out.map(_._2).toSet.subsetOf(exact) shouldBe true
  }
}
