package graft.functions.expressions

import graft.SparkSpec

/** SQL-surface and error-path coverage for the registered
  * `topk_by_score` aggregate (the plan-shape and Similarity-level tests
  * live in SimilaritySpec; the heap itself in TopKBufferSpec).
  */
class TopKByScoreSqlSpec extends SparkSpec {
  import spark.implicits._

  test("callable from SQL with GROUP BY; per-group arrays ranked best-first") {
    Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.7),
      (2L, 20L, 0.1), (2L, 21L, 0.2))
      .toDF("g", "id", "s").createOrReplaceTempView("topk_sql_spec")
    val rows = spark.sql(
      """SELECT g, topk_by_score(s, id, 2) AS tk
         FROM topk_sql_spec GROUP BY g ORDER BY g""")
      .as[(Long, Seq[(Long, Double)])].collect()
    rows(0)._2 shouldBe Seq((11L, 0.9), (12L, 0.7))
    rows(1)._2 shouldBe Seq((21L, 0.2), (20L, 0.1))
  }

  test("null scores and ids are skipped, never ranked") {
    Seq((Some(0.9), Some(1L)), (None, Some(2L)), (Some(0.8), None),
      (Some(0.5), Some(3L)))
      .toDF("s", "id").createOrReplaceTempView("topk_null_spec")
    val out = spark.sql(
      "SELECT topk_by_score(s, id, 10) FROM topk_null_spec")
      .as[Seq[(Long, Double)]].collect().head
    out shouldBe Seq((1L, 0.9), (3L, 0.5))
  }

  test("rejects non-literal, non-positive k and wrong input types") {
    Seq((1.0, 1L)).toDF("s", "id").createOrReplaceTempView("topk_err_spec")
    intercept[Exception] {
      spark.sql("SELECT topk_by_score(s, id, 0) FROM topk_err_spec").collect()
    }.getMessage should include("positive")
    intercept[Exception] {
      spark.sql("SELECT topk_by_score(s, id, CAST(id AS INT)) FROM topk_err_spec").collect()
    }
    val e = intercept[Exception] {
      spark.sql("SELECT topk_by_score(id, id, 2) FROM topk_err_spec").collect()
    }
    e.getMessage should (include("double") or include("DOUBLE") or include("type"))
  }
}
