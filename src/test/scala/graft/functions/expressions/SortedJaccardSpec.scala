package graft.functions.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.HashKernels

class SortedJaccardSpec extends SparkSpec {
  import spark.implicits._

  test("registered via GraftExtensions and callable from SQL and expr()") {
    val r = spark.sql(
      "SELECT sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
      .as[Double].collect()(0)
    r shouldBe 0.5 +- 1e-12
  }

  test("matches the JVM kernel on random sorted inputs") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 100).map { _ =>
      val a = Set.fill(rng.nextInt(40))(rng.nextInt(60).toLong).toArray.sorted
      val b = Set.fill(rng.nextInt(40))(rng.nextInt(60).toLong).toArray.sorted
      (a, b)
    }
    val got = rows.toDF("a", "b")
      .select(call_function("sorted_jaccard", col("a"), col("b")))
      .as[Double].collect()
    got.zip(rows).foreach { case (g, (a, b)) =>
      g shouldBe HashKernels.sortedJaccard(a, b) +- 1e-12
    }
  }

  test("null and empty semantics") {
    spark.sql("SELECT sorted_jaccard(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS j")
      .select(col("j").isNull).as[Boolean].collect()(0) shouldBe true
    spark.sql("SELECT sorted_jaccard(CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>)) AS j")
      .as[Double].collect()(0) shouldBe 1.0
    spark.sql("SELECT sorted_jaccard(CAST(array() AS ARRAY<BIGINT>), array(1L)) AS j")
      .as[Double].collect()(0) shouldBe 0.0
  }

  test("evaluates inside whole-stage codegen (no UDF node in the plan)") {
    val df = Seq((Array(1L, 2L), Array(2L, 3L))).toDF("a", "b")
      .select(call_function("sorted_jaccard", col("a"), col("b")).as("j"))
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "BatchEvalPython"
    plan.toLowerCase should not include "scalaudf"
    df.as[Double].collect()(0) shouldBe (1.0 / 3.0) +- 1e-12
  }
}
