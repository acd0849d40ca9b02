package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)),
    (Array(1.0, 2.0, 2.0), Array(1.0, 2.0, 2.0)),
    (Array(1.0, 1.0, 0.0), Array(1.0, 0.0, 0.0))
  ).toDF("a", "b")

  test("dot, l2Norm, cosine, l2Distance agree with hand computation") {
    val rows = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("dot"),
      VectorFunctions.l2Norm(col("a")).as("na"),
      VectorFunctions.cosine(col("a"), col("b")).as("cos"),
      VectorFunctions.l2Distance(col("a"), col("b")).as("dist")
    ).as[(Double, Double, Double, Double)].collect()

    rows(0)._1 shouldBe 0.0
    rows(0)._3 shouldBe 0.0
    rows(0)._4 shouldBe math.sqrt(2.0) +- 1e-12

    rows(1)._1 shouldBe 9.0
    rows(1)._2 shouldBe 3.0
    rows(1)._3 shouldBe 1.0 +- 1e-12
    rows(1)._4 shouldBe 0.0

    rows(2)._3 shouldBe (1.0 / math.sqrt(2.0)) +- 1e-12
  }

  test("lshBucket is deterministic and within [0, 2^nBits)") {
    val b1 = df.select(VectorFunctions.lshBucket(col("a"), 3, 4).as("k")).as[Long].collect()
    val b2 = df.select(VectorFunctions.lshBucket(col("a"), 3, 4).as("k")).as[Long].collect()
    b1 shouldBe b2
    all(b1) should (be >= 0L and be < 16L)
  }

  test("cosine-similar vectors land in the same LSH bucket, dissimilar may not") {
    val d = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.001, 2.001, 3.001))
    ).toDF("a", "b")
    val r = d.select(
      VectorFunctions.lshBucket(col("a"), 3, 8).as("ka"),
      VectorFunctions.lshBucket(col("b"), 3, 8).as("kb")
    ).as[(Long, Long)].collect()
    r(0)._1 shouldBe r(0)._2
  }
}
