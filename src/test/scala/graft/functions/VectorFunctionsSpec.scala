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

  test("int8Quantize bounds codes in [-127,127] and reconstructs within scale/2") {
    val d = Seq(
      Tuple1(Array(0.3, -1.7, 0.002, 1.7)),
      Tuple1(Array(-0.5, 0.25, 0.125, 0.0))
    ).toDF("v")
    val rows = d.select(
        VectorFunctions.int8Quantize(col("v")).as("q"), col("v"))
      .select(col("q.codes"), col("q.scale"),
        VectorFunctions.int8Dequantize(col("q")).as("r"), col("v"))
      .as[(Seq[Long], Double, Seq[Double], Seq[Double])].collect()
    rows.foreach { case (codes, scale, recon, orig) =>
      all(codes) should (be >= -127L and be <= 127L)
      codes.map(math.abs).max shouldBe 127L // max-abs element saturates
      scale shouldBe orig.map(math.abs).max / 127.0
      recon.zip(orig).foreach { case (r, o) =>
        math.abs(r - o) should be <= scale / 2 + 1e-12
      }
    }
  }

  test("int8Quantize maps the zero vector to zero codes with scale 0") {
    val d = Seq(Tuple1(Array(0.0, 0.0, 0.0))).toDF("v")
    val (codes, scale) = d.select(VectorFunctions.int8Quantize(col("v")).as("q"))
      .select(col("q.codes"), col("q.scale"))
      .as[(Seq[Long], Double)].head()
    codes shouldBe Seq(0L, 0L, 0L)
    scale shouldBe 0.0
  }

  test("hashProject matches hand-computed Rademacher signs and is linear") {
    // signs for dim 2: j=0 -> (+1, +1), j=1 -> (-1, -1)
    VectorFunctions.hashProjectKernel(Seq(1.0, 2.0), 2).toSeq shouldBe Seq(3.0, -3.0)
    // linearity: P(2v) = 2 P(v)
    val v = Seq(0.5, -1.25, 2.0, 0.125)
    val p1 = VectorFunctions.hashProjectKernel(v, 8)
    val p2 = VectorFunctions.hashProjectKernel(v.map(_ * 2), 8)
    p2.toSeq shouldBe p1.map(_ * 2).toSeq
    // null vectors project to null through the column form
    val d = Seq((1L, Array(1.0, 2.0)), (2L, null.asInstanceOf[Array[Double]]))
      .toDF("id", "v")
    val out = d.select(col("id"), VectorFunctions.hashProject(col("v"), 2).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    out(1L) shouldBe Seq(3.0, -3.0)
    out(2L) shouldBe null
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
