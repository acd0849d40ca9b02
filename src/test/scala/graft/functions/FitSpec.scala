package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class FitKernelSpec extends AnyFunSuite with Matchers {
  test("linFit recovers exact line with zero rmse") {
    val xs = Array(0.0, 1.0, 2.0, 3.0)
    val ys = xs.map(x => 2.5 * x - 1.0)
    val (s, a, r) = Fit.linFit(xs, ys)
    s shouldBe 2.5 +- 1e-12
    a shouldBe -1.0 +- 1e-12
    r shouldBe 0.0 +- 1e-12
  }

  test("linFit degenerate inputs give NaN") {
    Fit.linFit(Array(1.0), Array(2.0))._1.isNaN shouldBe true
    Fit.linFit(Array(3.0, 3.0), Array(1.0, 2.0))._1.isNaN shouldBe true
  }

  test("lsqFit solves a known 3-basis system exactly") {
    // y = 2*b0 + 3*b1 - 1*b2 over a non-degenerate design
    val design = Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0),
      Array(1.0, 1.0, 0.0), Array(1.0, 0.0, 1.0), Array(0.0, 1.0, 1.0))
    val coef0 = Array(2.0, 3.0, -1.0)
    val ys = design.map(row => row.zip(coef0).map { case (a, b) => a * b }.sum)
    val (c, rmse) = Fit.lsqFit(design, ys)
    c(0) shouldBe 2.0 +- 1e-10
    c(1) shouldBe 3.0 +- 1e-10
    c(2) shouldBe -1.0 +- 1e-10
    rmse shouldBe 0.0 +- 1e-10
  }

  test("lsqFit singular design returns NaN coefficients") {
    val design = Array(Array(1.0, 2.0), Array(2.0, 4.0), Array(3.0, 6.0))
    val (c, _) = Fit.lsqFit(design, Array(1.0, 2.0, 3.0))
    c.forall(_.isNaN) shouldBe true
  }
}

class FitColumnSpec extends SparkSpec {
  import spark.implicits._

  test("indexLinFitCol matches the kernel on array columns") {
    val df = Seq(Array(1.0, 3.0, 5.0, 7.0)).toDF("ys")
    val r = df.select(Fit.indexLinFitCol(col("ys")).as("f"))
      .select("f.slope", "f.intercept", "f.rmse")
      .as[(Double, Double, Double)].collect()(0)
    r._1 shouldBe 2.0 +- 1e-12
    r._2 shouldBe 1.0 +- 1e-12
    r._3 shouldBe 0.0 +- 1e-12
  }

  test("nutnrFitCol returns finite coefficients for a plausible spectrum") {
    val e = Array.tabulate(20)(i => math.exp(-i / 10.0))
    val a = e.map(v => 4.0 * v + 0.02 + 0.001)
    val df = Seq((a, e)).toDF("absorbance", "eno3")
    val r = df.select(Fit.nutnrFitCol(col("absorbance"), col("eno3")).as("f"))
      .select("f.c0", "f.rmse").as[(Double, Double)].collect()(0)
    r._1 shouldBe 4.0 +- 0.2
    r._2 should be < 0.01
  }
}
