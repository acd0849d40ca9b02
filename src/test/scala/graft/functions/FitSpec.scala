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

class NitrateFitSpec extends AnyFunSuite with Matchers {

  // synthesize a spectrum whose corrected absorbance is EXACTLY
  // no3*ENO3 + b/100 + s*wl/1000, so the fit must recover (no3, b, s)
  private def synth(no3: Double, b: Double, slope: Double,
                    ctdT: Double, ctdSp: Double, calTemp: Double) = {
    val wl = Array.tabulate(256)(i => 190.0 + i * 0.4)
    val eno3 = wl.map(w => 0.01 * math.exp(-(w - 210) * (w - 210) / 800.0))
    val eswa = wl.map(w => 0.005 * math.exp(-(w - 200) / 40.0))
    val di = Array.fill(256)(50000.0)
    val dark = 1000.0
    val c0 = 1.46380e-02; val c1 = 1.67660e-03; val c2 = 2.91898e-05
    val c3 = -7.56395e-06; val c4 = 1.27353e-07
    val sw = wl.indices.map { i =>
      val wlP = wl(i) - 210.0
      val fP = c0 + c1 * wlP + c2 * wlP * wlP + c3 * math.pow(wlP, 3) + c4 * math.pow(wlP, 4)
      val aswa = ctdSp * eswa(i) * math.exp(fP * (ctdT - calTemp))
      val acomp = no3 * eno3(i) + b / 100.0 + slope * wl(i) / 1000.0
      val absorbance = acomp + aswa
      di(i) / math.pow(10, absorbance) + dark
    }.toArray
    (wl, eno3, eswa, di, sw, dark)
  }

  test("recovers known (NO3, baseline, slope) through the full T/S correction") {
    val (wl, eno3, eswa, di, sw, dark) = synth(12.5, 3.0, -0.2, 10.0, 34.0, 20.0)
    val (no3, c, rmse) = Fit.nitrateFit(wl, eno3, eswa, di, sw, dark,
      ctdT = 10.0, ctdSp = 34.0, calTemp = 20.0,
      wlLower = 217.0, wlUpper = 240.0, frameType = "SLB")
    no3 shouldBe 12.5 +- 1e-6
    c(1) shouldBe 3.0 +- 1e-6
    c(2) shouldBe -0.2 +- 1e-6
    rmse shouldBe 0.0 +- 1e-9
  }

  test("dark frames yield NaN, wavelength window restricts the fit") {
    val (wl, eno3, eswa, di, sw, dark) = synth(5.0, 1.0, 0.1, 12.0, 33.0, 20.0)
    for (frame <- Seq("SDB", "SDF", "NDF")) {
      val (no3, _, rmse) = Fit.nitrateFit(wl, eno3, eswa, di, sw, dark,
        12.0, 33.0, 20.0, 217.0, 240.0, frame)
      no3.isNaN shouldBe true
      rmse.isNaN shouldBe true
    }
    // empty window -> NaN
    val (no3e, _, _) = Fit.nitrateFit(wl, eno3, eswa, di, sw, dark,
      12.0, 33.0, 20.0, 500.0, 600.0, "SLB")
    no3e.isNaN shouldBe true
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

  test("nitrateFitCol matches the kernel through the column API") {
    val wl = Array.tabulate(64)(i => 200.0 + i)
    val eno3 = wl.map(w => 0.01 * math.exp(-(w - 210) * (w - 210) / 800.0))
    val eswa = wl.map(_ => 0.001)
    val di = Array.fill(64)(50000.0)
    val sw = wl.indices.map(i =>
      di(i) / math.pow(10, 7.0 * eno3(i) + 0.02) + 500.0).toArray
    val df = Seq((wl, eno3, eswa, di, sw, 500.0, 20.0, 0.0, 20.0, "SLB"))
      .toDF("wl", "eno3", "eswa", "di", "sw", "dark", "t", "sp", "calt", "frame")
    val r = df.select(Fit.nitrateFitCol(col("wl"), col("eno3"), col("eswa"),
        col("di"), col("sw"), col("dark"), col("t"), col("sp"), col("calt"),
        lit(205.0), lit(245.0), col("frame")).as("f"))
      .select("f.no3", "f.rmse").as[(Double, Double)].collect()(0)
    // sp = 0 and t = calTemp disable the correction; acomp = 7*eno3 + 2/100
    r._1 shouldBe 7.0 +- 1e-6
    r._2 shouldBe 0.0 +- 1e-9
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
