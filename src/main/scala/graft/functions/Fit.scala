package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-row least-squares fitting over `ArrayType` columns — the Spark
  * re-expression of the reference's NUTNR nitrate fit shape
  * (rca_data_tools/qaqc/advanced_qaqc/calculateFunctions.py:267-468: per
  * sample, solve C = pinv(M)·A for a 3-column design matrix M and an
  * absorbance vector A, then report coefficients + RMSE).
  *
  * The kernels are tight JVM loops behind scalar UDFs (one boxing boundary
  * per row; the per-row work is O(len × basis²) — same rationale as
  * [[HashKernels]]). Deterministic left-to-right accumulation so results are
  * reproducible run-to-run; each row is independent, so the operator scales
  * embarrassingly with the scan.
  */
object Fit {

  /** Ordinary least squares y ≈ a + b·x via closed-form normal equations.
    * Returns (slope, intercept, rmse); NaN-padded result when n < 2 or the
    * design is degenerate (constant x).
    */
  def linFit(xs: Array[Double], ys: Array[Double]): (Double, Double, Double) = {
    val n = math.min(xs.length, ys.length)
    if (n < 2) return (Double.NaN, Double.NaN, Double.NaN)
    var sx = 0.0; var sy = 0.0; var sxx = 0.0; var sxy = 0.0
    var i = 0
    while (i < n) {
      sx += xs(i); sy += ys(i); sxx += xs(i) * xs(i); sxy += xs(i) * ys(i)
      i += 1
    }
    val det = n * sxx - sx * sx
    if (det == 0.0) return (Double.NaN, Double.NaN, Double.NaN)
    val slope = (n * sxy - sx * sy) / det
    val intercept = (sy - slope * sx) / n
    var sse = 0.0
    i = 0
    while (i < n) {
      val r = ys(i) - (intercept + slope * xs(i))
      sse += r * r
      i += 1
    }
    (slope, intercept, math.sqrt(sse / n))
  }

  /** Least squares over an arbitrary small basis: rows of `design` are the
    * per-sample basis values (len × k, k ≤ 4ish), solved via normal
    * equations + Gaussian elimination with partial pivoting. Returns
    * (coeffs, rmse); NaN coeffs on singular systems. This is the 3-basis
    * NUTNR fit generalized.
    */
  def lsqFit(design: Array[Array[Double]], ys: Array[Double]): (Array[Double], Double) = {
    val n = math.min(design.length, ys.length)
    if (n == 0) return (Array.empty, Double.NaN)
    val k = design(0).length
    val ata = Array.ofDim[Double](k, k)
    val atb = new Array[Double](k)
    var i = 0
    while (i < n) {
      val row = design(i)
      var a = 0
      while (a < k) {
        atb(a) += row(a) * ys(i)
        var b = 0
        while (b < k) { ata(a)(b) += row(a) * row(b); b += 1 }
        a += 1
      }
      i += 1
    }
    // Gaussian elimination with partial pivoting on [ata | atb]
    val coef = new Array[Double](k)
    var col0 = 0
    var singular = false
    while (col0 < k && !singular) {
      var piv = col0
      var r = col0 + 1
      while (r < k) {
        if (math.abs(ata(r)(col0)) > math.abs(ata(piv)(col0))) piv = r
        r += 1
      }
      if (math.abs(ata(piv)(col0)) < 1e-12) singular = true
      else {
        if (piv != col0) {
          val tmp = ata(piv); ata(piv) = ata(col0); ata(col0) = tmp
          val tb = atb(piv); atb(piv) = atb(col0); atb(col0) = tb
        }
        r = col0 + 1
        while (r < k) {
          val f = ata(r)(col0) / ata(col0)(col0)
          var c = col0
          while (c < k) { ata(r)(c) -= f * ata(col0)(c); c += 1 }
          atb(r) -= f * atb(col0)
          r += 1
        }
        col0 += 1
      }
    }
    if (singular) return (Array.fill(k)(Double.NaN), Double.NaN)
    var r = k - 1
    while (r >= 0) {
      var acc = atb(r)
      var c = r + 1
      while (c < k) { acc -= ata(r)(c) * coef(c); c += 1 }
      coef(r) = acc / ata(r)(r)
      r -= 1
    }
    var sse = 0.0
    i = 0
    while (i < n) {
      var pred = 0.0
      var c = 0
      while (c < k) { pred += design(i)(c) * coef(c); c += 1 }
      val res = ys(i) - pred
      sse += res * res
      i += 1
    }
    (coef, math.sqrt(sse / n))
  }

  /** Frame types the reference treats as dark frames (no fit, NaN outputs)
    * — calculateFunctions.py:416-421.
    */
  val DarkFrames: Set[String] = Set("SDB", "SDF", "NDF")

  /** Faithful port of the Plant et al. (2023) / Sakamoto (2009)
    * temperature-and-salinity-corrected nitrate fit
    * (calculateFunctions.py:267-468), one sample per call:
    *
    *  1. dark frames → NaN outputs;
    *  2. wavelength window `wlLower ≤ wl ≤ wlUpper` selects the fit band;
    *  3. `Absorbance = log10(DI / (SW − dark))`;
    *  4. bromide/seawater correction `ESWA · exp(f'(wl) · (t − calTemp))`
    *     with the published quartic `f'` in (wl − 210), scaled by practical
    *     salinity, subtracted from the absorbance;
    *  5. least squares on the design `[ENO3, 1/100, wl/1000]` (normal
    *     equations — same minimizer as the reference's pinv for the
    *     full-rank 3-column design); NO3 = first coefficient; RMSE over the
    *     fitted band.
    *
    * Returns (no3, coefficients[3], rmse).
    */
  def nitrateFit(wl: Array[Double], eno3: Array[Double], eswa: Array[Double],
                 di: Array[Double], sw: Array[Double], dark: Double,
                 ctdT: Double, ctdSp: Double, calTemp: Double,
                 wlLower: Double, wlUpper: Double,
                 frameType: String): (Double, Array[Double], Double) = {
    if (DarkFrames.contains(frameType))
      return (Double.NaN, Array.fill(3)(Double.NaN), Double.NaN)
    val c0 = 1.46380e-02; val c1 = 1.67660e-03; val c2 = 2.91898e-05
    val c3 = -7.56395e-06; val c4 = 1.27353e-07
    // clamp to the shortest calibration array: a wavelength grid longer
    // than a mid-deployment cal revision must not index past it
    val maxLen = Seq(wl.length, eno3.length, eswa.length, di.length, sw.length).min
    val idx = (0 until maxLen).filter(i => wlLower <= wl(i) && wl(i) <= wlUpper)
    val n = idx.length
    if (n == 0) return (Double.NaN, Array.fill(3)(Double.NaN), Double.NaN)
    val design = new Array[Array[Double]](n)
    val acomp = new Array[Double](n)
    var j = 0
    while (j < n) {
      val i = idx(j)
      val swCorr = sw(i) - dark
      val absorbance = math.log10(di(i) / swCorr)
      val wlPrime = wl(i) - 210.0
      val fPrime = c0 + c1 * wlPrime + c2 * wlPrime * wlPrime +
        c3 * math.pow(wlPrime, 3) + c4 * math.pow(wlPrime, 4)
      val swaExtAtT = eswa(i) * math.exp(fPrime * (ctdT - calTemp))
      acomp(j) = absorbance - ctdSp * swaExtAtT
      design(j) = Array(eno3(i), 0.01, wl(i) / 1000.0)
      j += 1
    }
    val (coef, rmse) = lsqFit(design, acomp)
    (coef(0), coef, rmse)
  }

  // ---- Column-level wrappers ----

  /** Fit y[i] ≈ intercept + slope·i over the elements of an array column.
    * Returns struct(slope, intercept, rmse). Null array → null struct
    * (Spark does not auto-null-check Seq udf params).
    */
  def indexLinFitCol(ys: Column): Column = {
    val f = udf { (y: Seq[Double]) =>
      if (y == null) null
      else {
        val xs = Array.tabulate(y.length)(_.toDouble)
        val (s, a, r) = linFit(xs, y.toArray)
        (s, a, r)
      }
    }
    f(ys.cast("array<double>")).cast("struct<slope:double,intercept:double,rmse:double>")
  }

  /** Column wrapper for [[nitrateFit]]: per-row arrays (spectrum + the
    * as-of-joined calibration arrays) + scalars in, struct(no3, coeffs,
    * rmse) out. Each row independent — scales with the scan.
    */
  def nitrateFitCol(wl: Column, eno3: Column, eswa: Column, di: Column,
                    sw: Column, dark: Column, ctdT: Column, ctdSp: Column,
                    calTemp: Column, wlLower: Column, wlUpper: Column,
                    frameType: Column): Column = {
    val f = udf { (spectra: Seq[Seq[Double]], dark: Double,
                   t: Double, sp: Double, calT: Double,
                   lo: Double, hi: Double, frame: String) =>
      if (spectra == null || spectra.exists(_ == null)) null
      else {
        val (no3, c, rmse) = nitrateFit(
          spectra(0).toArray, spectra(1).toArray, spectra(2).toArray,
          spectra(3).toArray, spectra(4).toArray, dark, t, sp, calT, lo, hi, frame)
        (no3, c.toSeq, rmse)
      }
    }
    val spectra = array(wl.cast("array<double>"), eno3.cast("array<double>"),
      eswa.cast("array<double>"), di.cast("array<double>"), sw.cast("array<double>"))
    f(spectra, dark.cast("double"), ctdT.cast("double"),
      ctdSp.cast("double"), calTemp.cast("double"), wlLower.cast("double"),
      wlUpper.cast("double"), frameType)
      .cast("struct<no3:double,coeffs:array<double>,rmse:double>")
  }

  /** Fit ys ≈ c0·basis0 + c1·basis1 + c2·basis2 with the NUTNR-shaped
    * design ([ENO3-like curve, constant 1/100, index/1000]). Returns
    * struct(c0, c1, c2, rmse); null or empty inputs → null / all-NaN
    * (lsqFit returns an EMPTY coefficient array for n = 0, which must
    * not be indexed).
    */
  def nutnrFitCol(absorbance: Column, eno3: Column): Column = {
    val f = udf { (a: Seq[Double], e: Seq[Double]) =>
      if (a == null || e == null) null
      else {
        val n = math.min(a.length, e.length)
        if (n == 0) (Double.NaN, Double.NaN, Double.NaN, Double.NaN)
        else {
          val design = Array.tabulate(n)(i => Array(e(i), 0.01, i / 1000.0))
          val (c, rmse) = lsqFit(design, a.toArray.take(n))
          (c(0), c(1), c(2), rmse)
        }
      }
    }
    f(absorbance.cast("array<double>"), eno3.cast("array<double>"))
      .cast("struct<c0:double,c1:double,c2:double,rmse:double>")
  }
}
