package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spectral / per-row array analytics — the OPTAA optical-product family
  * (rca_data_tools/qaqc/advanced_qaqc/calculateFunctions.py:622-791:
  * pigment ratios a412/a440, chlorophyll line height from medians around
  * 650/676/715 nm, POC from median attenuation) re-expressed as pure
  * higher-order Catalyst expressions over `ArrayType` columns. No UDFs —
  * everything stays codegen-eligible and runs inside the scan stage.
  *
  * Indices are 0-based here (the reference finds them by nearest-wavelength
  * search; index resolution happens at plan time from the wavelength grid).
  */
object Spectral {

  /** element_at with 0-based index. */
  def at(a: Column, i: Int): Column = element_at(a, i + 1)

  /** Ratio of two spectrum elements, null-safe on zero denominator
    * (reference guards the divide with `where(a440 != 0)`).
    */
  def bandRatio(a: Column, iNum: Int, iDen: Int): Column =
    when(at(a, iDen) =!= 0.0, at(a, iNum) / at(a, iDen))

  /** Exact median of the (up to) 3 consecutive elements centered at `i`
    * (the reference takes `nanmedian(abs[:, idx±1])` — a 3-window): sort
    * and take the middle. Windows truncated at the array EDGES follow
    * numpy median semantics — mean of 2 elements, the element itself for
    * 1 — and an index-0 center no longer builds the illegal
    * `slice(a, 0, 3)` (SQL slice is 1-based).
    */
  def median3(a: Column, i: Int): Column = {
    val start1 = math.max(i, 1) // 1-based window start (0-based i−1)
    val len = least(lit(i + 2), size(a)) - lit(start1) + 1
    val s = sort_array(slice(a, lit(start1), len))
    when(size(s) === 3, element_at(s, 2))
      .when(size(s) === 2, (element_at(s, 1) + element_at(s, 2)) / 2.0)
      .when(size(s) === 1, element_at(s, 1))
  }

  /** Chlorophyll-style line height at index `iPeak` against the baseline
    * interpolated between `iLo` and `iHi` (reference formula at
    * calculateFunctions.py:764-774, with 3-point medians at each band).
    * The baseline fraction uses the NOMINAL band wavelengths — the
    * reference computes `((a715−a650)/(715−650))·(676−650) + a650` with
    * those constants, NOT an index or grid fraction.
    */
  def lineHeight(a: Column, iLo: Int, iPeak: Int, iHi: Int,
                 wlLo: Double, wlPeak: Double, wlHi: Double): Column = {
    val mLo = median3(a, iLo)
    val mPk = median3(a, iPeak)
    val mHi = median3(a, iHi)
    val frac = (wlPeak - wlLo) / (wlHi - wlLo)
    mPk - (mLo + (mHi - mLo) * frac)
  }

  /** POC-style scaled median: median3 at `i` × `scale` (reference ×381). */
  def scaledMedian(a: Column, i: Int, scale: Double): Column =
    median3(a, i) * scale

  /** Nearest-wavelength index resolution (`argmin |wl − target|`,
    * calculateFunctions.py:678-689) — plan-time, driver-side: the
    * wavelength grid is per-deployment config, not per-row data.
    */
  def nearestIndex(wlGrid: Seq[Double], target: Double): Int =
    wlGrid.indices.minBy(i => math.abs(wlGrid(i) - target))

  /** The named OPTAA product bundle (calculateFunctions.py:622-791):
    * pigment ratios a412/a440 and a443/a440, chlorophyll line height from
    * 3-point medians at the 650/676/715 nm indices, and POC =
    * median(c ≈ 660 nm ± 1) × 381 — indices resolved from the deployment's
    * wavelength grid. Returns named (product, column) pairs over the
    * absorption (`a`) and attenuation (`c`) spectra.
    */
  def opticalProducts(a: Column, c: Column,
                      wlGrid: Seq[Double]): Seq[(String, Column)] = {
    val i412 = nearestIndex(wlGrid, 412.0)
    val i440 = nearestIndex(wlGrid, 440.0)
    val i443 = nearestIndex(wlGrid, 443.0)
    val i650 = nearestIndex(wlGrid, 650.0)
    val i676 = nearestIndex(wlGrid, 676.0)
    val i715 = nearestIndex(wlGrid, 715.0)
    val i660 = nearestIndex(wlGrid, 660.0)
    Seq(
      "ratio_412_440" -> bandRatio(a, i412, i440),
      "ratio_443_440" -> bandRatio(a, i443, i440),
      "chl_line_height" -> lineHeight(a, i650, i676, i715, 650.0, 676.0, 715.0),
      "poc" -> scaledMedian(c, i660, 381.0))
  }
}
