package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Named per-instrument advanced flag suites (SURVEY §2.9 C7) — the
  * reference's instrument-specific formulas re-expressed as pure Catalyst
  * expressions over scalar and `ArrayType` columns, composing
  * [[ArrayTests]] building blocks into [[Qartod.combineFlags]] digit
  * strings. All citations into
  * rca_data_tools/qaqc/advanced_qaqc/calculateFunctions.py.
  */
object InstrumentSuites {

  // ---- ADCP (calculateFunctions.py:78-171) ----

  /** Sidelobe contamination depth, Lentz et al. (2022):
    * `z_ic = ha·(1 − cos θ) + 3·Δz/2` with Δz in meters (the reference
    * divides `cell_length` cm by 100) — calculateFunctions.py:78-107.
    */
  def sidelobeDepth(transducerDepth: Column, cellLengthCm: Column,
                    thetaDegrees: Double = 20.0): Column = {
    val theta = math.toRadians(thetaDegrees)
    transducerDepth * (1.0 - math.cos(theta)) + lit(3.0) * (cellLengthCm / 100.0) / 2.0
  }

  /** ADCP flag bundle: error/vertical velocity magnitude, horizontal-speed
    * component test, 2-of-4 correlation vote, 3-of-4 percent-good vote
    * (calculateFunctions.py:140-171). `corr`/`pctGood` are the 4-beam
    * arrays; thresholds as the reference's per-type config.
    */
  def adcpFlags(errorVel: Column, verticalVel: Column,
                eastVel: Column, northVel: Column,
                corr: Column, pctGood: Column,
                evFail: Double, vvFail: Double, hsFail: Double,
                cmPass: Double, pgPass: Double): Seq[(String, Column)] = Seq(
    "error_velocity" -> (abs(errorVel) > evFail),
    "vertical_velocity" -> (abs(verticalVel) > vvFail),
    "horizontal_speed" -> (abs(eastVel) > hsFail || abs(northVel) > hsFail),
    "correlation_magnitude" -> ArrayTests.voteFail(corr, cmPass, k = 2, take = 4),
    "percent_good" -> ArrayTests.voteFail(pctGood, pgPass, k = 3, take = 4))

  // ---- PCO2W (calculateFunctions.py:809-890) ----

  /** PCO2W flag bundle over blanks + pCO2: low blanks (<20 % of the 16384
    * full scale), W2 step tests on both blanks (|Δ| > 2800) and on pCO2
    * (|Δ| > 1600; first row false via the reference's reindex fill), and
    * the J2 as-of-joined calibration range test. Step columns are the
    * pre-computed lags (window exprs at the call site — windows don't
    * belong inside a scalar bundle).
    */
  def pco2wFlags(blank434: Column, blank620: Column, pco2: Column,
                 prevBlank434: Column, prevBlank620: Column, prevPco2: Column,
                 calMin: Column, calMax: Column): Seq[(String, Column)] = {
    val fullScale = 16384.0
    def step(cur: Column, prev: Column, t: Double): Column =
      coalesce(abs(cur - prev) > t, lit(false)) // first row: no previous -> false
    Seq(
      "failed_blank" -> (blank434 < fullScale * 0.20 || blank620 < fullScale * 0.20),
      "failed_blank_step" ->
        (step(blank434, prevBlank434, 2800) || step(blank620, prevBlank620, 2800)),
      "failed_pco2_step" -> step(pco2, prevPco2, 1600),
      "failed_cal_range" -> (pco2 < calMin || pco2 > calMax))
  }

  // ---- PHSEN (calculateFunctions.py:898-977) ----

  /** 0-based column `c` of the row-major `(rows × 4)` reshape of a flat
    * light-measurement array (the reference's `np.reshape(N, rows, 4)`
    * then `[:, :, c]`): elements `4·r + c` — calculateFunctions.py:904-918.
    */
  def reshapeColumn(flat: Column, rows: Int, c: Int): Column =
    array((0 until rows).map(r => element_at(flat, r * 4 + c + 1)): _*)

  /** pH flag bundle over the reshaped 23×4 light and 4×4 blank arrays.
    * Thresholds are the reference's: max_bits 4096; low signal < 4096/12;
    * flat signal std < 180 (and < 60 for intensity); erratic reference
    * std > 10; saturated > 4096 − 4096/20; failed intensity < 5.
    */
  def phFlags(light: Column, blanks: Column): Seq[(String, Column)] = {
    val maxBits = 4096.0
    val ref434 = reshapeColumn(light, 23, 0)
    val sig434 = reshapeColumn(light, 23, 1)
    val ref578 = reshapeColumn(light, 23, 2)
    val sig578 = reshapeColumn(light, 23, 3)
    val bSig434 = reshapeColumn(blanks, 4, 1)
    val bSig578 = reshapeColumn(blanks, 4, 3)
    def anyBelow(a: Column, t: Double) = exists(a, x => x < t)
    def anyAbove(a: Column, t: Double) = exists(a, x => x > t)
    Seq(
      "low_indicator_signal" ->
        (anyBelow(sig434, maxBits / 12) || anyBelow(sig578, maxBits / 12)),
      "flat_indicator_signal" ->
        (ArrayTests.arrayStd(sig434) < 180 || ArrayTests.arrayStd(sig578) < 180),
      "erratic_reference" ->
        (ArrayTests.arrayStd(ref434) > 10 || ArrayTests.arrayStd(ref578) > 10),
      "failed_blank" ->
        (anyAbove(bSig434, maxBits - maxBits / 20) || anyBelow(bSig434, maxBits / 12) ||
          anyAbove(bSig578, maxBits - maxBits / 20) || anyBelow(bSig578, maxBits / 12)),
      "failed_intensity" ->
        (anyAbove(sig434, maxBits - maxBits / 20) || anyBelow(sig434, 5) ||
          anyAbove(sig578, maxBits - maxBits / 20) || anyBelow(sig578, 5)),
      "flat_intensity" ->
        (ArrayTests.arrayStd(sig434) < 60 || ArrayTests.arrayStd(sig578) < 60))
  }
}
