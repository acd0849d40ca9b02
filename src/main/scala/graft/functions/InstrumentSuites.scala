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

  // ---- Presence-conditional composition (the VEL3D/FLOR pattern) ----

  /** The reference enables tests by column presence
    * (calculateFunctions.py:1020-1074, :212-216): a test joins the bundle
    * only when every column it reads exists in the physical schema.
    * Resolution happens at PLAN time from `columns` — schema-driven, no
    * runtime branching.
    */
  def presentTests(columns: Seq[String],
                   tests: Seq[(String, Seq[String], Column)]): Seq[(String, Column)] = {
    val have = columns.toSet
    tests.collect { case (name, needs, mask) if needs.forall(have) => name -> mask }
  }

  // ---- FLOR (calculateFunctions.py:189-218) ----

  /** FLOR raw-signal range tests; the CDOM test joins only when the CDOM
    * variable exists (presence-conditional).
    */
  def florFlags(columns: Seq[String]): Seq[(String, Column)] = {
    val maxCounts = 4125.0
    def rangeTest(c: String): Column = col(c) <= 0 || col(c) > maxCounts
    presentTests(columns, Seq(
      ("raw_signal_beta", Seq("raw_signal_beta"), rangeTest("raw_signal_beta")),
      ("raw_signal_chl", Seq("raw_signal_chl"), rangeTest("raw_signal_chl")),
      ("raw_signal_cdom", Seq("raw_signal_cdom"), rangeTest("raw_signal_cdom"))))
  }

  // ---- VELPT / VEL3D (calculateFunctions.py:985-1074) ----

  /** VELPT attitude/sound/pressure bundle (fixed schema). */
  def velptFlags(pitch: Column, roll: Column, soundSpeed: Column,
                 pressure: Column): Seq[(String, Column)] = Seq(
    "suspect_pitch" -> (abs(pitch) > 20),
    "failed_pitch" -> (abs(pitch) >= 30),
    "suspect_roll" -> (abs(roll) > 20),
    "failed_roll" -> (abs(roll) >= 30),
    "failed_speed_of_sound" -> (soundSpeed <= 1400 || soundSpeed >= 1700),
    "failed_pressure" -> (pressure <= 0))

  /** VEL3D bundle: every test presence-conditional, including the vector
    * vs aquadopp correlation variants and the `error_code & 1` test.
    */
  def vel3dFlags(columns: Seq[String]): Seq[(String, Column)] =
    presentTests(columns, Seq(
      ("suspect_pitch", Seq("pitch"), abs(col("pitch")) > 20),
      ("failed_pitch", Seq("pitch"), abs(col("pitch")) >= 30),
      ("suspect_roll", Seq("roll"), abs(col("roll")) > 20),
      ("failed_roll", Seq("roll"), abs(col("roll")) >= 30),
      ("failed_speed_of_sound", Seq("speed_of_sound"),
        col("speed_of_sound") < 1400 || col("speed_of_sound") > 1700),
      ("failed_pressure", Seq("sea_water_pressure"), col("sea_water_pressure") <= 15),
      ("failed_error_code", Seq("error_code"),
        col("error_code").cast("int").bitwiseAND(1) === 1),
      ("failed_correlation", Seq("correlation_beam1", "correlation_beam2", "correlation_beam3"),
        col("correlation_beam1") < 50 || col("correlation_beam2") < 50 ||
          col("correlation_beam3") < 50),
      ("failed_correlation", Seq("correlation_1", "correlation_2", "correlation_3"),
        col("correlation_1") < 50 || col("correlation_2") < 50 || col("correlation_3") < 50),
      ("failed_ambiguity",
        Seq("ambiguity_velocity", "velocity_1", "velocity_2", "velocity_3"),
        abs(col("velocity_1")) > col("ambiguity_velocity") ||
          abs(col("velocity_2")) > col("ambiguity_velocity") ||
          abs(col("velocity_3")) > col("ambiguity_velocity"))))

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
