package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** QARTOD / legacy-QC flagging, re-expressed as Catalyst column expressions.
  *
  * Semantics follow the reference implementation:
  *   - gross range:  rca_data_tools/qaqc/calculate.py:100-115
  *   - climatology:  rca_data_tools/qaqc/calculate.py:117-193
  *   - flag combine: rca_data_tools/qaqc/advanced_qaqc/calculateFunctions.py:19-46
  *   - bitmask decode: rca_data_tools/qaqc/dashboard.py:1998-2077
  *   - positional-string coercion: rca_data_tools/qaqc/utils.py:20-33
  *
  * Everything here is a pure expression (whole-stage-codegen friendly); at
  * 100 TB these run inside the scan stage with zero extra shuffles.
  */
object Qartod {

  // Shadows functions.round: every oracle-compared column rounds with
  // DuckDB-exact semantics (see graft.functions.Rounding) so half-boundary
  // values hash identically on both engines.
  private def round(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    graft.functions.Rounding.dround(c, scale)

  /** Flag values (QARTOD convention). */
  val Pass = 1
  val NotEvaluated = 2
  val Suspect = 3
  val Fail = 4
  val Missing = 9

  /** C8 gross-range test: 4 outside the fail span (inclusive bounds), 3
    * outside the suspect span, else 1. NaN/null values compare false in the
    * reference (numpy) and therefore stay 1 — replicated explicitly because
    * Spark orders NaN *greater* than any double.
    */
  def grossRangeFlag(x: Column, failLo: Double, failHi: Double,
                     susLo: Double, susHi: Double): Column = {
    val valid = x.isNotNull && !x.isNaN
    when(valid && (x <= failLo || x >= failHi), Fail)
      .when(valid && (x <= susLo || x >= susHi), Suspect)
      .otherwise(Pass)
  }

  /** Fixed (month-only) climatology suspect test. `clim` is a broadcast-size
    * table `(month INT, sus_lo DOUBLE, sus_hi DOUBLE)`; rows whose month has
    * no entry keep flag 1, null/NaN thresholds flag 9 (not-evaluated).
    *
    * INTENTIONAL DEVIATION from the reference: calculate.py's *fixed* path
    * leaves NaN-threshold months at flag 1 and only the *binned* path emits
    * flag 9 for un-fitted bins (calculate.py:178-186 notes this). We unify on
    * the binned convention — an un-fitted month is "not evaluated", not
    * "pass" — and the q10 oracle encodes these semantics. Pass a clim table
    * with NaN rows dropped to reproduce reference behaviour exactly.
    * Returns `df` with `outCol` appended. One broadcast join, no shuffle.
    */
  def climatologyFixed(df: DataFrame, timeCol: String, valueCol: String,
                       clim: DataFrame, outCol: String): DataFrame = {
    // prefix the clim columns: dropping "month"/"sus_lo" by NAME after the
    // join would also delete same-named columns the caller's df carries
    val c = clim.select(col("month").as("__clim_month"),
      col("sus_lo").as("__clim_lo"), col("sus_hi").as("__clim_hi"))
    val joined = df.join(broadcast(c),
      month(df(timeCol)) === col("__clim_month"), "left")
    val x = df(valueCol)
    val lo = col("__clim_lo")
    val hi = col("__clim_hi")
    val flag = when(col("__clim_month").isNull, Pass)
      .when(lo.isNull || hi.isNull || lo.isNaN || hi.isNaN, Missing)
      .when(x.isNotNull && !x.isNaN && (x <= lo || x >= hi), Suspect)
      .otherwise(Pass)
    joined.withColumn(outCol, flag)
      .drop("__clim_month", "__clim_lo", "__clim_hi")
  }

  /** Binned climatology: month equality + depth in `[depth_lo, depth_hi)`.
    * `clim`: `(month INT, depth_lo, depth_hi, sus_lo, sus_hi)` broadcast-size.
    * NaN/null spans for a matched (month, bin) → 9 for every row in the bin
    * (reference behaviour for un-fitted bins).
    */
  def climatologyBinned(df: DataFrame, timeCol: String, valueCol: String,
                        depthCol: String, clim: DataFrame, outCol: String): DataFrame = {
    val d = df(depthCol)
    // prefixed clim columns — same caller-column-collision guard as
    // [[climatologyFixed]]
    val c = clim.select(col("month").as("__clim_month"),
      col("depth_lo").as("__clim_dlo"), col("depth_hi").as("__clim_dhi"),
      col("sus_lo").as("__clim_lo"), col("sus_hi").as("__clim_hi"))
    val joined = df.join(
      broadcast(c),
      month(df(timeCol)) === col("__clim_month") &&
        d >= col("__clim_dlo") && d < col("__clim_dhi"),
      "left")
    val x = df(valueCol)
    val lo = col("__clim_lo")
    val hi = col("__clim_hi")
    val flag = when(col("__clim_month").isNull, Pass)
      .when(lo.isNull || hi.isNull || lo.isNaN || hi.isNaN, Missing)
      .when(x.isNotNull && !x.isNaN && (x <= lo || x >= hi), Suspect)
      .otherwise(Pass)
    joined.withColumn(outCol, flag)
      .drop("__clim_month", "__clim_dlo", "__clim_dhi", "__clim_lo", "__clim_hi")
  }

  /** Fixed-depth climatology trace — the data behind the scatter clim
    * overlay (dashboard.py:63-79 `pressureBracket` + :104-150
    * `extractClim`): the depth selects ONE bracket (shallower than the
    * first bracket clamps to it; deeper than `last.hi − 1` clamps to the
    * last; otherwise the containing `[lo, hi)` bracket; no bracket at all
    * → empty result), that bracket's monthly suspect span expands to
    * month-15 points over refYear±1, and all three series (lo, hi,
    * midpoint) interpolate linearly onto the hourly grid spanning the
    * points — pandas `resample('H').interpolate()`.
    *
    * `clim` is the [[climatologyBinned]] table
    * `(month, depth_lo, depth_hi, sus_lo, sus_hi)`, broadcast-size by
    * construction; the result is bounded (≤ 12·3 points + ~3 years of
    * hours), so the global interpolation windows are deliberately fine.
    * Returns (t, clim_minus3std, clim_plus3std, clim_data).
    */
  def climTrace(clim: DataFrame, depth: Double, refYear: Int): DataFrame = {
    val spark = clim.sparkSession
    def empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("clim_minus3std",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("clim_plus3std",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("clim_data",
          org.apache.spark.sql.types.DoubleType))))
    val brackets = clim.select(col("depth_lo"), col("depth_hi")).distinct()
      .orderBy(col("depth_lo")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    if (brackets.isEmpty) return empty
    val chosen: Option[(Double, Double)] =
      if (depth < brackets.head._1) Some(brackets.head)
      else if (depth > brackets.last._2 - 1) Some(brackets.last)
      else brackets.find { case (lo, hi) => depth >= lo && depth < hi }
    chosen match {
      case None => empty
      case Some((blo, bhi)) =>
        val points = clim
          .filter(col("depth_lo") === lit(blo) && col("depth_hi") === lit(bhi))
          .select(col("month").cast("int").as("m"),
            col("sus_lo").cast("double").as("v_lo"),
            col("sus_hi").cast("double").as("v_hi"))
          .select(col("v_lo"), col("v_hi"),
            explode(array(lit(refYear - 1), lit(refYear), lit(refYear + 1))).as("yy"),
            col("m"))
          .select(
            make_timestamp(col("yy"), col("m"), lit(15), lit(0), lit(0), lit(0)).as("t"),
            col("v_lo").as("clim_minus3std"), col("v_hi").as("clim_plus3std"),
            ((col("v_lo") + col("v_hi")) / 2.0).as("clim_data"))
        val grid = graft.operators.GapFill.timeGrid(points, Nil, "t", 3600L)
        Seq("clim_minus3std", "clim_plus3std", "clim_data")
          .foldLeft(grid) { (df, c) =>
            graft.operators.GapFill.interpolateLinear(df, Nil, "t", c, c + "_i")
          }
          .select(col("t"),
            round(col("clim_minus3std_i"), 6).as("clim_minus3std"),
            round(col("clim_plus3std_i"), 6).as("clim_plus3std"),
            round(col("clim_data_i"), 6).as("clim_data"))
    }
  }

  /** Per-month climatology depth profiles — the profile-scatter clim
    * overlay's data (dashboard.py:83-100 `extractClimProfiles`): for each
    * requested month, one row per depth bracket at the bracket midpoint
    * with the suspect span and its mean. Bracket order (the reference's
    * dict iteration order) is made deterministic by sorting on depth.
    */
  def climProfiles(clim: DataFrame, months: Seq[Int]): DataFrame =
    clim.filter(col("month").isin(months: _*))
      .select(col("month").cast("int").as("month"),
        ((col("depth_lo") + col("depth_hi")) / 2.0).as("depth"),
        col("sus_lo").cast("double").as("clim_minus3std"),
        col("sus_hi").cast("double").as("clim_plus3std"),
        ((col("sus_lo") + col("sus_hi")) / 2.0).as("clim_data"))
      .orderBy(col("month"), col("depth"))

  /** C6 combine_qc_flags: fold ordered boolean fail-masks into one positional
    * digit string — '1' pass / '3' fail per test, e.g. "13" for (pass, fail).
    * Test names travel with the column via `withMetadata` ("tests_executed"),
    * mirroring the reference's DataArray attr.
    */
  def combineFlags(tests: Seq[(String, Column)]): Column = {
    val digits = tests.map { case (_, mask) => when(mask, "3").otherwise("1") }
    concat(digits: _*)
  }

  /** Names metadata key used alongside [[combineFlags]]. */
  val TestsExecutedKey = "tests_executed"

  /** C11: decode one test's digit out of a positional flag string (0-based
    * test index), e.g. flagDigit($"flags", 1) of "13" == 3.
    */
  def flagDigit(flagString: Column, testIndex: Int): Column =
    substring(flagString, testIndex + 1, 1).cast("int")

  /** C10 legacy bitmask decode for one test bit: given `qc_executed` and
    * `qc_results` byte columns, returns the QARTOD-style flag for bit `i`:
    * 0 if the test never ran (dominated by the initial=1 rollup), 1 on pass,
    * 9 for the "problematic" tests (bits 2-7), 4 (fail) for bits 0-1.
    */
  def bitFlag(qcExecuted: Column, qcResults: Column, bit: Int): Column = {
    val ran = (shiftright(qcExecuted, bit).cast("int").bitwiseAND(1)) === 1
    val passed = (shiftright(qcResults, bit).cast("int").bitwiseAND(1)) === 1
    val failFlag = if (bit >= 2) Missing else Fail
    when(!ran, 0).when(passed, Pass).otherwise(failFlag)
  }

  /** C10 rollup: `*_qc_summary_flag` = max over the 8 per-bit flags with
    * initial=1 (so all-unexecuted rows read "pass").
    */
  def qcSummaryFlag(qcExecuted: Column, qcResults: Column): Column = {
    val flags = (0 until 8).map(bitFlag(qcExecuted, qcResults, _)) :+ lit(Pass)
    greatest(flags: _*)
  }

  /** A4/A10-style rollup across already-decoded per-test flag columns. */
  def summaryFlag(flagCols: Seq[Column]): Column =
    greatest(flagCols :+ lit(Pass): _*)
}
