package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C12 calibration assembly (SURVEY §2.9): the reference's
  * deployment-aware calibration loader re-expressed as DataFrame logic
  * (rca_data_tools/qaqc/utils.py:105-285):
  *
  *  - calibration validity windows: per asset, a calibration is valid from
  *    its date until the next calibration, clipped to each deployment
  *    window, dropped when empty (utils.py:186-191);
  *  - SheetRef resolution: a `SheetRef:<sheet>` value resolves to the 2-D
  *    array parsed from the sibling `<csv base>__<sheet>.ext` file
  *    (utils.py:69-98);
  *  - value coercion (utils.py:217-233): `[...]` literals → 1-D double
  *    arrays, numerics → scalars, anything else stays a string.
  *
  * Divergence from the reference, per SURVEY §1.2: ragged coefficients
  * stay ragged (`ArrayType` rows of their own length) instead of being
  * NaN-padded to the max shape — the xarray padding exists only because
  * dense tensors need rectangular dims. [[explodeLong]] emits the
  * hash-friendly long form (one row per scalar/element) used by the
  * oracle-checked q61.
  *
  * File layout mirrors OOI asset-management: `<ASSET>__<YYYYMMDD>.csv`
  * with (name, value) columns, plus `<ASSET>__<YYYYMMDD>__<sheet>.ext`
  * comma-separated 2-D arrays. CSVs are read with `spark.read.csv` (row
  * order is irrelevant for name→value pairs); `.ext` files via
  * `wholetext` because row order IS the array's row index.
  */
object Calibration {

  private val FileRe = "([^/]+)__(\\d{8})\\.csv$"
  private val ExtRe = "([^/]+)__(\\d{8})__([^/.]+)\\.ext$"

  /** Parse a `.ext` payload (comma-separated rows, one line per row) into
    * `array<array<double>>` — ragged rows preserved.
    */
  def parseExt(content: Column): Column =
    transform(
      filter(split(regexp_replace(content, "\r", ""), "\n"), r => trim(r) =!= ""),
      r => transform(split(trim(r), ","), x => trim(x).cast("double")))

  /** Calibration CSV directory → (asset_uid, cal_date, name, value). */
  def calCsvDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("header", "true").csv(s"$dir/*.csv")
      .withColumn("__f", input_file_name())
      .select(
        regexp_extract(col("__f"), FileRe, 1).as("asset_uid"),
        to_timestamp(regexp_extract(col("__f"), FileRe, 2), "yyyyMMdd").as("cal_date"),
        col("name"), col("value"))

  /** `.ext` directory → (asset_uid, cal_date, sheet, mat). */
  def extDir(spark: SparkSession, dir: String): DataFrame = {
    spark.read.option("wholetext", "true").text(s"$dir/*.ext")
      .withColumn("__f", input_file_name())
      .select(
        regexp_extract(col("__f"), ExtRe, 1).as("asset_uid"),
        to_timestamp(regexp_extract(col("__f"), ExtRe, 2), "yyyyMMdd").as("cal_date"),
        regexp_extract(col("__f"), ExtRe, 3).as("sheet"),
        parseExt(col("value")).as("mat"))
  }

  /** Deployment-clipped calibration validity windows (utils.py:177-191).
    *
    * `deployments`: (asset_uid, dep_start, dep_stop) — null dep_stop =
    * open-ended (clipped at +inf like the reference's Timestamp.max).
    * `calIndex`: distinct (asset_uid, cal_date).
    * Returns (asset_uid, cal_date, valid_start, valid_stop).
    *
    * The successor calibration is computed once per asset over the FULL
    * calibration list (a per-asset high-cardinality window), then windows
    * are clipped per deployment via a broadcast-friendly equi-join on
    * asset — the reference's per-deployment loop, set-based.
    */
  def validityWindows(deployments: DataFrame, calIndex: DataFrame): DataFrame = {
    val maxTs = lit("9999-12-31 23:59:59").cast("timestamp")
    val w = Window.partitionBy(col("asset_uid")).orderBy(col("cal_date"))
    val cals = calIndex.withColumn("__next", lead(col("cal_date"), 1).over(w))
    cals.join(deployments, "asset_uid")
      .select(col("asset_uid"), col("cal_date"),
        greatest(col("cal_date"), col("dep_start")).as("valid_start"),
        least(coalesce(col("__next"), coalesce(col("dep_stop"), maxTs)),
          coalesce(col("dep_stop"), maxTs)).as("valid_stop"))
      .filter(col("valid_start") < col("valid_stop"))
  }

  /** Coerce coefficient values (utils.py:217-233) with SheetRef
    * resolution: adds `scalar` (double), `arr` (array<double>), `mat`
    * (array<array<double>>), `value_str` (unparseable passthrough).
    * `exts` may be null for sheets that fail to resolve — those keep the
    * raw `SheetRef:` string in value_str, surfacing the breakage instead
    * of silently dropping the coefficient.
    */
  def coerce(coefs: DataFrame, exts: DataFrame): DataFrame = {
    val isSheet = col("value").startsWith("SheetRef:")
    val isArr = col("value").rlike("^\\s*\\[.*\\]\\s*$")
    val arrParsed = transform(
      filter(split(regexp_replace(trim(col("value")), "^\\[|\\]$", ""), ","),
        x => trim(x) =!= ""),
      x => trim(x).cast("double"))
    // try_cast: a plain cast over non-numeric strings would throw under ANSI
    val scalar = expr("try_cast(value AS DOUBLE)")
    coefs
      .withColumn("sheet", when(isSheet, trim(substring_index(col("value"), ":", -1))))
      .join(exts.select(col("asset_uid"), col("cal_date"), col("sheet"),
          col("mat")),
        Seq("asset_uid", "cal_date", "sheet"), "left")
      .select(col("asset_uid"), col("cal_date"), col("name"),
        when(isSheet || isArr, lit(null).cast("double")).otherwise(scalar).as("scalar"),
        when(isArr, arrParsed).as("arr"),
        col("mat"),
        when(!isSheet && !isArr && scalar.isNull, col("value"))
          .when(isSheet && col("mat").isNull, col("value")).as("value_str"))
  }

  /** Full assembly in the hash-friendly exploded long form: one output row
    * per scalar, 1-D element (row_idx, null) or 2-D element
    * (row_idx, col_idx), with validity windows attached. Ragged arrays
    * emit exactly their own elements — no padding rows.
    */
  def explodeLong(deployments: DataFrame, calIndex: DataFrame,
                  coefs: DataFrame, exts: DataFrame): DataFrame = {
    val wins = validityWindows(deployments, calIndex)
    val coerced = coerce(coefs, exts)
    val entry = (r: Column, c: Column, v: Column) => struct(
      r.cast("int").as("row_idx"), c.cast("int").as("col_idx"),
      v.cast("double").as("value"))
    val entries =
      when(col("mat").isNotNull,
        flatten(transform(col("mat"), (row, r) =>
          transform(row, (v, c) => entry(r, c, v)))))
      .when(col("arr").isNotNull,
        transform(col("arr"), (v, i) => entry(i, lit(null), v)))
      .otherwise(array(entry(lit(null), lit(null), col("scalar"))))
    coerced
      .join(wins, Seq("asset_uid", "cal_date"))
      .select(col("asset_uid"), col("cal_date"), col("valid_start"),
        col("valid_stop"), col("name"), explode(entries).as("e"),
        col("value_str"))
      .select(col("asset_uid"), col("cal_date"), col("valid_start"),
        col("valid_stop"), col("name"),
        col("e.row_idx").as("row_idx"), col("e.col_idx").as("col_idx"),
        col("e.value").as("value"), col("value_str"))
  }
}
