package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Calibration, Tables}

/** C12 calibration assembly queries: deployment-clipped validity windows,
  * SheetRef 2-D resolution, scalar/1-D/2-D coercion (ragged, exploded
  * long form), and the window-joined application of a calibration to
  * samples. Inputs synthesized deterministically from the parquet tables
  * so DuckDB replays the identical pipeline (the file-backed loaders are
  * exercised by CalibrationSpec on temp directories).
  */
object QueriesCalibration {

  // Shadows functions.round: every oracle-compared column rounds with
  // DuckDB-exact semantics (see graft.functions.Rounding) so half-boundary
  // values hash identically on both engines.
  private def round(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    graft.functions.Rounding.dround(c, scale)

  type Q = (SparkSession, String) => DataFrame

  private val epoch = "2024-01-01 00:00:00"

  /** (asset_uid, dep_start, dep_stop) from region: one deployment per
    * asset, the last one open-ended.
    */
  private def deployments(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).select(
      concat(lit("ASSET"), col("r_regionkey")).as("asset_uid"),
      (lit(epoch).cast("timestamp") +
        make_dt_interval((col("r_regionkey") * 20).cast("int"))).as("dep_start"),
      when(col("r_regionkey") === 4, lit(null).cast("timestamp"))
        .otherwise(lit(epoch).cast("timestamp") +
          make_dt_interval((col("r_regionkey") * 20 + 100).cast("int"))).as("dep_stop"))

  /** One calibration file per supplier row: asset k%5, date epoch+7*(k div 5). */
  private def supBase(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).select(
      concat(lit("ASSET"), col("s_suppkey") % 5).as("asset_uid"),
      (lit(epoch).cast("timestamp") +
        make_dt_interval((expr("s_suppkey div 5") * 7).cast("int"))).as("cal_date"),
      col("s_suppkey").as("k"), col("s_acctbal"))

  /** Coefficient rows: a scalar, a 1-D literal, an unparseable serial, and
    * (every 10th file) a SheetRef to the taarray ext sheet.
    */
  private def coefs(s: SparkSession, d: String): DataFrame =
    supBase(s, d).select(col("asset_uid"), col("cal_date"),
      explode(filter(array(
        struct(lit("CC_scale").as("name"),
          round(col("s_acctbal") / 1000.0, 2).cast("string").as("value")),
        struct(lit("CC_wl").as("name"),
          concat(lit("["), col("k") % 10, lit(".5, "), col("k") % 7, lit(".25]")).as("value")),
        struct(lit("SERIAL").as("name"), concat(lit("SN-"), col("k")).as("value")),
        when(col("k") % 10 === 0,
          struct(lit("CC_taarray").as("name"), lit("SheetRef:taarray").as("value")))),
        x => x.isNotNull)).as("nv"))
      .select(col("asset_uid"), col("cal_date"), col("nv.name"), col("nv.value"))

  /** Ragged 2-row ext sheets (2 then 3 columns) for every 10th file. */
  private def exts(s: SparkSession, d: String): DataFrame =
    supBase(s, d).filter(col("k") % 10 === 0)
      .select(col("asset_uid"), col("cal_date"), lit("taarray").as("sheet"),
        Calibration.parseExt(concat(
          col("k"), lit(","), col("k") % 3, lit("\n"),
          col("k") % 4, lit(","), col("k") + 1, lit(","), col("k") % 9)).as("mat"))

  val queries: Map[String, Q] = Map(
    // C12: full assembly — windows + SheetRef + coercion, exploded long form.
    // valid_stop's open-validity sentinel (9999-12-31, reference-faithful in
    // the library) is clamped to 2200-01-01 in this OUTPUT only: INT96
    // parquet timestamps are read as int64 nanoseconds by the driver's
    // pyarrow reader, and year 9999 overflows ns and wraps to 1816.
    "q61_cal_assembly" -> ((s, d) => {
      val out = Calibration.explodeLong(
        deployments(s, d),
        supBase(s, d).select("asset_uid", "cal_date").distinct(),
        coefs(s, d), exts(s, d))
      out.select(col("asset_uid"), col("cal_date"), col("valid_start"),
        least(col("valid_stop"),
          lit("2200-01-01 00:00:00").cast("timestamp")).as("valid_stop"),
        col("name"), col("row_idx"), col("col_idx"),
        round(col("value"), 6).as("value"), col("value_str"))
    }),

    // C12 applied: samples calibrated by the scalar coefficient whose
    // validity window covers them (J3 interval join, windows broadcast)
    "q62_cal_apply" -> ((s, d) => {
      val wins = Calibration.validityWindows(
        deployments(s, d), supBase(s, d).select("asset_uid", "cal_date").distinct())
      val scale = coefs(s, d).filter(col("name") === "CC_scale")
        .select(col("asset_uid"), col("cal_date"),
          expr("try_cast(value AS DOUBLE)").as("cc_scale"))
      val calTable = wins.join(scale, Seq("asset_uid", "cal_date"))
      val samples = Tables.events(s, d).select(
        col("event_id"),
        concat(lit("ASSET"), col("user_id") % 5).as("asset_uid"),
        col("ts"), col("value"))
      samples.join(broadcast(calTable),
          samples("asset_uid") === calTable("asset_uid") &&
            col("ts") >= col("valid_start") && col("ts") < col("valid_stop"))
        .select(col("event_id"), samples("asset_uid").as("asset_uid"),
          col("cal_date"),
          round(col("value") * col("cc_scale"), 6).as("calibrated"))
    })
  )

  private val maxTs = "TIMESTAMP '9999-12-31 23:59:59'"

  private val oracleBase = s"""
      dep AS (
        SELECT 'ASSET' || CAST(r_regionkey AS VARCHAR) AS asset_uid,
               TIMESTAMP '$epoch' + r_regionkey * 20 * INTERVAL '1 day' AS dep_start,
               CASE WHEN r_regionkey = 4 THEN NULL
                    ELSE TIMESTAMP '$epoch' + (r_regionkey * 20 + 100) * INTERVAL '1 day'
               END AS dep_stop
        FROM region),
      sup AS (
        SELECT 'ASSET' || CAST(s_suppkey % 5 AS VARCHAR) AS asset_uid,
               TIMESTAMP '$epoch' + (s_suppkey // 5) * 7 * INTERVAL '1 day' AS cal_date,
               s_suppkey AS k, s_acctbal
        FROM supplier),
      calidx AS (SELECT DISTINCT asset_uid, cal_date FROM sup),
      nextc AS (SELECT asset_uid, cal_date,
                       lead(cal_date) OVER (PARTITION BY asset_uid ORDER BY cal_date) AS nxt
                FROM calidx),
      wins AS (
        SELECT n.asset_uid, n.cal_date,
               greatest(n.cal_date, d.dep_start) AS valid_start,
               least(coalesce(n.nxt, coalesce(d.dep_stop, $maxTs)),
                     coalesce(d.dep_stop, $maxTs)) AS valid_stop
        FROM nextc n JOIN dep d USING (asset_uid)
        WHERE greatest(n.cal_date, d.dep_start) <
              least(coalesce(n.nxt, coalesce(d.dep_stop, $maxTs)),
                    coalesce(d.dep_stop, $maxTs)))"""

  val oracleSql: Map[String, String] = Map(
    "q61_cal_assembly" -> raw"""
      WITH $oracleBase,
      coefs AS (
        SELECT asset_uid, cal_date, 'CC_scale' AS name,
               CAST(round(s_acctbal / 1000.0, 2) AS VARCHAR) AS value FROM sup
        UNION ALL
        SELECT asset_uid, cal_date, 'CC_wl',
               '[' || CAST(k % 10 AS VARCHAR) || '.5, ' || CAST(k % 7 AS VARCHAR) || '.25]'
        FROM sup
        UNION ALL
        SELECT asset_uid, cal_date, 'SERIAL', 'SN-' || CAST(k AS VARCHAR) FROM sup
        UNION ALL
        SELECT asset_uid, cal_date, 'CC_taarray', 'SheetRef:taarray'
        FROM sup WHERE k % 10 = 0),
      exts AS (
        SELECT asset_uid, cal_date, 'taarray' AS sheet,
               CAST(k AS VARCHAR) || ',' || CAST(k % 3 AS VARCHAR) || chr(10) ||
               CAST(k % 4 AS VARCHAR) || ',' || CAST(k + 1 AS VARCHAR) || ',' ||
               CAST(k % 9 AS VARCHAR) AS content
        FROM sup WHERE k % 10 = 0),
      resolved AS (
        SELECT c.asset_uid, c.cal_date, c.name, c.value,
               CASE WHEN c.value LIKE 'SheetRef:%'
                    THEN trim(split_part(c.value, ':', 2)) END AS sheet,
               CASE WHEN c.value LIKE 'SheetRef:%' THEN
                 list_transform(string_split(e.content, chr(10)),
                   r -> list_transform(string_split(r, ','), x -> CAST(trim(x) AS DOUBLE)))
               END AS mat
        FROM coefs c
        LEFT JOIN exts e ON c.asset_uid = e.asset_uid AND c.cal_date = e.cal_date
          AND trim(split_part(c.value, ':', 2)) = e.sheet),
      coerced AS (
        SELECT asset_uid, cal_date, name, mat,
               CASE WHEN sheet IS NULL AND NOT regexp_matches(value, '^\s*\[.*\]\s*$$')
                    THEN TRY_CAST(value AS DOUBLE) END AS scalar,
               CASE WHEN regexp_matches(value, '^\s*\[.*\]\s*$$') THEN
                 list_transform(
                   string_split(regexp_replace(regexp_replace(trim(value), '^\[', ''), '\]$$', ''), ','),
                   x -> CAST(trim(x) AS DOUBLE)) END AS arr,
               CASE WHEN sheet IS NULL AND NOT regexp_matches(value, '^\s*\[.*\]\s*$$')
                         AND TRY_CAST(value AS DOUBLE) IS NULL THEN value
                    WHEN sheet IS NOT NULL AND mat IS NULL THEN value END AS value_str
        FROM resolved),
      m1 AS (SELECT asset_uid, cal_date, name, CAST(t.ri AS INT) AS row_idx,
                    mat[CAST(t.ri AS INT) + 1] AS rowarr
             FROM coerced, unnest(range(len(mat))) AS t(ri)
             WHERE mat IS NOT NULL),
      longf AS (
        SELECT asset_uid, cal_date, name, row_idx, CAST(t.ci AS INT) AS col_idx,
               rowarr[CAST(t.ci AS INT) + 1] AS value, CAST(NULL AS VARCHAR) AS value_str
        FROM m1, unnest(range(len(rowarr))) AS t(ci)
        UNION ALL
        SELECT asset_uid, cal_date, name, CAST(t.i AS INT), CAST(NULL AS INT),
               arr[CAST(t.i AS INT) + 1], CAST(NULL AS VARCHAR)
        FROM coerced, unnest(range(len(arr))) AS t(i)
        WHERE arr IS NOT NULL AND mat IS NULL
        UNION ALL
        SELECT asset_uid, cal_date, name, CAST(NULL AS INT), CAST(NULL AS INT),
               scalar, value_str
        FROM coerced WHERE arr IS NULL AND mat IS NULL)
      SELECT w.asset_uid, w.cal_date, w.valid_start,
             least(w.valid_stop, TIMESTAMP '2200-01-01 00:00:00') AS valid_stop,
             l.name, l.row_idx, l.col_idx, round(l.value, 6) AS value, l.value_str
      FROM longf l JOIN wins w ON l.asset_uid = w.asset_uid AND l.cal_date = w.cal_date""",
    "q62_cal_apply" -> raw"""
      WITH $oracleBase,
      scale AS (
        SELECT asset_uid, cal_date, round(s_acctbal / 1000.0, 2) AS cc_scale FROM sup),
      cal AS (SELECT w.asset_uid, w.cal_date, w.valid_start, w.valid_stop, s.cc_scale
              FROM wins w JOIN scale s USING (asset_uid, cal_date)),
      samples AS (
        SELECT event_id, 'ASSET' || CAST(user_id % 5 AS VARCHAR) AS asset_uid,
               CAST(ts AS TIMESTAMP) AS ts, value
        FROM events)
      SELECT s.event_id, s.asset_uid, c.cal_date,
             round(s.value * c.cc_scale, 6) AS calibrated
      FROM samples s JOIN cal c ON s.asset_uid = c.asset_uid
        AND s.ts >= c.valid_start AND s.ts < c.valid_stop"""
  )
}
