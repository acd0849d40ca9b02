package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap handling and interpolation (SURVEY §2.6 W3/W4, §2.9 C2/C3):
  * window-function based linear interpolation — the classic Spark gap-fill
  * fragment the reference does with `interpolate_na` / `np.interp`.
  * All pure window plans: one shuffle on the series key.
  */
object GapFill {

  /** W4 linear interpolation of null values in `valueCol` along `orderCol`
    * per series: y = y0 + (y1 - y0) * (t - t0) / (t1 - t0) between the
    * nearest non-null neighbours; leading/trailing nulls stay null
    * (xarray `interpolate_na(method="linear")` default).
    * `orderCol` must be numeric (e.g. epoch micros).
    */
  def interpolateLinear(df: DataFrame, keyCols: Seq[String], orderCol: String,
                        valueCol: String, outCol: String,
                        tieBreak: Seq[String] = Nil): DataFrame = {
    val part: Seq[Column] = keyCols.map(col)
    val order = col(orderCol) +: tieBreak.map(col)
    val back = (if (part.isEmpty) Window.orderBy(order: _*)
                else Window.partitionBy(part: _*).orderBy(order: _*))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "next non-null" as a REVERSED growing frame, not
    // [CURRENT ROW, UNBOUNDED FOLLOWING]: Spark evaluates shrinking
    // frames by re-aggregating the remainder for every row — O(n²) per
    // partition (measured: q41's 1.3k-row series took 8 s at sf0.1).
    // The desc-ordered prefix holds exactly the asc-ordered suffix, and
    // its last non-null is the asc-first non-null, so results are
    // identical at O(n).
    val orderDesc = order.map(_.desc)
    val fwd = (if (part.isEmpty) Window.orderBy(orderDesc: _*)
               else Window.partitionBy(part: _*).orderBy(orderDesc: _*))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = col(valueCol)
    val t = col(orderCol).cast("double")
    val prevV = last(when(v.isNotNull, v), ignoreNulls = true).over(back)
    val prevT = last(when(v.isNotNull, t), ignoreNulls = true).over(back)
    val nextV = last(when(v.isNotNull, v), ignoreNulls = true).over(fwd)
    val nextT = last(when(v.isNotNull, t), ignoreNulls = true).over(fwd)
    val lerp = prevV + (nextV - prevV) * (t - prevT) / (nextT - prevT)
    df.withColumn(outCol,
      when(v.isNotNull, v)
        .when(prevV.isNotNull && nextV.isNotNull,
          when(nextT === prevT, prevV).otherwise(lerp))
        .otherwise(lit(null)))
  }

  /** W3 time-gap masking: null out `valueCol` where the gap to the previous
    * sample exceeds `maxGapSeconds` (the reference NaNs interpolated cells
    * between day-plus gaps, qaqc/dashboard.py:962-967).
    */
  def maskGaps(df: DataFrame, keyCols: Seq[String], timeCol: String,
               valueCol: String, maxGapSeconds: Long): DataFrame = {
    val w = if (keyCols.isEmpty) Window.orderBy(col(timeCol))
            else Window.partitionBy(keyCols.map(col): _*).orderBy(col(timeCol))
    val gap = unix_timestamp(col(timeCol)) - unix_timestamp(lag(col(timeCol), 1).over(w))
    df.withColumn(valueCol, when(gap > maxGapSeconds, lit(null)).otherwise(col(valueCol)))
  }

  /** C2-style regular grid: one row per (series, grid step) between the
    * series' min and max time, observed values joined on, everything else
    * null — ready for [[interpolateLinear]]. Grid generation is
    * `sequence()` + `explode` (distributed, no driver loop).
    */
  def timeGrid(df: DataFrame, keyCols: Seq[String], timeCol: String,
               stepSeconds: Long): DataFrame = {
    val grid = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(timeCol)).as("__lo"), max(col(timeCol)).as("__hi"))
      .withColumn(timeCol, explode(sequence(
        col("__lo"), col("__hi"),
        expr(s"INTERVAL $stepSeconds SECONDS"))))
      .drop("__lo", "__hi")
    grid.join(df, keyCols :+ timeCol, "left")
  }
}
