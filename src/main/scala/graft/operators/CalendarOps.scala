package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar regrouping and year-over-year alignment (SURVEY §2.6 W6, §2.8
  * date/time surface): ISO-week keys (qaqc/dashboard.py:1383-1387), calendar
  * grouping keys (:1282-1295), and the "time machine" overlay that shifts
  * each prior year's series onto the current axis by k×365 days
  * (qaqc/dashboard.py:1733-1787).
  */
object CalendarOps {

  /** ISO year: the calendar year of the Thursday in t's ISO week
    * (`date_trunc("week")` is Monday-based, +3 days = Thursday). Pure column
    * ops — composes anywhere, unlike SQL-only `extract(YEAROFWEEK …)`.
    */
  def isoYear(t: Column): Column = year(date_add(date_trunc("week", t), 3))

  /** ISO (year, week) key — reference `isocalendar()` grouping. */
  def isoWeekKey(t: Column): Column =
    struct(isoYear(t).as("iso_year"), weekofyear(t).as("iso_week"))

  /** Calendar grouping key at "day" | "week" | "month" granularity. */
  def calendarKey(t: Column, granularity: String): Column = granularity match {
    case "day"   => date_trunc("day", t)
    case "week"  => date_trunc("week", t)
    case "month" => date_trunc("month", t)
    case g => throw new IllegalArgumentException(s"granularity: $g")
  }

  /** W6 year-over-year alignment: adds `year_diff` (whole years before
    * `refTime`'s year) and `plot_time` = time shifted forward by
    * `year_diff * 365` days — the reference's deliberate leap-naive shift
    * (qaqc/dashboard.py:1771).
    */
  def yearOverYear(df: DataFrame, timeCol: String, refTime: Column): DataFrame =
    df.withColumn("year_diff", year(refTime) - year(col(timeCol)))
      // day-time interval arithmetic works on both TIMESTAMP and
      // TIMESTAMP_NTZ columns and preserves the input type
      .withColumn("plot_time",
        col(timeCol) + make_dt_interval(col("year_diff") * 365, lit(0), lit(0), lit(0)))
}
