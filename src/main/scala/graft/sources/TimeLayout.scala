package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned time-series layout — the storage contract a 100 TB
  * deployment of this engine actually lives on (SURVEY §2.1 scan layer;
  * the reference's per-(site, deployment) Zarr stores are chunked along
  * time the same way, ref qaqc/dashboard.py:311 `xr.open_zarr` over
  * time-chunked arrays).
  *
  * The flat single-directory layouts the bench reads are fine at test SF,
  * but a year of instrument data at production rates wants
  * `dir/ds=YYYY-MM-DD/part-*.parquet`: a span query then prunes whole
  * date directories at PLANNING time — zero I/O, zero tasks for the
  * out-of-span days — instead of relying on parquet row-group min/max
  * skipping inside one giant file (which still lists, opens, and
  * schedules every file).
  *
  * The subtlety [[readSpan]] exists for: Spark cannot derive
  * `ds ∈ [date(from), date(to)]` from `ts ∈ [from, to)` on its own —
  * the link between the data column and the directory key is a layout
  * contract, not a catalog constraint, so a plain `ts` range filter over
  * a partitioned read scans EVERY partition. The reader injects the
  * implied partition predicate alongside the exact `ts` filter; the `ds`
  * conjunct prunes directories, the `ts` conjunct keeps the answer exact
  * at span edges (both asserted in `PartitionPruneSpec`).
  */
object TimeLayout {

  /** The UTC calendar day of a timestamp INSTANT, as a DateType column.
    * Deliberately not `to_date(ts)`: that renders the instant in the
    * SESSION time zone, so a writer and a reader with different session
    * zones would disagree about which directory a row lives in — and a
    * reader-side widened bound computed in the "wrong" zone silently
    * prunes a directory that holds in-span rows. Epoch-day arithmetic
    * over `unix_micros` depends only on the instant, so the layout
    * contract holds across any writer/reader session-zone combination
    * (spec-pinned with a non-UTC reader session).
    *
    * Arithmetic note: the epoch-day quotient is computed over
    * `unix_seconds` in double — |epoch seconds| ≤ 9.2e12 is exactly
    * representable (< 2^53) and an exact multiple of 86400 divides
    * exactly, so `floor` is the true floor for every representable
    * timestamp; `unix_micros` (up to 9.2e18) would NOT be. Sub-second
    * truncation at negative boundaries is absorbed by the contract: any
    * MONOTONE day function shared by writer and reader buckets and prunes
    * consistently, and the exact `ts` predicate keeps span edges right.
    */
  private def utcDay(ts: Column): Column =
    date_add(lit("1970-01-01").cast("date"),
      floor(unix_seconds(ts).cast("double") / 86400d).cast("int"))

  /** Write `df` date-partitioned on `tsCol`: derives a `partCol` DATE
    * column (the UTC day of the instant, see [[utcDay]]) and lays out
    * `dir/partCol=YYYY-MM-DD/part-*.parquet`. The derived column is a
    * directory key, not payload — [[readSpan]] drops it on the way back
    * so round-trip schema equals `df`'s.
    */
  def writeDatePartitioned(df: DataFrame, dir: String, tsCol: String = "ts",
                           partCol: String = "ds"): Unit =
    df.withColumn(partCol, utcDay(col(tsCol)))
      .write.mode("overwrite").partitionBy(partCol).parquet(dir)

  /** Read the half-open span `[from, to)` from a date-partitioned layout,
    * pruning out-of-span date directories at planning time.
    *
    * `from`/`to` are timestamp literals (`YYYY-MM-DD[ HH:MM:SS[.ffffff]]`,
    * interpreted in the READER's session time zone — the user's natural
    * span spelling). The partition bound is widened to the whole UTC days
    * covering those instants — `utcDay(from) ≤ ds ≤ utcDay(to)` — with
    * [[utcDay]] matching the writer's directory derivation exactly, and
    * the exact `ts` predicate prunes the edge days' out-of-span rows, so
    * the result is row-identical to filtering an unpartitioned copy.
    */
  def readSpan(spark: SparkSession, dir: String, from: String, to: String,
               tsCol: String = "ts", partCol: String = "ds"): DataFrame = {
    // validate the bounds driver-side with the exact parser the cast uses:
    // a non-ANSI session would otherwise turn an unparseable bound into
    // NULL, null out both filters, and silently return an EMPTY read
    def requireParses(s: String, what: String): Unit = {
      val zid = org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(
        spark.sessionState.conf.sessionLocalTimeZone)
      require(org.apache.spark.sql.catalyst.util.DateTimeUtils.stringToTimestamp(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), zid).isDefined,
        s"TimeLayout.readSpan: $what bound '$s' is not a parseable " +
          "timestamp (expected YYYY-MM-DD[ HH:MM:SS[.ffffff]])")
    }
    requireParses(from, "from")
    requireParses(to, "to")
    val lo = lit(from).cast("timestamp")
    val hi = lit(to).cast("timestamp")
    spark.read.parquet(dir)
      .filter(col(partCol) >= utcDay(lo) && col(partCol) <= utcDay(hi))
      .filter(col(tsCol) >= lo && col(tsCol) < hi)
      .drop(partCol)
  }

  /** Full read of a date-partitioned layout with the directory key
    * dropped — schema equals what [[writeDatePartitioned]] was given.
    */
  def readAll(spark: SparkSession, dir: String,
              partCol: String = "ds"): DataFrame =
    spark.read.parquet(dir).drop(partCol)
}
