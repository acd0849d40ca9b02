package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Write `df` date-partitioned on `tsCol`: derives a `partCol` DATE
    * column and lays out `dir/partCol=YYYY-MM-DD/part-*.parquet`. The
    * derived column is a directory key, not payload — [[readSpan]] drops
    * it on the way back so round-trip schema equals `df`'s.
    */
  def writeDatePartitioned(df: DataFrame, dir: String, tsCol: String = "ts",
                           partCol: String = "ds"): Unit =
    df.withColumn(partCol, to_date(col(tsCol)))
      .write.mode("overwrite").partitionBy(partCol).parquet(dir)

  /** Read the half-open span `[from, to)` from a date-partitioned layout,
    * pruning out-of-span date directories at planning time.
    *
    * `from`/`to` are timestamp literals (`YYYY-MM-DD[ HH:MM:SS[.ffffff]]`,
    * session time zone). The partition bound is widened to whole days —
    * `date(from) ≤ ds ≤ date(to)` — and the exact `ts` predicate prunes
    * the edge days' out-of-span rows, so the result is row-identical to
    * filtering an unpartitioned copy.
    */
  def readSpan(spark: SparkSession, dir: String, from: String, to: String,
               tsCol: String = "ts", partCol: String = "ds"): DataFrame = {
    val lo = lit(from).cast("timestamp")
    val hi = lit(to).cast("timestamp")
    spark.read.parquet(dir)
      .filter(col(partCol) >= to_date(lo) && col(partCol) <= to_date(hi))
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
