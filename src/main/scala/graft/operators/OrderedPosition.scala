package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Exact ordered positions for FEW-BIG-SERIES data without serializing a
  * series onto one task.
  *
  * `Window.partitionBy(series).orderBy(t)` moves each series to ONE task —
  * fine when series count ≫ cores, fatal at the 100 TB design point where a
  * (site, span, variable) series holds billions of rows (the reference's
  * decimation input is exactly this shape). This helper computes the same
  * 0-based per-series position in two fully-parallel passes:
  *
  *  1. range-repartition by (series, order) and sort within partitions —
  *     each partition holds a contiguous slice of one-or-more series;
  *  2. per-partition local row numbers (parallel: partition count ≥ cores),
  *     plus a driver-side cumulative-offset table of (partition, series)
  *     row counts — `partitions × series` rows, tiny by precondition —
  *     broadcast back and added to the local numbers.
  *
  * Precondition: series cardinality small enough that
  * `partitions × series` fits on the driver (guarded). For high-cardinality
  * keys use a plain window — it is already parallel there.
  */
object OrderedPosition {

  private val MaxOffsetRows = 1000000

  /** Append `outCol` = exact 0-based position of each row within its
    * (keyCols) series ordered by `orderCols` (global positions when
    * `keyCols` is empty).
    *
    * No window anywhere: after the range-repartition + in-partition sort,
    * `monotonically_increasing_id()` already encodes (partition id, local
    * row index) — in sorted order — in its upper/lower bits. The offsets
    * job and the caller's job each run the range shuffle (measured: two
    * light passes beat materializing a cache of the full sorted data —
    * columnar cache writes cost ~2× the shuffle itself at 20M rows, and at
    * the 100 TB design point caching the input is a non-starter).
    */
  def withPosition(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
                   outCol: String): DataFrame = {
    val spark = df.sparkSession
    val sortCols = (keyCols ++ orderCols).map(col)
    val localMask = (1L << 33) - 1
    val ranged = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftrightunsigned(col("__mid"), 33).cast("int"))
      .withColumn("__lrn", col("__mid").bitwiseAND(localMask))
      .drop("__mid")
    val partKeys = col("__pid") +: keyCols.map(col)
    val counts = ranged
      .groupBy(partKeys: _*)
      .agg(count(lit(1)).as("__cnt"), min(col("__lrn")).as("__minlrn"))
      .collect()
    require(counts.length <= MaxOffsetRows,
      s"OrderedPosition: ${counts.length} (partition, series) groups — key " +
        "cardinality too high for the offset table; use a plain window instead")
    // driver-side cumulative offsets per series across ascending partitions;
    // each row carries (pid, keys..., seriesOffset - minLocalIndex) so the
    // executor-side position is one add
    val byKey = counts.groupBy(r => (1 to keyCols.length).map(r.get))
    val offsetRows = byKey.valuesIterator.flatMap { rows =>
      val sorted = rows.sortBy(_.getInt(0))
      var acc = 0L
      sorted.map { r =>
        val off = acc - r.getLong(keyCols.length + 2) // minus min local index
        acc += r.getLong(keyCols.length + 1)
        Row.fromSeq(r.toSeq.dropRight(2) :+ off)
      }
    }.toSeq
    val keyFields = keyCols.map(c => df.schema(c))
    val offSchema = StructType(
      StructField("__pid", IntegerType) +: keyFields :+ StructField("__off", LongType))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1), offSchema)
    ranged
      .join(broadcast(offDf), Seq("__pid") ++ keyCols)
      .withColumn(outCol, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }
}
