package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface. The reference is batch-only (SURVEY §2.10)
  * — this is the natural streaming extension of its tumbling-window
  * regrouping (A2, qaqc/dashboard.py:1282-1295): `readStream` → watermark →
  * windowed aggregation → sink. Batch/stream parity is the design goal: the
  * same aggregation expressed on a static DataFrame returns identical rows,
  * which is exactly what the DuckDB oracle checks.
  */
object StreamingOps {

  /** Watermarked tumbling-window aggregation over a streaming DataFrame:
    * count + sum(value) per (window, event_type).
    */
  def hourlyTypeAgg(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Run [[hourlyTypeAgg]] over the events parquet as a bounded stream
    * (Trigger.AvailableNow) into an in-memory sink and return the result —
    * the batch-parity harness. Schema is taken from a batch read of the
    * same path (streaming reads require an explicit schema).
    */
  def runHourlyTypeAggAvailableNow(spark: SparkSession, dir: String,
                                   queryName: String = "graft_stream_hourly"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // FileStreamSource wants a directory; pathGlobFilter narrows it to the
    // events file so sibling tables in the same dir aren't picked up.
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = hourlyTypeAgg(stream)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
