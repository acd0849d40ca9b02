package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingOpsSpec extends SparkSpec {

  test("bounded stream aggregation matches the batch equivalent exactly") {
    val d = "/root/testdata/sf0.001"
    val streamed = StreamingOps
      .runHourlyTypeAggAvailableNow(spark, d, queryName = "graft_stream_test")
      .orderBy("win_start", "event_type")
      .collect()
    val batch = graft.sources.Tables.events(spark, d)
      .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("win_start", "event_type")
      .collect()
    streamed.length should be > 0
    streamed shouldBe batch
  }
}
