package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Pins the events-schema contract: the testdata generator has shipped
  * `events.ts` as INT64 TIMESTAMP(NANOS) (rounds 1-6; Spark reads a raw
  * long under nanosAsLong) and as plain timestamp[µs] without timezone
  * (round 7+; Spark reads TIMESTAMP_NTZ). [[Tables.normalizeTs]] must make
  * every physical shape indistinguishable downstream — batch AND streaming
  * — so a future silent regeneration is a green no-op instead of a
  * 31-query outage (the round-7 failure mode).
  */
class EventsSchemaSpec extends SparkSpec {
  import spark.implicits._

  // same instants, three physical encodings; µs-truncation of the nanos
  // path is part of the contract (DuckDB's CAST rule)
  private val epochMicros = Seq(1700000000000000L, 1700000123456789L, 1700009876543210L)

  private def writeFixture(encode: org.apache.spark.sql.Column): String = {
    val dir = Files.createTempDirectory("graft_events_schema").toFile
    dir.deleteOnExit()
    spark.createDataset(epochMicros).toDF("us")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.5))
      .withColumn("ts", encode)
      .drop("us")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    dir.getAbsolutePath
  }

  private lazy val nsLongDir = writeFixture(col("us") * 1000L) // epoch nanos as raw INT64
  private lazy val ltzDir    = writeFixture(timestamp_micros(col("us")))
  private lazy val ntzDir    = writeFixture(timestamp_micros(col("us")).cast("timestamp_ntz"))

  test("fixtures land as the three physical shapes the contract covers") {
    def raw(d: String) = spark.read.parquet(s"$d/events.parquet").schema("ts").dataType
    raw(nsLongDir) shouldBe LongType
    raw(ltzDir) shouldBe TimestampType
    raw(ntzDir) shouldBe TimestampNTZType
  }

  test("Tables.events yields identical TimestampType rows for all shapes") {
    val outs = Seq(nsLongDir, ltzDir, ntzDir).map { d =>
      val df = Tables.events(spark, d)
      df.schema("ts").dataType shouldBe TimestampType
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    outs(0) shouldBe outs(1)
    outs(0) shouldBe outs(2)
    outs(0).map(_._2) should contain theSameElementsInOrderAs epochMicros
  }

  test("streaming replay wrappers read a DIRECTORY-shaped events.parquet (no silent zero rows)") {
    // the generator ships events.parquet as a single FILE today; a regen
    // could make it a directory of part files, where a parent-dir name
    // glob silently matches nothing — the replay readers must adapt
    val out = graft.streaming.StreamingOps
      .runHourlyTypeAggAvailableNow(spark, ntzDir,
        queryName = "graft_events_schema_dirlayout")
    out.count() should be > 0L
  }

  test("normalizeTs is schema-adaptive on streaming reads too") {
    val outs = Seq(nsLongDir, ltzDir, ntzDir).map { d =>
      val schema = spark.read.parquet(s"$d/events.parquet").schema
      // the fixture's events.parquet is a DIRECTORY (Spark write), so the
      // stream reads it directly — a name glob over the parent would
      // filter out the inner part files and make this test vacuous
      val stream = Tables.normalizeTs(
        spark.readStream.schema(schema)
          .parquet(s"$d/events.parquet"))
      stream.isStreaming shouldBe true
      stream.schema("ts").dataType shouldBe TimestampType
      val name = s"graft_events_schema_${d.hashCode.toHexString}"
      val q = stream.select(col("event_id"), col("ts"))
        .writeStream.format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    outs(0).map(_._2) should contain theSameElementsInOrderAs epochMicros
    outs(0) shouldBe outs(1)
    outs(0) shouldBe outs(2)
  }
}
