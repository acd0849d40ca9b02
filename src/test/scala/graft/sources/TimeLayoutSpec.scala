package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Date-partitioned layout: planning-time partition pruning and exact
  * span semantics (PLANS.md "partitioned-layout" entry).
  */
class TimeLayoutSpec extends SparkSpec {
  import spark.implicits._

  // 10 days × 48 half-hourly rows, one part file per day directory
  private lazy val (dir, flat) = {
    val d = Files.createTempDirectory("graft_timelayout").toString
    val df = spark.range(480)
      .select(
        expr("timestampadd(MINUTE, 30 * id, timestamp'2024-03-01 00:00:00')")
          .as("ts"),
        (col("id") % 7).as("host"),
        (col("id") * 3.7).as("value"))
    TimeLayout.writeDatePartitioned(df.repartition(1), d)
    (d, df)
  }

  private def scanOf(df: DataFrame): FileSourceScanExec = {
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    scans should have size 1
    scans.head
  }

  test("readSpan prunes out-of-span date directories at planning time") {
    val span = TimeLayout.readSpan(spark, dir,
      "2024-03-03 06:00:00", "2024-03-05 00:00:00")
    val scan = scanOf(span)
    // the implied ds bounds reached the scan as partition filters…
    scan.partitionFilters.map(_.sql).mkString(" ") should include("ds")
    span.collect().length.toLong shouldBe flat.filter(
      $"ts" >= "2024-03-03 06:00:00" && $"ts" < "2024-03-05 00:00:00").count()
    // …and only the 3 covered day directories were read (ds=03-05 is
    // listed by the widened bound but its rows all fail ts < to; days
    // 01,02,06..10 never produce a file or a task)
    scan.metrics("numFiles").value shouldBe 3
  }

  test("a plain ts filter without the ds conjunct scans every partition") {
    val unaided = spark.read.parquet(dir)
      .filter($"ts" >= "2024-03-03 06:00:00" && $"ts" < "2024-03-05 00:00:00")
    val scan = scanOf(unaided)
    unaided.collect()
    scan.metrics("numFiles").value shouldBe 10
  }

  test("readSpan is row-identical to filtering the unpartitioned copy") {
    val span = TimeLayout.readSpan(spark, dir,
      "2024-03-02 12:34:56", "2024-03-08 01:23:45")
    val expected = flat.filter(
      $"ts" >= "2024-03-02 12:34:56" && $"ts" < "2024-03-08 01:23:45")
    span.columns shouldBe flat.columns
    span.exceptAll(expected).count() shouldBe 0
    expected.exceptAll(span).count() shouldBe 0
  }

  test("a reader session in a different time zone loses no edge-day rows") {
    // ds is the UTC day of the INSTANT on both sides, so a session-zone
    // mismatch between writer (UTC) and reader must not shift the widened
    // partition bound onto the wrong directory. The span below, spelled
    // in America/New_York wall-clock, covers instants that live in the
    // NEXT UTC day's directory — a session-zone to_date() would prune it.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    // 2024-03-03 18:30 EST = 2024-03-03 23:30 UTC … 2024-03-03 21:00 EST
    // = 2024-03-04 02:00 UTC: in-span rows sit in ds=2024-03-04
    val span = TimeLayout.readSpan(s2, dir,
      "2024-03-03 18:30:00", "2024-03-03 21:00:00")
    val expected = flat.filter(
      $"ts" >= expr("timestamp'2024-03-03 23:30:00'") &&
        $"ts" < expr("timestamp'2024-03-04 02:00:00'")).count()
    expected should be > 0L
    span.count() shouldBe expected
  }

  test("an unparseable span bound fails fast naming the bound, not an empty read") {
    val e = intercept[IllegalArgumentException] {
      TimeLayout.readSpan(spark, dir, "not-a-timestamp", "2021-06-02")
    }
    e.getMessage should include("not-a-timestamp")
    e.getMessage should include("from")
    val e2 = intercept[IllegalArgumentException] {
      TimeLayout.readSpan(spark, dir, "2021-06-01", "2021-13-45")
    }
    e2.getMessage should include("2021-13-45")
  }

  test("readAll round-trips schema and rows") {
    val all = TimeLayout.readAll(spark, dir)
    all.columns shouldBe flat.columns
    all.count() shouldBe 480
    all.exceptAll(flat).count() shouldBe 0
  }
}
