package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScanBalanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val singleSplit = {
    val dir = Files.createTempDirectory("sbal").toString
    (0 until 1000).map(i => (i.toLong, s"doc $i", s"src${i % 5}"))
      .toDF("doc_id", "text", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/docs.parquet")
    s"$dir/docs.parquet"
  }

  test("an under-split scan is redistributed to defaultParallelism") {
    val df = ScanBalance.rebalance(spark.read.parquet(singleSplit), "doc_id")
    df.rdd.getNumPartitions shouldBe spark.sparkContext.defaultParallelism
    df.count() shouldBe 1000
  }

  test("an input already at the core count is returned unchanged (no-op)") {
    val wide = spark.read.parquet(singleSplit)
      .repartition(spark.sparkContext.defaultParallelism)
    val out = ScanBalance.rebalance(wide, "doc_id")
    // identity: no second exchange stacked on top
    out.queryExecution.logical shouldBe theSameInstanceAs(
      wide.queryExecution.logical)
  }

  test("the kill switch disables rebalancing") {
    spark.conf.set(ScanBalance.EnabledKey, "false")
    try {
      val raw = spark.read.parquet(singleSplit)
      val out = ScanBalance.rebalance(raw, "doc_id")
      out.queryExecution.logical shouldBe theSameInstanceAs(
        raw.queryExecution.logical)
    } finally spark.conf.unset(ScanBalance.EnabledKey)
  }

  test("filters written after a rebalance still push down to the scan") {
    val df = ScanBalance.rebalance(spark.read.parquet(singleSplit), "doc_id")
      .filter(col("doc_id") < 10)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString("\n")
    scan should include("PushedFilters")
    scan should include("LessThan(doc_id,10)")
    df.count() shouldBe 10
  }

  test("rebalanced results are identical to the raw scan") {
    val raw = spark.read.parquet(singleSplit)
    val bal = ScanBalance.rebalance(raw, "doc_id")
    bal.collect().toSet shouldBe raw.collect().toSet
    // round-robin spelling too
    ScanBalance.rebalance(raw).collect().toSet shouldBe raw.collect().toSet
  }
}
