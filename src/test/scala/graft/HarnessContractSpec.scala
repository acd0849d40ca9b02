package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pins the round-7 lesson as a contract: a crashed query must surface as
  * an explicit error in the harness outputs — never vanish (Verify) and
  * never time as a fast run (Bench). These specs drive the extracted
  * cores with an injected query map containing one good and one broken
  * query.
  */
class HarnessContractSpec extends SparkSpec {

  private val good: (SparkSession, String) => DataFrame =
    (s, _) => s.range(5).toDF("id")
  private val analysisCrash: (SparkSession, String) => DataFrame =
    (s, _) => s.range(5).toDF("id").select(expr("no_such_column div 1000"))
  private val runtimeCrash: (SparkSession, String) => DataFrame =
    (s, _) => {
      val f = udf((i: Long) => { require(false, "boom at runtime"); i })
      s.range(5).toDF("id").select(f(col("id")).as("x"))
    }

  test("Verify.run writes parquet for good queries and a _failed.json manifest for crashes") {
    val out = Files.createTempDirectory("graft_harness").toFile
    out.deleteOnExit()
    val failed = Verify.run(spark, "unused", out.getAbsolutePath,
      Map("q_good" -> good, "q_analysis" -> analysisCrash, "q_runtime" -> runtimeCrash),
      Map("q_good" -> "SELECT 1 AS one"))
    failed.keySet shouldBe Set("q_analysis", "q_runtime")
    new java.io.File(out, "q_good").exists() shouldBe true
    new java.io.File(out, "q_analysis").exists() shouldBe false
    val manifest = Files.readString(new java.io.File(out, "_failed.json").toPath)
    manifest should include("q_analysis")
    manifest should include("q_runtime")
    // the manifest must be valid single-line JSON (the driver json.load's it)
    manifest should not include "\n"
    Files.readString(new java.io.File(out, "oracle_sql.json").toPath) should
      include("SELECT 1 AS one")
  }

  test("Bench.measure times good queries and reports crashes as errors, never timings") {
    val (times, errors) = Bench.measure(spark, "unused",
      Map("q_good" -> good, "q_analysis" -> analysisCrash, "q_runtime" -> runtimeCrash),
      runs = 2)
    times.keySet shouldBe Set("q_good")
    times("q_good") should be > 0.0
    errors.keySet shouldBe Set("q_analysis", "q_runtime")
    errors("q_analysis").length should be <= 220 // bounded message
  }
}
