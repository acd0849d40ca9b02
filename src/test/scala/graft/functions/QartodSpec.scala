package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QartodSpec extends SparkSpec {
  import spark.implicits._

  test("grossRangeFlag: fail/suspect/pass bands, NaN and null stay pass") {
    val df = Seq(
      Some(0.5),             // <= failLo -> 4
      Some(5.0),             // <= susLo -> 3
      Some(100.0),           // pass
      Some(455.0),           // >= susHi -> 3
      Some(490.0),           // >= failHi -> 4
      Some(Double.NaN),      // NaN -> pass (numpy comparisons are false)
      None                   // null -> pass
    ).toDF("x")
      .withColumn("flag", Qartod.grossRangeFlag(col("x"), 1.0, 480.0, 10.0, 450.0))
    df.select("flag").as[Int].collect() shouldBe Array(4, 3, 1, 3, 4, 1, 1)
  }

  test("climatologyFixed: month span, un-fitted month -> 9, missing month -> 1") {
    val data = Seq(
      ("2024-01-15", 5.0),   // Jan: span (2, 44) -> 3 (5 <= ... no, 5 > 2 and < 44 -> 1)
      ("2024-01-15", 1.0),   // <= lo -> 3
      ("2024-06-15", 100.0), // un-fitted month -> 9
      ("2024-12-15", 10.0)   // no clim row for Dec -> 1
    ).toDF("t", "v").withColumn("t", col("t").cast("timestamp"))
    val clim = Seq(
      (1, Some(2.0), Some(44.0)),
      (6, None: Option[Double], None: Option[Double])
    ).toDF("month", "sus_lo", "sus_hi")
    val out = Qartod.climatologyFixed(data, "t", "v", clim, "flag")
      .select("flag").as[Int].collect()
    out shouldBe Array(1, 3, 9, 1)
  }

  test("climatologyBinned: (month, depth-bin) lookup with half-open bins") {
    val data = Seq(
      ("2024-01-15", 5.0, 10.0),  // bin [0,20): span (2,44) -> pass
      ("2024-01-15", 50.0, 10.0), // >= hi -> 3
      ("2024-01-15", 5.0, 20.0),  // depth 20 in [20,40) -> un-fitted -> 9
      ("2024-01-15", 5.0, 99.0)   // no bin -> 1
    ).toDF("t", "v", "depth").withColumn("t", col("t").cast("timestamp"))
    val clim = Seq(
      (1, 0.0, 20.0, Some(2.0), Some(44.0)),
      (1, 20.0, 40.0, None: Option[Double], None: Option[Double])
    ).toDF("month", "depth_lo", "depth_hi", "sus_lo", "sus_hi")
    val out = Qartod.climatologyBinned(data, "t", "v", "depth", clim, "flag")
      .select("flag").as[Int].collect()
    out shouldBe Array(1, 3, 9, 1)
  }

  test("combineFlags + flagDigit round-trip positional digit strings") {
    val df = Seq((100.0, true), (5.0, true)).toDF("v", "m")
    val flags = Qartod.combineFlags(Seq(
      "t1" -> (col("v") > 50),
      "t2" -> col("m")))
    val out = df.withColumn("flags", flags)
      .select(col("flags"),
        Qartod.flagDigit(col("flags"), 0).as("d0"),
        Qartod.flagDigit(col("flags"), 1).as("d1"))
      .as[(String, Int, Int)].collect()
    out shouldBe Array(("33", 3, 3), ("13", 1, 3))
  }

  test("bitFlag/qcSummaryFlag: not-run=0, pass=1, fail=4 (bits 0-1) / 9 (bits 2+), rollup max with initial 1") {
    val df = Seq(
      (0, 0),      // nothing ran -> all 0 -> summary 1
      (1, 1),      // bit0 ran+passed -> summary 1
      (1, 0),      // bit0 ran+failed -> 4
      (4, 0),      // bit2 ran+failed -> 9
      (5, 1)       // bit0 pass, bit2 fail -> 9
    ).toDF("ex", "res")
    val out = df.select(Qartod.qcSummaryFlag(col("ex"), col("res")).as("s"))
      .as[Int].collect()
    out shouldBe Array(1, 1, 4, 9, 9)
  }

  test("climTrace bracket selection: clamps, containment, notFound, interp endpoints") {
    import org.apache.spark.sql.functions.col
    val clim = Seq(
      (1, 0.0, 50.0, 10.0, 14.0), (2, 0.0, 50.0, 20.0, 24.0),
      (1, 50.0, 100.0, 110.0, 114.0), (2, 50.0, 100.0, 120.0, 124.0))
      .toDF("month", "depth_lo", "depth_hi", "sus_lo", "sus_hi")
    // shallower than the first bracket clamps to it
    val shallow = Qartod.climTrace(clim, depth = -5.0, refYear = 2024)
    shallow.filter(col("t") === java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      .select("clim_data").as[Double].collect() shouldBe Array(12.0)
    // deeper than last.hi - 1 clamps to the last bracket
    val deep = Qartod.climTrace(clim, depth = 250.0, refYear = 2024)
    deep.filter(col("t") === java.sql.Timestamp.valueOf("2024-02-15 00:00:00"))
      .select("clim_data").as[Double].collect() shouldBe Array(122.0)
    // containment picks [lo, hi); midway between points interpolates
    val mid = Qartod.climTrace(clim, depth = 25.0, refYear = 2024)
    val jan = java.sql.Timestamp.valueOf("2024-01-15 00:00:00").getTime
    val feb = java.sql.Timestamp.valueOf("2024-02-15 00:00:00").getTime
    val half = new java.sql.Timestamp((jan + feb) / 2)
    mid.filter(col("t") === half).select("clim_data").as[Double]
      .collect() shouldBe Array(17.0) // halfway between 12 and 22
    // no brackets at all -> empty
    Qartod.climTrace(clim.limit(0), depth = 10.0, refYear = 2024).count() shouldBe 0L
    // grid spans exactly [first point, last point], hourly
    mid.count() shouldBe ((java.sql.Timestamp.valueOf("2025-02-15 00:00:00").getTime -
      java.sql.Timestamp.valueOf("2023-01-15 00:00:00").getTime) / 3600000L + 1L)
  }

  test("climProfiles reshapes brackets to per-month depth profiles") {
    val clim = Seq(
      (1, 0.0, 50.0, 10.0, 14.0), (1, 50.0, 100.0, 110.0, 114.0),
      (2, 0.0, 50.0, 20.0, 24.0))
      .toDF("month", "depth_lo", "depth_hi", "sus_lo", "sus_hi")
    val out = Qartod.climProfiles(clim, Seq(1))
      .as[(Int, Double, Double, Double, Double)].collect()
    out shouldBe Array(
      (1, 25.0, 10.0, 14.0, 12.0),
      (1, 75.0, 110.0, 114.0, 112.0))
  }
}
