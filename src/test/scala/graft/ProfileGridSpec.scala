package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Profiler-grid e2e (dashboard.py:399-920 / gridProfiles:154-228):
  * known-answer depth interpolation with edge clamping, the two pressure
  * masks, the left-column gap mask, <2-sample column dropping, and the
  * manifest semantics (populated = none+clim trios; empty/insufficient =
  * none+clim+anno trios; anno never recorded on populated grids).
  */
class ProfileGridSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val base = "QAQC_plots/TEST-SITE-CTD_temp"

  private val profA = (ts("2025-07-29 01:00:00"), ts("2025-07-29 02:00:00"), ts("2025-07-29 03:00:00"))
  private val profB = (ts("2025-07-29 05:00:00"), ts("2025-07-29 06:00:00"), ts("2025-07-29 07:00:00"))

  // ascent profiles: pressure decreasing over [start, peak]
  private def fixture() = Seq(
    // extent guards: before profA.start and after profB.end, no profile
    (ts("2025-07-29 00:30:00"), 1.0, 50.0),
    (ts("2025-07-29 08:00:00"), 1.0, 50.0),
    // profile A: press 10,8,6,2 -> min_p=2 (no shallow mask), max_p=10
    (ts("2025-07-29 01:10:00"), 100.0, 10.0),
    (ts("2025-07-29 01:20:00"), 80.0, 8.0),
    (ts("2025-07-29 01:30:00"), 60.0, 6.0),
    (ts("2025-07-29 01:40:00"), 20.0, 2.0),
    // profile B: press 9,7 -> min_p=7 (>5: shallow mask), max_p=9
    (ts("2025-07-29 05:10:00"), 900.0, 9.0),
    (ts("2025-07-29 05:20:00"), 700.0, 7.0)
  ).toDF("time", "temp", "press")

  private def run(df: org.apache.spark.sql.DataFrame,
                  profiles: Seq[(Timestamp, Timestamp, Timestamp)],
                  spanDays: Int = 1) =
    ProfileGrid.run(df, "time", "temp", "press",
      profiles.toDF("start", "peak", "end"),
      timeRef = ts("2025-07-30 00:00:00"), spanDays = spanDays,
      profileDepth = 20.0, depthStep = 1.0,
      fileNameBase = base, spanString = "day")

  test("known-answer interpolation with edge clamp and pressure masks") {
    val r = run(fixture(), Seq(profA, profB))
    val rows = r.data.collect()
      .map(x => (x.getTimestamp(0), x.getDouble(1),
        if (x.isNullAt(2)) None else Some(x.getDouble(2))))
      .toSeq
    rows.length shouldBe 40 // 2 profiles x 20 depth steps

    val a = rows.filter(_._1 == profA._2).map(x => x._2 -> x._3).toMap
    // below the shallowest sample: constant extrapolation (min_p=2 <= 5)
    a(0.0) shouldBe Some(20.0)
    a(1.0) shouldBe Some(20.0)
    a(2.0) shouldBe Some(20.0)
    a(3.0) shouldBe Some(30.0) // lerp between (2,20) and (6,60)
    a(5.0) shouldBe Some(50.0)
    a(7.0) shouldBe Some(70.0) // lerp between (6,60) and (8,80)
    a(10.0) shouldBe Some(100.0)
    a(11.0) shouldBe None // max_p=10 < 185: deeper cells masked
    a(19.0) shouldBe None

    val b = rows.filter(_._1 == profB._2).map(x => x._2 -> x._3).toMap
    b(6.0) shouldBe None // min_p=7 > 5: shallower cells masked, not clamped
    b(7.0) shouldBe Some(700.0)
    b(8.0) shouldBe Some(800.0)
    b(9.0) shouldBe Some(900.0)
    b(10.0) shouldBe None
  }

  test("gap mask nulls the left column of a >threshold peak gap") {
    // peaks 24h apart (== threshold, kept) then 48h apart (> 1 day: the
    // LEFT column of the gap is masked, dashboard.py:1004-1010)
    val days = Seq("2025-07-25", "2025-07-26", "2025-07-28")
    val profs = days.map(d =>
      (ts(s"$d 11:00:00"), ts(s"$d 12:00:00"), ts(s"$d 13:00:00")))
    val samples = Seq(
      (ts("2025-07-25 00:30:00"), 1.0, 50.0),
      (ts("2025-07-29 08:00:00"), 1.0, 50.0)) ++
      profs.flatMap { case (s, _, _) => Seq(
        (new Timestamp(s.getTime + 600000L), 10.0, 8.0),
        (new Timestamp(s.getTime + 1200000L), 30.0, 2.0))
      }
    val r = run(samples.toDF("time", "temp", "press"), profs, spanDays = 5)
    val byPeak = r.data.collect()
      .groupBy(_.getTimestamp(0)).map { case (k, v) => k -> v.count(!_.isNullAt(2)) }
    byPeak(profs(0)._2) should be > 0 // 24h == threshold: not masked
    byPeak(profs(1)._2) shouldBe 0    // 48h > threshold: fully masked
    byPeak(profs(2)._2) should be > 0 // last column never masked
  }

  test("profiles with <2 samples produce no grid column") {
    // third profile with a single sample: dropped like gridProfiles'
    // zero-column deletion; A and B keep their columns
    val profC = (ts("2025-07-29 09:00:00"), ts("2025-07-29 10:00:00"), ts("2025-07-29 11:00:00"))
    val samples = fixture()
      .unionByName(Seq((ts("2025-07-29 09:30:00"), 5.0, 4.0)).toDF("time", "temp", "press"))
      .unionByName(Seq((ts("2025-07-29 12:00:00"), 1.0, 50.0)).toDF("time", "temp", "press"))
    val r = run(samples, Seq(profA, profB, profC))
    r.data.select(col("t")).distinct().collect().map(_.getTimestamp(0)).toSet shouldBe
      Set(profA._2, profB._2)
  }

  test("populated manifest: none + clim trios, anno saved-but-unrecorded") {
    val r = run(fixture(), Seq(profA, profB))
    r.manifest shouldBe Seq(
      s"${base}_day_none_full.png", s"${base}_day_none_standard.png", s"${base}_day_none_local.png",
      s"${base}_day_clim_full.png", s"${base}_day_clim_standard.png", s"${base}_day_clim_local.png")
  }

  test("gridFallback: separable interpolation fills time then depth, no extrapolation") {
    // samples on two depth rows (0 and 10) at hours 0 and 2; depth row 5
    // empty -> filled from neighbours; cells before first/after last
    // sample stay null
    val timeRef = ts("2025-07-02 00:00:00")
    val h0 = ts("2025-07-01 00:30:00")
    val h2 = ts("2025-07-01 02:30:00")
    val df = Seq(
      (h0, 10.0, 0.0), (h2, 30.0, 0.0),   // depth 0
      (h0, 110.0, 10.0), (h2, 130.0, 10.0) // depth 10
    ).toDF("time", "temp", "press")
    val out = ProfileGrid.gridFallback(df, "time", "temp", "press",
        timeRef, spanDays = 1, yMin = 0.0, yMax = 20.0, depthStep = 5.0)
      .collect()
      .map(r => ((r.getTimestamp(0), r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // mesh starts at 2025-07-01 00:00 - 1*0.002d = 23:57:07.2 prev day;
    // second cell = +1h, within [h0, h2] for both rows
    val cells = out.keys.map(_._1).toSeq.distinct.sortBy(_.getTime)
    val t1 = cells(1) // first in-range grid time
    val v0 = out((t1, 0.0)).get
    val v10 = out((t1, 10.0)).get
    v0 should be(10.0 +- 10.0)  // between the endpoints
    v10 should be(110.0 +- 10.0)
    // depth row 5 filled exactly midway between rows 0 and 10
    out((t1, 5.0)).get shouldBe ((v0 + v10) / 2.0) +- 1e-9
    // before any sample: null at every depth
    out((cells.head, 0.0)) shouldBe None
    out((cells.head, 5.0)) shouldBe None
    // beyond the deepest sampled row: no extrapolation
    out((t1, 15.0)) shouldBe None
  }

  test("gridFallback gap mask only engages with more than one gap (reference quirk)") {
    val timeRef = ts("2025-07-10 00:00:00")
    def samplesWith(gaps: Int) = {
      // clusters of samples separated by >1-day gaps
      val clusters = gaps + 1
      (0 until clusters).flatMap { c =>
        val base = ts("2025-07-01 00:00:00").getTime + c * 3L * 86400000L
        Seq((new Timestamp(base), 1.0, 0.0),
          (new Timestamp(base + 3600000L), 2.0, 0.0),
          (new Timestamp(base), 5.0, 10.0),
          (new Timestamp(base + 3600000L), 6.0, 10.0))
      }.toDF("time", "temp", "press")
    }
    def nullCellsInGap(df: org.apache.spark.sql.DataFrame): Long = {
      val out = ProfileGrid.gridFallback(df, "time", "temp", "press",
        timeRef, spanDays = 9, yMin = 0.0, yMax = 15.0, depthStep = 5.0)
      out.filter(col("t") > lit(ts("2025-07-01 02:00:00")) &&
          col("t") < lit(ts("2025-07-03 23:00:00")) && col("value").isNull)
        .count()
    }
    // one gap: unmasked (interpolated across) — len(timeGaps[0]) > 1 is false
    nullCellsInGap(samplesWith(1)) shouldBe 0L
    // two gaps: cells inside each gap are nulled
    nullCellsInGap(samplesWith(2)) should be > 0L
  }

  test("empty window and insufficient profiles emit the 9-file manifest") {
    val nine = Seq("none", "clim", "anno").flatMap(o =>
      Seq("full", "standard", "local").map(sc => s"${base}_day_${o}_$sc.png"))
    // <= 5 samples in window
    val tiny = fixture().limit(3)
    val r1 = run(tiny, Seq(profA, profB))
    r1.manifest shouldBe nine
    r1.data.count() shouldBe 0L
    // only one surviving grid column
    val r2 = run(fixture(), Seq(profA))
    r2.manifest shouldBe nine
    r2.data.count() shouldBe 0L
  }
}
