package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Port of the reference's golden e2e (tests/test_plotProfilesScatter.py):
  * synthetic PCO2W-shaped fixture (FIXTURES.md §1/§6), descent-sampled
  * parameter, day span — asserts the exact 36-entry artifact manifest
  * (3 plots × 3 scales × 4 overlay variants) and plot-data invariants.
  */
class ProfileScatterSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val base = "QAQC_plots/TEST-SITE-PCO2W_pco2"

  // two profiles inside the day window: descent slice is [peak, end]
  private val profiles = Seq(
    (ts("2025-07-29 06:00:00"), ts("2025-07-29 06:30:00"), ts("2025-07-29 07:00:00")),
    (ts("2025-07-29 12:00:00"), ts("2025-07-29 12:30:00"), ts("2025-07-29 13:00:00")),
    // outside the mask (ends after the last sample + 5 min): excluded
    (ts("2025-07-29 22:00:00"), ts("2025-07-29 23:00:00"), ts("2025-07-30 04:00:00"))
  )

  private def fixture() = {
    // samples: one per minute across each profile's full [start, end]
    val rows = profiles.take(2).flatMap { case (s, _, e) =>
      Iterator.iterate(s)(t => new Timestamp(t.getTime + 60000L))
        .takeWhile(!_.after(e))
        .map(t => (t, 400.0 + (t.getTime / 60000 % 50), (t.getTime / 60000 % 180).toDouble))
    }
    rows.toDF("time", "pco2_seawater", "int_ctd_pressure")
  }

  test("golden manifest: 36 artifacts — summary + 2 profiles, 3 scales, 4 overlay variants") {
    val r = ProfileScatter.run(
      fixture(), "time", "pco2_seawater", "int_ctd_pressure",
      profiles.toDF("start", "peak", "end"),
      timeRef = ts("2025-07-30 00:00:00"), spanDays = 1,
      fileNameBase = base, spanString = "day", descentSampled = true,
      annoNonEmpty = true, climNonEmpty = true, flagNonEmpty = true)

    r.manifest.length shouldBe 36
    val expected = for {
      idx <- Seq("000", "001", "002")
      scale <- Seq("full", "standard", "local")
      overlay <- Seq("none", "anno", "clim", "flag")
    } yield s"${base}_${idx}profile_day_${overlay}_$scale.png"
    r.manifest.toSet shouldBe expected.toSet
    // reference ordering: plot outer, scale middle, overlay inner
    r.manifest.take(4) shouldBe Seq(
      s"${base}_000profile_day_none_full.png",
      s"${base}_000profile_day_anno_full.png",
      s"${base}_000profile_day_clim_full.png",
      s"${base}_000profile_day_flag_full.png")
  }

  test("plot data: descent slice [peak, end], negated pressure, summary = union") {
    val r = ProfileScatter.run(
      fixture(), "time", "pco2_seawater", "int_ctd_pressure",
      profiles.toDF("start", "peak", "end"),
      timeRef = ts("2025-07-30 00:00:00"), spanDays = 1,
      fileNameBase = base, spanString = "day", descentSampled = true,
      annoNonEmpty = true, climNonEmpty = true, flagNonEmpty = true)
    val rows = r.data.select("plot_idx", "y", "z")
      .as[(Int, Double, Timestamp)].collect()
    val byPlot = rows.groupBy(_._1)
    byPlot.keySet shouldBe Set(0, 1, 2)
    // 31 one-minute samples per descent slice [peak, end]
    byPlot(1).length shouldBe 31
    byPlot(2).length shouldBe 31
    byPlot(0).length shouldBe 62
    all(byPlot(1).map(_._3.getTime)) should be >= ts("2025-07-29 06:30:00").getTime
    all(rows.map(_._2)) should be <= 0.0
  }

  test("empty window: exactly the three 000 none artifacts, no data") {
    val r = ProfileScatter.run(
      fixture(), "time", "pco2_seawater", "int_ctd_pressure",
      profiles.toDF("start", "peak", "end"),
      timeRef = ts("2026-01-01 00:00:00"), spanDays = 1,
      fileNameBase = base, spanString = "day", descentSampled = true,
      annoNonEmpty = true, climNonEmpty = true, flagNonEmpty = true)
    r.manifest shouldBe Seq(
      s"${base}_000profile_day_none_full.png",
      s"${base}_000profile_day_none_standard.png",
      s"${base}_000profile_day_none_local.png")
  }

  test("week span groups profiles by calendar day (one sub-plot per day)") {
    // both profiles on 07-29 plus data needs a 7-day window
    val r = ProfileScatter.run(
      fixture(), "time", "pco2_seawater", "int_ctd_pressure",
      profiles.toDF("start", "peak", "end"),
      timeRef = ts("2025-07-30 00:00:00"), spanDays = 7,
      fileNameBase = base, spanString = "week", descentSampled = true,
      annoNonEmpty = true, climNonEmpty = true, flagNonEmpty = true)
    // two profiles share one day -> summary + ONE day group = 2 plots
    r.manifest.count(_.contains("profile_week_none_full")) shouldBe 2
    r.data.select("plot_idx").distinct().as[Int].collect().sorted shouldBe Array(0, 1)
  }

  test("missing overlay tables drop only their artifacts") {
    val r = ProfileScatter.run(
      fixture(), "time", "pco2_seawater", "int_ctd_pressure",
      profiles.toDF("start", "peak", "end"),
      timeRef = ts("2025-07-30 00:00:00"), spanDays = 1,
      fileNameBase = base, spanString = "day", descentSampled = true,
      annoNonEmpty = false, climNonEmpty = true, flagNonEmpty = false)
    r.manifest.length shouldBe 3 * 3 * 2 // none + clim only
    r.manifest.count(_.contains("_anno_")) shouldBe 0
    r.manifest.count(_.contains("_clim_")) shouldBe 9
  }
}
