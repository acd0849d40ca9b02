package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Fixed-depth scatter e2e (dashboard.py:1500-1994, plots.py:342-389):
  * time-machine trace windows and 365-day shifts, legend strings, the
  * depth fan-out's keep-the-time-axis semantics, and the manifest shapes.
  */
class FixedScatterSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val base = "QAQC_plots/TEST-SITE-CTD_temp"
  private val timeRef = ts("2024-01-20 00:00:00")

  // two years of data: 2024 rows in [Jan 16, Jan 18], 2023 rows shifted
  // exactly -365 days (so they land in trace 1's window)
  private def fixture() = Seq(
    (ts("2024-01-16 06:00:00"), 10.0, 3.25),
    (ts("2024-01-17 06:00:00"), 20.0, 7.25),
    (ts("2024-01-18 06:00:00"), 30.0, 3.75), // out of band for both depths
    (ts("2023-01-16 06:00:00"), 11.0, 3.25), // = 2024-01-16 - 365d? (2023-01-17 + ...) in trace 1 window
    (ts("2023-01-17 06:00:00"), 21.0, 7.25)
  ).toDF("time", "temp", "press")

  test("time-machine traces: windows, 365-day plot shift, legends") {
    val r = FixedScatter.run(fixture(), "time", "temp", timeRef, spanDays = 5,
      fileNameBase = base, spanString = "day")
    val rows = r.data.collect() // (trace, legend, plot_time, value)
      .map(x => (x.getInt(0), x.getString(1), x.getTimestamp(2), x.getDouble(3)))

    // trace 0: window [2024-01-15, 2024-01-20], unshifted
    val t0 = rows.filter(_._1 == 0)
    t0.map(_._4).sorted.toSeq shouldBe Seq(10.0, 20.0, 30.0)
    t0.map(_._2).distinct.toSeq shouldBe Seq("2024")
    t0.map(_._3).toSet shouldBe Set(
      ts("2024-01-16 06:00:00"), ts("2024-01-17 06:00:00"), ts("2024-01-18 06:00:00"))

    // trace 1: window [2023-01-16, 2023-01-21], plot times shifted +365d
    val t1 = rows.filter(_._1 == 1)
    t1.map(_._4).sorted.toSeq shouldBe Seq(11.0, 21.0)
    t1.map(_._2).distinct.toSeq shouldBe Seq("2023")
    t1.map(_._3).toSet shouldBe Set(
      ts("2024-01-16 06:00:00"), ts("2024-01-17 06:00:00"))
  }

  test("legend spans two years when a trace window straddles new year") {
    val df = Seq(
      (ts("2023-12-30 12:00:00"), 1.0),
      (ts("2024-01-02 12:00:00"), 2.0)).toDF("time", "temp")
    val r = FixedScatter.run(df, "time", "temp", ts("2024-01-03 00:00:00"),
      spanDays = 7, fileNameBase = base, spanString = "week")
    val legends = r.data.select(col("trace"), col("legend")).distinct().collect()
      .map(x => x.getInt(0) -> x.getString(1)).toMap
    legends(0) shouldBe "2023 - 2024"
  }

  test("depth fan-out keeps the time axis: out-of-band samples null, traces depth-agnostic") {
    val r = FixedScatter.runDepths(fixture(), "time", "temp", "press", Seq(3, 7),
      timeRef, spanDays = 5, fileNameBase = base, spanString = "day")
    val rows = r.data.collect()
      .map(x => (x.getInt(0), x.getInt(1),
        if (x.isNullAt(4)) None else Some(x.getDouble(4))))
    // every (depth, trace) pair sees every in-window sample
    rows.count(x => x._1 == 3 && x._2 == 0) shouldBe 3
    rows.count(x => x._1 == 7 && x._2 == 0) shouldBe 3
    // values masked by d < press < d + 0.5 (strict)
    rows.filter(x => x._1 == 3 && x._2 == 0).flatMap(_._3).toSeq shouldBe Seq(10.0)
    rows.filter(x => x._1 == 7 && x._2 == 0).flatMap(_._3).toSeq shouldBe Seq(20.0)
    rows.filter(x => x._1 == 3 && x._2 == 1).flatMap(_._3).toSeq shouldBe Seq(11.0)
  }

  test("deploy span: per-deployment traces, same-year deployments share year_diff") {
    val df = Seq(
      (ts("2024-01-16 06:00:00"), 10.0),
      (ts("2023-01-15 06:00:00"), 20.0),
      (ts("2023-01-05 06:00:00"), 30.0)).toDF("time", "temp")
    val r = FixedScatter.runDeploy(df, "time", "temp",
      Seq(ts("2024-01-17 12:00:00"), ts("2023-01-16 00:00:00"), ts("2023-01-10 00:00:00")),
      fileNameBase = base)
    val rows = r.data.collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getTimestamp(3), x.getDouble(4)))
    // trace 0 anchored at the 2024 deployment, unshifted
    rows.filter(_._1 == 0).map(_._4).toSeq shouldBe Seq(10.0)
    rows.filter(_._1 == 0).head._2 shouldBe 0
    // traces 1 and 2: distinct traces, both year_diff 1, shifted +365d
    val t1 = rows.filter(_._1 == 1)
    t1.map(_._4).sorted.toSeq shouldBe Seq(20.0, 30.0) // both Jan-2023 samples in ±15d
    t1.head._2 shouldBe 1
    val t2 = rows.filter(_._1 == 2)
    t2.map(_._4).sorted.toSeq shouldBe Seq(20.0, 30.0)
    t2.head._2 shouldBe 1
    rows.filter(_._1 == 1).map(_._3).toSet shouldBe Set(
      ts("2024-01-15 06:00:00"), ts("2024-01-05 06:00:00"))
    r.manifest.head shouldBe s"${base}_deploy_none_full.png"
    r.manifest.length shouldBe 12
  }

  test("manifest: per-depth none/clim/flag/time trios; empty keeps none+time") {
    val r = FixedScatter.runDepths(fixture(), "time", "temp", "press", Seq(3, 7),
      timeRef, spanDays = 5, fileNameBase = base, spanString = "day")
    r.manifest shouldBe (for {
      d <- Seq(3, 7)
      o <- Seq("none", "clim", "flag", "time")
      sc <- Seq("full", "standard", "local")
    } yield s"${base}_${d}meters_day_${o}_$sc.png")

    // empty window: clim/flag skipped, none + time still recorded
    val rEmpty = FixedScatter.run(fixture(), "time", "temp",
      ts("2030-01-01 00:00:00"), spanDays = 1,
      fileNameBase = base, spanString = "day")
    rEmpty.manifest shouldBe (for {
      o <- Seq("none", "time")
      sc <- Seq("full", "standard", "local")
    } yield s"${base}_day_${o}_$sc.png")
    rEmpty.data.count() shouldBe 0L
  }

  test("S7 operational status threads into the result; default is the degrade rule") {
    // default: no status passed — the statusDict.get(site, 'UNAVAILABLE')
    // degrade (dashboard.py:1553), painted gray (constants.py:56)
    val r = FixedScatter.run(fixture(), "time", "temp", timeRef, spanDays = 5,
      fileNameBase = base, spanString = "day")
    r.status shouldBe "UNAVAILABLE"
    r.statusColor shouldBe "gray"
    // explicit status from the S7 snapshot map flows through run ->
    // runDepths -> Result, with the reference's title color
    val rOp = FixedScatter.runDepths(fixture(), "time", "temp", "press",
      depths = Seq(3), timeRef, spanDays = 5,
      fileNameBase = base, spanString = "day", status = "OPERATIONAL")
    rOp.status shouldBe "OPERATIONAL"
    rOp.statusColor shouldBe "green"
    val rDep = FixedScatter.runDeploy(fixture(), "time", "temp",
      deployTimes = Seq(ts("2024-01-16 00:00:00")),
      fileNameBase = base, status = "TROUBLESHOOTING")
    rDep.status shouldBe "TROUBLESHOOTING"
    rDep.statusColor shouldBe "red"
  }
}
