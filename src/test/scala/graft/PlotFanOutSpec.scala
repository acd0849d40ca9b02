package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.ConfigRegistry.{SiteConfig, VariableResolver}

/** Plot fan-out planner (plots.py:215-430): parameter resolution and
  * naming, profiler vs fixed fan-out, ADCP and express exclusions,
  * per-depth tasks, pressure-resolution guard.
  */
class PlotFanOutSpec extends AnyFunSuite with Matchers {

  private val resolver = new VariableResolver(Map(
    "temperature" -> Seq("sea_water_temperature", "temp"),
    "oxygen" -> Seq("dissolved_oxygen"),
    "pressure" -> Seq("int_ctd_pressure")))

  private def site(instrument: String, depths: Seq[String] = Nil) =
    SiteConfig("SITE-A", 1, instrument, "f", Nil,
      Seq("time", "temperature", "oxygen"), depths, None, "lttb")

  test("profiler fan-out: grid + scatter + per-depth; ADCP and express drop the scatter") {
    val cols = Seq("time", "sea_water_temperature", "int_ctd_pressure")
    val tasks = PlotFanOut.plan(site("CTD-PROFILER", Seq("20", "60")), resolver, cols,
      express = false)
    tasks.map(t => (t.kind, t.depth)) shouldBe Seq(
      ("grid", None), ("profile_scatter", None),
      ("depth_scatter", Some(20)), ("depth_scatter", Some(60)))
    tasks.head.pressParam shouldBe Some("int_ctd_pressure")
    tasks.head.imageBase shouldBe "QAQC_plots/SITE-A_temperature"
    tasks.last.imageBase shouldBe "QAQC_plots/SITE-A_temperature_60meters"
    // oxygen column absent: skipped entirely
    tasks.map(_.canonical).distinct shouldBe Seq("temperature")

    PlotFanOut.plan(site("ADCP-PROFILER", Seq("20")), resolver, cols, express = false)
      .map(_.kind) shouldBe Seq("grid")
    PlotFanOut.plan(site("CTD-PROFILER", Seq("20")), resolver, cols, express = true)
      .map(_.kind) shouldBe Seq("grid", "depth_scatter")
  }

  test("profiler without exactly one pressure column skips the parameter") {
    val noPress = Seq("time", "sea_water_temperature")
    PlotFanOut.plan(site("CTD-PROFILER"), resolver, noPress, express = false) shouldBe Nil
    val twoPress = new VariableResolver(Map(
      "temperature" -> Seq("temp"),
      "pressure" -> Seq("p1", "p2")))
    PlotFanOut.plan(site("CTD-PROFILER"), twoPress,
      Seq("time", "temp", "p1", "p2"), express = false) shouldBe Nil
  }

  test("fixed instruments get the small-marker scatter; multi-resolution names per column") {
    val cols = Seq("time", "sea_water_temperature", "temp", "dissolved_oxygen")
    val tasks = PlotFanOut.plan(site("CTD-FIXED"), resolver, cols, express = false)
    tasks.map(_.kind).distinct shouldBe Seq("scatter")
    tasks.map(_.markerSize).distinct shouldBe Seq("small")
    // temperature resolves to TWO physical columns -> per-column names
    tasks.filter(_.canonical == "temperature").map(_.imageBase) shouldBe Seq(
      "QAQC_plots/SITE-A_sea_water_temperature", "QAQC_plots/SITE-A_temp")
    // oxygen resolves to one -> canonical name
    tasks.filter(_.canonical == "oxygen").map(_.imageBase) shouldBe Seq(
      "QAQC_plots/SITE-A_oxygen")
  }
}
