package graft

import graft.sources.ConfigRegistry.{SiteConfig, VariableResolver}

/** Per-(site, span) plot fan-out planner — the reference's
  * `run_dashboard_creation` parameter loop (rca_data_tools/qaqc/plots.py:
  * 215-430) as a pure plan: which plot paths run, against which resolved
  * physical column, under which artifact name base.
  *
  * Semantics preserved:
  *  - each canonical parameter resolves to the physical columns actually
  *    present (plots.py:220-223); none present → skipped with a warning
  *    semantic (log-and-continue), MULTIPLE present → one task set per
  *    physical column, named `<site>_<yParam>` instead of
  *    `<site>_<param>` (plots.py:228-233);
  *  - PROFILER instruments require exactly ONE resolved pressure column
  *    (plots.py:268-273, else the parameter is skipped) and fan out to
  *    the contour grid, the profiler scatter (not for ADCP,
  *    plots.py:312; returns NO artifacts in express mode,
  *    dashboard.py:1108-1109), and one fixed-depth scatter per
  *    configured depth (plots.py:340-342, skipped for "Single");
  *  - non-profiler instruments get the single fixed-depth scatter with
  *    the "small" marker (plots.py:391-425; per-depth scatters use
  *    "medium", plots.py:382).
  *
  * Execution of each task is [[ProfileGrid]]/[[ProfileScatter]]/
  * [[FixedScatter]] surface; this planner is driver-side config logic
  * (a few rows per site), like [[graft.tools.QaqcCli]] one level up.
  */
object PlotFanOut {

  final case class PlotTask(kind: String, canonical: String, yParam: String,
                            pressParam: Option[String], imageBase: String,
                            plotTitle: String, depth: Option[Int],
                            markerSize: String)

  def plan(site: SiteConfig, resolver: VariableResolver, fileColumns: Seq[String],
           express: Boolean, plotDirPrefix: String = "QAQC_plots/"): Seq[PlotTask] = {
    val isProfiler = site.instrument.contains("PROFILER")
    val isAdcp = site.instrument.contains("ADCP")
    val pressCandidates =
      resolver.candidates("pressure").filter(fileColumns.contains).distinct
    site.dataParameters.filterNot(p => p == "time" || p == "pressure").flatMap { param =>
      val present = resolver.candidates(param).filter(fileColumns.contains).distinct
      present.flatMap { yParam =>
        val base =
          if (present.length > 1) s"$plotDirPrefix${site.refDes}_$yParam"
          else s"$plotDirPrefix${site.refDes}_$param"
        val title =
          if (present.length > 1) s"${site.refDes} $yParam"
          else s"${site.refDes} $param"
        if (isProfiler) {
          if (pressCandidates.length != 1) Nil // plots.py:272-273
          else {
            val press = Some(pressCandidates.head)
            val grid = Seq(PlotTask("grid", param, yParam, press, base, title, None, "n/a"))
            val scatter =
              if (isAdcp || express) Nil // ADCP: no scatter; express: no artifacts
              else Seq(PlotTask("profile_scatter", param, yParam, press, base, title, None, "n/a"))
            val depths =
              if (isAdcp) Nil
              else site.depths.flatMap(d => d.toIntOption).map(d =>
                PlotTask("depth_scatter", param, yParam, press,
                  s"${base}_${d}meters", s"$title: $d meters", Some(d), "medium"))
            grid ++ scatter ++ depths
          }
        } else {
          Seq(PlotTask("scatter", param, yParam, None, base, title, None, "small"))
        }
      }
    }
  }
}
