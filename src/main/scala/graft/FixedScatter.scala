package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Port of the reference's fixed-depth scatter query
  * (rca_data_tools/qaqc/dashboard.py:1500-1994 `plotScatter`, per-depth
  * fan-out at qaqc/plots.py:342-389): the plot-DATA table — the base
  * scatter plus the time-machine overlay traces — and the deterministic
  * artifact manifest. Rendering (marker sizes, the 16-colour line cycle at
  * dashboard.py:1532-1549 indexed by `year_diff % 16`, legends' layout)
  * stays a thin client.
  *
  * Semantics preserved:
  *  - window = [timeRef − span, timeRef] (dashboard.py:1613-1619);
  *  - time-machine traces (dashboard.py:1747-1787): trace k shifts the
  *    window back k*365 days (k = 0 .. timeRef.year − first-sample-year,
  *    from the UNSLICED dataset, dashboard.py:1752-1753) and shifts each
  *    sample's plot time forward by k*365 days; traces with no samples in
  *    their window are dropped (dashboard.py:1764); the trace legend is
  *    `minYear - maxYear` of the in-window sample years, collapsed to one
  *    year when equal (dashboard.py:1765-1770). Trace 0 IS the base
  *    scatter (dashboard.py:1750-1751);
  *  - per-depth fan-out (plots.py:342-389): each configured depth d keeps
  *    values only where d < pressure < d + 0.5 — but the reference masks
  *    with xarray `.where` WITHOUT drop, so the time axis survives the
  *    mask: trace existence, legends, and the empty-slice check all come
  *    from every sample in the window regardless of depth, and
  *    out-of-band samples plot as null values. Reproduced here as null
  *    `value` rows (matplotlib skips NaN points — same picture);
  *  - manifest (append order dashboard.py:1652-1657 then the overlay loop
  *    :1665-1992): `none` trio always; `clim` and `flag` trios only for a
  *    non-empty window (:1822,:1887) — recorded even when the overlay
  *    data itself is empty; the `time` trio always (the time-machine
  *    branch has no empty-slice guard); `anno` files are saved but never
  *    appended to the reference's fileNameList (:1722-1730 — the same
  *    quirk as [[ProfileGrid]]); `near` is a stub (:1880-1882). Per-depth
  *    plots suffix the base name with `_{d}meters` (plots.py:357-359).
  *
  * Scale shape: the trace assignment is a broadcast range join against
  * the (numYears+1)-row trace table and the legend is a per-trace agg
  * joined back broadcast — samples are never collected; the only driver
  * values are the 3-field extent agg. Overlapping windows (span = 365)
  * duplicate boundary samples into both traces, exactly like the
  * reference's per-trace `.sel` slices.
  */
object FixedScatter {

  /** `status` is the S7 operational-status string painted into every
    * artifact title (dashboard.py:1553,1565), default = the degrade rule.
    */
  final case class Result(data: DataFrame, manifest: Seq[String],
                          status: String = graft.sources.OperationalStatus.Default) {
    def statusColor: String = graft.sources.OperationalStatus.colorFor(status)
  }

  private val Scales = Seq("full", "standard", "local")

  /** Per-trace legend string from the in-window sample years: a single
    * year collapses to "y", a range renders "y0 - y1"
    * (dashboard.py:1765-1770 — shared by both trace modes).
    */
  private def legendFor(tagged: DataFrame): DataFrame =
    tagged.groupBy(col("trace"))
      .agg(min(year(col("st"))).as("y0"), max(year(col("st"))).as("y1"))
      .select(col("trace"),
        when(col("y0") === col("y1"), col("y1").cast("string"))
          .otherwise(concat(col("y0"), lit(" - "), col("y1"))).as("legend"))

  private def manifestFor(base: String, spanString: String, empty: Boolean): Seq[String] = {
    val overlays = if (empty) Seq("none", "time") else Seq("none", "clim", "flag", "time")
    overlays.flatMap(o => Scales.map(sc => s"${base}_${spanString}_${o}_$sc.png"))
  }

  /** Single fixed-depth (or "Single"-depth site) scatter: data columns
    * (trace, legend, plot_time, value).
    */
  def run(samples: DataFrame, timeCol: String, valueCol: String,
          timeRef: Timestamp, spanDays: Int,
          fileNameBase: String, spanString: String,
          status: String = graft.sources.OperationalStatus.Default): Result = {
    val r = runDepths(samples, timeCol, valueCol, pressCol = null, depths = Nil,
      timeRef, spanDays, fileNameBase, spanString, status)
    Result(r.data.drop("depth"), r.manifest, status)
  }

  /** Deploy-span scatter (dashboard.py:1604-1611, 1738-1746): the base
    * window is ±15 days around the FIRST deployment; the time machine gets
    * one trace per deployment time, each a ±15-day window shifted forward
    * by `365 · (yearRef − deployment year)` days (yearRef = first
    * deployment's year). Two deployments in one year are separate traces
    * with the same year_diff — the reference draws them in the same colour
    * with duplicate legend entries, so the output carries both the trace
    * index and year_diff. Data columns: (trace, year_diff, legend,
    * plot_time, value); manifest uses spanString "deploy" with the same
    * overlay shape as [[run]].
    */
  def runDeploy(samples: DataFrame, timeCol: String, valueCol: String,
                deployTimes: Seq[Timestamp],
                fileNameBase: String,
                status: String = graft.sources.OperationalStatus.Default): Result = {
    require(deployTimes.nonEmpty, "runDeploy needs at least one deployment time")
    val spark = samples.sparkSession
    import spark.implicits._
    val t = col(timeCol)
    val d15 = 15L * 86400000L
    val yearRef = deployTimes.head.toInstant.atZone(java.time.ZoneOffset.UTC).getYear

    val first = deployTimes.head
    val ext = samples.agg(count(when(
      t >= lit(new Timestamp(first.getTime - d15)) &&
        t <= lit(new Timestamp(first.getTime + d15)), 1))).collect()(0)
    val empty = ext.getLong(0) == 0L
    val manifest = manifestFor(fileNameBase, "deploy", empty)

    val traces = broadcast(deployTimes.zipWithIndex.map { case (dt, i) =>
      (i, new Timestamp(dt.getTime - d15), new Timestamp(dt.getTime + d15),
        yearRef - dt.toInstant.atZone(java.time.ZoneOffset.UTC).getYear)
    }.toDF("trace", "lo", "hi", "year_diff"))

    val tagged = samples.join(traces, t >= col("lo") && t <= col("hi"))
      .select(col("trace"), col("year_diff"), t.as("st"),
        col(valueCol).cast("double").as("v"))
    val legend = legendFor(tagged)
    val data = tagged.join(broadcast(legend), "trace")
      .select(col("trace"), col("year_diff"), col("legend"),
        (col("st") + make_dt_interval(col("year_diff") * lit(365))).as("plot_time"),
        col("v").as("value"))
    Result(data, manifest, status)
  }

  /** Per-depth fan-out: one plot per configured depth, data columns
    * (depth, trace, legend, plot_time, value). `depths = Nil` means a
    * "Single"-depth site: no pressure masking, no name suffix.
    */
  def runDepths(samples: DataFrame, timeCol: String, valueCol: String,
                pressCol: String, depths: Seq[Int],
                timeRef: Timestamp, spanDays: Int,
                fileNameBase: String, spanString: String,
                status: String = graft.sources.OperationalStatus.Default): Result = {
    val spark = samples.sparkSession
    import spark.implicits._
    val spanMs = spanDays * 86400000L
    val startDate = new Timestamp(timeRef.getTime - spanMs)
    val t = col(timeCol)

    // one pass: dataset-wide first year (time machine depth) + window count
    // (the empty-slice check uses the depth-agnostic time axis, see doc)
    val ext = samples.agg(
      min(year(t)),
      count(when(t >= lit(startDate) && t <= lit(timeRef), 1))).collect()(0)
    val empty = ext.isNullAt(0) || ext.getLong(1) == 0L
    val refYear = timeRef.toInstant.atZone(java.time.ZoneOffset.UTC).getYear
    val numYears = if (ext.isNullAt(0)) 0 else math.max(0, refYear - ext.getInt(0))

    val baseNames = if (depths.isEmpty) Seq(fileNameBase)
                    else depths.map(d => s"${fileNameBase}_${d}meters")
    val manifest = baseNames.flatMap(b => manifestFor(b, spanString, empty))

    // trace table: k = 0 is the base scatter; k >= 1 the time machine
    val traces = broadcast((0 to numYears).map { k =>
      val hi = new Timestamp(timeRef.getTime - k * 365L * 86400000L)
      (k, new Timestamp(hi.getTime - spanMs), hi)
    }.toDF("trace", "lo", "hi"))

    val tagged = samples.join(traces, t >= col("lo") && t <= col("hi"))
      .select(col("trace"), t.as("st"), col(valueCol).cast("double").as("v"),
        (if (pressCol == null) lit(null).cast("double") else col(pressCol).cast("double")).as("press"))

    // legend per trace from the in-window sample years (depth-agnostic)
    val legend = legendFor(tagged)

    val shifted = tagged.join(broadcast(legend), "trace")
      .select(col("trace"), col("legend"),
        (col("st") + make_dt_interval(col("trace") * lit(365))).as("plot_time"),
        col("v"), col("press"))

    val data =
      if (depths.isEmpty)
        shifted.select(lit(null).cast("int").as("depth"), col("trace"),
          col("legend"), col("plot_time"), col("v").as("value"))
      else {
        val depthsDf = broadcast(depths.toDF("depth"))
        // xarray `.where` without drop: every depth sees every sample,
        // out-of-band values null (plots.py:343-346, strict bounds)
        shifted.crossJoin(depthsDf)
          .select(col("depth"), col("trace"), col("legend"), col("plot_time"),
            when(col("press") > col("depth") &&
              col("press") < col("depth") + lit(0.5), col("v")).as("value"))
      }
    Result(data, manifest, status)
  }
}
