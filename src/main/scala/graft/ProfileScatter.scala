package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Port of the reference's profiler-scatter query
  * (rca_data_tools/qaqc/dashboard.py:1080-1495, golden-tested by
  * tests/test_plotProfilesScatter.py): the engine's deliverable is the
  * plot-DATA table plus the deterministic artifact manifest; rendering
  * stays a thin client (SURVEY §2.2 K1).
  *
  * Semantics preserved from the reference (day/week/month/year spans):
  *  - window = [timeRef − span, timeRef] (dashboard.py:1423-1426);
  *  - profile mask: start > firstSample−5min ∧ end ≤ lastSample+5min
  *    (dashboard.py:1438-1441);
  *  - descent-sampled parameters slice [peak, end], others [start, peak]
  *    (dashboard.py:1116-1121, 186-195);
  *  - scatter Y is negated pressure (dashboard.py:1260);
  *  - plot 000 = all profiles (summary), then one sub-plot per profile
  *    group in peak order, skipping empty groups without consuming an
  *    index (dashboard.py:1444-1495);
  *  - manifest per plot: scales (full, standard, local) outer, overlays
  *    (none, anno, clim, flag) inner; overlay artifacts only when the
  *    plot has data AND that overlay table is non-empty; an empty window
  *    emits exactly the three 000 "none" files (dashboard.py:1427-1432,
  *    save_at_all_scales).
  *
  * Scale shape: samples are never collected — the profile tagging is a
  * broadcast interval join and the plot-data table stays distributed. Only
  * the profile index (broadcast-size by construction: a handful of casts
  * per day) and the 2-value time extent reach the driver.
  */
object ProfileScatter {

  /** `status` is the S7 operational-status string the reference paints
    * into every artifact's title (dashboard.py:1122,1134); the degrade
    * default mirrors `statusDict.get(site, 'UNAVAILABLE')`.
    */
  final case class Result(data: DataFrame, manifest: Seq[String],
                          status: String = graft.sources.OperationalStatus.Default) {
    def statusColor: String = graft.sources.OperationalStatus.colorFor(status)
  }

  private val Scales = Seq("full", "standard", "local")
  private val Overlays = Seq("anno", "clim", "flag")

  def run(samples: DataFrame, timeCol: String, xParam: String, pressParam: String,
          profiles: DataFrame, // (start, peak, end) timestamps
          timeRef: Timestamp, spanDays: Int,
          fileNameBase: String, spanString: String,
          descentSampled: Boolean,
          annoNonEmpty: Boolean, climNonEmpty: Boolean, flagNonEmpty: Boolean,
          status: String = graft.sources.OperationalStatus.Default): Result = {
    val spark = samples.sparkSession
    val startDate = new Timestamp(timeRef.getTime - spanDays * 86400000L)
    val base = samples.filter(col(timeCol) >= lit(startDate) && col(timeCol) <= lit(timeRef))

    val extent = base.agg(min(col(timeCol)), max(col(timeCol))).collect()(0)
    if (extent.isNullAt(0)) {
      // no data in window: three "none" artifacts for plot 000, no data
      // rows — but with the ADVERTISED (plot_idx, x, y, z) schema, so
      // consumers projecting those columns don't fail only on this branch
      val manifest = Scales.map(s => s"${fileNameBase}_000profile_${spanString}_none_$s.png")
      val emptyData = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("plot_idx",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("x",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("y",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("z",
            org.apache.spark.sql.types.TimestampType))))
      return Result(emptyData, manifest, status)
    }
    val maskStart = new Timestamp(extent.getTimestamp(0).getTime - 5 * 60000L)
    val maskEnd = new Timestamp(extent.getTimestamp(1).getTime + 5 * 60000L)

    // profile index is broadcast-size; the five-minute mask mirrors the
    // reference's guard against profiles straddling the data extent
    val inWindow = profiles
      .filter(col("start") > lit(maskStart) && col("end") <= lit(maskEnd))
    val sliceLo = if (descentSampled) "peak" else "start"
    val sliceHi = if (descentSampled) "end" else "peak"

    val tagged = base.join(
        broadcast(inWindow),
        col(timeCol) >= col(sliceLo) && col(timeCol) <= col(sliceHi))
      .select(col("peak"),
        col(xParam).as("x"),
        // `+ 0.0` normalizes IEEE -0.0 (from negating a 0.0 pressure) to 0.0
        // so downstream bit-level compares treat surface rows consistently
        (-col(pressParam) + lit(0.0)).as("y"),
        col(timeCol).as("z"))

    // per-profile row counts: one tiny agg — drives plot numbering exactly
    // like the reference (empty groups produce no plot and no index)
    val counts = tagged.groupBy(col("peak")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).sortBy(_._1.getTime)
    // groupBy only emits groups with ≥1 row, so every collected peak is
    // non-empty by construction (empty profiles were dropped by the join)
    val nonEmptyPeaks = counts.map(_._1)

    // sub-plot grouping per span (reference group_profiles_by_span,
    // dashboard.py:1277-1296): day → one plot per profile; week → per
    // calendar day; month → per ISO (year, week); else per (year, month)
    def groupOf(p: Timestamp): (Int, Int, Int) = {
      // explicit UTC: toLocalDateTime uses the JVM default timezone, which
      // would shift day/week/month membership near boundaries on non-UTC
      // drivers (the reference groups in UTC)
      val ld = p.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      if (spanString.contains("day")) (0, 0, nonEmptyPeaks.indexWhere(_ == p))
      else if (spanString.contains("week")) (ld.getYear, ld.getMonthValue, ld.getDayOfMonth)
      else if (spanString.contains("month")) {
        val iso = java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR
        val isoYear = java.time.temporal.IsoFields.WEEK_BASED_YEAR
        (ld.get(isoYear), ld.get(iso), 0)
      } else (ld.getYear, ld.getMonthValue, 0)
    }
    val groupsOrdered = nonEmptyPeaks.map(groupOf).distinct.sorted
    val groupIdxOf: Map[(Int, Int, Int), Int] = groupsOrdered.zipWithIndex.toMap
    val peakIdx = nonEmptyPeaks.map(p => p -> (groupIdxOf(groupOf(p)) + 1)).toMap
    val idxDf = broadcast(
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          peakIdx.toSeq.map { case (p, i) =>
            org.apache.spark.sql.Row(p, i)
          }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("peak",
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("plot_idx",
            org.apache.spark.sql.types.IntegerType)))))
    // plot 0 = summary over all profiles; plots 1..n per group — one pass:
    // each tagged row explodes into its group plot and the summary plot
    val data = tagged.join(idxDf, "peak")
      .select(explode(array(col("plot_idx"), lit(0))).as("plot_idx"),
        col("x"), col("y"), col("z"))

    val overlaysPresent = Overlays.filter {
      case "anno" => annoNonEmpty
      case "clim" => climNonEmpty
      case "flag" => flagNonEmpty
    }
    def files(idx: Int, withOverlays: Boolean): Seq[String] =
      Scales.flatMap { s =>
        val baseName = f"${fileNameBase}_$idx%03dprofile_${spanString}_none_$s.png"
        if (withOverlays)
          baseName +: overlaysPresent.map(o =>
            f"${fileNameBase}_$idx%03dprofile_${spanString}_${o}_$s.png")
        else Seq(baseName)
      }
    val summaryHasData = nonEmptyPeaks.nonEmpty
    val manifest =
      files(0, summaryHasData) ++
        groupsOrdered.indices.flatMap(i => files(i + 1, withOverlays = true))
    Result(data, manifest, status)
  }
}
