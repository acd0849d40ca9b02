package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-able source providers for the reference's driver-fetch loaders
  * (SURVEY §2.1 S5-S10, §7.4.6): every remote resource the reference pulls
  * at query time — deployment CSVs over HTTP, the profile-index discovery
  * page, annotation JSON on object storage, camera-archive HTML listings,
  * HITL spreadsheet tabs — is modeled as a SNAPSHOT DIRECTORY with a fixed
  * layout, so the whole pipeline runs and tests offline and a production
  * deployment only needs a sync job that materializes the same layout.
  *
  * Layout under `root`:
  *  - `deployment/<SITE8>_Deploy.csv`        (ref dashboard.py:231-252)
  *  - `profileIndices/<site>_profiles_<yyyy>.csv` (ref dashboard.py:256-286;
  *    the reference discovers file names by scraping the GitHub HTML page —
  *    a directory listing IS that page's snapshot)
  *  - `annotations/<site>.json`              (ref dashboard.py:49-60)
  *  - `cam/<site>/<yyyy-mm-dd>.html`         (ref visual_data.py:40-83)
  *  - `sheets/<notebook>/<tab>.csv`          (ref notes.py:52-63)
  *
  * All loaders return plain DataFrames; everything downstream (interval
  * joins, pivots, taxonomies) is ordinary engine surface.
  */
class SnapshotStore(spark: SparkSession, root: String) {

  /** S5 deployment history: parsed, sorted like loadDeploymentHistory
    * (most recent first per reference designator, dashboard.py:242).
    */
  def deploymentHistory(site: String): DataFrame =
    spark.read.option("header", "true").csv(s"$root/deployment/${site}_Deploy.csv")
      .select(
        col("Reference Designator").as("referenceDesignator"),
        to_timestamp(col("startDateTime")).as("deployDate"),
        to_timestamp(col("stopDateTime")).as("deployEnd"),
        col("deploymentNumber").cast("int").as("deployNum"))
      .orderBy(col("referenceDesignator").desc, col("deployDate").desc)

  /** S7 profile index: one CSV per year, discovered by listing (the
    * snapshot of the reference's HTML scrape + per-file fetch), parsed and
    * sorted by start (dashboard.py:270-284). Files not matching the
    * `<site>_profiles_<yyyy>.csv` pattern are ignored, like the regex scrape.
    */
  def profileIndex(site: String): DataFrame =
    spark.read.option("header", "true")
      .csv(s"$root/profileIndices/${site}_profiles_*.csv")
      .withColumn("__f", input_file_name())
      .filter(col("__f").rlike(s"${site}_profiles_[0-9]{4}\\.csv$$"))
      .select(
        to_timestamp(col("start")).as("start"),
        to_timestamp(col("peak")).as("peak"),
        to_timestamp(col("end")).as("end"))
      .orderBy(col("start"))

  /** S6 annotations: the site's JSON annotation list
    * (dashboard.py:49-60; entries carry epoch-millisecond beginDT/endDT,
    * endDT nullable — exposed raw plus parsed timestamps).
    */
  def annotations(site: String): DataFrame =
    spark.read.option("multiLine", "true").json(s"$root/annotations/$site.json")
      .select(col("beginDT").cast("long").as("beginDT"),
        col("endDT").cast("long").as("endDT"),
        col("annotation").cast("string").as("annotation"))
      .withColumn("beginTime", timestamp_millis(col("beginDT")))
      .withColumn("endTime", timestamp_millis(col("endDT")))

  /** S8 camera-archive listings: one HTML autoindex snapshot per day.
    * Entries are `<a href="...CAM...">name</a>  date time size`; like the
    * reference (visual_data.py:56-59) only CAM-carrying hrefs count and
    * the FIRST match of each page is skipped, and an entry without the
    * three trailing tokens gets a null size. `date_taken` comes from the
    * snapshot file name.
    */
  def cameraListing(site: String): DataFrame = {
    val entryRe = "<a href=\"[^\"]*CAM[^\"]*\"[^>]*>[^<]+</a>[^<\\n]*"
    val entries = regexp_extract_all(col("value"), lit(entryRe), lit(0))
    val parsed = transform(
      slice(entries, lit(2), greatest(size(entries) - 1, lit(0))),
      e => {
        val trail = trim(regexp_extract(e, "</a>(.*)$", 1))
        val parts = split(trail, "\\s+")
        struct(
          trim(regexp_extract(e, ">([^<]+)</a>", 1)).as("img_name"),
          when(size(parts) >= 3, element_at(parts, 3)).as("size"))
      })
    spark.read.option("wholetext", "true").text(s"$root/cam/$site/*.html")
      .select(to_date(regexp_extract(input_file_name(),
          "([0-9]{4}-[0-9]{2}-[0-9]{2})\\.html$", 1)).as("date_taken"),
        explode(parsed).as("e"))
      .select(col("date_taken"), col("e.img_name").as("img_name"),
        col("e.size").as("size"))
  }

  /** S9/S10 spreadsheet tabs: one CSV snapshot per worksheet
    * (notes.py:52-63); `tab` carries the worksheet name.
    */
  def sheetTabs(notebook: String): DataFrame =
    spark.read.option("header", "true").csv(s"$root/sheets/$notebook/*.csv")
      .withColumn("tab",
        regexp_extract(input_file_name(), "([^/]+)\\.csv$", 1))

  /** S7 operational status: the instrument-status map the reference
    * fetches from the nereus REST endpoint at load time
    * (dashboard.py:290-302) — a single JSON object `{refDes: status}`,
    * snapshotted at `status/operational_status.json`. MUST NEVER raise:
    * the reference degrades a fetch failure to an empty dict (an outage
    * cannot crash the flow), and call sites default missing sites to
    * `'UNAVAILABLE'` (dashboard.py:448,1122,1553) — replicated by
    * [[OperationalStatus.statusFor]]. Driver-side map by design: the
    * payload is one status string per instrument (broadcast-size).
    */
  def operationalStatus(): Map[String, String] =
    try {
      val df = spark.read.option("multiLine", "true")
        .json(s"$root/status/operational_status.json")
      val row = df.collect().headOption
      row match {
        case Some(r) =>
          df.schema.fieldNames.iterator.zipWithIndex.collect {
            case (name, i) if !r.isNullAt(i) && name != "_corrupt_record" =>
              name -> r.get(i).toString
          }.toMap
        case None => Map.empty
      }
    } catch {
      case scala.util.control.NonFatal(_) => Map.empty
    }
}

/** Status vocabulary + plot-title colors for the S7 operational-status
  * map (reference constants.py:46-57); `statusFor` is the degrade rule
  * every reference call site applies (`statusDict.get(site,
  * 'UNAVAILABLE')`, dashboard.py:448).
  */
object OperationalStatus {
  val Default = "UNAVAILABLE"

  val Colors: Map[String, String] = Map(
    "OPERATIONAL" -> "green",
    "FAILED" -> "red",
    "TROUBLESHOOTING" -> "red",
    "RECOVERED" -> "blue",
    "PARTIALLY_FUNCTIONAL" -> "red",
    "OFFLINE" -> "blue",
    "UNCABLED" -> "blue",
    "DATA_QUALITY" -> "red",
    "NOT_DEPLOYED" -> "blue",
    "UNAVAILABLE" -> "gray")

  def statusFor(statusMap: Map[String, String], site: String): String =
    statusMap.getOrElse(site, Default)

  def colorFor(status: String): String = Colors.getOrElse(status, Colors(Default))
}
