package graft.sources

import scala.io.Source

/** Config registry (SURVEY §7.1 step 1 / §2.1 S3): the reference drives all
  * "schemas" from CSV config — a sites registry with quoted-list fields
  * (rca_data_tools/qaqc/params/sitesDictionary.csv, loaded at
  * qaqc/constants.py:67-79), a canonical→physical variable map
  * (params/variableMap.csv, constants.py:81), span validation per
  * instrument class (qaqc/pipeline.py:75-84, constants.py:26-44), and
  * per-(site, span) compute routing (qaqc/pipeline.py:151-160).
  *
  * Everything here is driver-side: registries are a few hundred rows and
  * feed broadcast joins / plan construction, never a distributed scan.
  */
object ConfigRegistry {

  /** One sites-registry row. `dataParameters` etc. are already unpacked
    * from the reference's quoted `"""a,b,c"""` cells.
    */
  final case class SiteConfig(refDes: String, stage: Int, instrument: String,
                              storeFile: String, nearestNeighbors: Seq[String],
                              dataParameters: Seq[String], depths: Seq[String],
                              depthMinMax: Option[(Double, Double)],
                              decimationAlgo: String)

  /** Minimal RFC-4180-ish CSV line parser (quoted fields, doubled quotes). */
  private[sources] def parseCsvLine(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else inQuotes = false
        } else cur += c
      } else c match {
        case '"' => inQuotes = true
        case ',' => out += cur.result(); cur.clear()
        case other => cur += other
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  /** The reference's quoted-list cell convention: a cell parsed to
    * `"a,b,c"` (quotes kept after CSV unquoting, because the raw cell was
    * `"""a,b,c"""`) or the literal `None`. Mirrors the strip-quotes +
    * split(",") at qaqc/plots.py:143 and qaqc/pipeline.py:113-117.
    */
  private[sources] def parseListCell(cell: String): Seq[String] = {
    val stripped = cell.stripPrefix("\"").stripSuffix("\"").trim
    if (stripped.isEmpty || stripped == "None") Nil
    else stripped.split(",").map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def readCsv(path: String): Seq[Map[String, String]] = {
    val src = Source.fromFile(path)
    try {
      val lines = src.getLines().filter(_.nonEmpty).toList
      val header = parseCsvLine(lines.head)
      lines.tail.map(l => header.zip(parseCsvLine(l)).toMap)
    } finally src.close()
  }

  /** Load the sites registry; `stage = None` keeps all rows (the reference
    * builds SITES_DICT per stage, constants.py:74-77).
    */
  def loadSites(path: String, stage: Option[Int] = None): Map[String, SiteConfig] = {
    val rows = readCsv(path).map { r =>
      val mm = parseListCell(r("depthMinMax")).map(_.toDouble)
      SiteConfig(
        refDes = r("refDes"),
        stage = r("stage").toInt,
        instrument = r("instrument"),
        storeFile = r("storeFile"),
        nearestNeighbors = parseListCell(r("nearestNeighbors")),
        dataParameters = parseListCell(r("dataParameters")),
        depths = parseListCell(r("depths")).filterNot(_ == "Single"),
        depthMinMax = if (mm.length == 2) Some((mm(0), mm(1))) else None,
        decimationAlgo = r("decimationAlgo"))
    }
    rows.filter(s => stage.forall(_ == s.stage)).map(s => s.refDes -> s).toMap
  }

  /** Canonical-parameter → physical-variable-name resolver (SURVEY §1.3;
    * variableMap.csv via constants.py:81, applied qaqc/plots.py:220-221).
    */
  final class VariableResolver(mapping: Map[String, Seq[String]]) {
    /** Physical candidates for a canonical name (itself always last-resort). */
    def candidates(canonical: String): Seq[String] =
      mapping.getOrElse(canonical, Nil) :+ canonical
    /** First candidate present among `columns`, if any. */
    def resolve(canonical: String, columns: Seq[String]): Option[String] = {
      val cols = columns.toSet
      candidates(canonical).find(cols.contains)
    }
  }

  /** `maxCoordinateSizes.csv` → instrument → coordinate → max size —
    * the reference's `load_max_coordinate_sizes` (`qaqc/utils.py:361-366`,
    * loaded into `MAX_COORD_SIZES` at `constants.py:113`; a harvester-side
    * cap on extra-dim extents, e.g. OPTAA wavelength ≤ 92 — the same
    * extents the native Zarr source surfaces as `ArrayType` columns).
    */
  def loadMaxCoordinateSizes(path: String): Map[String, Map[String, Int]] =
    readCsv(path)
      .groupBy(_("instrument"))
      .map { case (inst, rows) =>
        inst -> rows.map(r => r("coordinate") -> r("max_size").toInt).toMap
      }

  def loadVariableMap(path: String): VariableResolver =
    new VariableResolver(readCsv(path).map { r =>
      r("parameter") -> parseListCell(r("variableNames"))
    }.toMap)

  /** Span validation per instrument class (qaqc/pipeline.py:75-84):
    * cameras get no 1-day span (constants.py:34-39); heavy optical
    * instruments are throttled to short spans (constants.py:41-44, the
    * in-code FIXME); everything else gets the full set (constants.py:26-32).
    */
  /** span argument → artifact-name span string (constants.py:26-32
    * SPAN_DICT; '0' is the deploy span).
    */
  val SpanStrings: Map[String, String] = Map(
    "1" -> "day", "7" -> "week", "30" -> "month", "365" -> "year", "0" -> "deploy")

  // valid spans are SPAN_DICT KEYS in the reference (pipeline.py:80
  // checks `span not in valid_spans` against the dict) — the deploy span
  // is the ARGUMENT '0'; the string "deploy" is kept as an alias
  val AllSpans: Set[String] = Set("1", "7", "30", "365", "0", "deploy")
  val CamSpans: Set[String] = Set("7", "30", "365", "0", "deploy")
  val HeavySpans: Set[String] = Set("1", "7")
  val HeavyInstruments: Set[String] = Set("SPKIR", "OPTAA")

  def validSpans(instrument: String): Set[String] =
    if (instrument.startsWith("CAM")) CamSpans
    else if (HeavyInstruments.exists(instrument.startsWith)) HeavySpans
    else AllSpans

  def validateSpan(instrument: String, span: String): Boolean =
    validSpans(instrument).contains(span)

  /** Per-(site, span) worker-size routing with a default, mirroring
    * compute_exceptions.yaml + qaqc/pipeline.py:151-160.
    */
  final case class WorkerSize(cpu: Int, memGb: Int)
  val DefaultWorker: WorkerSize = WorkerSize(2, 16)

  def workerFor(exceptions: Map[(String, String), WorkerSize],
                refDes: String, span: String): WorkerSize =
    exceptions.getOrElse((refDes, span), DefaultWorker)
}
