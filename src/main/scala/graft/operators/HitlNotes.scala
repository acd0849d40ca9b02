package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITL notes taxonomy (rca_data_tools/qaqc/notes.py:66-173): the QA/QC
  * log's most-recent note per instrument label, fanned out into the
  * dashboard's page tables — by stage, by site, by platform (where a
  * platform matches ANY of its node codes), and by note status — each
  * destined for a `HITL_{page}_{item}.csv` artifact. q54 covers the
  * sheet transpose that produces the (label, note) input; this operator
  * is the page/status fan-out.
  */
object HitlNotes {

  /** notes.py:69-128 — substring matched against the instrument label. */
  val PlotPages: Seq[(String, Seq[String])] = Seq(
    "Stage1" -> Seq("ADCP", "BOTPT", "CTD", "DOFSTA", "DOSTA", "FLCDR", "FLORT",
      "FLNTU", "FLOR", "NUTNR", "PARAD", "PHSEN", "PCO2W", "SPKIR", "VELPT"),
    "Stage2" -> Seq("CAMHD", "OPTAA", "PREST", "THSPH", "TMPSF", "TRHPH", "VEL3D", "ZPLSC"),
    "Stage3" -> Seq("CAMDS", "HPIES", "HYDBB", "HYDLF", "MASSP", "OBSBB", "OBSSP"),
    "Stage4" -> Seq("FLOBNC", "FLOBNM", "OSMOIA", "PPS", "RAS", "D1000"),
    // "CEO2SHBP" (letter O) preserves the reference's OWN typo for
    // CE02SHBP (notes.py:111) — a note labelled with the real site code
    // never matches there either; fixing it here would diverge
    "Sites" -> Seq("CEO2SHBP", "CE04OSBP", "CE04OSPD", "CE04OSPS", "RS01SBPD",
      "RS01SBPS", "RS01SLBS", "RS01SUM1", "RS01SUM2", "RS03AXBS", "RS03AXPD",
      "RS03AXPS", "RS03INT1", "RS03INT2", "RS03CCAL", "RS03ECAL", "RS03ASHS"))

  /** notes.py:131-147 — a platform page item matches any of its codes. */
  val Platforms: Seq[(String, Seq[String])] = Seq(
    "BEP" -> Seq("BP"),
    "Deep-Profiler" -> Seq("DP0"),
    "Shallow-Profiler" -> Seq("SF0"),
    "Shallow-Profiler-200m_Platform" -> Seq("PC0"),
    "Seafloor" -> Seq("SLBS", "SUM1", "SUM2", "AXBS", "INT1", "INT2",
      "CCAL", "ECAL", "ASHS"))

  /** notes.py:164 — matched case-insensitively against the note text. */
  val Statuses: Seq[String] = Seq("Watchlist", "Failed", "Harvest", "Plotting", "Pending")

  /** (label, note) → (page, item, label, note): one row per matching
    * (page, item) table entry plus the status tables. The match spec is a
    * ~60-row broadcast; the notes side streams through one join, so the
    * fan-out parallelizes over notes, not spec entries.
    */
  def taxonomy(notes: DataFrame): DataFrame = {
    val spark = notes.sparkSession
    import spark.implicits._
    val spec = (
      PlotPages.flatMap { case (p, items) => items.map(i => (p, i, Seq(i))) } ++
        Platforms.map { case (p, codes) => ("Platforms", p, codes) })
      .toDF("page", "item", "patterns")
    val byPage = notes.join(broadcast(spec),
        exists(col("patterns"), pat => col("label").contains(pat)))
      .select(col("page"), col("item"), col("label"), col("note"))
    val statusSpec = Statuses.map(s => (s, s.toLowerCase)).toDF("item", "pat")
    val byStatus = notes.join(broadcast(statusSpec),
        lower(col("note")).contains(col("pat")))
      .select(lit("Status").as("page"), col("item"), col("label"), col("note"))
    byPage.unionByName(byStatus)
  }

  /** Artifact names, one per non-empty (page, item) table (notes.py:161,172). */
  def tableNames(taxonomyDf: DataFrame): DataFrame =
    taxonomyDf.select(col("page"), col("item")).distinct()
      .select(format_string("HITL_%s_%s.csv", col("page"), col("item")).as("file"))
}
