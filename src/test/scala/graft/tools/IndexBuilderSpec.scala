package graft.tools

import java.nio.file.Files

import graft.SparkSpec

/** Index builder (index.py:20-66): suffix-filtered recursive listing,
  * relative keys, deterministic order, index.json written in place.
  */
class IndexBuilderSpec extends SparkSpec {

  test("createIndex lists artifacts by suffix and writes index.json in place") {
    val root = Files.createTempDirectory("graft_index").toFile
    root.deleteOnExit()
    def touch(rel: String): Unit = {
      val f = new java.io.File(root, rel)
      f.getParentFile.mkdirs()
      f.createNewFile(); f.deleteOnExit()
    }
    touch("QAQC_plots/SITE-A_day_none_full.png")
    touch("QAQC_plots/sub/SITE-B_week_clim_local.svg")
    touch("QAQC_plots/notes.txt") // filtered out
    touch("HITL_notes/HITL_Stage1_CTD.csv")
    touch("HITL_notes/readme.md") // filtered out

    val (plots, hitl) = IndexBuilder.createIndex(spark,
      s"${root.getAbsolutePath}/QAQC_plots", s"${root.getAbsolutePath}/HITL_notes")
    plots shouldBe Seq(
      "SITE-A_day_none_full.png", "sub/SITE-B_week_clim_local.svg")
    hitl shouldBe Seq("HITL_Stage1_CTD.csv")

    val json = new String(Files.readAllBytes(
      new java.io.File(root, "QAQC_plots/index.json").toPath), "UTF-8")
    json shouldBe "[\"SITE-A_day_none_full.png\", \"sub/SITE-B_week_clim_local.svg\"]"
    new java.io.File(root, "HITL_notes/index.json").exists() shouldBe true
    // the index file itself never joins the next index (wrong suffix)
    IndexBuilder.listIndex(spark,
      s"${root.getAbsolutePath}/QAQC_plots", Seq(".png", ".svg")) shouldBe plots
  }
}
