package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Snapshot providers (S5-S10): deployment CSV, profile-index discovery,
  * annotations JSON, camera HTML autoindex parse, sheet tabs — all from a
  * temp snapshot directory, no network.
  */
class ProvidersSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft_snap").toFile
    dir.deleteOnExit()
    def write(rel: String, content: String): Unit = {
      val f = new java.io.File(dir, rel)
      f.getParentFile.mkdirs()
      val w = new java.io.PrintWriter(f)
      w.write(content); w.close(); f.deleteOnExit()
    }
    write("deployment/CE04OSPS_Deploy.csv",
      "Reference Designator,startDateTime,stopDateTime,deploymentNumber\n" +
        "CE04OSPS-SF01B-2A-CTDPFA107,2023-06-01T00:00:00,2024-06-01T00:00:00,7\n" +
        "CE04OSPS-SF01B-2A-CTDPFA107,2024-06-01T00:00:00,,8\n")
    write("profileIndices/CE04OSPS_profiles_2024.csv",
      "start,peak,end\n" +
        "2024-01-16T00:00:00,2024-01-16T12:00:00,2024-01-17T00:00:00\n")
    write("profileIndices/CE04OSPS_profiles_2023.csv",
      "start,peak,end\n" +
        "2023-03-01T00:00:00,2023-03-01T06:00:00,2023-03-01T12:00:00\n")
    write("annotations/CE04OSPS.json",
      """[{"beginDT": 1705363200000, "endDT": 1705449600000, "annotation": "vent plume"},
         {"beginDT": 1705536000000, "endDT": null, "annotation": "biofouling"}]""")
    write("cam/CAMDSB103/2024-01-10.html",
      """<html><body><pre>
        |<a href="/CAMDSB103/">CAMDSB103/</a>
        |<a href="CAMDSB103_img1.jpg">CAMDSB103_img1.jpg</a>   10-Jan-2024 00:00   2.5M
        |<a href="CAMDSB103_img2.jpg">CAMDSB103_img2.jpg</a>   10-Jan-2024 06:00   820K
        |<a href="CAMDSB103_img3.jpg">CAMDSB103_img3.jpg</a>
        |<a href="other.txt">other.txt</a>   10-Jan-2024 07:00   1K
        |</pre></body></html>""".stripMargin)
    write("sheets/HITL/PageOne.csv", "a,b\n1,2\n")
    write("status/operational_status.json",
      """{"CE04OSPS-SF01B-2A-CTDPFA107": "OPERATIONAL",
         |"RS01SBPS-SF01A-2A-CTDPFA102": "FAILED"}""".stripMargin)
    write("corrupt/status/operational_status.json", "not json {{{")
    dir.getAbsolutePath
  }

  private lazy val store = new SnapshotStore(spark, root)

  test("deploymentHistory parses and sorts most-recent-first") {
    val rows = store.deploymentHistory("CE04OSPS").collect()
    rows.length shouldBe 2
    rows(0).getInt(3) shouldBe 8
    rows(0).isNullAt(2) shouldBe true // open-ended deployment
    rows(1).getTimestamp(1) shouldBe ts("2023-06-01 00:00:00")
  }

  test("profileIndex concatenates yearly files sorted by start") {
    val rows = store.profileIndex("CE04OSPS").collect()
    rows.length shouldBe 2
    rows.map(_.getTimestamp(0)).toSeq shouldBe Seq(
      ts("2023-03-01 00:00:00"), ts("2024-01-16 00:00:00"))
  }

  test("annotations parse epoch-ms with nullable end") {
    val rows = store.annotations("CE04OSPS").orderBy("beginDT").collect()
    rows.length shouldBe 2
    rows(0).getString(2) shouldBe "vent plume"
    rows(0).getTimestamp(3) shouldBe ts("2024-01-16 00:00:00")
    rows(1).isNullAt(4) shouldBe true
  }

  test("cameraListing parses autoindex entries, skips first CAM tag, null sizes") {
    val rows = store.cameraListing("CAMDSB103")
      .orderBy("img_name").collect()
    // 4 CAM-href entries on the page; the first is skipped (reference
    // quirk, visual_data.py:59); other.txt has no CAM in href
    rows.length shouldBe 3
    rows.map(_.getString(1)).toSeq shouldBe
      Seq("CAMDSB103_img1.jpg", "CAMDSB103_img2.jpg", "CAMDSB103_img3.jpg")
    rows(0).getString(2) shouldBe "2.5M"
    rows(1).getString(2) shouldBe "820K"
    rows(2).isNullAt(2) shouldBe true // entry without trailing size tokens
    rows.map(_.getDate(0).toString).distinct.toSeq shouldBe Seq("2024-01-10")
  }

  test("sheetTabs reads worksheet snapshots with tab names") {
    val rows = store.sheetTabs("HITL").collect()
    rows.length shouldBe 1
    rows(0).getString(2) shouldBe "PageOne"
  }

  test("operationalStatus parses the snapshot map; statusFor defaults UNAVAILABLE") {
    val m = store.operationalStatus()
    m shouldBe Map(
      "CE04OSPS-SF01B-2A-CTDPFA107" -> "OPERATIONAL",
      "RS01SBPS-SF01A-2A-CTDPFA102" -> "FAILED")
    OperationalStatus.statusFor(m, "CE04OSPS-SF01B-2A-CTDPFA107") shouldBe "OPERATIONAL"
    OperationalStatus.statusFor(m, "CE02SHBP-LJ01D-06-CTDBPN106") shouldBe "UNAVAILABLE"
    OperationalStatus.colorFor("OPERATIONAL") shouldBe "green"
    OperationalStatus.colorFor("UNAVAILABLE") shouldBe "gray"
  }

  test("operationalStatus degrades to empty on missing or corrupt snapshot") {
    // missing: a root with no status dir at all (reference: nereus outage
    // -> empty dict, never an exception, dashboard.py:290-302)
    val missing = new SnapshotStore(spark, root + "/sheets")
    missing.operationalStatus() shouldBe Map.empty
    OperationalStatus.statusFor(missing.operationalStatus(), "ANY") shouldBe "UNAVAILABLE"
    // corrupt: unparseable JSON degrades the same way
    val corrupt = new SnapshotStore(spark, root + "/corrupt")
    corrupt.operationalStatus() shouldBe Map.empty
  }
}
