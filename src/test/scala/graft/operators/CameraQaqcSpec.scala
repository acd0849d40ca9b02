package graft.operators

import java.sql.Date

import graft.SparkSpec

class CameraQaqcSpec extends SparkSpec {
  import spark.implicits._

  private val d = Date.valueOf("2024-01-10")

  test("classification: decimal-unit sizes to MiB, NaN quirk, CAMHD filter") {
    val listing = Seq(
      (d, "CAMHDA301_a.jpg", "20M"),   // 19.07 MiB -> possibly_blank at 50
      (d, "CAMHDA301_b.jpg", "60M"),   // 57.2 MiB -> not_blank
      (d, "CAMHDA301_c.mp4", "900M"),  // dropped: mp4
      (d, "CAMHDA301_d.md5", "1K"),    // dropped: md5
      (d, "CAMHDA301_e.jpg", "garbage") // unparseable -> NOT blank (NaN quirk)
    ).toDF("date_taken", "img_name", "size")
    val out = CameraQaqc.classify(listing, cutoffMb = 50.0, isCamhd = true)
      .select("img_name", "image_status").as[(String, String)].collect().toMap
    out.size shouldBe 3
    out("CAMHDA301_a.jpg") shouldBe "possibly_blank"
    out("CAMHDA301_b.jpg") shouldBe "not_blank"
    out("CAMHDA301_e.jpg") shouldBe "not_blank" // np.nan < cutoff is False
  }

  test("sizeMb maps binary units and refuses unknown ones (no B-suffix grab)") {
    val sizes = Seq("1 GiB", "2 TB", "512 KiB", "3 XB", "7 PB")
      .toDF("s").select(CameraQaqc.sizeMb(org.apache.spark.sql.functions.col("s")))
      .as[Option[Double]].collect()
    sizes(0).get shouldBe 1024.0 +- 1e-9           // GiB is binary
    sizes(1).get shouldBe (2e12 / 1024 / 1024) +- 1e-3
    sizes(2).get shouldBe 0.5 +- 1e-9
    // unknown units must be null (→ not_blank), NOT parsed as bytes via
    // their trailing 'B'
    sizes(3) shouldBe None
    sizes(4) shouldBe None
  }

  test("dailyWide pivots with both columns and the one-file manifest") {
    val listing = Seq(
      (d, "CAMDS_a.jpg", "1M"),
      (d, "CAMDS_b.jpg", "30M"),
      (Date.valueOf("2024-01-11"), "CAMDS_c.jpg", "40M")
    ).toDF("date_taken", "img_name", "size")
    val r = CameraQaqc.run(listing, cutoffMb = 15.0, isCamhd = false,
      site = "RS01SBPS-CAMDS", spanString = "week")
    val rows = r.data.as[(Date, Long, Long)].collect().sortBy(_._1.getTime)
    rows shouldBe Array((d, 1L, 1L), (Date.valueOf("2024-01-11"), 1L, 0L))
    r.manifest shouldBe Seq("RS01SBPS-CAMDS_week_none_full.png")
  }

  test("HITL taxonomy: platform any-code match and status tables") {
    val notes = Seq(
      ("RS01SLBS-BP01-CTD-1", "Watchlist: drift"),
      ("RS03AXPS-SF01A-OPTAA-2", "OK nominal"),
      ("CE04OSBP-DP01A-ZPLSC-3", "failed - gap")
    ).toDF("label", "note")
    val t = HitlNotes.taxonomy(notes).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // stage + site + platform + status routing
    t should contain(("Stage1", "CTD", "RS01SLBS-BP01-CTD-1"))
    t should contain(("Sites", "RS01SLBS", "RS01SLBS-BP01-CTD-1"))
    t should contain(("Platforms", "BEP", "RS01SLBS-BP01-CTD-1"))
    t should contain(("Platforms", "Seafloor", "RS01SLBS-BP01-CTD-1")) // SLBS code
    t should contain(("Platforms", "Shallow-Profiler", "RS03AXPS-SF01A-OPTAA-2"))
    t should contain(("Status", "Watchlist", "RS01SLBS-BP01-CTD-1"))
    t should contain(("Status", "Failed", "CE04OSBP-DP01A-ZPLSC-3")) // case-insensitive
    t.count(_._1 == "Status") shouldBe 2
  }
}
