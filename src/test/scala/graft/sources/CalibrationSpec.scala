package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C12 calibration assembly (utils.py:55-285): file-backed CSV + .ext
  * loaders, SheetRef resolution, scalar/1-D/2-D coercion with ragged
  * arrays, and deployment-clipped validity windows.
  */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("graft_cal").toFile
    dir.deleteOnExit()
    def write(name: String, content: String): Unit = {
      val f = new java.io.File(dir, name)
      val w = new java.io.PrintWriter(f)
      w.write(content); w.close(); f.deleteOnExit()
    }
    write("ASSET1__20240101.csv",
      "serial,name,value,notes\n" +
        "1,CC_scale,1.5,a scalar\n" +
        "1,CC_wl,\"[400.0, 450.5, 500.0]\",a 1-D array\n" +
        "1,CC_taarray,SheetRef:taarray,a 2-D sheet\n" +
        "1,SERIAL,SN-001,free text\n")
    write("ASSET1__20240301.csv",
      "serial,name,value,notes\n1,CC_scale,2.0,recalibrated\n")
    write("ASSET1__20240101__taarray.ext",
      "1.0,2.0,3.0\n4.0,5.0\n") // ragged on purpose
    dir.getAbsolutePath
  }

  test("calCsvDir parses asset/date from file names, keeps (name, value)") {
    val dir = writeFixture()
    val rows = Calibration.calCsvDir(spark, dir)
      .as[(String, java.sql.Timestamp, String, String)].collect().sortBy(r => (r._2.getTime, r._3))
    rows.map(_._1).distinct shouldBe Array("ASSET1")
    rows.count(_._2 == ts("2024-01-01 00:00:00")) shouldBe 4
    rows.filter(_._3 == "CC_wl").head._4 shouldBe "[400.0, 450.5, 500.0]"
  }

  test("extDir parses ragged 2-D arrays preserving row order") {
    val dir = writeFixture()
    val m = Calibration.extDir(spark, dir)
      .select("asset_uid", "sheet", "mat").collect()(0)
    m.getString(0) shouldBe "ASSET1"
    m.getString(1) shouldBe "taarray"
    m.getSeq[Seq[Double]](2) shouldBe Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))
  }

  test("end-to-end: SheetRef resolution, coercion, windows from files") {
    val dir = writeFixture()
    val coefs = Calibration.calCsvDir(spark, dir)
    val exts = Calibration.extDir(spark, dir)
    val deployments = Seq(
      ("ASSET1", ts("2024-02-01 00:00:00"), ts("2024-06-01 00:00:00")))
      .toDF("asset_uid", "dep_start", "dep_stop")
    val calIndex = coefs.select("asset_uid", "cal_date").distinct()

    val wins = Calibration.validityWindows(deployments, calIndex)
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(_._2.getTime)
    // cal 1 starts before the deployment: clipped to dep_start; valid until cal 2
    wins(0) shouldBe (("ASSET1", ts("2024-01-01 00:00:00"),
      ts("2024-02-01 00:00:00"), ts("2024-03-01 00:00:00")))
    // cal 2 valid until deployment stop
    wins(1) shouldBe (("ASSET1", ts("2024-03-01 00:00:00"),
      ts("2024-03-01 00:00:00"), ts("2024-06-01 00:00:00")))

    val long = Calibration.explodeLong(deployments, calIndex, coefs, exts)
    // ragged 2-D: 3 + 2 elements, no padding row
    val mat = long.filter(col("name") === "CC_taarray")
      .select("row_idx", "col_idx", "value")
      .as[(Int, Int, Double)].collect().sorted
    mat shouldBe Array((0, 0, 1.0), (0, 1, 2.0), (0, 2, 3.0), (1, 0, 4.0), (1, 1, 5.0))
    // 1-D array exploded with null col_idx
    val wl = long.filter(col("name") === "CC_wl")
      .select("row_idx", "value").as[(Int, Double)].collect().sorted
    wl shouldBe Array((0, 400.0), (1, 450.5), (2, 500.0))
    // scalar + string passthrough
    long.filter(col("name") === "CC_scale" && col("cal_date") === ts("2024-03-01 00:00:00"))
      .select("value").as[Double].collect() shouldBe Array(2.0)
    long.filter(col("name") === "SERIAL")
      .select("value_str").as[String].collect() shouldBe Array("SN-001")
  }

  test("windows drop calibrations that never overlap a deployment") {
    val deployments = Seq(
      ("A", ts("2024-05-01 00:00:00"), ts("2024-06-01 00:00:00")))
      .toDF("asset_uid", "dep_start", "dep_stop")
    val calIndex = Seq(
      ("A", ts("2024-01-01 00:00:00")), ("A", ts("2024-02-01 00:00:00")))
      .toDF("asset_uid", "cal_date")
    // cal 1's validity [start, next cal) ends before the deployment begins
    val wins = Calibration.validityWindows(deployments, calIndex)
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, java.sql.Timestamp)].collect()
    wins.map(_._2) shouldBe Array(ts("2024-02-01 00:00:00"))
    // open-ended deployment: window capped at the far-future sentinel
    val open = Seq(("A", ts("2024-01-15 00:00:00"), null.asInstanceOf[java.sql.Timestamp]))
      .toDF("asset_uid", "dep_start", "dep_stop")
    val w2 = Calibration.validityWindows(open, calIndex)
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sortBy(_._2.getTime)
    w2.last._4 shouldBe ts("9999-12-31 23:59:59")
  }
}
