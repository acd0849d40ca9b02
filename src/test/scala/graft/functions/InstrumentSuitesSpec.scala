package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class InstrumentSuitesSpec extends SparkSpec {
  import spark.implicits._

  test("sidelobeDepth follows the Lentz formula") {
    val df = Seq((100.0, 400.0)).toDF("ha", "cell_cm")
    val z = df.select(InstrumentSuites.sidelobeDepth(col("ha"), col("cell_cm")))
      .as[Double].collect()(0)
    // 100*(1-cos20°) + 3*4/2 = 100*0.060307 + 6
    z shouldBe (100.0 * (1 - math.cos(math.toRadians(20))) + 6.0) +- 1e-9
  }

  test("adcpFlags: velocity magnitudes, component OR, and beam votes") {
    val df = Seq(
      // ev, vv, east, north, corr[4], pg[4]
      (0.1, 0.05, 0.5, 0.5, Array(120.0, 120, 120, 120), Array(90.0, 90, 90, 90)), // all pass
      (0.9, 0.05, 0.5, 3.0, Array(120.0, 10, 10, 10), Array(90.0, 90, 10, 10))     // several fail
    ).toDF("ev", "vv", "e", "n", "corr", "pg")
    val flags = Qartod.combineFlags(InstrumentSuites.adcpFlags(
      col("ev"), col("vv"), col("e"), col("n"), col("corr"), col("pg"),
      evFail = 0.5, vvFail = 0.3, hsFail = 2.0, cmPass = 64, pgPass = 21))
    // row 2: ev fails, hs (north) fails, both beam votes fail
    df.select(flags).as[String].collect() shouldBe Array("11111", "31333")
  }

  test("pco2wFlags: blank floor, step tests with first-row false, cal range") {
    val df = Seq(
      // b434, b620, pco2, prev434, prev620, prevPco2, calMin, calMax
      (10000.0, 10000.0, 500.0, Some(9000.0), Some(9000.0), Some(480.0), 200.0, 1200.0),
      (2000.0, 10000.0, 2000.0, Some(9000.0), Some(9000.0), Some(100.0), 200.0, 1200.0),
      (10000.0, 10000.0, 500.0, None: Option[Double], None: Option[Double],
        None: Option[Double], 200.0, 1200.0) // first row: steps false
    ).toDF("b434", "b620", "pco2", "p434", "p620", "ppco2", "lo", "hi")
    val flags = Qartod.combineFlags(InstrumentSuites.pco2wFlags(
      col("b434"), col("b620"), col("pco2"),
      col("p434"), col("p620"), col("ppco2"), col("lo"), col("hi")))
    // row 2: low blank, blank step, pco2 step (1900 > 1600), out of cal range
    df.select(flags).as[String].collect() shouldBe
      Array("1111", "3333", "1111")
  }

  test("presence-conditional composition: tests join only when their columns exist") {
    // FLOR without CDOM -> 2 tests; with CDOM -> 3
    val without = Seq((2000.0, 2000.0)).toDF("raw_signal_beta", "raw_signal_chl")
    val flagsW = Qartod.combineFlags(InstrumentSuites.florFlags(without.columns))
    without.select(flagsW).as[String].collect()(0) shouldBe "11"
    val withCdom = Seq((2000.0, 5000.0, -1.0))
      .toDF("raw_signal_beta", "raw_signal_chl", "raw_signal_cdom")
    val flagsC = Qartod.combineFlags(InstrumentSuites.florFlags(withCdom.columns))
    withCdom.select(flagsC).as[String].collect()(0) shouldBe "133"
  }

  test("vel3dFlags picks the vector vs aquadopp correlation variant by schema") {
    val vector = Seq((10.0, 5.0, 60.0, 40.0, 60.0))
      .toDF("pitch", "roll", "correlation_beam1", "correlation_beam2", "correlation_beam3")
    val names = InstrumentSuites.vel3dFlags(vector.columns).map(_._1)
    names shouldBe Seq("suspect_pitch", "failed_pitch", "suspect_roll",
      "failed_roll", "failed_correlation")
    val flags = Qartod.combineFlags(InstrumentSuites.vel3dFlags(vector.columns))
    // beam2 < 50 -> correlation fails; attitude fine
    vector.select(flags).as[String].collect()(0) shouldBe "11113"
  }

  test("velptFlags thresholds follow the reference") {
    val df = Seq(
      (5.0, 5.0, 1500.0, 10.0),   // all pass
      (25.0, 35.0, 1200.0, -1.0)  // suspect pitch, failed roll (+suspect), sos, pressure
    ).toDF("pitch", "roll", "sos", "press")
    val flags = Qartod.combineFlags(InstrumentSuites.velptFlags(
      col("pitch"), col("roll"), col("sos"), col("press")))
    df.select(flags).as[String].collect() shouldBe Array("111111", "313333")
  }

  test("reshapeColumn extracts a (rows x 4) column from the flat array") {
    val flat = Array.tabulate(12)(_.toDouble) // 3 rows x 4 cols
    val df = Seq(Tuple1(flat)).toDF("a")
    df.select(InstrumentSuites.reshapeColumn(col("a"), 3, 1))
      .as[Seq[Double]].collect()(0) shouldBe Seq(1.0, 5.0, 9.0)
    df.select(InstrumentSuites.reshapeColumn(col("a"), 3, 3))
      .as[Seq[Double]].collect()(0) shouldBe Seq(3.0, 7.0, 11.0)
  }

  test("phFlags: healthy signals pass, low/flat signals flag") {
    def mk(sig: Double => Double): Array[Double] =
      Array.tabulate(92)(i => sig(i.toDouble))
    // healthy: signals ~2000 with variation; references with small jitter
    val healthy = mk { i =>
      val r = (i % 4).toInt match {
        case 0 => 2000.0 + (i % 7)          // ref434, std < 10
        case 1 => 1500.0 + (i % 23) * 30    // sig434, std > 180
        case 2 => 2000.0 + (i % 5)          // ref578
        case _ => 1600.0 + (i % 23) * 30    // sig578
      }
      r
    }
    // sick: flat low signals
    val sick = mk { i =>
      (i % 4).toInt match {
        case 1 | 3 => 100.0 // low AND flat signals
        case _ => 2000.0
      }
    }
    val blanksOk = Array.tabulate(16)(i => (i % 4).toInt match {
      case 1 | 3 => 3000.0
      case _ => 2500.0
    })
    val df = Seq((healthy, blanksOk), (sick, blanksOk)).toDF("light", "blanks")
    val flags = Qartod.combineFlags(InstrumentSuites.phFlags(col("light"), col("blanks")))
    val out = df.select(flags).as[String].collect()
    out(0) shouldBe "111111"
    // low_indicator + flat_indicator + flat_intensity fire; references fine
    out(1) shouldBe "331113"
  }
}
