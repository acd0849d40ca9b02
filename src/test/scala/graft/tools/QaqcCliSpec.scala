package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.ConfigRegistry.{SiteConfig, WorkerSize}
import graft.tools.QaqcCli._

/** CLI shell (pipeline.py:195-277): arg guards, prefix folding, stage
  * fan-out, per-site span validity (with the homebrew exemption), worker
  * routing.
  */
class QaqcCliSpec extends AnyFunSuite with Matchers {

  private def site(refDes: String, stage: Int, instrument: String = "CTD-FIXED") =
    refDes -> SiteConfig(refDes, stage, instrument, "f", Nil,
      Seq("time", "temp"), Nil, None, "lttb")

  private val sites = Map(
    site("RS01-CTD", 1), site("RS02-OPTAA", 1),
    site("RS03-CAMDS", 3), site("RS04-PREST", 2))

  test("argument parsing covers the reference's surface") {
    val a = parseArgs(Seq("--stage1", "--run", "--span", "30",
      "--threshold", "1000", "--prefix", "archives/x", "--s3-sync"), "2024-01-01")
    a.map(_.stage1) shouldBe Right(true)
    a.map(_.span) shouldBe Right("30")
    a.map(_.threshold) shouldBe Right(1000)
    parseArgs(Seq("--bogus"), "t").isLeft shouldBe true
  }

  test("malformed --threshold returns Left, not an exception") {
    val r = QaqcCli.parseArgs(Seq("--site", "X", "--threshold", "5e6"), "2024-01-01")
    r.isLeft shouldBe true
    r.left.toOption.get should include("--threshold")
  }

  test("site and stage arguments are mutually exclusive") {
    val args = CliArgs(stage1 = true, site = Some("RS01-CTD"), time = "t")
    buildPlan(args, sites).left.toOption.get should include("Do not use")
  }

  test("homebrew + sync without an archive prefix is refused") {
    val args = CliArgs(site = Some("RS01-CTD"), sync = true,
      homebrewQartod = true, time = "t")
    buildPlan(args, sites).left.toOption.get should include("Refusing to sync")
    // with a prefix it folds into the bucket
    val ok = buildPlan(args.copy(prefix = "archives/internal/x/"), sites)
    ok.toOption.get.head.parameters("s3_bucket") shouldBe
      "qaqc-bucket/archives/internal/x"
  }

  test("unknown site errors with the available list") {
    val e = buildPlan(CliArgs(site = Some("NOPE"), time = "t"), sites)
    e.left.toOption.get should include("not available")
    e.left.toOption.get should include("RS01-CTD")
  }

  test("stage fan-out selects per-stage sites; invalid spans become skips") {
    val plan = buildPlan(
      CliArgs(stage1 = true, stage3 = true, span = "1", time = "t"),
      sites).toOption.get
    plan.map(_.site) shouldBe Seq("RS01-CTD", "RS02-OPTAA", "RS03-CAMDS")
    plan.map(_.staggerSeconds).distinct shouldBe Seq(10)
    // CTD: all spans valid; OPTAA throttled past 7d; CAM has no 1-day span
    plan.find(_.site == "RS01-CTD").get.valid shouldBe true
    plan.find(_.site == "RS03-CAMDS").get.valid shouldBe false
    val p365 = buildPlan(
      CliArgs(stage1 = true, span = "365", time = "t"), sites).toOption.get
    p365.find(_.site == "RS02-OPTAA").get.valid shouldBe false
    // homebrew mode lifts the OPTAA/SPKIRA throttle (pipeline.py:77)
    val hb = buildPlan(
      CliArgs(stage1 = true, span = "365", homebrewQartod = true, time = "t"),
      sites).toOption.get
    hb.find(_.site == "RS02-OPTAA").get.valid shouldBe true
  }

  test("worker routing honors compute exceptions with the 2/16 default") {
    val exc = Map(("RS01-CTD", "365") -> WorkerSize(8, 64))
    val plan = buildPlan(
      CliArgs(stage1 = true, span = "365", time = "t"), sites, exc).toOption.get
    plan.find(_.site == "RS01-CTD").get.worker shouldBe WorkerSize(8, 64)
    plan.find(_.site == "RS02-OPTAA").get.worker shouldBe WorkerSize(2, 16)
  }
}
