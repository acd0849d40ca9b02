package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ConfigRegistrySpec extends AnyFunSuite with Matchers {
  import ConfigRegistry._

  private def fixture(name: String): String =
    getClass.getResource(s"/params/$name").getPath

  test("parseCsvLine handles quoted fields and doubled quotes") {
    parseCsvLine("a,b,c") shouldBe Seq("a", "b", "c")
    parseCsvLine("a,\"b,c\",d") shouldBe Seq("a", "b,c", "d")
    parseCsvLine("a,\"\"\"x,y\"\"\",b") shouldBe Seq("a", "\"x,y\"", "b")
    parseCsvLine("a,,b") shouldBe Seq("a", "", "b")
  }

  test("parseListCell unpacks the reference's quoted-list convention") {
    parseListCell("\"a,b,c\"") shouldBe Seq("a", "b", "c")
    parseListCell("None") shouldBe Nil
    parseListCell("") shouldBe Nil
    parseListCell("plain") shouldBe Seq("plain")
  }

  test("loadSites parses the registry, filters by stage, unpacks lists") {
    val all = loadSites(fixture("sites.csv"))
    all.size shouldBe 6
    val s1 = loadSites(fixture("sites.csv"), stage = Some(1))
    s1.size shouldBe 5
    val ctd = s1("SITE-A-CTD01")
    ctd.instrument shouldBe "CTD-FIXED"
    ctd.dataParameters shouldBe Seq("time", "temperature", "pressure", "salinity")
    ctd.nearestNeighbors shouldBe Seq("SITE-B-CTD02")
    ctd.depths shouldBe Nil // "Single" means no per-depth fan-out
    ctd.depthMinMax shouldBe None
    val prof = s1("SITE-C-PROF03")
    prof.depths shouldBe Seq("010", "050", "100")
    prof.depthMinMax shouldBe Some((0.0, 200.0))
    all("SITE-D-ADCP04").decimationAlgo shouldBe "coarsen"
  }

  test("VariableResolver picks the first physical candidate present") {
    val r = loadVariableMap(fixture("variables.csv"))
    r.resolve("temperature", Seq("int_temp", "foo")) shouldBe Some("int_temp")
    r.resolve("temperature", Seq("sea_water_temperature", "int_temp")) shouldBe
      Some("sea_water_temperature") // candidate order wins
    r.resolve("pressure", Seq("bin_depths")) shouldBe Some("bin_depths")
    r.resolve("unmapped_param", Seq("unmapped_param")) shouldBe Some("unmapped_param")
    r.resolve("temperature", Seq("nope")) shouldBe None
  }

  test("loadMaxCoordinateSizes nests per instrument like the reference dict") {
    // qaqc/utils.py:361-366 builds {instrument: {coordinate: max_size}}
    val m = loadMaxCoordinateSizes(fixture("max_coords.csv"))
    m("OPTAA") shouldBe Map("wavelength" -> 92)
    m("ADCP") shouldBe Map("bin" -> 40, "beam" -> 4)
    m.get("NUTNR") shouldBe None
  }

  test("span validation mirrors the per-instrument-class rules") {
    validateSpan("CTD-FIXED", "1") shouldBe true
    validateSpan("CTD-FIXED", "0") shouldBe true // '0' = the deploy span argument
    validateSpan("CAM", "0") shouldBe true
    validateSpan("CAM", "1") shouldBe false
    validateSpan("CAM", "7") shouldBe true
    validateSpan("SPKIR", "365") shouldBe false
    validateSpan("SPKIR", "7") shouldBe true
    validateSpan("OPTAA", "30") shouldBe false
  }

  test("workerFor falls back to the 2cpu/16gb default") {
    val exc = Map(("SITE-A", "365") -> WorkerSize(16, 104))
    workerFor(exc, "SITE-A", "365") shouldBe WorkerSize(16, 104)
    workerFor(exc, "SITE-A", "7") shouldBe DefaultWorker
  }
}
