package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Accuracy bounds for the q108 sketch statistics: the golden pin asserts
  * run-to-run determinism; this asserts the sketches stay NEAR the exact
  * values (HLL++ rsd default 5%; approx_percentile at accuracy 1000 is
  * exact for groups under 1000 values).
  */
class DocsSketchSpec extends SparkSpec {

  test("q108 sketches track the exact statistics") {
    val rows = graft.SparkEntry.queries("q108_sketch_stats")(
        spark, "/root/testdata/sf0.001")
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      val exactD = r.getAs[Long]("exact_distinct").toDouble
      val approxD = r.getAs[Long]("approx_distinct").toDouble
      // default rsd 5% is an ASYMPTOTIC bound; tiny groups (tens of
      // values at sf0.001) see proportionally larger wobble
      approxD shouldBe exactD +- math.max(5.0, exactD * 0.20)
      // exact percentile INTERPOLATES the even-cardinality middle while
      // approx_percentile returns an actual element — assert proximity,
      // not equality (equality would only hold for odd-sized groups)
      val ep50 = r.getAs[Double]("exact_p50")
      r.getAs[Double]("approx_p50") shouldBe ep50 +- math.max(1.0, ep50 * 0.25)
    }
  }
}
