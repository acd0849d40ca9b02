package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkEntry

/** Round-16 pin for the probe query-list derivation (round-15 VERDICT
  * item 1): probe lists must be STRUCTURALLY complete — derived from
  * `SparkEntry.queries`, never assembled by external file/shell plumbing
  * that can lose a row without erroring (the r15 ratio table silently
  * dropped q39_json_extract through a name-contains filter).
  */
class ProbeQueriesSpec extends AnyFunSuite with Matchers {

  test("'all' resolves to EXACTLY the gate surface, sorted") {
    val all = ProbeQueries.resolve("all")
    all.toSet shouldBe SparkEntry.queries.keySet
    all shouldBe all.sorted
    all.size shouldBe SparkEntry.queries.size
  }

  test("explicit CSVs are validated name by name; unknown names ERROR") {
    ProbeQueries.resolve("q01_pricing_summary, q28_minhash_pairs") shouldBe
      Seq("q01_pricing_summary", "q28_minhash_pairs")
    val e = intercept[IllegalArgumentException] {
      ProbeQueries.resolve("q01_pricing_summary,q39_json") // a prefix typo
    }
    e.getMessage should include("q39_json")
    intercept[IllegalArgumentException] { ProbeQueries.resolve(",") }
  }

  test("select is total over a resolved list") {
    val names = ProbeQueries.resolve("all")
    ProbeQueries.select(names).keySet shouldBe names.toSet
  }

  test("parity line accounts for every requested query or fails loudly") {
    ProbeQueries.parityLine(Seq("a", "b", "c"), Seq("a", "b"), Seq("c")) should
      include(""""parity":"OK"""")
    val e = intercept[IllegalArgumentException] {
      ProbeQueries.parityLine(Seq("a", "b", "c"), Seq("a"), Seq("c"))
    }
    e.getMessage should include("b")
  }
}
