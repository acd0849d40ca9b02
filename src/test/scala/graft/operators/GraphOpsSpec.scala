package graft.operators

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000000L

  test("pageRank on a 2-cycle stays exactly uniform") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val out = GraphOps.pageRank(edges, "src", "dst", iterations = 5)
      .as[(String, Long)].collect().toMap
    out shouldBe Map("a" -> S / 2, "b" -> S / 2)
  }

  test("pageRank redistributes dangling mass (hand-computed, 2 iterations)") {
    // a -> b, b dangling. r0 = 5e11, base = (15 * 5e11) div 100 = 7.5e10.
    // iter1: dang=5e11, share=2.5e11; r(a)=7.5e10+85*2.5e11 div 100,
    //        r(b)=7.5e10+85*(5e11+2.5e11) div 100
    // iter2: dang=712500000000, share=356250000000
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val out = GraphOps.pageRank(edges, "src", "dst", iterations = 2)
      .as[(String, Long)].collect().toMap
    out("a") shouldBe 377812500000L
    out("b") shouldBe 622187500000L
    out.values.sum shouldBe S
  }

  test("pageRank driver and distributed routes are bit-identical") {
    // randomized 400-edge digraph with dangling nodes and a hub;
    // smallGraphEdges = 0 forces the distributed loop
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((s"h${rnd.nextInt(40)}", s"h${rnd.nextInt(60)}"))
      .toDF("src", "dst")
    val fast = GraphOps.pageRank(edges, "src", "dst", iterations = 5)
      .as[(String, Long)].collect().toMap
    val dist = GraphOps.pageRank(edges, "src", "dst", iterations = 5,
        smallGraphEdges = 0L)
      .as[(String, Long)].collect().toMap
    fast shouldBe dist
  }

  test("pageRank drops self-loops and duplicate edges, null endpoints never rank") {
    val edges = Seq(("a", "a"), ("a", "b"), ("a", "b"), (null, "b"), ("b", null))
      .toDF("src", "dst")
    val out = GraphOps.pageRank(edges, "src", "dst", iterations = 3)
      .as[(String, Long)].collect().toMap
    out.keySet shouldBe Set("a", "b")
    out("b") should be > out("a")
  }

  test("pageRank is bit-deterministic across parallelism and conserves mass") {
    val edges = (0L until 400L)
      .map(i => (s"h${i % 23}", s"h${(i * 7 + 3) % 29}"))
      .toDF("src", "dst")
    val base = GraphOps.pageRank(edges, "src", "dst", iterations = 10)
      .as[(String, Long)].collect().toMap
    val reshard = GraphOps.pageRank(edges.repartition(7), "src", "dst",
      iterations = 10).as[(String, Long)].collect().toMap
    reshard shouldBe base
    // truncating division leaks at most a few units per edge+node per round
    val total = base.values.sum
    total should be <= S
    total should be > S - 10L * (400L + base.size + 2L)
  }
}
