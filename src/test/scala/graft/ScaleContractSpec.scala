package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the scale-parameterization formulas: the sf anchors MUST
  * reproduce the historical fixed knob values (k = 8, nBits = 4) — a
  * drift here silently changes every golden and oracle row — and the
  * grown scales must grow the knob per contract (occupancy bounded).
  */
class ScaleContractSpec extends AnyFunSuite with Matchers {

  test("semanticClusters reproduces k=8 at every sf anchor") {
    // embeddings row counts: sf0.001 / sf0.01 / sf0.1
    for (n <- Seq(20L, 200L, 2000L))
      ScaleContract.semanticClusters(n) shouldBe 8
  }

  test("semanticClusters grows k ∝ N with occupancy ≤ 250, capped at dim") {
    ScaleContract.semanticClusters(20000L) shouldBe 64   // 10×: capped
    ScaleContract.semanticClusters(200000L) shouldBe 64  // 100×: capped
    ScaleContract.semanticClusters(10000L) shouldBe 40   // ceil(10000/250)
    ScaleContract.semanticClusters(10000L, dim = 128) shouldBe 40
    ScaleContract.semanticClusters(200000L, dim = 1024) shouldBe 800
    // occupancy bound below the cap: N / k ≤ 250
    for (n <- Seq(2001L, 5000L, 9999L, 16000L))
      (n.toDouble / ScaleContract.semanticClusters(n)) should be <= 250.0
  }

  test("semanticMaxCluster: backstop at sf anchors, 4x-occupancy headroom past the k cap") {
    // sf scales: 4 * N/k far below the backstop → unchanged 8192
    for (n <- Seq(20L, 200L, 2000L))
      ScaleContract.semanticMaxCluster(n, ScaleContract.semanticClusters(n)) shouldBe 8192
    // 100×: k capped at 64 → mean occupancy 3125; the measured 2.63×
    // skew cluster (8213) must fit under the 4× headroom (12500)
    val cap100 = ScaleContract.semanticMaxCluster(200000L, 64)
    cap100 shouldBe 12500
    cap100 should be > 8213
  }

  test("lshBits reproduces nBits=4 at every sf anchor, incl. the exact boundary") {
    for (n <- Seq(20L, 200L, 2000L)) ScaleContract.lshBits(n) shouldBe 4
    // N = 2000 is the EXACT power-of-two occupancy boundary (2000/16 =
    // 125): integer shift keeps it at 4 where float log2 could flip
    ScaleContract.lshBits(2000L) shouldBe 4
    // floor semantics: grows at the first N with floor(N/16) > 125
    ScaleContract.lshBits(2015L) shouldBe 4
    ScaleContract.lshBits(2016L) shouldBe 5
  }

  test("lshBits keeps expected occupancy ≤ 125 and is monotone") {
    ScaleContract.lshBits(20000L) shouldBe 8
    ScaleContract.lshBits(200000L) shouldBe 11
    var prev = 0
    for (n <- Seq(100L, 1000L, 2000L, 4000L, 20000L, 200000L, 2000000L)) {
      val b = ScaleContract.lshBits(n)
      (n >> b) should be <= 125L
      b should be >= prev
      prev = b
    }
  }
}
