package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pure-JVM kernel tests (no Spark needed). */
class HashKernelsSpec extends AnyFunSuite with Matchers {

  test("shingleHashSet: sorted, distinct, short-doc fallback") {
    val h = HashKernels.shingleHashSet("a b c d", 3)
    h.toSeq shouldBe h.toSeq.sorted
    h.toSet.size shouldBe h.length
    h.length shouldBe 2 // "a b c", "b c d"
    // <= k tokens hash the whole token sequence as one shingle
    HashKernels.shingleHashSet("a b", 3).length shouldBe 1
    // normalization: case/whitespace-insensitive
    HashKernels.shingleHashSet("A  B\tC d", 3) shouldBe HashKernels.shingleHashSet("a b c d", 3)
  }

  test("minHashSig: deterministic, length, monotone under union") {
    val a = HashKernels.shingleHashSet("the quick brown fox jumps", 3)
    val s1 = HashKernels.minHashSig(a, 64)
    val s2 = HashKernels.minHashSig(a, 64)
    s1 shouldBe s2
    s1.length shouldBe 64
    // signature of a superset is element-wise <= (min over more values)
    val b = HashKernels.shingleHashSet("the quick brown fox jumps over lazy dogs", 3)
    val su = HashKernels.minHashSig((a ++ b).distinct, 64)
    su.zip(HashKernels.minHashSig(a, 64)).foreach { case (u, x) => u should be <= x }
  }

  test("identical docs share every band key; band keys are salted per band") {
    val sig = HashKernels.minHashSig(HashKernels.shingleHashSet("x y z w v u", 2), 64)
    val k1 = HashKernels.bandKeys(sig, 16, 4)
    val k2 = HashKernels.bandKeys(sig, 16, 4)
    k1 shouldBe k2
    k1.length shouldBe 16
    // constant signature slices must still produce distinct keys per band
    val const = Array.fill(64)(42L)
    HashKernels.bandKeys(const, 16, 4).toSet.size shouldBe 16
  }

  test("sortedJaccard matches set-based Jaccard on random inputs") {
    val rng = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val xs = Set.fill(rng.nextInt(30))(rng.nextInt(40).toLong)
      val ys = Set.fill(rng.nextInt(30))(rng.nextInt(40).toLong)
      val a = xs.toArray.sorted
      val b = ys.toArray.sorted
      val inter = xs.intersect(ys).size.toDouble
      val uni = xs.union(ys).size.toDouble
      val expected = if (uni == 0) 1.0 else inter / uni
      HashKernels.sortedJaccard(a, b) shouldBe expected +- 1e-12
    }
  }

  test("bucketPairs: n*(n-1)/2 ordered pairs, capped at maxBucket") {
    val p = HashKernels.bucketPairs(Seq(1L, 2L, 3L, 4L), 1024)
    p.length shouldBe 6
    p.foreach { case (a, b) => a should be < b }
    HashKernels.bucketPairs(Seq.tabulate(100)(_.toLong), 10).length shouldBe 45
  }

  test("cosineKernel agrees with the expression version semantics") {
    HashKernels.cosineKernel(Seq(1.0, 2.0, 2.0), Seq(1.0, 2.0, 2.0)).doubleValue shouldBe 1.0 +- 1e-12
    HashKernels.cosineKernel(Seq(1.0, 0.0), Seq(0.0, 1.0)).doubleValue shouldBe 0.0 +- 1e-12
    // zero-norm → null, same as CosineSimilarity expression and the HOF
    HashKernels.cosineKernel(Seq(0.0, 0.0), Seq(1.0, 1.0)) shouldBe null
    HashKernels.cosineKernel(Seq(1.0, 1.0), Seq(0.0, 0.0)) shouldBe null
  }

  test("fingerprint40Udf/simHash40Udf null-guard: null text does not NPE") {
    // the raw kernels require non-null; the UDF wrappers must pass null through
    noException should be thrownBy HashKernels.fingerprint40("x")
    // exercised via Spark in TrainingDataSpec (null doc → null split label)
  }

  test("hashString/mix64 are stable across calls (seeded, no RNG)") {
    HashKernels.hashString("graft") shouldBe HashKernels.hashString("graft")
    HashKernels.mix64(0L) shouldBe HashKernels.mix64(0L)
    HashKernels.hashString("a") should not be HashKernels.hashString("b")
  }
}
