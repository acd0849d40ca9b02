package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure JVM kernels (no Spark session needed):
  * normalization contracts, output ranges, and determinism invariants
  * that the example-based specs can't sweep.
  */
object KernelProps extends Properties("Kernels") {

  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val ws = Gen.oneOf(" ", "  ", "\t", " \t ")
  private val text: Gen[String] = for {
    words <- Gen.listOfN(8, word)
    seps <- Gen.listOfN(8, ws)
  } yield words.zip(seps).map { case (w, s) => w + s }.mkString

  property("wordNgrams: every gram has exactly n space-joined tokens") =
    forAll(text, Gen.choose(1, 4)) { (t, n) =>
      TextFunctions.wordNgramsKernel(t, n)
        .forall(_.split(" ", -1).length == n)
    }

  property("wordNgrams: distinct, and bounded by token count") =
    forAll(text, Gen.choose(1, 4)) { (t, n) =>
      val grams = TextFunctions.wordNgramsKernel(t, n)
      grams.distinct.length == grams.length && {
        // reference tokenization = the kernel's contract: SQL trim
        // (spaces only) then split KEEPING trailing empties
        val sqlTrimmed = t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        val toks = if (sqlTrimmed.isEmpty) Array.empty[String]
                   else sqlTrimmed.split("\\s+", -1)
        grams.length <= math.max(0, toks.length - n + 1)
      }
    }

  property("wordNgrams: invariant to leading/trailing SPACES (SQL trim)") =
    forAll(text) { t =>
      TextFunctions.wordNgramsKernel("  " + t + " ", 3).toSeq ==
        TextFunctions.wordNgramsKernel(t, 3).toSeq
    }

  property("wordNgrams: case-insensitive") =
    forAll(text) { t =>
      TextFunctions.wordNgramsKernel(t.toUpperCase(java.util.Locale.ROOT), 2).toSeq ==
        TextFunctions.wordNgramsKernel(t, 2).toSeq
    }

  property("fingerprint40: always in [0, 2^40)") =
    forAll(text) { t =>
      val fp = HashKernels.fingerprint40(t)
      fp >= 0L && fp < (1L << 40)
    }

  property("fingerprint40: invariant to leading/trailing spaces and case") =
    forAll(text) { t =>
      HashKernels.fingerprint40(" " + t + "  ") == HashKernels.fingerprint40(t) &&
        HashKernels.fingerprint40(t.toUpperCase(java.util.Locale.ROOT)) ==
          HashKernels.fingerprint40(t)
    }

  private val vec = Gen.listOfN(4, Gen.choose(-10.0, 10.0)).map(_.toArray)

  property("nearestCentroid: returns the true argmin, ties to smaller index") =
    forAll(vec, Gen.nonEmptyListOf(vec)) { (v, cents) =>
      val cs = cents.toArray
      def d2(c: Array[Double]) =
        c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum
      val got = graft.operators.Similarity.nearestCentroid(v, cs)
      val best = cs.map(d2).zipWithIndex.minBy { case (d, i) => (d, i) }._2
      got == best
    }

  property("simHash40: always in [0, 2^40)") =
    forAll(text) { t =>
      val h = HashKernels.simHash40(t)
      h >= 0L && h < (1L << 40)
    }

  property("linearScore: in (0,1), deterministic, space-trim invariant") =
    forAll(text) { t =>
      val w = Array.tabulate(16)(j => ((j * 37) % 21 - 10) / 10.0)
      val s = HashKernels.linearScore(t, 16, w, 0.0)
      val s2 = HashKernels.linearScore("  " + t + " ", 16, w, 0.0)
      (s == null && s2 == null) ||
        (s > 0.0 && s < 1.0 && s == s2)
    }

  property("bpe mergeOnce: concatenation is preserved, length never grows") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "ab", "c"))) { sym =>
      val merged = graft.operators.Bpe.mergeOnce(sym, "a", "b")
      merged.mkString == sym.mkString && merged.length <= sym.length &&
        !merged.iterator.sliding(2).withPartial(false)
          .exists(p => p.head == "a" && p.last == "b")
    }

  property("bpe encodeWord: subwords always reconstruct word + </w>") =
    forAll(word, Gen.listOfN(3, Gen.zip(word, word))) { (w, merges) =>
      graft.operators.Bpe.encodeWord(w, merges).mkString ==
        w + graft.operators.Bpe.EndOfWord
    }

  private val dvec: Gen[List[Double]] =
    Gen.choose(1, 64).flatMap(d =>
      Gen.listOfN(d, Gen.choose(-10.0, 10.0)))

  property("int8Quantize: codes bounded, max saturates, reconstruction <= scale/2") =
    forAll(dvec) { v =>
      val q = VectorFunctions.int8QuantizeKernel(v)
      val zero = v.forall(_ == 0.0)
      q.codes.forall(c => c >= -127L && c <= 127L) &&
        (zero || q.codes.map(math.abs).max == 127L) &&
        (zero || v.zip(q.codes).forall { case (x, c) =>
          math.abs(x - c * q.scale) <= q.scale / 2 + 1e-12
        }) &&
        (!zero || (q.scale == 0.0 && q.codes.forall(_ == 0L)))
    }

  property("l2Normalize: unit norm, parallel to input (non-negative dot)") =
    forAll(dvec) { v =>
      val u = VectorFunctions.l2NormalizeKernel(v)
      if (v.forall(_ == 0.0)) u == null
      else {
        val n = math.sqrt(u.map(x => x * x).sum)
        val dot = v.zip(u).map { case (a, b) => a * b }.sum
        math.abs(n - 1.0) < 1e-9 && dot >= 0.0
      }
    }

  private val toks: Gen[List[String]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")))

  property("windowPairs: count bounded, each pair sorted, no self-pairs") =
    forAll(toks, Gen.choose(1, 4)) { (t, w) =>
      val pairs = TextFunctions.windowPairsKernel(t, w)
      pairs.length <= math.max(0, t.length - 1) * w &&
        pairs.forall { p =>
          val Array(a, b) = p.split(" ", 2)
          a < b
        }
    }

  property("hashProject: additive (P(u+v) = P(u)+P(v)) and output-dim sized") =
    forAll(dvec, Gen.choose(1, 8)) { (v, od) =>
      val u = v.map(_ * 0.5)
      val pu = VectorFunctions.hashProjectKernel(u, od)
      val pv = VectorFunctions.hashProjectKernel(v, od)
      val psum = VectorFunctions.hashProjectKernel(
        u.zip(v).map { case (a, b) => a + b }, od)
      pu.length == od &&
        psum.zip(pu.zip(pv)).forall { case (s, (a, b)) =>
          math.abs(s - (a + b)) <= 1e-9 * (1 + math.abs(s))
        }
    }

  property("mmrSelect: picks independent of candidate list order") =
    forAll(Gen.choose(2, 8), Gen.long) { (n, seed) =>
      val rng = new scala.util.Random(seed)
      val cands = (0 until n).map { i =>
        (i.toLong, rng.nextDouble(),
          Seq.fill(4)(rng.nextDouble() * 2 - 1): Seq[Double])
      }
      val base = VectorFunctions.mmrSelect(0.7, 3, cands)
      val shuffled = VectorFunctions.mmrSelect(0.7, 3, rng.shuffle(cands))
      base == shuffled
    }
}
