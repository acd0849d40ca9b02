package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "low low low"),
    (2L, "lower lower"),
    (3L, "newest")
  ).toDF("doc_id", "text")

  test("train learns the textbook merge sequence with deterministic tie-breaks") {
    // word freqs: low:3, lower:2, newest:1
    // round 1: (l,o)=5 ties (o,w)=5 -> lexicographic asc picks (l,o)
    // round 2: (lo,w)=5
    // round 3: (low,</w>)=3 beats (low,e)=2,(e,r)=2,(r,</w>)=2
    val merges = Bpe.train(corpus, "text", numMerges = 3)
    merges shouldBe Seq(("l", "o"), ("lo", "w"), ("low", "</w>"))
  }

  test("train is run-to-run deterministic") {
    val a = Bpe.train(corpus, "text", numMerges = 6)
    val b = Bpe.train(corpus, "text", numMerges = 6)
    a shouldBe b
  }

  test("driver and distributed training routes learn identical merge tables") {
    // smallVocabWords = 0 forces the distributed loop; the default takes
    // the in-driver path — the golden gate (q104) needs them bit-equal,
    // tie-breaks included (the corpus fixture exercises a count tie)
    val fast = Bpe.train(corpus, "text", numMerges = 8)
    val dist = Bpe.train(corpus, "text", numMerges = 8, smallVocabWords = 0L)
    fast shouldBe dist
  }

  test("routes agree on non-BMP words (code-point segmentation, not UTF-16)") {
    // 𝕏 (U+1D54F) and 😀 (U+1F600) are astral: a UTF-16 charwise split
    // would shear them into surrogate halves in the driver route while
    // the distributed substring split works on code points — the merge
    // tables would silently diverge at the smallVocabWords threshold
    val astral = Seq(
      (1L, "a𝕏b a𝕏b a𝕏b"),
      (2L, "😀😀x 😀😀x"),
      (3L, "a𝕏 plain")
    ).toDF("doc_id", "text")
    val fast = Bpe.train(astral, "text", numMerges = 6)
    val dist = Bpe.train(astral, "text", numMerges = 6, smallVocabWords = 0L)
    fast shouldBe dist
    // and no merge symbol is a lone surrogate half
    fast.flatMap(m => Seq(m._1, m._2)).foreach { s =>
      s.exists(c => Character.isSurrogate(c) &&
        s.codePoints().count() == s.length) shouldBe false
    }
  }

  test("train stops early when words are fully merged") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // a b </w> -> 2 merges reach the single symbol "ab</w>"; further
    // rounds find no pair
    val merges = Bpe.train(tiny, "text", numMerges = 10)
    merges shouldBe Seq(("a", "b"), ("ab", "</w>"))
  }

  test("encode applies merges in rank order; blank and null are unscorable") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"))
    Bpe.encodeWord("low", merges) shouldBe Seq("low</w>")
    Bpe.encodeWord("lower", merges) shouldBe Seq("low", "e", "r", "</w>")
    Bpe.encodeWord("wool", merges) shouldBe Seq("w", "o", "o", "l", "</w>")
    val out = Bpe.encode(
        Seq((1L, "low lower"), (2L, ""), (3L, null.asInstanceOf[String]))
          .toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .as[(Long, Option[Seq[String]], Int)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, Some(Seq("low</w>", "low", "e", "r", "</w>")), 5))
    out(1) shouldBe ((2L, None, 0))
    out(2) shouldBe ((3L, None, 0))
  }

  test("encoding round-trips: concatenated subwords reconstruct the words") {
    val merges = Bpe.train(corpus, "text", numMerges = 8)
    val words = Seq("low", "lower", "newest", "unseen")
    words.foreach { w =>
      Bpe.encodeWord(w, merges).mkString shouldBe w + Bpe.EndOfWord
    }
  }
}
