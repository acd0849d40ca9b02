package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, Array(1.0, 0.0, 0.0, 0.0)),
    (2L, Array(0.9, 0.1, 0.0, 0.0)),
    (3L, Array(0.0, 1.0, 0.0, 0.0)),
    (4L, Array(0.0, 0.0, 1.0, 0.0)),
    (5L, Array(1.0, 0.05, 0.0, 0.0))
  ).toDF("id", "v")

  test("bruteForceTopK returns exact cosine top-k in rank order") {
    val q = Seq((100L, Array(1.0, 0.0, 0.0, 0.0))).toDF("qid", "qv")
    val out = Similarity.bruteForceTopK(corpus, "id", "v", q, "qid", "qv", k = 3)
      .as[(Long, Long, Double)].collect().sortBy(-_._3)
    out.length shouldBe 3
    out(0)._2 shouldBe 1L
    out(0)._3 shouldBe 1.0
    out.map(_._2).toSet shouldBe Set(1L, 5L, 2L) // the three closest
  }

  test("bruteForceTopK handles multiple queries independently") {
    val q = Seq(
      (100L, Array(1.0, 0.0, 0.0, 0.0)),
      (200L, Array(0.0, 0.0, 1.0, 0.0))
    ).toDF("qid", "qv")
    val out = Similarity.bruteForceTopK(corpus, "id", "v", q, "qid", "qv", k = 1)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    out.map(r => (r._1, r._2)) shouldBe Array((100L, 1L), (200L, 4L))
  }

  test("ivfTopK finds the self-match (same vector shares its bucket)") {
    val q = Seq((100L, Array(0.9, 0.1, 0.0, 0.0))).toDF("qid", "qv")
    val out = Similarity.ivfTopK(corpus, "id", "v", q, "qid", "qv",
        dim = 4, k = 5, nBits = 2)
      .as[(Long, Long, Double)].collect()
    out.map(_._2) should contain(2L)
    // results are a subset of the exact ones' ids (bucket pruning only removes)
    val exact = Similarity.bruteForceTopK(corpus, "id", "v", q, "qid", "qv", k = 5)
      .as[(Long, Long, Double)].collect().map(_._2).toSet
    out.map(_._2).toSet.subsetOf(exact) shouldBe true
  }
}
