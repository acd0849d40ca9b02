package graft.operators

import graft.SparkSpec

class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin equals the unsalted join and spreads the hot key") {
    // pathological skew: 1000 of 1010 rows share one key
    val left = ((0 until 1000).map(i => ("hot", i.toLong)) ++
      (0 until 10).map(i => (s"k$i", i.toLong + 1000))).toDF("key", "event_id")
    val right = (Seq(("hot", "H")) ++ (0 until 10).map(i => (s"k$i", s"V$i")))
      .toDF("key", "payload")
    val salted = ScaleJoins.saltedEquiJoin(left, right, "key",
        saltFactor = 8, entropyCol = "event_id")
      .select("key", "event_id", "payload")
    val plain = left.join(right, "key").select("key", "event_id", "payload")
    salted.collect().toSet shouldBe plain.collect().toSet
    // the salt column must actually split the hot key into several sub-keys
    val saltCard = left.filter($"key" === "hot")
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64($"event_id"),
        org.apache.spark.sql.functions.lit(8L)))
      .distinct().count()
    saltCard should be > 4L
  }

  test("saltedEquiJoin is deterministic across runs (hash salt, not rand)") {
    val left = (0 until 100).map(i => ("k", i.toLong)).toDF("key", "event_id")
    val right = Seq(("k", "v")).toDF("key", "payload")
    val a = ScaleJoins.saltedEquiJoin(left, right, "key", 4, "event_id").collect().toSet
    val b = ScaleJoins.saltedEquiJoin(left, right, "key", 4, "event_id").collect().toSet
    a shouldBe b
  }

  test("identically bucketed tables join with zero exchanges") {
    // tables land in the session's default warehouse (spark-warehouse/,
    // gitignored); DROP TABLE below removes the files
    val facts = (0 until 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "a")
    val dims = (0 until 500).map(i => (i.toLong % 50, s"d$i")).toDF("k", "b")
    ScaleJoins.writeBucketed(facts, "bkt_facts", "k", 8, sortCol = Some("k"))
    ScaleJoins.writeBucketed(dims, "bkt_dims", "k", 8, sortCol = Some("k"))
    try {
      val joined = spark.table("bkt_facts")
        .hint("merge") // force sort-merge so the assertion is about exchanges
        .join(spark.table("bkt_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      plan should not include "Exchange"
      joined.count() shouldBe 10000L // 50 keys x 20 fact x 10 dim rows
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }

  test("bloomPrunedJoin equals the plain join and prunes before the shuffle") {
    val probe = (0 until 10000).map(i => (i.toLong, s"p$i")).toDF("k", "a")
    val build = (0 until 100).map(i => (i.toLong * 97, s"b$i")).toDF("k", "b")
    val plain = probe.join(build, Seq("k"))
      .as[(Long, String, String)].collect().sorted
    val pruned = ScaleJoins.bloomPrunedJoin(probe, build, "k",
        expectedItems = 100, fpp = 0.01)
      .as[(Long, String, String)].collect().sorted
    pruned shouldBe plain
    plain.length shouldBe 100 // every build key 97*i (i<100) < 10000 matches
  }

  test("bloomPrunedJoin on string keys and null probe keys") {
    val probe = Seq(Some("a"), Some("b"), None, Some("zz"))
      .zipWithIndex.map { case (k, i) => (k.orNull, i) }.toDF("k", "i")
    val build = Seq(("a", 1), ("zz", 2)).toDF("k", "j")
    val out = ScaleJoins.bloomPrunedJoin(probe, build, "k",
        expectedItems = 10)
      .select("k").as[String].collect().sorted
    out shouldBe Array("a", "zz")
  }

  test("mmrRerank plans every join as broadcast — the corpus side never shuffles") {
    // the k·Q candidate join-back is explicitly broadcast in mmrRerank;
    // this pins the plan so an AQE size misestimate can never degrade the
    // corpus-sized emb side into a SortMergeJoin/ShuffledHashJoin exchange
    val corpus = (0 until 500)
      .map(i => (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j))))
      .toDF("id", "v")
    val q = Seq((0L, Array.tabulate(8)(j => math.cos(j.toDouble))))
      .toDF("qid", "qv")
    val out = Similarity.mmrRerank(corpus, "id", "v", q, "qid", "qv",
      kCandidates = 10, m = 3, lambda = 0.7)
    val plan = out.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should not include "ShuffledHashJoin"
    out.count() shouldBe 3L
  }
}
