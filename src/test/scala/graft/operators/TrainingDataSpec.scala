package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is deterministic, content-keyed, and respects fractions roughly") {
    val docs = (0 until 2000).map(i => (i.toLong, s"document body number $i with words"))
      .toDF("doc_id", "text")
    val split = TrainingData.hashSplit(col("text"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = docs.withColumn("s", split).groupBy("s").count()
      .as[(String, Long)].collect().toMap
    counts.keySet shouldBe Set("train", "val", "test")
    counts("train").toDouble / 2000 shouldBe 0.8 +- 0.05
    // same text -> same split regardless of id (content-keyed)
    val twice = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"))
      .toDF("doc_id", "text").withColumn("s", split)
      .select("s").as[String].collect()
    twice(0) shouldBe twice(1)
    // deterministic across runs
    val r1 = docs.withColumn("s", split).select("doc_id", "s")
      .as[(Long, String)].collect().sortBy(_._1)
    val r2 = docs.withColumn("s", split).select("doc_id", "s")
      .as[(Long, String)].collect().sortBy(_._1)
    r1 shouldBe r2
  }

  test("hashSplit: null text gets a null label (and the kernel UDF doesn't NPE)") {
    val docs = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val split = TrainingData.hashSplit(col("text"), Seq("train" -> 0.9, "test" -> 0.1))
    val rows = docs.withColumn("s", split)
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
      .select("doc_id", "s", "fp").as[(Long, Option[String], Option[Long])]
      .collect().sortBy(_._1)
    rows(0)._2.isDefined shouldBe true
    rows(1)._2 shouldBe None
    rows(1)._3 shouldBe None
  }

  test("hashSplit rejects fractions that don't sum to 1") {
    an[IllegalArgumentException] should be thrownBy
      TrainingData.hashSplit(col("text"), Seq("a" -> 0.5, "b" -> 0.2))
  }

  test("packSequences fills consecutive packs of ~capacity tokens per series") {
    val docs = (0 until 100).map(i => ("s1", i.toLong, 10)).toDF("source", "doc_id", "n_tokens")
    val packed = TrainingData.packSequences(docs, Seq("source"), Seq("doc_id"),
      "n_tokens", capacity = 100)
    val perPack = packed.groupBy("pack_id")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("tok"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    perPack.length shouldBe 10
    perPack.foreach { case (_, n, tok) => n shouldBe 10; tok shouldBe 100 }
    // pack_pos is 1..n within each pack
    packed.filter(col("pack_id") === 0).agg(max("pack_pos")).as[Int].collect()(0) shouldBe 10
  }

  test("packSequences keeps a document whole (overshoot, never split)") {
    val docs = Seq(("s", 1L, 60), ("s", 2L, 60), ("s", 3L, 60))
      .toDF("source", "doc_id", "n_tokens")
    val packs = TrainingData.packSequences(docs, Seq("source"), Seq("doc_id"),
        "n_tokens", capacity = 100)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().sortBy(_._1)
    // cums: 60,120,180 -> before: 0,60,120 -> packs 0,0,1
    packs.map(_._2).toSeq shouldBe Seq(0L, 0L, 1L)
  }

  test("chunkByTokens: exact boundaries, overlap, short final chunk") {
    // 25 tokens, window 10, stride 8 → chunks at 0,8,16: 10+10+9 tokens
    val text = (1 to 25).map(i => s"w$i").mkString(" ")
    val out = TrainingData.chunkByTokens(Seq((1L, text)).toDF("id", "text"),
        "text", window = 10, stride = 8)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_tokens", "chunk").as[(Int, Int, String)].collect()
    out.map(c => (c._1, c._2)).toSeq shouldBe Seq((0, 10), (1, 10), (2, 9))
    out(0)._3 shouldBe (1 to 10).map("w" + _).mkString(" ")
    out(1)._3 shouldBe (9 to 18).map("w" + _).mkString(" ")  // 2-token overlap
    out(2)._3 shouldBe (17 to 25).map("w" + _).mkString(" ")
  }

  test("chunkByTokens: short docs yield one whole chunk; blank/null yield none") {
    val df = Seq((1L, "a b c"), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = TrainingData.chunkByTokens(df, "text", window = 10, stride = 10)
      .select("id", "chunk_idx", "n_tokens", "chunk")
      .as[(Long, Int, Int, String)].collect()
    out.toSeq shouldBe Seq((1L, 0, 3, "a b c"))
  }

  test("chunkByTokens covers every token exactly when stride == window") {
    val text = (1 to 100).map("t" + _).mkString(" ")
    val out = TrainingData.chunkByTokens(Seq((1L, text)).toDF("id", "text"),
        "text", window = 7, stride = 7)
      .orderBy("chunk_idx").select("chunk").as[String].collect()
    out.mkString(" ") shouldBe text
    out.length shouldBe 15 // ceil(100/7)
  }

  test("normalizeValues: hand-computed z, winsorization bounds, outlier flags") {
    // group g: values 0..10 — n=11, Σx=55, Σx²=385, mean=5,
    // var=(385−55²/11)/10=11, p05=0.5, p95=9.5
    val df = (0 to 10).map(i => (i.toLong, "g", i.toDouble)).toDF("event_id", "grp", "value")
    val out = TrainingData.normalizeValues(df, "grp", "value", Seq("event_id"))
      .as[(Long, String, Double, Double, Double, Boolean)].collect().sortBy(_._1)
    out.length shouldBe 11
    val z0 = out.head
    z0._4 shouldBe -5.0 / math.sqrt(11.0) +- 1e-6
    z0._5 shouldBe 0.5   // winsorized up to p05
    z0._6 shouldBe true  // below the lower bound
    val z5 = out(5)
    z5._4 shouldBe 0.0
    z5._5 shouldBe 5.0
    z5._6 shouldBe false
    val z10 = out(10)
    z10._5 shouldBe 9.5
    z10._6 shouldBe true
  }

  test("epochOrder: reproducible permutation per epoch, different across epochs") {
    val docs = (0L until 200L).map(Tuple1(_)).toDF("doc_id")
    def order(epoch: Int): Seq[Long] =
      TrainingData.epochOrder(docs, "doc_id", epoch)
        .orderBy("position").select("doc_id").as[Long].collect().toSeq
    val e0a = order(0)
    val e0b = order(0)
    val e1 = order(1)
    e0a shouldBe e0b                      // same epoch → identical order
    e0a should not be e1                  // different epoch → reshuffled
    e0a.sorted shouldBe (0L until 200L)   // a permutation, nothing lost
    e1.sorted shouldBe (0L until 200L)
    // positions are a contiguous 0-based range
    TrainingData.epochOrder(docs, "doc_id", 0)
      .select("position").as[Long].collect().sorted shouldBe (0L until 200L).toArray
  }

  test("quantileBuckets assigns value-based buckets from broadcast thresholds") {
    // 1..4, 2 buckets: p50 = 2.5 → {1,2}→0, {3,4}→1
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("id", "value")
    val out = TrainingData.quantileBuckets(df, "value", 2, Seq("id"))
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    out.map(_._3).toSeq shouldBe Seq(0L, 0L, 1L, 1L)
    // deciles over 1..100: every bucket 0..9 appears, ~10 values each
    val big = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "value")
    val buckets = TrainingData.quantileBuckets(big, "value", 10, Seq("id"))
      .groupBy("bucket").count().as[(Long, Long)].collect().sortBy(_._1)
    buckets.map(_._1).toSeq shouldBe (0L to 9L)
    all(buckets.map(_._2)) should (be >= 9L and be <= 11L)
    // no window anywhere: the plan must not contain a global sort reducer
    val plan = TrainingData.quantileBuckets(big, "value", 10, Seq("id"))
      .queryExecution.executedPlan.toString
    plan should not include "Window"
  }

  test("meanPoolEmbeddings pools element-wise and unit-normalizes") {
    val df = Seq(
      (10L, 1L, Array(1.0, 2.0)),
      (10L, 2L, Array(3.0, 4.0)),
      (20L, 3L, Array(0.0, 0.0))
    ).toDF("doc", "ord", "v")
    val out = TrainingData.meanPoolEmbeddings(df, "doc", "v", "ord")
      .as[(Long, Long, Seq[Double], Option[Seq[Double]])].collect().sortBy(_._1)
    val (d1, n1, p1, u1) = out(0)
    (d1, n1) shouldBe ((10L, 2L))
    p1 shouldBe Seq(2.0, 3.0)
    val nrm = math.sqrt(13.0)
    u1.get(0) shouldBe 2.0 / nrm +- 1e-12
    u1.get(1) shouldBe 3.0 / nrm +- 1e-12
    out(1)._3 shouldBe Seq(0.0, 0.0)
    out(1)._4 shouldBe None // zero-norm pool → null unit, not an error
  }

  test("momentStats: hand-computed population moments from power sums") {
    // values 1..4: μ=2.5, m2=1.25, m3=0, m4=2.5625 →
    // std=√1.25, skew=0, kurt=2.5625/1.5625−3=−1.36
    val df = Seq((1.0, "g"), (2.0, "g"), (3.0, "g"), (4.0, "g"))
      .toDF("value", "grp")
    val out = TrainingData.momentStats(df, "grp", "value")
      .as[(String, Long, Double, Double, Double, Double)].head()
    out._2 shouldBe 4L
    out._3 shouldBe 2.5
    out._4 shouldBe math.sqrt(1.25) +- 1e-6
    out._5 shouldBe 0.0
    out._6 shouldBe -1.36 +- 1e-6
  }

  test("momentStats: zero-variance group yields null skew/kurtosis, std 0") {
    val df = Seq((5.0, "g"), (5.0, "g")).toDF("value", "grp")
    val r = TrainingData.momentStats(df, "grp", "value")
      .selectExpr("std", "skewness IS NULL", "kurtosis IS NULL")
      .as[(Double, Boolean, Boolean)].head()
    r shouldBe ((0.0, true, true))
  }

  test("normalizeValues: singleton and zero-variance groups yield null z, no error") {
    // n=1 → n−1=0; constant group → variance 0: both must null the z
    // rather than divide by zero (ANSI aborts) or sqrt a negative
    val df = Seq((1L, "single", 7.0), (2L, "const", 3.0), (3L, "const", 3.0))
      .toDF("event_id", "grp", "value")
    val out = TrainingData.normalizeValues(df, "grp", "value", Seq("event_id"))
      .selectExpr("event_id", "z IS NULL", "winsorized", "is_outlier")
      .as[(Long, Boolean, Double, Boolean)].collect().sortBy(_._1)
    out.map(_._2).toSeq shouldBe Seq(true, true, true)
    out(0)._3 shouldBe 7.0 // p05 == p95 == the value itself
    out(0)._4 shouldBe false
  }

  test("normalizeValues propagates null values as null z / null verdict") {
    val df = Seq((1L, "g", Some(1.0)), (2L, "g", Some(2.0)), (3L, "g", Some(3.0)),
      (4L, "g", Option.empty[Double]))
      .toDF("event_id", "grp", "value")
    val out = TrainingData.normalizeValues(df, "grp", "value", Seq("event_id"))
    val nulls = out.filter("event_id = 4")
      .selectExpr("z IS NULL", "winsorized IS NULL", "is_outlier IS NULL")
      .as[(Boolean, Boolean, Boolean)].head()
    nulls shouldBe ((true, true, true))
    // stats ignore the null: n=3 not 4
    out.filter("event_id = 2").select("z").as[Double].head() shouldBe 0.0
  }
}
