package graft.functions.expressions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SpaceSaving heavy-hitters aggregate: exact and partitioning-
  * independent when capacity covers the distinct count (the oracle-gated
  * q145 regime), sound over/under bounds and heavy-item containment when
  * it doesn't (the 100 TB regime).
  */
class ApproxTopItemsSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish stream: token i appears ~N/(i+1) times, shuffled
  private def zipfStream(vocab: Int, n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val raw = (0 until n).map { _ =>
      // inverse-cdf-ish skew: low ids vastly more frequent
      val u = rnd.nextDouble()
      val i = math.min(vocab - 1, (math.pow(vocab + 1.0, u) - 1).toInt)
      s"tok$i"
    }
    rnd.shuffle(raw)
  }

  private def exactCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def run(df: DataFrame, k: Int, cap: Int): Seq[(String, Long, Long)] =
    df.agg(call_function("approx_top_items", col("t"), lit(k), lit(cap)).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.token"), col("e.cnt"), col("e.lb"))
      .as[(String, Long, Long)].collect().toSeq

  test("exact regime equals exact counts under any partitioning") {
    val items = zipfStream(vocab = 200, n = 8000, seed = 11)
    val exact = exactCounts(items)
    val expected = exact.toSeq.map { case (t, c) => (t, c, c) }
      .sortBy { case (t, c, _) => (-c, t) }.take(10)
    for (parts <- Seq(1, 7)) {
      run(items.toDF("t").repartition(parts), k = 10, cap = 1000) shouldBe expected
    }
  }

  test("incremental-min eviction matches the reference full-scan algorithm exactly") {
    // the count-bucket index is a pure data-structure swap: victim choice
    // (min count, lex-largest tie), update, merge, and trim must be
    // byte-identical to the straightforward full-scan spelling
    case class Reversed(s: String) extends Ordered[Reversed] {
      def compare(o: Reversed): Int = o.s.compareTo(s)
    }
    def refAdd(m: scala.collection.mutable.LinkedHashMap[String, (Long, Long)],
               cap: Int, item: String): Unit = m.get(item) match {
      case Some((c, e)) => m(item) = (c + 1, e)
      case None if m.size < cap => m(item) = (1L, 0L)
      case None =>
        val (victim, (vc, _)) = m.toSeq
          .minBy { case (s, (c, _)) => (c, Reversed(s)) }
        m.remove(victim)
        m(item) = (vc + 1, vc)
    }
    val rnd = new scala.util.Random(41)
    for (cap <- Seq(4, 16, 64)) {
      val buf = new SpaceSavingBuffer(cap)
      val ref = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
      (0 until 5000).foreach { _ =>
        val item = s"t${rnd.nextInt(cap * 3)}"
        buf.add(item)
        refAdd(ref, cap, item)
      }
      buf.entries.sortBy(_._1) shouldBe
        ref.toSeq.map { case (s, (c, e)) => (s, c, e) }.sortBy(_._1)
    }
  }

  test("incremental-min merge+trim matches the reference combine rule exactly") {
    // the Agarwal combine: floors added to absent-side items, union
    // trimmed to capacity keeping largest counts (ties: item asc)
    def refMerge(a: Seq[(String, Long, Long)], b: Seq[(String, Long, Long)],
                 cap: Int): Seq[(String, Long, Long)] = {
      def floor(x: Seq[(String, Long, Long)]): Long =
        if (x.size >= cap) x.map(_._2).min else 0L
      val (aF, bF) = (floor(a), floor(b))
      val bMap = b.map(e => e._1 -> e).toMap
      val aKeys = a.map(_._1).toSet
      val combined = a.map { case (s, c, e) =>
        bMap.get(s) match {
          case Some((_, c2, e2)) => (s, c + c2, e + e2)
          case None => (s, c + bF, e + bF)
        }
      } ++ b.collect { case (s, c, e) if !aKeys(s) => (s, c + aF, e + aF) }
      combined.sortBy { case (s, c, _) => (-c, s) }.take(cap)
    }
    val rnd = new scala.util.Random(47)
    for (cap <- Seq(4, 16); trial <- 0 until 5) {
      def fill(n: Int): SpaceSavingBuffer = {
        val buf = new SpaceSavingBuffer(cap)
        (0 until n).foreach(_ => buf.add(s"t${rnd.nextInt(cap * 3)}"))
        buf
      }
      val a = fill(400 + rnd.nextInt(400))
      val b = fill(400 + rnd.nextInt(400))
      val expected = refMerge(a.entries, b.entries, cap).sortBy(_._1)
      a.merge(b)
      withClue(s"cap=$cap trial=$trial: ") {
        a.entries.sortBy(_._1) shouldBe expected
      }
    }
  }

  test("small capacity: bounds hold and heavy items survive the merges") {
    val n = 20000
    val cap = 64
    val items = zipfStream(vocab = 3000, n = n, seed = 23)
    val exact = exactCounts(items)
    val got = run(items.toDF("t").repartition(13), k = cap, cap = cap)
    got should not be empty
    got.foreach { case (t, cnt, lb) =>
      val truth = exact.getOrElse(t, 0L)
      withClue(s"$t cnt=$cnt lb=$lb true=$truth: ") {
        cnt should be >= truth // overestimate only
        lb should be <= truth  // lower bound sound
      }
    }
    // mergeable-summaries containment: anything clearly above N/cap is kept
    val kept = got.map(_._1).toSet
    exact.filter(_._2 > 2L * n / cap).keys.foreach { heavy =>
      withClue(s"heavy item $heavy (true=${exact(heavy)}) missing: ") {
        kept should contain(heavy)
      }
    }
    // and the unambiguous head of the distribution ranks first
    val exactTop = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(3).map(_._1)
    got.take(3).map(_._1) shouldBe exactTop
  }

  test("grouped aggregation keeps per-group state separate") {
    val df = (zipfStream(50, 2000, 5).map(("a", _)) ++
      zipfStream(50, 2000, 6).map(("b", _))).toDF("g", "t")
    val out = df.groupBy(col("g"))
      .agg(call_function("approx_top_items", col("t"), lit(5), lit(500)).as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.token"), col("e.cnt"))
      .as[(String, String, Long)].collect()
    out.groupBy(_._1).keySet shouldBe Set("a", "b")
    val perG = out.groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap)
    val ea = exactCounts(zipfStream(50, 2000, 5))
    perG("a").foreach { case (t, c) => c shouldBe ea(t) }
  }

  test("plans as partial+final object-hash aggregation, not a sort aggregate") {
    val df = zipfStream(50, 500, 9).toDF("t")
      .agg(call_function("approx_top_items", col("t"), lit(5), lit(100)).as("top"))
    val plan = df.queryExecution.executedPlan.toString
    plan should include("ObjectHashAggregate")
    // partial mode before the exchange: the capped summaries merge
    // map-side, so at most `capacity` counters per partition cross the
    // shuffle however large the vocabulary
    plan should include("partial_approx_top_items")
  }

  test("null items are skipped; empty input yields an empty array") {
    val out = Seq(Some("x"), None, Some("x"), Some("y"))
      .toDF("t")
      .agg(call_function("approx_top_items", col("t"), lit(5), lit(10)).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.token"), col("e.cnt"))
      .as[(String, Long)].collect().toSeq
    out shouldBe Seq(("x", 2L), ("y", 1L))
    val empty = Seq.empty[String].toDF("t")
      .agg(call_function("approx_top_items", col("t"), lit(5), lit(10)).as("top"))
      .select(org.apache.spark.sql.functions.size(col("top")))
      .as[Int].collect().head
    empty shouldBe 0
  }
}
