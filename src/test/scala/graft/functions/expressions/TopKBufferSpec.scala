package graft.functions.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Property-style tests (seeded random cases) for the hand-rolled bounded
  * top-k heap behind `topk_by_score`: agreement with the sort-take
  * reference, merge order-insensitivity (partial aggregation
  * correctness), and serialization round-trip through the
  * TypedImperativeAggregate codec.
  */
class TopKBufferSpec extends AnyFunSuite with Matchers {

  private def reference(entries: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    entries.filterNot(_._1.isNaN).sortBy { case (s, i) => (-s, i) }.take(k)

  private def randomCases(seed: Long): Seq[(Seq[(Double, Long)], Int)] = {
    val rng = new scala.util.Random(seed)
    (0 until 300).map { _ =>
      val n = rng.nextInt(40)
      val entries = Seq.fill(n) {
        val s = rng.nextInt(6) match {
          case 0 => Double.NaN
          case 1 => 0.0
          case 2 => 1.0
          case _ => rng.nextDouble() * 20.0 - 10.0
        }
        (s, rng.nextInt(30).toLong) // small id range: plenty of score ties
      }
      (entries, 1 + rng.nextInt(12))
    }
  }

  test("add + sortedBestFirst agrees with sort-take, NaN dropped, ties by id") {
    randomCases(41L).foreach { case (entries, k) =>
      val buf = new TopKBuffer(k)
      entries.foreach { case (s, i) => buf.add(s, i) }
      buf.sortedBestFirst shouldBe reference(entries, k)
    }
  }

  test("merge of any split equals the unsplit buffer (partial aggregation)") {
    val rng = new scala.util.Random(42L)
    randomCases(43L).foreach { case (entries, k) =>
      val (l, r) = entries.splitAt(rng.nextInt(entries.length + 1))
      val left = new TopKBuffer(k)
      l.foreach { case (s, i) => left.add(s, i) }
      val right = new TopKBuffer(k)
      r.foreach { case (s, i) => right.add(s, i) }
      left.merge(right)
      left.sortedBestFirst shouldBe reference(entries, k)
    }
  }

  test("serialize/deserialize round-trips through the aggregate codec") {
    randomCases(44L).foreach { case (entries, k) =>
      val agg = TopKByScore(
        org.apache.spark.sql.catalyst.expressions.Literal(1.0),
        org.apache.spark.sql.catalyst.expressions.Literal(1L),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
      val buf = new TopKBuffer(k)
      entries.foreach { case (s, i) => buf.add(s, i) }
      val back = agg.deserialize(agg.serialize(buf))
      back.sortedBestFirst shouldBe buf.sortedBestFirst
    }
  }
}
