package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OrderedPositionSpec extends SparkSpec {
  import spark.implicits._

  test("positions match a window-computed row_number per series") {
    val df = (0 until 5000).map { i =>
      (if (i % 3 == 0) "a" else "b", (i * 7919) % 5000, i)
    }.toDF("k", "ord", "tie").repartition(13)
    val got = OrderedPosition.withPosition(df, Seq("k"), Seq("ord", "tie"), "pos")
      .select("k", "ord", "tie", "pos")
      .as[(String, Int, Int, Long)].collect().sortBy(r => (r._1, r._4))
    val expected = got.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2, r._3)).zipWithIndex.map { case (r, i) => (r._1, r._2, r._3, i.toLong) }
    }.toArray.sortBy(r => (r._1, r._4))
    got shouldBe expected
  }

  test("global positions (no keys) are a permutation of 0..n-1 in order") {
    val df = (0 until 1000).map(i => ((i * 31) % 1000, i)).toDF("ord", "tie")
      .repartition(7)
    val got = OrderedPosition.withPosition(df, Nil, Seq("ord"), "pos")
      .select("ord", "pos").as[(Int, Long)].collect().sortBy(_._2)
    got.map(_._2).toSeq shouldBe (0L until 1000L)
    got.map(_._1).toSeq shouldBe got.map(_._1).toSeq.sorted
  }
}
