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

  test("positions stay an exact order-consistent permutation at 600k rows (regression: optimizer-dropped sort)") {
    // the failure mode this guards: Catalyst removing the in-partition sort
    // (invisible dependency of the position assignment) only showed up
    // beyond toy sizes, when shuffle-fetch order stopped being in-order
    val df = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.1")
      .withColumn("__ord", col("l_orderkey") * 10 + col("l_linenumber"))
    val got = OrderedPosition.withPosition(df, Nil, Seq("__ord"), "pos")
      .select(col("__ord").cast("long"), col("pos"))
      .as[(Long, Long)].collect()
    got.length shouldBe 600000
    // exact permutation of 0..n-1
    got.map(_._2).sorted.toSeq shouldBe (0L until 600000L)
    // order-consistent: sorting by position must yield nondecreasing keys
    val keysByPos = got.sortBy(_._2).map(_._1)
    keysByPos.toSeq shouldBe keysByPos.toSeq.sorted
    // and identical across a second evaluation (job-to-job determinism
    // of counts; tied keys may permute positions but stay order-consistent)
    val again = OrderedPosition.withPosition(df, Nil, Seq("__ord"), "pos")
      .select(col("pos")).as[Long].collect()
    again.sorted.toSeq shouldBe (0L until 600000L)
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
