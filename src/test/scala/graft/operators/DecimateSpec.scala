package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecimateSpec extends SparkSpec {
  import spark.implicits._

  test("strideSample keeps positions 0, k, 2k per series") {
    val df = (0 until 10).map(i => ("a", i)).toDF("k", "x")
    val out = Decimate.strideSample(df, Seq("k"), "x", 3)
      .select("x").as[Int].collect().sorted
    out shouldBe Array(0, 3, 6, 9)
  }

  test("strideSample global path (no keys) gives exact global positions without a global window") {
    val df = (0 until 1003).map(i => (i, s"v$i")).toDF("x", "v").repartition(7)
    val out = Decimate.strideSample(df, Nil, "x", 100)
      .select("x").as[Int].collect().sorted
    out shouldBe (0 until 1003 by 100).toArray
  }

  test("coarsen: fixed-count bucket means, trailing partial bucket trimmed") {
    val df = (0 until 7).map(i =>
        ("a", java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$i"), i.toDouble))
      .toDF("k", "ts", "v")
    val out = Decimate.coarsen(df, Seq("k"), "ts", Seq("v"), window = 3)
      .select("v").as[Double].collect().sorted
    out shouldBe Array(1.0, 4.0) // means of (0,1,2), (3,4,5); row 6 trimmed
  }

  test("lttbKernel: endpoints kept, exact output size, y-values from input") {
    val n = 1000
    val xs = Array.tabulate(n)(_.toDouble)
    val ys = Array.tabulate(n)(i => math.sin(i / 25.0) * 100 + (i % 7))
    val out = Decimate.lttbKernel(xs, ys, 50)
    out.length shouldBe 50
    out.head shouldBe ((xs.head, ys.head))
    out.last shouldBe ((xs.last, ys.last))
    val ySet = ys.toSet
    out.foreach { case (_, y) => ySet should contain(y) }
    // x positions are nondecreasing (bucket-middle snap preserves order)
    out.map(_._1).toSeq shouldBe out.map(_._1).toSeq.sorted
  }

  test("lttbKernel matches an independent straightforward implementation") {
    // slow, obviously-correct re-implementation of the reference algorithm:
    // numpy array_split bin sizing, prev-selected/next-centroid triangle,
    // first-tie-wins argmax, bucket-middle x
    def slowLttb(xs: Array[Double], ys: Array[Double], threshold: Int): Array[(Double, Double)] = {
      val n = xs.length
      if (threshold < 3 || n <= threshold) return xs.zip(ys)
      val nBins = threshold - 2
      val sizes = {
        val base = (n - 2) / nBins; val rem = (n - 2) % nBins
        (0 until nBins).map(i => base + (if (i < rem) 1 else 0))
      }
      val starts = sizes.scanLeft(1)(_ + _)
      val out = scala.collection.mutable.ArrayBuffer[(Double, Double)]((xs(0), ys(0)))
      var prev = (xs(0), ys(0))
      for (b <- 0 until nBins) {
        val s = starts(b); val e = starts(b) + sizes(b)
        val (cx, cy) =
          if (b < nBins - 1) {
            val ns = starts(b + 1); val ne = starts(b + 1) + sizes(b + 1)
            ((ns until ne).map(xs).sum / (ne - ns), (ns until ne).map(ys).sum / (ne - ns))
          } else (xs(n - 1), ys(n - 1))
        val best = (s until e).maxBy { j =>
          val area = 0.5 * math.abs((prev._1 - cx) * (ys(j) - prev._2) -
            (prev._1 - xs(j)) * (cy - prev._2))
          (area, -j) // maxBy with -j => first index wins ties
        }
        val middle = s + sizes(b) / 2
        val pt = (xs(middle), ys(best))
        out += pt
        prev = pt
      }
      out += ((xs(n - 1), ys(n - 1)))
      out.toArray
    }
    val rng = new scala.util.Random(31)
    for (trial <- 0 until 20) {
      val n = 50 + rng.nextInt(500)
      val xs = Array.tabulate(n)(_.toDouble)
      val ys = Array.fill(n)(rng.nextInt(50).toDouble) // duplicates force ties
      val t = 3 + rng.nextInt(40)
      withClue(s"trial=$trial n=$n t=$t: ") {
        Decimate.lttbKernel(xs, ys, t).toSeq shouldBe slowLttb(xs, ys, t).toSeq
      }
    }
  }

  test("lttbKernel: short series returned unchanged") {
    val xs = Array(1.0, 2.0, 3.0)
    val ys = Array(9.0, 8.0, 7.0)
    Decimate.lttbKernel(xs, ys, 50).toSeq shouldBe xs.zip(ys).toSeq
  }

  test("downsample caps per-series size then decimates; deterministic with duplicate x") {
    val df = (0 until 5000).map { i =>
      (if (i % 2 == 0) "a" else "b", (i / 10).toDouble, (i % 97).toDouble)
    }.toDF("k", "x", "y")
    def run() = Decimate.downsample(df, "k", "x", "y", threshold = 100)
      .orderBy("k", "x", "y").as[(String, Double, Double)].collect()
    val r1 = run()
    val r2 = run()
    r1 shouldBe r2
    r1.count(_._1 == "a") shouldBe 100
    r1.count(_._1 == "b") shouldBe 100
  }
}
