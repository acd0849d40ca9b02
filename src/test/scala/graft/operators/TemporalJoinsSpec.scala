package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("intervalJoin tags facts with containing intervals (inclusive bounds)") {
    val facts = Seq(("2024-01-01 12:00:00", 1), ("2024-01-05 00:00:00", 2),
        ("2024-01-02 00:00:00", 3))
      .toDF("t", "id").withColumn("t", col("t").cast("timestamp"))
    val ivs = Seq(("2024-01-01 00:00:00", "2024-01-02 00:00:00", "w1"))
      .toDF("s", "e", "w").withColumn("s", col("s").cast("timestamp"))
      .withColumn("e", col("e").cast("timestamp"))
    val out = TemporalJoins.intervalJoin(facts, "t", ivs, "s", "e")
      .select("id").as[Int].collect().sorted
    out shouldBe Array(1, 3) // boundary t == e included
  }

  test("bucketizedIntervalJoin matches broadcast intervalJoin exactly") {
    val facts = (0 until 500).map(i =>
        (ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"), i))
      .toDF("t", "id")
    val ivs = Seq(
      (ts("2024-01-01 03:00:00"), ts("2024-01-01 06:30:00"), "a"),
      (ts("2024-01-01 20:15:00"), ts("2024-01-01 23:00:00"), "b"))
      .toDF("s", "e", "w")
    val expected = TemporalJoins.intervalJoin(facts, "t", ivs, "s", "e")
      .select("id", "w").as[(Int, String)].collect().sorted
    val got = TemporalJoins.bucketizedIntervalJoin(facts, "t", ivs, "s", "e", 3600)
      .select("id", "w").as[(Int, String)].collect().sorted
    got shouldBe expected
  }

  test("bucketizedIntervalJoin with extraKeys matches the keyed theta join") {
    val facts = (0 until 500).map(i =>
        (ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"), i, s"site${i % 3}"))
      .toDF("t", "id", "site")
    val ivs = Seq(
      (ts("2024-01-01 03:00:00"), ts("2024-01-01 06:30:00"), "a", "site0"),
      (ts("2024-01-01 03:00:00"), ts("2024-01-01 06:30:00"), "b", "site1"),
      (ts("2024-01-01 20:15:00"), ts("2024-01-01 23:00:00"), "c", "site2"))
      .toDF("s", "e", "w", "site")
    val expected = facts.join(ivs,
        facts("site") === ivs("site") &&
          facts("t") >= ivs("s") && facts("t") <= ivs("e"))
      .select("id", "w").as[(Int, String)].collect().sorted
    val got = TemporalJoins.bucketizedIntervalJoin(
        facts, "t", ivs, "s", "e", 3600, extraKeys = Seq("site"))
      .select("id", "w").as[(Int, String)].collect().sorted
    got shouldBe expected
    expected should not be empty
    // the key AND the bucket both ride the JOIN KEYS (not merely the
    // plan text — a regression to bucket-only keys would cross-product
    // per site and still mention 'site' in the scans)
    val plan = TemporalJoins.bucketizedIntervalJoin(
      facts, "t", ivs, "s", "e", 3600, extraKeys = Seq("site"))
      .queryExecution.executedPlan.toString
    val keyedJoin =
      """(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[[^\]]*site#[^\]]*__bucket""".r
    withClue(s"site+bucket not in the join keys of:\n$plan") {
      keyedJoin.findFirstIn(plan).isDefined shouldBe true
    }
  }

  test("overlapJoin: open-ended annotations overlap and clip to window") {
    val win = Seq((ts("2024-01-10 00:00:00"), ts("2024-01-20 00:00:00"), 1))
      .toDF("ws", "we", "wid")
    val annos = Seq(
      (ts("2024-01-05 00:00:00"), Some(ts("2024-01-12 00:00:00")), "a"), // overlaps, clip start
      (ts("2024-01-15 00:00:00"), None, "b"),                           // open-ended
      (ts("2024-01-21 00:00:00"), None, "c"),                           // after window
      (ts("2024-01-01 00:00:00"), Some(ts("2024-01-02 00:00:00")), "d") // before window
    ).toDF("as", "ae", "aid")
    val out = TemporalJoins.overlapJoin(win, "ws", "we", annos, "as", "ae")
      .select("aid", "clip_start", "clip_end")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp)].collect().sortBy(_._1)
    out.map(_._1) shouldBe Array("a", "b")
    out(0)._2 shouldBe ts("2024-01-10 00:00:00")
    out(0)._3 shouldBe ts("2024-01-12 00:00:00")
    out(1)._3 shouldBe ts("2024-01-20 00:00:00")
  }

  test("asOfJoinBackward: latest right row at-or-before, consistent across null columns") {
    val left = Seq(("u", ts("2024-01-01 00:00:10")), ("u", ts("2024-01-01 00:00:25")))
      .toDF("k", "lt")
    val right = Seq(
      ("u", ts("2024-01-01 00:00:05"), Some(1.0), Option.empty[String]),
      ("u", ts("2024-01-01 00:00:10"), Option.empty[Double], Some("b")))
      .toDF("k", "rt", "v1", "v2")
    val out = TemporalJoins.asOfJoinBackward(left, "lt", right, "rt",
        keys = Seq("k"), rightValueCols = Seq("v1", "v2"))
      .orderBy("lt")
      .select("asof_v1", "asof_v2").as[(Option[Double], Option[String])].collect()
    // exact-time match visible; whole row carried (v1 null, not mixed from row 1)
    out(0) shouldBe ((None, Some("b")))
    out(1) shouldBe ((None, Some("b")))
  }

  test("asOfJoinForward: earliest right row at-or-after, tolerance bounds") {
    val left = Seq(
      ("u", ts("2024-01-01 00:00:10")),  // exact-time right match
      ("u", ts("2024-01-01 00:00:12")),  // next right at :20
      ("u", ts("2024-01-01 00:00:30"))). // nothing after
      toDF("k", "lt")
    val right = Seq(
      ("u", ts("2024-01-01 00:00:10"), 1.0),
      ("u", ts("2024-01-01 00:00:20"), 2.0)).toDF("k", "rt", "v")
    val out = TemporalJoins.asOfJoinForward(left, "lt", right, "rt",
        keys = Seq("k"), rightValueCols = Seq("v"))
      .orderBy("lt").select("asof_v").as[Option[Double]].collect()
    out shouldBe Array(Some(1.0), Some(2.0), None)
    val tol = TemporalJoins.asOfJoinForward(left, "lt", right, "rt",
        keys = Seq("k"), rightValueCols = Seq("v"), toleranceSeconds = Some(5L))
      .orderBy("lt").select("asof_v").as[Option[Double]].collect()
    tol shouldBe Array(Some(1.0), None, None) // 8 s gap > 5 s tolerance
  }

  test("asOfJoinNearest: closer side wins, ties backward, per-side tolerance") {
    val left = Seq(
      ("u", ts("2024-01-01 00:00:13")),  // back 3 s vs fwd 7 s → backward
      ("u", ts("2024-01-01 00:00:18")),  // back 8 s vs fwd 2 s → forward
      ("u", ts("2024-01-01 00:00:15")),  // 5 s both ways → tie → backward
      ("u", ts("2024-01-01 00:05:00"))). // nothing within tolerance
      toDF("k", "lt")
    val right = Seq(
      ("u", ts("2024-01-01 00:00:10"), 1.0),
      ("u", ts("2024-01-01 00:00:20"), 2.0)).toDF("k", "rt", "v")
    val out = TemporalJoins.asOfJoinNearest(left, "lt", right, "rt",
        keys = Seq("k"), rightValueCols = Seq("v"), toleranceSeconds = Some(60L))
      .orderBy("lt")
      .select("asof_v", "asof_direction")
      .as[(Option[Double], Option[String])].collect()
    out shouldBe Array(
      (Some(1.0), Some("b")), (Some(1.0), Some("b")),
      (Some(2.0), Some("f")), (None, None))
  }

  test("asOfJoinNearest falls to the other side when one is out of tolerance") {
    val left = Seq(("u", ts("2024-01-01 00:01:00"))).toDF("k", "lt")
    val right = Seq(
      ("u", ts("2024-01-01 00:00:00"), 1.0),   // 60 s back — out of tol
      ("u", ts("2024-01-01 00:01:30"), 2.0)).toDF("k", "rt", "v") // 30 s fwd
    val out = TemporalJoins.asOfJoinNearest(left, "lt", right, "rt",
        keys = Seq("k"), rightValueCols = Seq("v"), toleranceSeconds = Some(45L))
      .select("asof_v", "asof_direction")
      .as[(Option[Double], Option[String])].collect()(0)
    out shouldBe ((Some(2.0), Some("f")))
  }

  test("asOfJoinBackward tolerance is sub-second exact") {
    val left = Seq(("u", ts("2024-01-01 00:00:10.500"))).toDF("k", "lt")
    val right = Seq(("u", ts("2024-01-01 00:00:10.000"), 1.0)).toDF("k", "rt", "v")
    def run(tol: Long) = TemporalJoins.asOfJoinBackward(left, "lt", right, "rt",
        keys = Seq("k"), rightValueCols = Seq("v"), toleranceSeconds = Some(tol))
      .select("asof_v").as[Option[Double]].collect()(0)
    run(0L) shouldBe None    // 0.5 s gap > 0 s tolerance
    run(1L) shouldBe Some(1.0)
  }

  test("validityWindows: lead-based windows, clip, empty dropped") {
    val df = Seq(("a", ts("2024-01-01 00:00:00")), ("a", ts("2024-03-01 00:00:00")))
      .toDF("k", "cal")
    val out = TemporalJoins.validityWindows(df, "k", "cal",
        defaultEnd = lit(ts("2024-12-31 00:00:00")),
        clipLo = Some(lit(ts("2024-02-01 00:00:00"))))
      .select("valid_from", "valid_to")
      .as[(java.sql.Timestamp, java.sql.Timestamp)].collect().sortBy(_._1.getTime)
    out.length shouldBe 2
    out(0)._1 shouldBe ts("2024-02-01 00:00:00") // clipped up
    out(0)._2 shouldBe ts("2024-03-01 00:00:00")
    out(1)._2 shouldBe ts("2024-12-31 00:00:00")
  }

  test("annotationOverlay clips spans, normalizes fractions, keeps one per start line") {
    import org.apache.spark.sql.functions.lit
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val annos = Seq(
      // straddles window start: clipped, x_min 0
      (ts("2023-12-20 00:00:00"), ts("2024-01-11 00:00:00"), "early"),
      // open-ended: runs to the window end
      (ts("2024-01-11 00:00:00"), null.asInstanceOf[java.sql.Timestamp], "open"),
      // same clipped start as "early" (also pre-window): overwrite quirk ->
      // the max-(beginTime, annotation) survivor wins
      (ts("2023-12-25 00:00:00"), ts("2024-01-06 00:00:00"), "later"),
      // entirely outside
      (ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00"), "after"),
      (ts("2023-11-01 00:00:00"), ts("2023-12-01 00:00:00"), "before")
    ).toDF("beginTime", "endTime", "annotation")
    val out = TemporalJoins.annotationOverlay(annos,
        lit("2024-01-01 00:00:00").cast("timestamp"),
        lit("2024-01-21 00:00:00").cast("timestamp"))
      .collect().map(r => (r.getString(2), r.getTimestamp(0), r.getTimestamp(1),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    out.length shouldBe 2
    val later = out.find(_._1 == "later").get
    later._2 shouldBe ts("2024-01-01 00:00:00") // clipped start
    later._4 shouldBe 0.0
    later._5 shouldBe 0.25 // Jan 6 of a 20-day window
    val open = out.find(_._1 == "open").get
    open._3 shouldBe ts("2024-01-21 00:00:00") // open end -> window end
    open._4 shouldBe 0.5
    open._5 shouldBe 1.0
  }
}
