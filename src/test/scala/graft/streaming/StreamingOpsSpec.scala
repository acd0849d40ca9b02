package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("stateful sessionize matches batch gap-sessionization for watermark-closed sessions") {
    val d = "/root/testdata/sf0.001"
    val gap = 1800L
    val streamed = StreamingOps.runSessionizeAvailableNow(spark, d, gap,
        queryName = "graft_stream_sessions_test")
      .select("userId", "startMs", "endMs", "n")
      .as[(Long, Long, Long, Long)].collect().toSet

    // batch equivalent: per user, split on >gap silence
    val events = graft.sources.Tables.events(spark, d)
      .select(col("user_id"), (unix_micros(col("ts")) / 1000L).cast("long").as("tsMs"), col("event_id"))
      .as[(Long, Long, Long)].collect()
    val maxTs = events.map(_._2).max
    val batchSessions = events.groupBy(_._1).flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
      var start = sorted.head._2; var last = sorted.head._2; var n = 1L
      sorted.tail.foreach { e =>
        if (e._2 - last <= gap * 1000) { last = math.max(last, e._2); n += 1 }
        else { sessions += ((uid, start, last, n)); start = e._2; last = e._2; n = 1 }
      }
      sessions += ((uid, start, last, n))
      sessions
    }.toSet
    // sessions whose close point precedes the final watermark must be
    // emitted; the remainder may legitimately still be open in state
    val mustEmit = batchSessions.filter(s => s._3 + gap * 1000 < maxTs)
    assert(mustEmit.subsetOf(streamed),
      s"missing ${(mustEmit -- streamed).take(3)}")
    assert(streamed.subsetOf(batchSessions),
      s"unexpected ${(streamed -- batchSessions).take(3)}")
  }

  test("bounded stream aggregation matches the batch equivalent exactly") {
    val d = "/root/testdata/sf0.001"
    val streamed = StreamingOps
      .runHourlyTypeAggAvailableNow(spark, d, queryName = "graft_stream_test")
      .orderBy("win_start", "event_type")
      .collect()
    val batch = graft.sources.Tables.events(spark, d)
      .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("win_start", "event_type")
      .collect()
    streamed.length should be > 0
    streamed shouldBe batch
  }

  test("stream-stream interval join matches the batch join") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamingOps
      .runStreamIntervalJoinAvailableNow(spark, dir, "graft_sij_spec")
      .collect().map(_.toSeq).toSet
    val e = graft.sources.Tables.events(spark, dir)
    import org.apache.spark.sql.functions.{col => f, expr}
    val l = e.filter(f("event_type") === "click")
      .select(f("user_id"), f("event_id").as("l_id"), f("ts").as("l_ts"))
    val r = e.filter(f("event_type") === "view")
      .select(f("user_id").as("__ru"), f("event_id").as("r_id"), f("ts").as("r_ts"))
    val batch = l.join(r, l("user_id") === f("__ru") &&
        expr("r_ts >= l_ts AND r_ts <= l_ts + interval 30 minutes"))
      .select("user_id", "l_id", "r_id", "l_ts", "r_ts")
      .collect().map(_.toSeq).toSet
    streamed shouldBe batch
    streamed.nonEmpty shouldBe true
  }

  test("sequenced interval-join replay: watermark EVICTS state mid-stream, batch parity holds") {
    val dir = "/root/testdata/sf0.001"
    // a narrowed horizon (5 min vs the gate's 1 h) tightens the buffered
    // frontier; time-ordered arrival means no row is ever late, so the
    // result must STILL equal the batch join while state drains
    val (df, s) = graft.streaming.StreamingOps.runStreamIntervalJoinSequenced(
      spark, dir, batches = 4, horizon = "5 minutes",
      queryName = "graft_sij_seq_spec")
    val streamed = df.collect().map(_.toSeq).toSet
    val e = graft.sources.Tables.events(spark, dir)
    import org.apache.spark.sql.functions.{col => f, expr}
    val l = e.filter(f("event_type") === "click")
      .select(f("user_id"), f("event_id").as("l_id"), f("ts").as("l_ts"))
    val r = e.filter(f("event_type") === "view")
      .select(f("user_id").as("__ru"), f("event_id").as("r_id"), f("ts").as("r_ts"))
    val batch = l.join(r, l("user_id") === f("__ru") &&
        expr("r_ts >= l_ts AND r_ts <= l_ts + interval 30 minutes"))
      .select("user_id", "l_id", "r_id", "l_ts", "r_ts")
      .collect().map(_.toSeq).toSet
    streamed shouldBe batch
    streamed.nonEmpty shouldBe true
    withClue(s"state summary $s: ") {
      s.dataBatches should be >= 4       // the replay really was multi-batch
      s.removed should be > 0L           // the watermark really evicted state
      s.droppedLate shouldBe 0L          // time-ordered arrival: nothing late
      s.peakRows should be > 0L
      // the sizing contract itself: peak buffered state stays BELOW the
      // whole-corpus burst the single-batch replay would hold
      val inputRows = e.filter(f("event_type").isin("click", "view")).count()
      s.peakRows should be < inputRows
    }
  }

  test("sessionize multi-batch replay (advancing watermark) matches batch gap-sessionization") {
    import org.apache.spark.sql.functions.{col => f, unix_micros}
    val gap = 1800L
    val src = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(f("user_id"), f("ts"), f("event_id"))
    // three non-overlapping time slices, one FILE each, modification
    // times ascending: FileStreamSource replays them in arrival =
    // event-time order, so each micro-batch genuinely advances the
    // watermark (the single-batch parity test never exercises that)
    val Array(c1, c2) = src.select(unix_micros(f("ts")).as("us"))
      .stat.approxQuantile("us", Array(1.0 / 3, 2.0 / 3), 0.0).map(_.toLong)
    val fixture = java.nio.file.Files.createTempDirectory("graft_replay").toFile
    fixture.deleteOnExit()
    val slices = Seq(
      src.filter(unix_micros(f("ts")) <= c1),
      src.filter(unix_micros(f("ts")) > c1 && unix_micros(f("ts")) <= c2),
      src.filter(unix_micros(f("ts")) > c2))
    slices.zipWithIndex.foreach { case (s, i) =>
      val stage = new java.io.File(fixture, s"stage$i")
      s.coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(fixture, f"slice$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + i * 600000L)
    }
    val streamed = graft.streaming.StreamingOps
      .runSessionizeAvailableNow(spark, fixture.getAbsolutePath, gap,
        queryName = "graft_stream_sessions_mb",
        sourceGlob = "slice*.parquet", maxFilesPerTrigger = Some(1))
      .select("userId", "startMs", "endMs", "n")
      .as[(Long, Long, Long, Long)].collect().toSet

    val events = src
      .select(f("user_id"), (unix_micros(f("ts")) / 1000L).cast("long").as("tsMs"),
        f("event_id"))
      .as[(Long, Long, Long)].collect()
    val maxTs = events.map(_._2).max
    val batchSessions = events.groupBy(_._1).flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
      var start = sorted.head._2; var last = sorted.head._2; var n = 1L
      sorted.tail.foreach { e =>
        if (e._2 - last <= gap * 1000) { last = math.max(last, e._2); n += 1 }
        else { sessions += ((uid, start, last, n)); start = e._2; last = e._2; n = 1 }
      }
      sessions += ((uid, start, last, n))
      sessions
    }.toSet
    val mustEmit = batchSessions.filter(s => s._3 + gap * 1000 < maxTs)
    mustEmit.nonEmpty shouldBe true
    assert(mustEmit.subsetOf(streamed),
      s"missing ${(mustEmit -- streamed).take(3)}")
    assert(streamed.subsetOf(batchSessions),
      s"unexpected ${(streamed -- batchSessions).take(3)}")
  }

  test("streaming exact dedup drops in-horizon duplicates, batch-parity on content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup").toFile
    dir.deleteOnExit()
    import spark.implicits._
    // testdata stores each table as a single FILE named <table>.parquet;
    // replicate that layout (the harness globs on the file name)
    val stage = new java.io.File(dir, "stage")
    Seq(
      (0L, "alpha text"), (1L, "beta text"), (2L, "alpha text"),
      (3L, "gamma text"), (4L, "beta text"), (5L, "alpha text"))
      .toDF("doc_id", "text")
      .coalesce(1)
      .write.mode("overwrite").parquet(stage.getAbsolutePath)
    val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(dir, "documents.parquet").toPath)
    val out = graft.streaming.StreamingOps
      .runDedupDocsAvailableNow(spark, dir.getAbsolutePath, "graft_sdedup_spec")
    out.count() shouldBe 3L
    out.select("text").as[String].collect().sorted shouldBe
      Array("alpha text", "beta text", "gamma text")
  }

  test("near-dup ingest gate: sound drops, exact-dup recall, stream/batch parity") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    def words(seed: Int, n: Int): String = {
      val rnd = new scala.util.Random(seed)
      (0 until n).map(_ => s"w${rnd.nextInt(400)}").mkString(" ")
    }
    // 0 and 83 are "planted": their perturbed copies form the reference
    // (the runner's doc_id % 83 == 0 contract); 120 is an EXACT copy of a
    // reference text; the rest are unrelated
    val base = (0 until 120).map(i => (i.toLong, words(i, 40)))
    val exactCopy = (120L, words(0, 40) + " eval item tag")
    val docs = (base :+ exactCopy).toDF("doc_id", "text")
    val reference = docs.filter($"doc_id" % 83 === 0)
      .select(concat($"text", lit(" eval item tag")).as("text"))

    // batch gate: sound drops (every dropped doc really reaches 0.5
    // Jaccard to some reference doc) and jaccard-1 recall (the exact
    // copy of a reference text can never pass)
    val kept = StreamingOps.nearDupGate(docs, reference, "text")
      .select($"doc_id").as[Long].collect().toSet
    kept should not contain 120L
    val dropped = (0L until 121L).toSet -- kept
    val refTexts = reference.as[String].collect()
    def jac(a: String, b: String): Double =
      graft.functions.HashKernels.sortedJaccard(
        tokSh(a), tokSh(b))
    def tokSh(t: String): Seq[Long] = {
      val sh = docs.sparkSession.range(1).toDF()
        .select(graft.operators.Dedup.sortedShingleHashes(lit(t), 3).as("sh"))
        .collect()(0).getAs[scala.collection.Seq[Long]]("sh")
      sh.toSeq
    }
    dropped.foreach { id =>
      val t = base.lift(id.toInt).map(_._2).getOrElse(exactCopy._2)
      withClue(s"doc $id dropped without a qualifying reference: ") {
        refTexts.exists(r => jac(t, r) >= 0.5) shouldBe true
      }
    }
    // the planted sources themselves are near-dups of their perturbed
    // copies (tag-only perturbation on 40 words → jaccard >> 0.5)
    dropped should contain allOf (0L, 83L)

    // streaming replay of the same corpus equals the batch gate
    val dir = java.nio.file.Files.createTempDirectory("graft_sgate").toFile
    dir.deleteOnExit()
    val stage = new java.io.File(dir, "stage")
    docs.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
    val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(dir, "documents.parquet").toPath)
    val streamed = StreamingOps
      .runNearDupGateAvailableNow(spark, dir.getAbsolutePath, "graft_sgate_spec")
      .as[Long].collect().toSet
    streamed shouldBe kept
  }

  test("near-dup gate multi-batch replay (one file per trigger) equals the batch gate") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    def words(seed: Int, n: Int): String = {
      val rnd = new scala.util.Random(seed + 7000)
      (0 until n).map(_ => s"w${rnd.nextInt(300)}").mkString(" ")
    }
    val docs = (0 until 90).map(i => (i.toLong, words(i, 30))).toDF("doc_id", "text")
    val reference = docs.filter($"doc_id" % 31 === 0)
      .select(concat($"text", lit(" bench tag")).as("text"))
    val expected = StreamingOps.nearDupGate(docs, reference, "text")
      .select($"doc_id").as[Long].collect().toSet

    // three slice files, one per micro-batch: the gate is stateless, so
    // batch boundaries and arrival order must not change the verdicts
    val dir = java.nio.file.Files.createTempDirectory("graft_gate_mb").toFile
    dir.deleteOnExit()
    for (b <- 0 until 3) {
      val stage = new java.io.File(dir, s"stage$b")
      docs.filter($"doc_id" % 3 === b).coalesce(1)
        .write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(dir, s"slice$b.parquet").toPath)
    }
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath + "/slice*.parquet")
    val q = StreamingOps.nearDupGate(stream, reference, "text")
      .select($"doc_id")
      .writeStream.format("memory").queryName("graft_gate_mb")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    spark.table("graft_gate_mb").as[Long].collect().toSet shouldBe expected
    withClue("replay must actually have run multiple batches: ") {
      batches should be >= 3
    }
  }

  test("near-dup gate fails fast on a non-broadcast-size reference, naming the batch path") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    val docs = Seq((1L, "incoming text one")).toDF("doc_id", "text")
    val reference = (0 until 25)
      .map(i => s"reference text number $i with words").toDF("text")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.nearDupGate(docs, reference, "text", maxReferenceRows = 10)
    }
    e.getMessage should include("crossCorpusNearDups")
    e.getMessage should include("maxReferenceRows")
    // at the cap exactly, the gate still runs
    StreamingOps.nearDupGate(docs, reference, "text", maxReferenceRows = 25)
      .count() shouldBe 1L
    // and an "unbounded" cap must not wrap the enforcement limit negative
    // (Int.MaxValue + 1 would plan limit(-2147483648) and fail analysis)
    StreamingOps.nearDupGate(docs, reference, "text",
      maxReferenceRows = Int.MaxValue).count() shouldBe 1L
  }
}
