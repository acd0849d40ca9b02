package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface. The reference is batch-only (SURVEY §2.10)
  * — this is the natural streaming extension of its tumbling-window
  * regrouping (A2, qaqc/dashboard.py:1282-1295): `readStream` → watermark →
  * windowed aggregation → sink. Batch/stream parity is the design goal: the
  * same aggregation expressed on a static DataFrame returns identical rows,
  * which is exactly what the DuckDB oracle checks.
  */
object StreamingOps {

  // Shadows functions.round: every oracle-compared column rounds with
  // DuckDB-exact semantics (see graft.functions.Rounding) so half-boundary
  // values hash identically on both engines.
  private def round(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    graft.functions.Rounding.dround(c, scale)

  /** Watermarked tumbling-window aggregation over a streaming DataFrame:
    * count + sum(value) per (window, event_type).
    */
  def hourlyTypeAgg(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Stateful sessionization via `flatMapGroupsWithState` — the custom-state
    * streaming surface: per user, events are folded into gap-based sessions
    * (a new session starts after `gapSeconds` of silence). Emits one row per
    * CLOSED session on event-time timeout; state per key is one open
    * session (bounded).
    *
    * Batch parity: with a bounded AvailableNow run plus final-watermark
    * flush the emitted sessions equal the batch q29-style sessionization.
    */
  def sessionize(events: org.apache.spark.sql.Dataset[SessionEvent],
                 gapSeconds: Long): org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L
    def fn(userId: Long, it: Iterator[SessionEvent],
           state: GroupState[OpenSession]): Iterator[SessionOut] = {
      val sorted = it.toArray.sortBy(e => (e.tsMs, e.eventId))
      var open = state.getOption
      val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
      sorted.foreach { e =>
        open match {
          case Some(s) if e.tsMs - s.lastMs <= gapMs =>
            open = Some(s.copy(lastMs = math.max(s.lastMs, e.tsMs), n = s.n + 1))
          case Some(s) =>
            closed += SessionOut(userId, s.startMs, s.lastMs, s.n)
            open = Some(OpenSession(e.tsMs, e.tsMs, 1))
          case None =>
            open = Some(OpenSession(e.tsMs, e.tsMs, 1))
        }
      }
      if (state.hasTimedOut) {
        val out = open.map(s => SessionOut(userId, s.startMs, s.lastMs, s.n))
        state.remove()
        out.iterator ++ closed.iterator
      } else {
        open.foreach { s =>
          state.update(s)
          // close the session once the event-time watermark passes last+gap
          // (timeout must be set strictly beyond the current watermark)
          state.setTimeoutTimestamp(
            math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
        }
        closed.iterator
      }
    }
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn _)
  }

  /** Streaming exact dedup — the training-data ingestion shape: documents
    * deduplicate on their content key (xxhash64 + length, the
    * [[graft.operators.Dedup.exactDedup]] key — the shuffle and the state
    * store carry 12 bytes per distinct doc, never text) as they arrive.
    * `dropDuplicatesWithinWatermark` bounds state to the watermark
    * horizon: duplicates separated by more than `horizon` are the batch
    * pass's job, exactly the at-ingest dedup contract.
    */
  def dedupDocs(stream: DataFrame, tsCol: String, textCol: String,
                horizon: String): DataFrame =
    stream
      .withWatermark(tsCol, horizon)
      .withColumn("__k", xxhash64(col(textCol)))
      .withColumn("__len", length(col(textCol)))
      .dropDuplicatesWithinWatermark("__k", "__len")
      .drop("__k", "__len")

  /** Streaming near-dup ingest gate against a BROADCAST-SIZE reference
    * set — the decontamination-at-ingest shape: drop incoming documents
    * whose k-shingle Jaccard to ANY reference document reaches
    * `minJaccard`, with candidates mined by MinHash band collision over
    * the [[graft.functions.HashKernels]] signature family (the same
    * shingle construction as [[graft.operators.Dedup]]'s Column
    * spellings, but kernel hashes — band keys are NOT interchangeable
    * with `Dedup.lshBands` output, and the 128/32 defaults collide a
    * superset of the 64/16 miner's candidates).
    *
    * Stateless per micro-batch: the reference index — a band-key →
    * doc-indices map plus each reference doc's sorted shingle-hash array
    * — is built ONCE driver-side from the static frame and broadcast;
    * each stream row probes its own band keys against the map and
    * verifies candidates with the exact merge-scan Jaccard
    * ([[graft.functions.HashKernels.sortedJaccard]]). No stream state, no
    * stream-stream self-join, no per-batch re-execution of the static
    * side. The reference is broadcast-size BY CONTRACT (eval benchmarks,
    * blocklists — the things ingest must never admit); the symmetric
    * large×large case remains the batch pass's job
    * ([[graft.operators.Dedup.crossCorpusNearDups]], banded equi-join).
    *
    * Signatures and band keys come from the [[graft.functions
    * .HashKernels]] JVM kernels — the batch miner's spellings — NOT the
    * Column HOF spelling (`transform`/`array_min` per hash function is a
    * CodegenFallback interpreted per element: measured 473 s for the
    * sf0.1 gate vs ~1 s through the kernels). Defaults run 128 hashes /
    * 32 bands — a tighter candidate-recall curve than the miner's 64/16
    * (at Jaccard 0.8 a pair misses every band with p ≈ 5e-8 vs 2e-4) —
    * because a decontamination gate's failure mode is a missed leak.
    *
    * Exactly like the batch miner, identical texts share every band (a
    * same-signature pair collides in all of them), so jaccard-1
    * duplicates of a reference doc can never pass; pairs near the
    * `minJaccard` boundary are subject to the banding's candidate-recall
    * curve (1 − (1 − j^rows)^bands), a deterministic property of the
    * data under the fixed hash seeds. Works identically on a batch
    * DataFrame (the parity spec runs both).
    */
  def nearDupGate(stream: DataFrame, reference: DataFrame, textCol: String,
                  k: Int = 3, numHashes: Int = 128, bands: Int = 32,
                  minJaccard: Double = 0.5,
                  maxReferenceRows: Int = 1000000): DataFrame = {
    import graft.functions.HashKernels
    require(numHashes % bands == 0,
      s"numHashes $numHashes must divide into $bands bands")
    require(maxReferenceRows > 0,
      s"maxReferenceRows must be positive, got $maxReferenceRows")
    val rows = numHashes / bands
    // native codegen expressions when GraftExtensions is installed (one
    // codegen stage per gate scan, nulls propagate natively), else the
    // JVM-kernel UDF chain with explicit null guards
    val native = graft.functions.NativeFunctions.registered(
      stream.sparkSession, "shingle_hashes")
    def withSigCols(df: DataFrame): DataFrame =
      if (native) df
        .withColumn("__sh", call_function("shingle_hashes", col(textCol), lit(k)))
        .withColumn("__bk",
          call_function("minhash_band_keys", col("__sh"), lit(numHashes), lit(bands)))
      else df
        .withColumn("__sh",
          when(col(textCol).isNotNull,
            HashKernels.shingleHashSetUdf(k)(col(textCol))))
        .withColumn("__bk",
          when(col("__sh").isNotNull, HashKernels.bandKeysUdf(bands, rows)(
            HashKernels.minHashSigUdf(numHashes)(col("__sh")))))
    // reference index: band keys + sorted shingle hashes per doc. The
    // broadcast-size contract is ENFORCED, not just documented: the
    // collect itself is capped at maxReferenceRows + 1, so a caller who
    // points the gate at a non-broadcast-size reference gets a clear
    // error naming the batch alternative, never a driver OOM.
    // overflow-proof: maxReferenceRows = Int.MaxValue must not wrap the
    // limit negative (same guard as Curation.benchmarkGramSet)
    val refLimit =
      if (maxReferenceRows == Int.MaxValue) Int.MaxValue
      else maxReferenceRows + 1
    val refRows = withSigCols(reference.select(col(textCol)))
      .filter(col("__sh").isNotNull)
      .select(col("__bk"), col("__sh"))
      .limit(refLimit)
      .collect()
    require(refRows.length <= maxReferenceRows,
      s"nearDupGate: the reference set has more than $maxReferenceRows " +
        "usable documents — not broadcast-size. Use the batch banded " +
        "equi-join (Dedup.crossCorpusNearDups) for a large reference, or " +
        "raise maxReferenceRows.")
    val refSh: Array[Array[Long]] = refRows.map(
      _.getAs[scala.collection.Seq[Long]]("__sh").toArray)
    // grow buckets in buffers, freeze to arrays once: heavy band
    // collisions (near-identical reference items sharing every band)
    // stay linear instead of re-copying a growing array per append
    val grow = new java.util.HashMap[java.lang.Long,
      scala.collection.mutable.ArrayBuffer[Int]]()
    refRows.zipWithIndex.foreach { case (r, i) =>
      // band keys are salted with the band index inside the kernel, so
      // the long alone is the bucket key
      r.getAs[scala.collection.Seq[Long]]("__bk").foreach { key =>
        grow.computeIfAbsent(key,
          _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += i
      }
    }
    val bandMap = new java.util.HashMap[java.lang.Long, Array[Int]]()
    grow.forEach((k, v) => bandMap.put(k, v.toArray))
    val bc = stream.sparkSession.sparkContext.broadcast((bandMap, refSh))
    // __bk is null exactly when __sh is (the when-guard above), and the
    // UDF returns primitive Boolean — the sh null check is the only
    // null path
    val isDup = udf((bk: Seq[Long], sh: Seq[Long]) => {
      if (sh == null || sh.isEmpty) false
      else {
        val (map, shArr) = bc.value
        val visited = new java.util.HashSet[Int]()
        bk.exists { key =>
          val cands = map.get(key)
          cands != null && cands.exists { i =>
            visited.add(i) &&
              graft.functions.HashKernels.sortedJaccard(
                sh, scala.collection.immutable.ArraySeq.unsafeWrapArray(
                  shArr(i))) >= minJaccard
          }
        }
      }
    })
    withSigCols(stream)
      .filter(!isDup(col("__bk"), col("__sh")))
      .drop("__bk", "__sh")
  }

  /** Run [[nearDupGate]] over the documents parquet as a bounded stream,
    * gated against the q92-style planted benchmark (a perturbed copy of
    * every `doc_id % 83 == 0` document): the at-ingest decontamination
    * pipeline. Output is the KEPT doc ids — stateless and
    * arrival-order-independent, so the result is deterministic and equals
    * the same gate applied to the batch frame (parity spec).
    */
  def runNearDupGateAvailableNow(spark: SparkSession, dir: String,
                                 queryName: String = "graft_stream_decontam"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val reference = graft.sources.Tables.plantedBenchmark(spark, dir)
      .select(col("text"))
    val stream = tableStream(spark, dir, "documents")
    withReplayPartitions(spark) { withNoDataBatches(spark, enabled = false) {
      replayCheckpoint { ckpt =>
        val w = nearDupGate(stream, reference, "text")
          .select(col("doc_id").cast("long").as("doc_id"))
          .writeStream
          .format("memory")
          .queryName(queryName)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
        val q = ckpt.fold(w)(c => w.option("checkpointLocation", c)).start()
        q.awaitTermination()
      }
    } }
    spark.table(queryName)
  }

  final case class SessionEvent(userId: Long, ts: java.sql.Timestamp, eventId: Long) {
    def tsMs: Long = ts.getTime
  }
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long)
  final case class SessionOut(userId: Long, startMs: Long, endMs: Long, n: Long)


  /** Streaming scan of one table stored at `dir/<table>.parquet`, which
    * the testdata generator may ship as a single FILE (the driver layout)
    * or a DIRECTORY of part files (Spark-written fixtures). The file
    * layout needs a parent-dir read narrowed by a name glob; pointing the
    * glob at a directory layout would SILENTLY match zero part files (the
    * failure mode the schema-contract spec caught in its own fixture) —
    * so the directory layout is read directly. Schema comes from a batch
    * read of the same path (streaming reads require one).
    */
  private def tableStream(spark: SparkSession, dir: String,
                          table: String): DataFrame = {
    val path = s"$dir/$table.parquet"
    val schema = spark.read.parquet(path).schema
    val reader = spark.readStream.schema(schema)
    // layout probe through the Hadoop FileSystem API, not java.io.File:
    // an HDFS/S3 directory layout would look like a non-directory to the
    // local-FS probe and fall into the glob branch, which silently
    // matches zero part files
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(hPath).isDirectory) reader.parquet(path)
    else reader.option("pathGlobFilter", s"$table.parquet").parquet(dir)
  }

  /** Run [[hourlyTypeAgg]] over the events parquet as a bounded stream
    * (Trigger.AvailableNow) into an in-memory sink and return the result —
    * the batch-parity harness. Schema is taken from a batch read of the
    * same path (streaming reads require an explicit schema).
    */
  def runHourlyTypeAggAvailableNow(spark: SparkSession, dir: String,
                                   queryName: String = "graft_stream_hourly"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = graft.sources.Tables.normalizeTs(tableStream(spark, dir, "events"))
    // complete mode re-emits the full result every batch — the trailing
    // no-data batch adds nothing to the output
    withReplayPartitions(spark) { withNoDataBatches(spark, enabled = false) {
      replayCheckpoint { ckpt =>
        val w = hourlyTypeAgg(stream)
          .writeStream
          .format("memory")
          .queryName(queryName)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
        val q = ckpt.fold(w)(c => w.option("checkpointLocation", c)).start()
        q.awaitTermination()
      }
    } }
    spark.table(queryName)
  }

  /** Run [[dedupDocs]] over the documents parquet as a bounded stream.
    * The table carries no event time, so every row gets the SAME
    * synthesized arrival instant — one ingest burst, trivially inside any
    * watermark horizon, so the result equals a GLOBAL dedup no matter how
    * the source is split into batches (an id-derived time would silently
    * re-emit cross-horizon duplicates under multi-batch reads and break
    * the q68 oracle). Which COPY of a duplicate survives is
    * arrival-order-dependent, so callers wanting a deterministic result
    * project the content columns (identical across copies), as q68 does.
    */
  def runDedupDocsAvailableNow(spark: SparkSession, dir: String,
                               queryName: String = "graft_stream_dedup"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = tableStream(spark, dir, "documents")
      .withColumn("ts", timestamp_seconds(lit(1700000000L)))
    // dropDuplicates emits each first-seen row on ARRIVAL — the trailing
    // no-data batch only evicts state
    withReplayPartitions(spark) { withNoDataBatches(spark, enabled = false) {
      replayCheckpoint { ckpt =>
        val w = dedupDocs(stream, "ts", "text", "1 hour")
          .writeStream
          .format("memory")
          .queryName(queryName)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
        val q = ckpt.fold(w)(c => w.option("checkpointLocation", c)).start()
        q.awaitTermination()
      }
    } }
    spark.table(queryName)
  }

  /** Stateful-operator state-store count = shuffle partitions, and a
    * bounded single-file replay pays store init/commit × partitions as
    * pure fixed cost — size it to the replay, not the session default.
    * Scoped + restored (queries run sequentially); a production
    * deployment sizes partitions to key cardinality at its checkpoint.
    */
  private def withReplayPartitions[T](spark: SparkSession, n: Int = 4)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Scoped toggle for the trailing no-data micro-batch. After the last
    * data batch of an AvailableNow run, Spark schedules one more batch
    * purely to advance the watermark — for operators whose OUTPUT needs
    * the final watermark (event-time timeouts in [[sessionize]], append-
    * mode windowed aggs) that batch is load-bearing and MUST stay on; for
    * operators that emit on arrival (inner stream-stream joins, first-seen
    * dropDuplicates, complete-mode aggs) it only evicts state the stopped
    * query discards anyway, yet costs a full state-store commit cycle
    * (measured: ~0.7 s of q84's 2.5 s replay). Callers assert which case
    * they are in; the probe + oracle gate pin result equality.
    */
  private def withNoDataBatches[T](spark: SparkSession, enabled: Boolean)(body: => T): T = {
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, enabled.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Checkpoint directory for a throwaway bounded replay: tmpfs
    * (`/dev/shm`) when available, so the offset/commit-log and state-store
    * fsyncs of each micro-batch hit memory instead of disk — the replay's
    * checkpoint has no recovery value (the query runs AvailableNow to a
    * memory sink and is dropped). Falls back to Spark's default temp
    * checkpoint when tmpfs is absent. A PRODUCTION stream points its
    * checkpoint at durable storage; this shortcut is only sound because
    * the caller never restarts from it.
    */
  private def replayCheckpoint[T](body: Option[String] => T): T = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val p = java.nio.file.Files.createTempDirectory(shm.toPath, "graft-ckpt-")
      try body(Some(p.toString))
      finally {
        import scala.jdk.CollectionConverters._
        // walk returns a Stream holding open directory handles — close it
        // (via Using) before deleting, or each replay leaks descriptors
        scala.util.Using(java.nio.file.Files.walk(p)) { st =>
          st.iterator().asScala.toSeq.reverse
        }.getOrElse(Seq.empty)
          .foreach(f => try java.nio.file.Files.deleteIfExists(f) catch { case _: Throwable => () })
      }
    } else body(None)
  }

  /** Stream-stream interval join: for every left event, the right events
    * of the same key whose time falls in `[left.ts, left.ts + window]` —
    * the streaming counterpart of
    * [[graft.operators.TemporalJoins.intervalJoin]]. Both sides carry
    * watermarks, and the time-range predicate is what lets Spark bound
    * the join state: right rows older than the watermark minus the window
    * are evicted, so state is O(rate × window), not O(stream).
    */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                         window: String, horizon: String): DataFrame = {
    val l = left.withWatermark("ts", horizon)
      .select(col(keyCol).as("__lk"), col("ts").as("l_ts"),
        col("event_id").as("l_id"))
    val r = right.withWatermark("ts", horizon)
      .select(col(keyCol).as("__rk"), col("ts").as("r_ts"),
        col("event_id").as("r_id"))
    l.join(r, expr(
      s"__lk = __rk AND r_ts >= l_ts AND r_ts <= l_ts + interval $window"))
      .select(col("__lk").as(keyCol), col("l_id"), col("r_id"),
        col("l_ts"), col("r_ts"))
  }

  /** Run [[streamIntervalJoin]] over the events parquet: clicks joined to
    * the same user's views within 30 minutes. The single-file source
    * arrives as one micro-batch, so no row is ever late against the
    * watermark and the result equals the batch join — the q84 oracle.
    */
  def runStreamIntervalJoinAvailableNow(spark: SparkSession, dir: String,
                                        queryName: String = "graft_stream_ij"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def src = graft.sources.Tables.normalizeTs(tableStream(spark, dir, "events"))
    val joined = streamIntervalJoin(
      src.filter(col("event_type") === "click"),
      src.filter(col("event_type") === "view"),
      keyCol = "user_id", window = "30 minutes", horizon = "1 hour")
    // an INNER stream-stream join emits each match the batch its rows
    // meet — the trailing no-data batch only evicts state (outer joins
    // would need it: null-extended rows emit on watermark expiry)
    withReplayPartitions(spark) { withNoDataBatches(spark, enabled = false) {
      replayCheckpoint { ckpt =>
        val w = joined.writeStream
          .format("memory")
          .queryName(queryName)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
        val q = ckpt.fold(w)(c => w.option("checkpointLocation", c)).start()
        q.awaitTermination()
      }
    } }
    spark.table(queryName)
  }

  /** State metrics of a bounded streaming replay, read from the query's
    * progress events: `peakRows`/`peakBytes` are the largest per-batch
    * state-store footprint, `removed` counts state rows EVICTED by the
    * advancing watermark across the run (the sizing contract's proof of
    * eviction), `droppedLate` counts late input rows discarded (0 on a
    * time-ordered replay), `dataBatches` the micro-batches that carried
    * input.
    */
  final case class StreamStateSummary(peakRows: Long, peakBytes: Long,
                                      removed: Long, droppedLate: Long,
                                      dataBatches: Int)

  /** The SIZING run for the stream-stream interval join's buffered
    * state (round-15 VERDICT item 6): stage `events` into `batches`
    * time-ordered slice files and replay one file per trigger, so the
    * watermark genuinely advances batch over batch and Spark EVICTS
    * buffered rows older than `watermark − window` while the stream is
    * still running. Arrival is globally time-ordered, so no row is ever
    * late and the result STILL equals the batch join — while peak state
    * is bounded by the rows inside one `(horizon + window)` frontier
    * span, the `O(rate × (horizon + window))` contract PLANS.md
    * documents — instead of the whole-corpus burst the single-batch gate
    * replay buffers. Returns the joined result and the measured state
    * summary.
    */
  def runStreamIntervalJoinSequenced(spark: SparkSession, dir: String,
                                     batches: Int = 8,
                                     window: String = "30 minutes",
                                     horizon: String = "1 hour",
                                     queryName: String = "graft_stream_ij_seq",
                                     limitHours: Option[Double] = None): (DataFrame, StreamStateSummary) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    require(batches >= 2, "sequenced replay needs at least 2 batches")
    val src0 = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    // limitHours restricts the replay to the table's first N hours of
    // event time: with the full 30-day span, any practical batch count
    // leaves each micro-batch covering HOURS of event time, so peak
    // state floors at one batch's rows and the horizon term of the
    // sizing formula is invisible (the round-16 measurement's limit).
    // A bounded span makes batch spans ≪ horizon, so
    // rate × (horizon + window) dominates and the peak must move with
    // the horizon — the formula's direct demonstration.
    val src = limitHours.fold(src0) { h =>
      val t0 = src0.agg(min(unix_micros(col("ts")))).head().getLong(0)
      src0.filter(unix_micros(col("ts")) < t0 + (h * 3600e6).toLong)
    }
    // time slice boundaries at the ts quantiles (exact: relativeError 0)
    val cuts = src.select(unix_micros(col("ts")).as("us"))
      .stat.approxQuantile("us",
        (1 until batches).map(_.toDouble / batches).toArray, 0.0)
      .map(_.toLong)
    val fixture = java.nio.file.Files.createTempDirectory("graft_ij_seq").toFile
    fixture.deleteOnExit()
    for (b <- 0 until batches) {
      val lo = if (b == 0) Long.MinValue else cuts(b - 1)
      val hi = if (b == batches - 1) Long.MaxValue else cuts(b)
      val stage = new java.io.File(fixture, s"stage$b")
      src.filter(unix_micros(col("ts")) > lo && unix_micros(col("ts")) <= hi)
        .coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(fixture, f"slice$b%03d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      // FileStreamSource replays by (mtime, path): pin both ascending
      dest.setLastModified(1700000000000L + b * 600000L)
    }
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(fixture.getAbsolutePath + "/slice*.parquet")
    val joined = streamIntervalJoin(
      stream.filter(col("event_type") === "click"),
      stream.filter(col("event_type") === "view"),
      keyCol = "user_id", window = window, horizon = horizon)
    // no-data batches stay ON here: the trailing batch's eviction is
    // part of what this run measures
    val progress = withReplayPartitions(spark) {
      replayCheckpoint { ckpt =>
        val w = joined.writeStream
          .format("memory")
          .queryName(queryName)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
        val q = ckpt.fold(w)(c => w.option("checkpointLocation", c)).start()
        q.awaitTermination()
        q.recentProgress.toSeq
      }
    }
    def per(f: org.apache.spark.sql.streaming.StateOperatorProgress => Long): Seq[Long] =
      progress.map(_.stateOperators.map(f).sum)
    val summary = StreamStateSummary(
      peakRows = (0L +: per(_.numRowsTotal)).max,
      peakBytes = (0L +: per(_.memoryUsedBytes)).max,
      removed = per(_.numRowsRemoved).sum,
      droppedLate = per(_.numRowsDroppedByWatermark).sum,
      dataBatches = progress.count(_.numInputRows > 0))
    (spark.table(queryName), summary)
  }

  /** Run the [[graft.operators.Curation.ingestGate]] curation chain over
    * the documents parquet as a bounded stream: the at-ingest formulation
    * of quality + decontamination + stratified sampling. The benchmark
    * shingle set comes from a BATCH read of the same table (docs with
    * `doc_id % 97 == 0` — the q73 convention) and is broadcast; the gate
    * itself is stateless (no watermark, no state store), so the streamed
    * result equals the batch run row-for-row — which is what the q79
    * oracle checks.
    */
  def runIngestGateAvailableNow(spark: SparkSession, dir: String,
                                queryName: String = "graft_stream_gate"): DataFrame = {
    import graft.operators.Curation
    import graft.functions.TextFunctions
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$dir/documents.parquet")
    val bench = Curation.benchmarkGramSet(
      batch.filter(col("doc_id") % 97 === 0), "text", n = 3)
    val benchBc = spark.sparkContext.broadcast(bench)
    val stream = tableStream(spark, dir, "documents")
    val gated = Curation.ingestGate(stream, "text", "source", benchBc, n = 3,
        stopwords = TextFunctions.LangStopwords("en"),
        minQuality = 0.6, maxContamination = 0.05,
        rates = Map("src3" -> 1.0, "src11" -> 0.0), defaultRate = 0.5)
      .select(col("doc_id"), col("source"), col("quality"),
        col("contamination"), col("sample_bucket"), col("admitted"))
    replayCheckpoint { ckpt =>
      val w = gated.writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
      val q = ckpt.fold(w)(c => w.option("checkpointLocation", c)).start()
      q.awaitTermination()
    }
    spark.table(queryName)
  }

  /** Run [[sessionize]] over the events parquet as a bounded stream (memory
    * sink, Append). Sessions still open when the final watermark lands stay
    * in state — the contract of streaming sessionization; the spec compares
    * emitted sessions against the batch equivalent under that closure rule.
    */
  def runSessionizeAvailableNow(spark: SparkSession, dir: String, gapSeconds: Long,
                                queryName: String = "graft_stream_sessions",
                                sourceGlob: String = "events.parquet",
                                maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // `sourceGlob`/`maxFilesPerTrigger` let the replay run as MULTIPLE
    // micro-batches over time-sliced files (modification-time order =
    // arrival order), driving a genuinely advancing watermark — the
    // multi-batch parity spec uses this; the driver default is one batch.
    val raw =
      if (sourceGlob == "events.parquet" && maxFilesPerTrigger.isEmpty)
        tableStream(spark, dir, "events") // layout-adaptive default path
      else {
        val schema = spark.read.option("pathGlobFilter", sourceGlob)
          .parquet(dir).schema
        val reader0 = spark.readStream.schema(schema)
          .option("pathGlobFilter", sourceGlob)
        maxFilesPerTrigger
          .fold(reader0)(n => reader0.option("maxFilesPerTrigger", n.toString))
          .parquet(dir)
      }
    val stream = graft.sources.Tables.normalizeTs(raw)
      .withWatermark("ts", "0 seconds")
      .select(col("user_id").as("userId"), col("ts"),
        col("event_id").as("eventId"))
      .as[SessionEvent]
    // the trailing no-data batch is LOAD-BEARING here: event-time
    // timeouts close the still-open sessions only when the final
    // watermark advance runs (probe: disabling it silently drops ~1.5 %
    // of emitted sessions) — only the checkpoint moves to tmpfs
    withReplayPartitions(spark) {
      replayCheckpoint { ckpt =>
        val w = sessionize(stream, gapSeconds)
          .writeStream
          .format("memory")
          .queryName(queryName)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
        val q = ckpt.fold(w)(c => w.option("checkpointLocation", c)).start()
        q.awaitTermination()
      }
    }
    spark.table(queryName)
  }
}
