package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{ArrayTests, Fit, Qartod, Spectral, TextFunctions}
import graft.operators.{GapFill, Multimodal}
import graft.sources.Tables
import graft.streaming.StreamingOps

/** Science-kernel and extension queries: grid interpolation (C2/A3),
  * least-squares fits (C4), spectral products (C5), per-instrument array
  * flag suites (C7/A6-A8), size-string parsing (C13), multimodal decode
  * plumbing, and the Structured Streaming batch-parity query.
  */
object QueriesScience {

  // Shadows functions.round: every oracle-compared column rounds with
  // DuckDB-exact semantics (see graft.functions.Rounding) so half-boundary
  // values hash identically on both engines.
  private def round(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    graft.functions.Rounding.dround(c, scale)

  type Q = (SparkSession, String) => DataFrame

  private val HourUs = 3600000000L

  val queries: Map[String, Q] = Map(
    // C2/A3: observations interpolated onto a regular hourly grid per user.
    // r20: the union+window spelling shuffled AND double-sorted the
    // GENERATED grid (1.05M rows at sf0.1 against 100k observations —
    // the engine's worst 10× ratio, 3.96×); interpolateOntoStepGrid is
    // spec-pinned result-identical and only the observations cross the
    // exchange — grid rows generate in the final projection
    "q41_grid_interp" -> ((s, d) => {
      val obs = Tables.events(s, d)
        .groupBy(col("user_id"), unix_micros(col("ts")).cast("double").as("t"))
        .agg(avg(col("value")).as("v"))
      GapFill.interpolateOntoStepGrid(
          obs, Seq("user_id"), "t", "v", HourUs, "v_interp")
        .select(col("user_id"), col("t"), round(col("v_interp"), 6).as("v_interp"))
    }),

    // C4: per-row least-squares fit of embedding[i] ~ a + b*i
    "q42_linfit" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          Fit.indexLinFitCol(col("embedding")).as("f"))
        .select(col("vec_id"),
          round(col("f.slope"), 6).as("slope"),
          round(col("f.intercept"), 6).as("intercept"),
          round(col("f.rmse"), 6).as("rmse"))
    }),

    // C5: spectral band ratio, 3-point-median line height, scaled median
    "q43_spectral" -> ((s, d) => {
      val e = col("e")
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .select(col("vec_id"),
          round(Spectral.bandRatio(e, 1, 4), 6).as("band_ratio"),
          round(Spectral.lineHeight(e, 10, 11, 12, 650.0, 676.0, 715.0), 6)
            .as("line_height"),
          round(Spectral.scaledMedian(e, 20, 381.0), 6).as("poc_proxy"))
    }),

    // C7/A6-A8: vote, range, flat-signal array tests folded to a digit string
    "q44_array_flags" -> ((s, d) => {
      val e = col("e")
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .withColumn("flags", Qartod.combineFlags(Seq(
          "vote" -> ArrayTests.voteFail(e, 0.1, 2, 8),
          "range" -> ArrayTests.anyOutOfRange(e, -0.4, 0.4),
          "flat" -> ArrayTests.flatSignal(e, 0.12))))
        .groupBy(col("flags")).agg(count(lit(1)).as("cnt"))
    }),

    // C7 named ADCP suite over synthesized beam arrays (thresholds scaled
    // to the embedding value domain)
    "q58_adcp_suite" -> ((s, d) => {
      val e = col("e")
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .withColumn("flags", Qartod.combineFlags(
          graft.functions.InstrumentSuites.adcpFlags(
            Spectral.at(e, 0), Spectral.at(e, 1), Spectral.at(e, 2), Spectral.at(e, 3),
            slice(e, 6, 4), slice(e, 10, 4),
            evFail = 0.2, vvFail = 0.15, hsFail = 0.25, cmPass = 0.0, pgPass = 0.05)))
        .groupBy(col("flags")).agg(count(lit(1)).as("cnt"))
    }),

    // C13: human-size string parse (synthesized from part attributes)
    "q45_size_parse" -> ((s, d) => {
      Tables.part(s, d)
        .withColumn("size_str", concat(
          format_string("%.1f", round(col("p_retailprice") / 7.0, 1)),
          lit(" "),
          when(col("p_partkey") % 3 === 0, "KB")
            .when(col("p_partkey") % 3 === 1, "MB")
            .otherwise("GB")))
        .select(col("p_partkey"), col("size_str"),
          round(TextFunctions.parseHumanSizeMb(col("size_str")), 6).as("size_mb"))
    }),

    // Structured Streaming batch-parity: bounded stream -> watermark ->
    // tumbling hourly window -> memory sink (oracle checks the same agg)
    "q46_stream_hourly" -> ((s, d) =>
      StreamingOps.runHourlyTypeAggAvailableNow(s, d)),

    // Streaming exact dedup at ingest: dropDuplicatesWithinWatermark on
    // the content key; projecting text makes the result copy-agnostic
    "q68_stream_dedup" -> ((s, d) =>
      StreamingOps.runDedupDocsAvailableNow(s, d).select(col("text"))),

    // Streaming near-dup decontamination at ingest: documents replayed as
    // a bounded stream are gated against the planted q92-style benchmark
    // through a broadcast MinHash band index (stateless per batch, no
    // stream state). Output = kept doc ids — arrival-order-independent →
    // deterministic → golden-pinned; the q146 invariants companion rides
    // the DuckDB gate (sound drops, high-jaccard recall, id hygiene)
    "q146_stream_decontam" -> ((s, d) =>
      StreamingOps.runNearDupGateAvailableNow(s, d)),

    // Stream-stream interval join with watermark-bounded state: clicks
    // joined to same-user views within 30 minutes (oracle = batch join)
    "q84_stream_interval_join" -> ((s, d) =>
      StreamingOps.runStreamIntervalJoinAvailableNow(s, d)),

    // Stateful streaming sessionization (flatMapGroupsWithState +
    // event-time timeout): 30-min-gap sessions per user. The oracle is
    // the batch gap-sessionization RESTRICTED to sessions the final
    // watermark has closed (endMs + gap < watermark) — the exact
    // append-mode emission contract; still-open state is not output
    "q100_stream_sessionize" -> ((s, d) =>
      StreamingOps.runSessionizeAvailableNow(s, d, gapSeconds = 1800,
        queryName = "graft_q100_sessions")),

    // Fixed-depth climatology trace (pressureBracket + extractClim):
    // bracket selection at 75 m, month-15 points over refYear±1, hourly
    // linear interpolation of the lo/hi/mid series
    "q72_clim_trace" -> ((s, d) => {
      val clim = Tables.nation(s, d).select(
        (col("n_nationkey") % 12 + 1).as("month"),
        (expr("n_nationkey div 12") * 50).cast("double").as("depth_lo"),
        (expr("n_nationkey div 12") * 50 + 50).cast("double").as("depth_hi"),
        (col("n_nationkey") * 2.0).as("sus_lo"),
        (col("n_nationkey") * 2.0 + 4.0).as("sus_hi"))
      Qartod.climTrace(clim, depth = 75.0, refYear = 2024)
    }),

    // Multimodal decode: payloads synthesized with REAL PNG/JPEG headers
    // (one third each, remainder raw text) -> partition-batched kernel
    // parses actual IHDR/SOF dimensions; raw text takes the stub fallback
    "q47_multimodal" -> ((s, d) => {
      val media = Tables.documents(s, d).select(
        col("doc_id").cast("long").as("doc_id"),
        Multimodal.synthImageUdf(
          when(col("doc_id") % 3 === 0, "png")
            .when(col("doc_id") % 3 === 1, "jpeg").otherwise("text"),
          (col("doc_id") % 800 + 1).cast("int"),
          (col("doc_id") % 600 + 1).cast("int"),
          col("text")).as("payload"))
      Multimodal.decode(media)
    }),

    // Audio decode: payloads synthesized with REAL 44-byte WAV headers ->
    // partition-batched kernel chunk-walks RIFF and reports fmt/data
    // facts; the oracle recomputes every field from the synth arithmetic,
    // so header write + parse must round-trip exactly
    "q77_audio_decode" -> ((s, d) => {
      val media = Tables.supplier(s, d).select(
        col("s_suppkey").cast("long").as("doc_id"),
        Multimodal.synthWavUdf(
          (col("s_suppkey") % 2 + 1).cast("int"),
          element_at(array(lit(8000), lit(16000), lit(44100)),
            (col("s_suppkey") % 3 + 1).cast("int")),
          ((col("s_suppkey") % 2 + 1) * 8).cast("int"),
          (col("s_suppkey") % 100 + 1).cast("int")).as("payload"))
      Multimodal.decodeAudio(media)
        .withColumn("duration_s", round(col("duration_s"), 6))
    }),

    // Video frame-sample plan: k uniform bucket-center timestamps per
    // video -> frame numbers at the video's fps (pure expressions, the
    // planning table a codec stage consumes)
    "q78_frame_plan" -> ((s, d) => {
      val videos = Tables.supplier(s, d).select(
        col("s_suppkey").as("video_id"),
        (col("s_suppkey") % 120 + 10).cast("double").as("duration_s"),
        element_at(array(lit(24), lit(30)),
          (col("s_suppkey") % 2 + 1).cast("int")).as("fps"))
      Multimodal.frameSamplePlan(videos, "video_id", "duration_s", "fps", k = 4)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q41_grid_interp" -> s"""
      WITH e AS (SELECT user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS t,
                        avg(value) AS v, 0 AS is_grid
                 FROM events GROUP BY 1, 2),
      bounds AS (SELECT user_id, min(t) AS lo, max(t) AS hi FROM e GROUP BY 1),
      grid AS (SELECT user_id,
                      CAST(unnest(range(CAST(floor(lo/$HourUs) AS BIGINT),
                                        CAST(floor(hi/$HourUs) AS BIGINT) + 1))
                           * $HourUs AS DOUBLE) AS t,
                      CAST(NULL AS DOUBLE) AS v, 1 AS is_grid
               FROM bounds),
      u AS (SELECT * FROM e UNION ALL SELECT * FROM grid),
      w AS (SELECT user_id, t, is_grid, v,
                   last_value(v IGNORE NULLS) OVER wb AS pv,
                   last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER wb AS pt,
                   first_value(v IGNORE NULLS) OVER wf AS nv,
                   first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER wf AS nt
            FROM u
            WINDOW wb AS (PARTITION BY user_id ORDER BY t, is_grid
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (PARTITION BY user_id ORDER BY t, is_grid
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, t,
             round(CASE WHEN v IS NOT NULL THEN v
                        WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                          CASE WHEN nt = pt THEN pv
                               ELSE pv + (nv - pv) * (t - pt) / (nt - pt) END
                        ELSE NULL END, 6) AS v_interp
      FROM w WHERE is_grid = 1""",
    "q42_linfit" -> """
      WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      pts AS (SELECT vec_id, CAST(i AS DOUBLE) AS x, e[CAST(i AS INT) + 1] AS y
              FROM base, unnest(range(len(e))) AS t(i)),
      sums AS (SELECT vec_id, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                      sum(x*x) AS sxx, sum(x*y) AS sxy
               FROM pts GROUP BY vec_id),
      coefs AS (SELECT vec_id, n,
                       (n*sxy - sx*sy)/(n*sxx - sx*sx) AS slope,
                       (sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n AS intercept
                FROM sums)
      SELECT c.vec_id, round(slope, 6) AS slope, round(intercept, 6) AS intercept,
             round(sqrt(sum((y - (intercept + slope*x))^2)/c.n), 6) AS rmse
      FROM coefs c JOIN pts p ON c.vec_id = p.vec_id
      GROUP BY c.vec_id, c.n, slope, intercept""",
    "q43_spectral" -> """
      WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
      SELECT vec_id,
             round(CASE WHEN e[5] != 0 THEN e[2] / e[5] END, 6) AS band_ratio,
             round(list_sort(e[11:13])[2] -
                   (list_sort(e[10:12])[2] +
                    (list_sort(e[12:14])[2] - list_sort(e[10:12])[2])
                      * ((676.0 - 650.0) / (715.0 - 650.0))), 6) AS line_height,
             round(list_sort(e[20:22])[2] * 381.0, 6) AS poc_proxy
      FROM base""",
    "q44_array_flags" -> """
      WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      t AS (SELECT vec_id,
                   len(list_filter(e[1:8], x -> x > 0.1)) < 2 AS vote,
                   len(list_filter(e, x -> x < -0.4 OR x > 0.4)) > 0 AS rng,
                   sqrt(greatest(list_sum(list_transform(e, x -> x*x)) / len(e)
                        - (list_sum(e) / len(e))^2, 0.0)) < 0.12 AS flat
            FROM base)
      SELECT concat(CASE WHEN vote THEN '3' ELSE '1' END,
                    CASE WHEN rng THEN '3' ELSE '1' END,
                    CASE WHEN flat THEN '3' ELSE '1' END) AS flags,
             count(*) AS cnt
      FROM t GROUP BY 1""",
    "q58_adcp_suite" -> """
      WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      t AS (SELECT vec_id,
                   abs(e[1]) > 0.2 AS f1,
                   abs(e[2]) > 0.15 AS f2,
                   (abs(e[3]) > 0.25 OR abs(e[4]) > 0.25) AS f3,
                   len(list_filter(e[6:9], x -> x > 0.0)) < 2 AS f4,
                   len(list_filter(e[10:13], x -> x > 0.05)) < 3 AS f5
            FROM base)
      SELECT concat(CASE WHEN f1 THEN '3' ELSE '1' END,
                    CASE WHEN f2 THEN '3' ELSE '1' END,
                    CASE WHEN f3 THEN '3' ELSE '1' END,
                    CASE WHEN f4 THEN '3' ELSE '1' END,
                    CASE WHEN f5 THEN '3' ELSE '1' END) AS flags,
             count(*) AS cnt
      FROM t GROUP BY 1""",
    "q45_size_parse" -> """
      WITH p AS (SELECT p_partkey,
                        printf('%.1f %s', round(p_retailprice / 7.0, 1),
                               CASE WHEN p_partkey % 3 = 0 THEN 'KB'
                                    WHEN p_partkey % 3 = 1 THEN 'MB'
                                    ELSE 'GB' END) AS size_str
                 FROM part)
      SELECT p_partkey, size_str,
             round(CASE regexp_extract(size_str, '(KB|MB|GB)\s*$', 1)
                     WHEN 'KB' THEN CAST(regexp_extract(size_str, '([0-9]+\.?[0-9]*)', 1) AS DOUBLE) / 1024.0
                     WHEN 'MB' THEN CAST(regexp_extract(size_str, '([0-9]+\.?[0-9]*)', 1) AS DOUBLE)
                     WHEN 'GB' THEN CAST(regexp_extract(size_str, '([0-9]+\.?[0-9]*)', 1) AS DOUBLE) * 1024.0
                   END, 6) AS size_mb
      FROM p""",
    "q46_stream_hourly" -> """
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS win_start,
             event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2""",
    // batch gap-sessionization (millisecond clock, the kernel's
    // (tsMs, eventId) ordering) restricted to watermark-closed sessions
    "q100_stream_sessionize" -> """
      WITH e AS (SELECT user_id, event_id,
                        epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS tsms
                 FROM events),
      m AS (SELECT user_id, event_id, tsms,
                   CASE WHEN lag(tsms) OVER w IS NULL
                             OR tsms - lag(tsms) OVER w > 1800000
                        THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsms, event_id)),
      s AS (SELECT user_id, tsms,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY tsms, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM m),
      g AS (SELECT user_id, sid, min(tsms) AS s_ms, max(tsms) AS e_ms,
                   count(*) AS n
            FROM s GROUP BY 1, 2),
      wm AS (SELECT max(tsms) AS wmms FROM e)
      SELECT user_id AS "userId", CAST(s_ms AS BIGINT) AS "startMs",
             CAST(e_ms AS BIGINT) AS "endMs", CAST(n AS BIGINT) AS n
      FROM g, wm WHERE e_ms + 1800000 < wmms""",
    "q72_clim_trace" -> """
      WITH clim AS (
        SELECT (n_nationkey % 12) + 1 AS m,
               CAST(n_nationkey AS DOUBLE) * 2.0 AS v_lo,
               CAST(n_nationkey AS DOUBLE) * 2.0 + 4.0 AS v_hi
        FROM nation WHERE (n_nationkey // 12) = 1),
      pts AS (
        SELECT make_timestamp(CAST(yy AS BIGINT), CAST(m AS BIGINT), 15, 0, 0, 0) AS t,
               v_lo, v_hi, (v_lo + v_hi) / 2.0 AS v_md
        FROM clim, unnest([2023, 2024, 2025]) AS y(yy)),
      bounds AS (SELECT min(t) AS lo, max(t) AS hi FROM pts),
      grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS t FROM bounds),
      g2 AS (SELECT g.t, p.v_lo, p.v_hi, p.v_md
             FROM grid g LEFT JOIN pts p ON g.t = p.t),
      w AS (SELECT *,
                   last_value(v_lo IGNORE NULLS) OVER wb AS p_lo,
                   last_value(v_hi IGNORE NULLS) OVER wb AS p_hi,
                   last_value(v_md IGNORE NULLS) OVER wb AS p_md,
                   first_value(v_lo IGNORE NULLS) OVER wf AS n_lo,
                   first_value(v_hi IGNORE NULLS) OVER wf AS n_hi,
                   first_value(v_md IGNORE NULLS) OVER wf AS n_md,
                   last_value(CASE WHEN v_md IS NOT NULL THEN epoch(t) END IGNORE NULLS)
                     OVER wb AS pt,
                   first_value(CASE WHEN v_md IS NOT NULL THEN epoch(t) END IGNORE NULLS)
                     OVER wf AS nt
            FROM g2
            WINDOW wb AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT t,
             round(CASE WHEN v_lo IS NOT NULL THEN v_lo
                        WHEN p_lo IS NOT NULL AND n_lo IS NOT NULL THEN
                          CASE WHEN nt = pt THEN p_lo
                               ELSE p_lo + (n_lo - p_lo) * (epoch(t) - pt) / (nt - pt) END
                   END, 6) AS clim_minus3std,
             round(CASE WHEN v_hi IS NOT NULL THEN v_hi
                        WHEN p_hi IS NOT NULL AND n_hi IS NOT NULL THEN
                          CASE WHEN nt = pt THEN p_hi
                               ELSE p_hi + (n_hi - p_hi) * (epoch(t) - pt) / (nt - pt) END
                   END, 6) AS clim_plus3std,
             round(CASE WHEN v_md IS NOT NULL THEN v_md
                        WHEN p_md IS NOT NULL AND n_md IS NOT NULL THEN
                          CASE WHEN nt = pt THEN p_md
                               ELSE p_md + (n_md - p_md) * (epoch(t) - pt) / (nt - pt) END
                   END, 6) AS clim_data
      FROM w""",
    "q68_stream_dedup" -> """
      SELECT DISTINCT text FROM documents""",
    "q84_stream_interval_join" -> """
      WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
                 FROM events)
      SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
             l.ts AS l_ts, r.ts AS r_ts
      FROM e l JOIN e r
        ON l.event_type = 'click' AND r.event_type = 'view'
       AND l.user_id = r.user_id
       AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL '30 minutes'""",
    "q47_multimodal" -> """
      WITH base AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(doc_id % 3 AS INT) AS kind,
               CAST(doc_id % 800 + 1 AS INT) AS w,
               CAST(doc_id % 600 + 1 AS INT) AS h,
               octet_length(encode(text)) AS olen, text
        FROM documents)
      SELECT doc_id,
             CAST(CASE kind WHEN 0 THEN olen + 33 WHEN 1 THEN olen + 14
                  ELSE olen END AS INT) AS n_bytes,
             CAST(CASE kind WHEN 0 THEN 137 WHEN 1 THEN 255
                  ELSE CASE WHEN olen = 0 THEN -1 ELSE ascii(substr(text, 1, 1)) END
                  END AS INT) AS first_byte,
             CAST(CASE kind
                  WHEN 0 THEN CASE WHEN olen = 0 THEN 0
                                   ELSE ascii(substr(text, length(text), 1)) END
                  WHEN 1 THEN 217
                  ELSE CASE WHEN olen = 0 THEN -1
                            ELSE ascii(substr(text, length(text), 1)) END
                  END AS INT) AS last_byte,
             CASE kind WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'unknown' END AS format,
             CAST(CASE kind WHEN 2 THEN olen % 640 ELSE w END AS INT) AS width,
             CAST(CASE kind WHEN 2 THEN olen % 480 ELSE h END AS INT) AS height
      FROM base""",
    // every field recomputed from the synth arithmetic: a parse bug or a
    // header-write bug breaks the hash
    "q77_audio_decode" -> """
      WITH p AS (
        SELECT CAST(s_suppkey AS BIGINT) AS doc_id,
               CAST(s_suppkey % 2 + 1 AS INT) AS channels,
               ([8000, 16000, 44100])[CAST(s_suppkey % 3 AS INT) + 1] AS rate,
               CAST((s_suppkey % 2 + 1) * 8 AS INT) AS bits,
               CAST(s_suppkey % 100 + 1 AS BIGINT) AS frames
        FROM supplier)
      SELECT doc_id,
             CAST(44 + frames * channels * (bits // 8) AS INT) AS n_bytes,
             'wav' AS format, channels,
             CAST(rate AS INT) AS sample_rate, bits,
             frames AS n_frames,
             round(CAST(frames AS DOUBLE) / rate, 6) AS duration_s
      FROM p""",
    "q78_frame_plan" -> """
      WITH v AS (
        SELECT s_suppkey AS video_id,
               CAST(s_suppkey % 120 + 10 AS DOUBLE) AS duration_s,
               ([24, 30])[CAST(s_suppkey % 2 AS INT) + 1] AS fps
        FROM supplier)
      SELECT video_id, CAST(t.i AS INT) AS frame_idx,
             round((t.i + 0.5) * duration_s / 4, 6) AS t_s,
             CAST(floor((t.i + 0.5) * duration_s / 4 * fps) AS BIGINT) AS frame_no
      FROM v, unnest(range(4)) AS t(i)"""
  )
}
