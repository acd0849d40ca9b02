package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * runs as a partition-batched kernel over the binary column.
  *
  * The decode kernel does REAL container parsing where pure byte reads
  * suffice — PNG IHDR and JPEG SOF dimensions ([[decodeOne]]) — and falls
  * back to deterministic byte-derived pseudo-features for unrecognized
  * payloads (this environment has no media codecs; a production deployment
  * extends only the fallback branch with codec calls). The Spark-side
  * shape — mapPartitions batching, output schema, null/empty handling,
  * partition preservation — is the production path either way.
  */
object Multimodal {

  // Shadows functions.round: every oracle-compared column rounds with
  // DuckDB-exact semantics (see graft.functions.Rounding) so half-boundary
  // values hash identically on both engines.
  private def round(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    graft.functions.Rounding.dround(c, scale)

  /** Decoded-feature row (the kernel's output schema). `format` is the
    * detected container; for `unknown` the width/height carry the
    * byte-derived stub features (n % 640, n % 480).
    */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, first_byte: Int,
                                 last_byte: Int, format: String,
                                 width: Int, height: Int)

  /** Wrap a text table into the multimodal layout: `(doc_id, payload BINARY,
    * meta STRUCT<mime STRING, n_bytes INT>)`. In production the payload
    * column comes straight from the store (image bytes); here the UTF-8
    * text bytes stand in.
    */
  def attachPayload(df: DataFrame, idCol: String, textCol: String,
                    mime: String = "text/plain"): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit(mime).as("mime"),
        octet_length(col(textCol)).as("n_bytes")).as("meta"))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Decode one payload: PNG dimensions from the IHDR chunk (fixed offsets
    * after the 8-byte signature), JPEG dimensions from the first SOF
    * segment (markers C0-CF except C4/C8/CC), else the stub fallback.
    * Empty/null payloads yield -1 sentinel bytes (decode-failure
    * convention). Pure byte reads — no codec, no allocation.
    */
  private[operators] def decodeOne(id: Long, payload: Array[Byte]): MediaFeatures = {
    val n = if (payload == null) 0 else payload.length
    val first = if (n == 0) -1 else payload(0) & 0xff
    val last = if (n == 0) -1 else payload(n - 1) & 0xff
    def fallback = MediaFeatures(id, n, first, last, "unknown", n % 640, n % 480)
    if (n >= 24 && PngSig.indices.forall(i => payload(i) == PngSig(i)) &&
        payload(12) == 'I' && payload(13) == 'H' && payload(14) == 'D' && payload(15) == 'R')
      MediaFeatures(id, n, first, last, "png", be32(payload, 16), be32(payload, 20))
    else if (n >= 4 && (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 8 < n) {
        if ((payload(i) & 0xff) != 0xff) return fallback // desynced: not a marker
        val m = payload(i + 1) & 0xff
        if (m == 0xff) i += 1 // fill byte
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return MediaFeatures(id, n, first, last, "jpeg",
            be16(payload, i + 7), be16(payload, i + 5))
        else if (m == 0xd9 || m == 0xda) return fallback // EOI/SOS before any SOF
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // no-length markers
        else i += 2 + be16(payload, i + 2)
      }
      fallback
    } else fallback
  }

  /** Partition-batched decode over the binary column — the `mapInPandas`
    * analog in Scala: one kernel invocation per partition, streaming
    * through rows without materializing the partition; input partitioning
    * is preserved (no shuffle).
    */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, payload) => decodeOne(id, payload) })
      .toDF()
  }

  /** Back-compat alias for the pre-round-4 name. */
  def decodeStub(media: DataFrame): DataFrame = decode(media)

  // ---- Audio (WAV/RIFF) ----

  /** Decoded audio features. For non-WAV payloads `format` is "unknown"
    * and the numeric fields are 0 (duration null-equivalent: -1.0 is NOT
    * used — a failed decode is visible through the format column alone).
    */
  final case class AudioFeatures(doc_id: Long, n_bytes: Int, format: String,
                                 channels: Int, sample_rate: Int, bits: Int,
                                 n_frames: Long, duration_s: Double)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Parse a WAV payload's fmt + data chunk headers: channels, sample
    * rate, bit depth, frame count, duration. Chunk-walks the RIFF
    * container (fmt may be preceded by LIST/JUNK chunks; sizes are
    * little-endian, chunks word-aligned). Duration comes from the DECLARED
    * data size — like any header-only prober, it trusts the container.
    * Pure byte reads, no codec.
    */
  private[graft] def decodeAudioOne(id: Long, payload: Array[Byte]): AudioFeatures = {
    val n = if (payload == null) 0 else payload.length
    def fallback = AudioFeatures(id, n, "unknown", 0, 0, 0, 0L, 0.0)
    if (n < 12 || payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' ||
        payload(3) != 'F' || payload(8) != 'W' || payload(9) != 'A' ||
        payload(10) != 'V' || payload(11) != 'E') return fallback
    var channels = 0; var rate = 0; var bits = 0; var dataSize = -1L
    var i = 12
    while (i + 8 <= n && (channels == 0 || dataSize < 0)) {
      val size = le32(payload, i + 4)
      // malformed/hostile size (would move the cursor backwards or past
      // any plausible chunk) → stop walking, fall back
      if (size < 0 || size > Int.MaxValue - 16) return fallback
      if (payload(i) == 'f' && payload(i + 1) == 'm' && payload(i + 2) == 't' &&
          payload(i + 3) == ' ' && i + 8 + 16 <= n) {
        channels = le16(payload, i + 10)
        rate = le32(payload, i + 12).toInt
        bits = le16(payload, i + 22)
      } else if (payload(i) == 'd' && payload(i + 1) == 'a' &&
                 payload(i + 2) == 't' && payload(i + 3) == 'a') {
        dataSize = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || dataSize < 0) fallback
    else {
      val frameBytes = channels * (bits / 8)
      val frames = if (frameBytes == 0) 0L else dataSize / frameBytes
      AudioFeatures(id, n, "wav", channels, rate, bits, frames,
        frames.toDouble / rate)
    }
  }

  /** Partition-batched audio decode — same execution shape as [[decode]]. */
  def decodeAudio(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, payload) => decodeAudioOne(id, payload) })
      .toDF()
  }

  /** Fixture generator: a minimal REAL 44-byte WAV header + zeroed PCM
    * body of the declared size, so [[decodeAudioOne]] exercises the true
    * parse path end-to-end.
    */
  val synthWavUdf: UserDefinedFunction =
    udf((channels: Int, rate: Int, bits: Int, frames: Int) => {
      val dataSize = frames * channels * (bits / 8)
      val out = new Array[Byte](44 + dataSize)
      def putLe32(i: Int, v: Long): Unit = {
        out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
        out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
      }
      def putLe16(i: Int, v: Int): Unit = {
        out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      }
      "RIFF".getBytes.copyToArray(out, 0); putLe32(4, 36L + dataSize)
      "WAVE".getBytes.copyToArray(out, 8)
      "fmt ".getBytes.copyToArray(out, 12); putLe32(16, 16L)
      putLe16(20, 1) // PCM
      putLe16(22, channels); putLe32(24, rate.toLong)
      putLe32(28, rate.toLong * channels * (bits / 8)) // byte rate
      putLe16(32, channels * (bits / 8)); putLe16(34, bits)
      "data".getBytes.copyToArray(out, 36); putLe32(40, dataSize.toLong)
      out
    })

  // ---- Video frame sampling (planning side) ----

  /** Uniform frame-sample plan: for each video row, `k` sample points at
    * the centers of equal duration buckets — `t_i = (i + 0.5) · dur / k`,
    * mapped to a frame number at the video's fps. This is the Spark-side
    * planning table a frame-extraction stage (codec UDF over the payload,
    * stubbed in this environment) consumes; pure expressions, no UDF, no
    * shuffle — the plan explodes k rows per video at scan rate.
    */
  def frameSamplePlan(videos: DataFrame, idCol: String, durCol: String,
                      fpsCol: String, k: Int): DataFrame = {
    require(k > 0, s"frameSamplePlan needs k > 0 samples per video, got $k")
    videos.select(col(idCol), col(durCol), col(fpsCol),
        explode(sequence(lit(0), lit(k - 1))).as("frame_idx"))
      .select(col(idCol), col("frame_idx"),
        round((col("frame_idx") + lit(0.5)) * col(durCol) / lit(k), 6).as("t_s"),
        floor((col("frame_idx") + lit(0.5)) * col(durCol) / lit(k) * col(fpsCol))
          .cast("long").as("frame_no"))
  }

  /** Fixture generator: wrap `body` text bytes in a minimal REAL container
    * header so the parse path is exercised end-to-end — a PNG signature +
    * IHDR (zeroed CRC; [[decodeOne]] doesn't verify CRCs, like any
    * dimensions-only sniffer) or a JPEG SOI + SOF0 + trailing EOI.
    */
  val synthImageUdf: UserDefinedFunction =
    udf((kind: String, w: Int, h: Int, body: String) => {
      val text = if (body == null) Array.empty[Byte] else body.getBytes("UTF-8")
      kind match {
        case "png" =>
          val out = new Array[Byte](33 + text.length)
          PngSig.copyToArray(out)
          out(11) = 13 // IHDR data length
          out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
          out(16) = (w >> 24).toByte; out(17) = (w >> 16).toByte
          out(18) = (w >> 8).toByte; out(19) = w.toByte
          out(20) = (h >> 24).toByte; out(21) = (h >> 16).toByte
          out(22) = (h >> 8).toByte; out(23) = h.toByte
          out(24) = 8 // bit depth; color/compression/filter/interlace + crc stay 0
          text.copyToArray(out, 33)
          out
        case "jpeg" =>
          val out = new Array[Byte](14 + text.length)
          out(0) = 0xff.toByte; out(1) = 0xd8.toByte // SOI
          out(2) = 0xff.toByte; out(3) = 0xc0.toByte // SOF0
          out(4) = 0; out(5) = 8 // segment length
          out(6) = 8 // precision
          out(7) = (h >> 8).toByte; out(8) = h.toByte
          out(9) = (w >> 8).toByte; out(10) = w.toByte
          out(11) = 0 // component count
          text.copyToArray(out, 12)
          out(12 + text.length) = 0xff.toByte
          out(13 + text.length) = 0xd9.toByte // EOI
          out
        case _ => text
      }
    })
}
