package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/** The correctness-gate Zarr fixture: a consolidated Zarr v2 store built
  * deterministically from the `events` gate table, so `spark.read
  * .format("zarr")` results can be value-compared against a DuckDB
  * oracle over the SAME parquet rows (the round-13 VERDICT item — the
  * native source's first rows+schema+hash evidence, mirroring
  * `qaqc/dashboard.py:305-313`'s store-scan role).
  *
  * Layout contract (what the oracle replicates in SQL):
  *  - rows = the first [[SliceRows]] events by `event_id` (a total
  *    order — unique at every scale incl. grown layouts), re-sorted by
  *    `(ts, event_id)` so the store's record coordinate is ascending
  *    (every reference store is time-sorted; enables `sortedCoord`);
  *  - `time` = ts as int64 CF "microseconds since 1970-01-01" (exact
  *    µs round-trip), zlib; `event_id` int64 zlib; `user_id` int64 raw;
  *    `value` f8 zlib; `value_gapped` f8 zlib with NaN planted at
  *    `event_id % 13 == 3` AND record chunk 3 (store rows 768..1023,
  *    when it exists) left UNWRITTEN → a fill_value(NaN) run — so the
  *    gate exercises NaN→null decode and the missing-chunk path, both
  *    SQL-expressible (rn BETWEEN 769 AND 1024 over the same ordering);
  *  - `etype` = event_type as a |S10 fixed-width NUL-padded string
  *    array (zlib) — the string-dtype decode on the oracle gate;
  *  - `etype_vlen` = the SAME event_type as an object (`|O`) array
  *    behind the numcodecs `vlen-utf8` filter + zlib — xarray's default
  *    str encoding (round-14: the variable-length decode on the oracle
  *    gate, value-identical to `etype` by construction);
  *  - `flag` = (event_id % 2 == 0) as a raw `|b1` bool array with a
  *    JSON-boolean fill — the widened-dtype decode on the oracle gate;
  *  - `stamp` = ts as a raw `<M8[ns]` datetime64 array (ns = µs·1000,
  *    exact) with NaT planted at `event_id % 11 == 7` — the round-14
  *    raw-datetime decode on the oracle gate (NaT → null timestamp);
  *  - `eid_delta` = event_id behind a numcodecs `delta` filter
  *    (dtype `<i8`, astype `<i4`) + zlib — the round-15 filter-chain
  *    decode on the oracle gate (value-identical to `event_id`);
  *  - `press` = `(event_id % 9000) · 0.25 − 1000` behind a
  *    `[fixedscaleoffset(offset −1000, scale 4, astype <i2), shuffle]`
  *    CHAIN + zlib — every value an exact quarter (scale is a power of
  *    two), so the oracle expresses the decode as
  *    `(event_id % 9000) / 4.0 - 1000.0` with zero rounding ambiguity;
  *  - `day` = ts floored to epoch days as a raw `<M8[D]` array
  *    (DateType) with NaT planted at `event_id % 17 == 11` — the
  *    round-15 day-unit decode on the oracle gate;
  *  - `hstamp` / `mstamp` = ts floored to hours / minutes as raw
  *    `<M8[h]` / `<M8[m]` arrays (NaT at `event_id % 19 == 13` /
  *    `% 23 == 17`) — the round-16 coarse-unit datetime decode;
  *  - `seq4` = `event_id % 100000` as `<i4` behind a blosc frame with
  *    the BIT-shuffle flag, zlib blocks of 400 bytes (100 elements —
  *    NOT a multiple of 8, so the c-blosc round-to-8 + leftover-copy
  *    path is on the oracle gate), and `qflag` = `event_id % 5` as
  *    `|i1` behind a bitshuffled STORED-block frame — round-16;
  *  - `tags` = a 2-D (time × slot, n × 3) `|S16` array with
  *    `tags[k] = event_type || '_' || k`, trailing dim chunked [2]
  *    (widths 2+1) — the round-16 2-D string stitch on the oracle gate;
  *  - `spectrum` = a 2-D (time × band, n × 4) f8 array with
  *    spectrum[k] = value · (k+1) (IEEE-exact in both engines) and a
  *    NaN element at (event_id % 7 == 5, band 2) — trailing dim chunked
  *    [3] so the gate exercises col-chunk STITCHING (widths 3+1), the
  *    round-13 2-D contract;
  *  - `spec_f` = the SAME spectrum values with `order: "F"` (each chunk
  *    stored column-major) — the round-18 v2 Fortran-order decode,
  *    value-identical to `spectrum` by construction;
  *  - `beam3` = a rank-3 (time × bin × beam, n × 3 × 2) f8 array with
  *    beam3[j][k] = value · (j+1) + k · 0.5 and a NaN element at
  *    (event_id % 7 == 5, bin 1, beam 0), bins chunked [2] (widths
  *    2+1), beams chunked [1] — the round-18 nested-array decode with
  *    stitch seams in BOTH trailing dims.
  *
  * The store is rebuilt once per (layout, JVM) into a fresh temp dir —
  * a 4000-row driver-side write, ~1 MB — never cached across processes
  * (a regenerated testdata layout must never serve a stale store).
  */
object ZarrGateStore {
  val SliceRows = 4000
  val Chunk = 256
  /** The record chunk of `value_gapped` left unwritten (fill run). */
  val MissingChunk = 3
  /** spectrum's trailing-dim extent and chunk (4 split as 3+1). */
  val Bands = 4
  val BandChunk = 3
  /** tags' trailing-dim extent and chunk (3 split as 2+1). */
  val Slots = 3
  val SlotChunk = 2
  /** seq4's blosc blocksize: 100 i4 elements — deliberately NOT a
    * multiple of 8, so every full block exercises bitshuffle's
    * round-to-8 + 4-element verbatim tail.
    */
  val BitBlockBytes = 400
  /** v3 sharding geometry (round-17): record-dim shard extents for the
    * 2-inner (`eid_sh`, `spec_sh`) and 4-inner (`value_sh`) shards, and
    * the GLOBAL inner-chunk index of value_sh left as the all-ones
    * index sentinel (rows 513..768 1-based → a fill-NaN run).
    */
  val ShardRec = 2 * Chunk
  val ShardRecBig = 4 * Chunk
  val ShardMissingInner = 2
  /** spec3/spec_sh trailing-dim chunk (Bands = 4 split 2 + 2 — evenly,
    * as v3 sharding requires of inner chunks).
    */
  val SpecColChunk = 2
  /** beam3's rank-3 geometry (round-18): (time × bin × beam) with bins
    * chunked [2] (widths 2+1 — a padded trailing edge) and beams
    * chunked [1] (two files along the last dim), so the 3-D stitch
    * crosses chunk seams in BOTH trailing dimensions.
    */
  val Bins = 3
  val BinChunk = 2
  val Beams = 2
  val BeamChunk = 1

  private val built = scala.collection.concurrent.TrieMap.empty[String, String]
  private val builtV3 = scala.collection.concurrent.TrieMap.empty[String, String]

  def store(spark: SparkSession, dir: String): String =
    built.getOrElseUpdate(new java.io.File(dir).getAbsolutePath,
      build(spark, dir))

  /** The v3 twin (round-16): the same events slice written as a Zarr v3
    * store — root `zarr.json` with consolidated_metadata, `c/<i>` chunk
    * names, codecs lists — so the v3 metadata dialect and the crc32c /
    * zstd / vlen codec paths get oracle rows, not just spec pins.
    * Arrays: `time` (int64 CF-µs attrs), `event_id` (int64 raw),
    * `value` (float64, zstd + crc32c, NaN for null), `etype`
    * (string, vlen-utf8 + zstd).
    */
  def storeV3(spark: SparkSession, dir: String): String =
    builtV3.getOrElseUpdate(new java.io.File(dir).getAbsolutePath,
      buildV3(spark, dir))

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** A c-blosc chunk frame with the BIT-shuffle flag (0x4) set: 16-byte
    * header (format version 2), int32-LE block starts, then per block an
    * int32-LE csize + payload — zlib-compressed (codec id 3) when that
    * wins, STORED (csize == uncompressed size) otherwise. Each block's
    * payload is `bitshuffleBytes` of its slice, exactly what
    * [[ZarrMeta.bitunshuffle]] inverts.
    */
  private def bloscBitFrame(raw: Array[Byte], typesize: Int, blocksize: Int,
                            deflateBlocks: Boolean): Array[Byte] = {
    val nbytes = raw.length
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val blocks = (0 until nblocks).map { i =>
      val ubs = math.min(blocksize, nbytes - i * blocksize)
      val sh = ZarrMeta.bitshuffleBytes(
        java.util.Arrays.copyOfRange(raw, i * blocksize, i * blocksize + ubs),
        typesize)
      val comp = if (deflateBlocks) deflateBytes(sh) else sh
      if (comp.length < ubs) (comp, ubs) else (sh, ubs)
    }
    val headerAndStarts = 16 + 4 * nblocks
    val offsets = blocks.scanLeft(headerAndStarts) {
      case (off, (data, _)) => off + 4 + data.length
    }
    val bb = ByteBuffer.allocate(offsets.last).order(ByteOrder.LITTLE_ENDIAN)
    val flags = 0x4 | (3 << 5) // bit-shuffle, zlib inner codec
    bb.put(2.toByte).put(1.toByte).put(flags.toByte).put(typesize.toByte)
    bb.putInt(nbytes).putInt(blocksize).putInt(offsets.last)
    offsets.init.foreach(bb.putInt)
    blocks.foreach { case (data, ubs) =>
      bb.putInt(if (data.length == ubs) ubs else data.length)
      bb.put(data)
    }
    bb.array()
  }

  private def buildV3(spark: SparkSession, dir: String): String = {
    val slice = Tables.events(spark, dir)
      .select("event_id", "ts", "value", "event_type")
      .orderBy("event_id").limit(SliceRows)
      .collect()
      .sortBy(r => (micros(r.getTimestamp(1)), r.getLong(0)))
    val n = slice.length
    require(n > 0, s"zarr v3 gate store: $dir/events.parquet is empty")
    val out = Files.createTempDirectory("graft_zarr_v3_gate").toString
    val nChunks = (n + Chunk - 1) / Chunk
    def put(arr: String, c: Int, bytes: Array[Byte]): Unit = {
      Files.createDirectories(Paths.get(out, arr, "c"))
      Files.write(Paths.get(out, arr, "c", c.toString), bytes)
    }
    def leL(vs: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putLong); bb.array()
    }
    def withCrc(src: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32C()
      crc.update(src, 0, src.length)
      val bb = ByteBuffer.allocate(src.length + 4).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(src).putInt(crc.getValue.toInt)
      bb.array()
    }
    def zstd(src: Array[Byte]): Array[Byte] =
      com.github.luben.zstd.Zstd.compress(src, 3)
    val time = slice.map(r => micros(r.getTimestamp(1)))
    val eventId = slice.map(_.getLong(0))
    val value = slice.map(r => if (r.isNullAt(2)) Double.NaN else r.getDouble(2))
    val etype = slice.map(_.getString(3))
    def leD(vs: Array[Double]): Array[Byte] = {
      val bb = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putDouble); bb.array()
    }
    // one padded record chunk of a 1-D array (rows past n → pad)
    def chunkL(a: Array[Long], c: Int, pad: Long): Array[Long] =
      Array.tabulate(Chunk)(k => if (c * Chunk + k < n) a(c * Chunk + k) else pad)
    def chunkD(a: Array[Double], c: Int): Array[Double] =
      Array.tabulate(Chunk)(k => if (c * Chunk + k < n) a(c * Chunk + k) else Double.NaN)
    // assemble one SHARD file: data region (present inner chunks
    // back-to-back, C-order) + uint64-LE (offset, nbytes) index —
    // all-ones sentinel for absent inners — at `end` or `start`,
    // crc32c-framed when `idxCrc`
    def shardFile(inners: Seq[Option[Array[Byte]]], atEnd: Boolean,
                  idxCrc: Boolean): Array[Byte] = {
      val idxLen = inners.size * 16 + (if (idxCrc) 4 else 0)
      val dataLen = inners.flatten.map(_.length).sum
      val dataBase = if (atEnd) 0L else idxLen.toLong
      val idx = ByteBuffer.allocate(idxLen).order(ByteOrder.LITTLE_ENDIAN)
      val data = new java.io.ByteArrayOutputStream()
      var pos = dataBase
      inners.foreach {
        case Some(b) =>
          idx.putLong(pos).putLong(b.length.toLong)
          data.write(b, 0, b.length); pos += b.length
        case None => idx.putLong(-1L).putLong(-1L)
      }
      if (idxCrc) {
        val crc = new java.util.zip.CRC32C()
        crc.update(idx.array(), 0, inners.size * 16)
        idx.putInt(crc.getValue.toInt)
      }
      val out = ByteBuffer.allocate(idxLen + dataLen)
      if (atEnd) out.put(data.toByteArray).put(idx.array())
      else out.put(idx.array()).put(data.toByteArray)
      out.array()
    }
    def putShard(arr: String, key: Seq[Int], bytes: Array[Byte]): Unit = {
      val p = Paths.get(out, (arr +: "c" +: key.init.map(_.toString)): _*)
      Files.createDirectories(p)
      Files.write(p.resolve(key.last.toString), bytes)
    }
    // eid_sh: int64, raw inner chunks, shard [ShardRec] of [Chunk]
    // inners, index at START, index_codecs [bytes] (no crc)
    val innersPerShard = ShardRec / Chunk
    val nShards = (nChunks + innersPerShard - 1) / innersPerShard
    for (s <- 0 until nShards) {
      val inners = (0 until innersPerShard).map { i =>
        val c = s * innersPerShard + i
        if (c >= nChunks) None else Some(leL(chunkL(eventId, c, 0L)))
      }
      putShard("eid_sh", Seq(s), shardFile(inners, atEnd = false, idxCrc = false))
    }
    // value_sh: float64, inner [bytes, zstd, crc32c], shard [ShardRecBig]
    // of [Chunk] inners, index at END + crc32c; global inner chunk
    // [[ShardMissingInner]] is the all-ones SENTINEL (fill-NaN run)
    val innersPerBig = ShardRecBig / Chunk
    val nBigShards = (nChunks + innersPerBig - 1) / innersPerBig
    for (s <- 0 until nBigShards) {
      val inners = (0 until innersPerBig).map { i =>
        val c = s * innersPerBig + i
        if (c >= nChunks || c == ShardMissingInner) None
        else Some(withCrc(zstd(leD(chunkD(value, c)))))
      }
      putShard("value_sh", Seq(s), shardFile(inners, atEnd = true, idxCrc = true))
    }
    // stamp3: raw numpy.datetime64[ns] (ts µs · 1000 — exact), NaT at
    // event_id % 11 == 7 (the v2 `stamp` convention, q154's twin)
    val NaT = Long.MinValue
    val stamp3 = Array.tabulate(n)(i =>
      if (eventId(i) % 11 == 7) NaT else time(i) * 1000L)
    // spec3: 2-D (n × Bands) float64 behind [transpose [1,0], bytes,
    // zstd] — stored F-order per (Chunk × SpecColChunk) chunk — with
    // spec3[k] = value · (k+1) and a NaN element at
    // (event_id % 7 == 5, band 2), trailing dim chunked [SpecColChunk]
    def specVal(i: Int, k: Int): Double =
      if (eventId(i) % 7 == 5 && k == 2) Double.NaN else value(i) * (k + 1)
    val nColChunks = (Bands + SpecColChunk - 1) / SpecColChunk
    def specChunkC(c: Int, t: Int): Array[Double] = {
      // C-order (row-major) elements of chunk (c, t), padded with NaN
      val w = math.min(SpecColChunk, Bands - t * SpecColChunk)
      Array.tabulate(Chunk * SpecColChunk) { e =>
        val i = c * Chunk + e / SpecColChunk
        val j = e % SpecColChunk
        if (i < n && j < w) specVal(i, t * SpecColChunk + j) else Double.NaN
      }
    }
    for (c <- 0 until nChunks; t <- 0 until nColChunks) {
      val corder = specChunkC(c, t)
      // stored layout under transpose [1, 0]: element (i, j) of the
      // (Chunk × SpecColChunk) grid at stored position j·Chunk + i
      val stored = new Array[Double](corder.length)
      for (i <- 0 until Chunk; j <- 0 until SpecColChunk)
        stored(j * Chunk + i) = corder(i * SpecColChunk + j)
      putShard("spec3", Seq(c, t), zstd(leD(stored)))
    }
    // spec_sh: the same 2-D values SHARDED — outer [ShardRec × Bands],
    // inner [Chunk × SpecColChunk] (2 × 2 inners per shard, C-order
    // index), inner [bytes, zstd], index at END + crc32c
    for (s <- 0 until nShards) {
      val inners = for (i0 <- 0 until innersPerShard; i1 <- 0 until nColChunks)
        yield {
          val c = s * innersPerShard + i0
          if (c >= nChunks) None else Some(zstd(leD(specChunkC(c, i1))))
        }
      putShard("spec_sh", Seq(s, 0), shardFile(inners, atEnd = true, idxCrc = true))
    }
    // beam3_sh: the rank-3 (time × bin × beam) shape SHARDED (round-19)
    // — outer [ShardRec, 2, 2], inner [Chunk, BinChunk, BeamChunk] =
    // [Chunk, 2, 1] → 2 × 1 × 2 inners per shard, C-order index over
    // the rank-3 inner grid, inner [bytes, zstd], index END + crc32c.
    // Bins = 3 → the s1 = 1 bin-shard is EDGE-PADDED (bin 3 = NaN pad);
    // values are the v2 beam3 formula, so the q166 oracle shape
    // re-oracles the sharded rank-3 read byte-for-byte.
    def beamVal(i: Int, j: Int, k: Int): Double =
      if (value(i).isNaN || (eventId(i) % 7 == 5 && j == 1 && k == 0))
        Double.NaN
      else value(i) * (j + 1) + k * 0.5
    def beamInner(c: Int, t1: Int, t2: Int): Array[Double] =
      Array.tabulate(Chunk * BinChunk * BeamChunk) { e =>
        val r = e / (BinChunk * BeamChunk)
        val jj = (e / BeamChunk) % BinChunk
        val kk = e % BeamChunk
        val row = c * Chunk + r
        val bin = t1 * BinChunk + jj
        val beam = t2 * BeamChunk + kk
        if (row >= n || bin >= Bins || beam >= Beams) Double.NaN
        else beamVal(row, bin, beam)
      }
    val nBinShards = (Bins + BinChunk - 1) / BinChunk // shard bin extent = BinChunk
    val beamsPerShard = 2 / BeamChunk // shard beam extent 2, inner 1
    for (s0 <- 0 until nShards; s1 <- 0 until nBinShards) {
      val inners =
        for (i0 <- 0 until innersPerShard; i1 <- 0 until 1;
             i2 <- 0 until beamsPerShard) yield {
          val c = s0 * innersPerShard + i0
          if (c >= nChunks) None
          else Some(zstd(leD(beamInner(c, s1 + i1, i2))))
        }
      putShard("beam3_sh", Seq(s0, s1, 0),
        shardFile(inners, atEnd = true, idxCrc = true))
    }
    for (c <- 0 until nChunks) {
      put("stamp3", c, leL(chunkL(stamp3, c, NaT)))
      def padL(a: Array[Long]): Array[Long] =
        Array.tabulate(Chunk)(k => if (c * Chunk + k < n) a(c * Chunk + k) else 0L)
      put("time", c, leL(padL(time)))
      put("event_id", c, leL(padL(eventId)))
      val vb = ByteBuffer.allocate(Chunk * 8).order(ByteOrder.LITTLE_ENDIAN)
      for (k <- 0 until Chunk)
        vb.putDouble(if (c * Chunk + k < n) value(c * Chunk + k) else Double.NaN)
      put("value", c, withCrc(zstd(vb.array())))
      val bos = new java.io.ByteArrayOutputStream()
      def u4le(v: Int): Unit = {
        bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
        bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
      }
      u4le(Chunk)
      for (k <- 0 until Chunk) {
        val s = if (c * Chunk + k < n) etype(c * Chunk + k) else ""
        val b = s.getBytes("UTF-8"); u4le(b.length); bos.write(b, 0, b.length)
      }
      put("etype", c, zstd(bos.toByteArray))
    }
    val bytesLE = """{"name": "bytes", "configuration": {"endian": "little"}}"""
    def arr(dtype: String, fill: String, codecs: String,
            attrs: String = "{}"): String =
      s"""{"zarr_format": 3, "node_type": "array", "shape": [$n],
          "data_type": $dtype,
          "chunk_grid": {"name": "regular",
            "configuration": {"chunk_shape": [$Chunk]}},
          "chunk_key_encoding": {"name": "default",
            "configuration": {"separator": "/"}},
          "fill_value": $fill, "codecs": $codecs,
          "dimension_names": ["time"], "attributes": $attrs}"""
    val zstdC = """{"name": "zstd", "configuration": {"level": 3}}"""
    // a 2-D / sharded / extension-dtype array entry (shape, grid and
    // codec lists fully caller-specified)
    def arr2(shape: String, dtype: String, fill: String, grid: String,
             codecs: String, dims: String): String =
      s"""{"zarr_format": 3, "node_type": "array", "shape": $shape,
          "data_type": $dtype,
          "chunk_grid": {"name": "regular",
            "configuration": {"chunk_shape": $grid}},
          "chunk_key_encoding": {"name": "default",
            "configuration": {"separator": "/"}},
          "fill_value": $fill, "codecs": $codecs,
          "dimension_names": $dims, "attributes": {}}"""
    def sharded(inner: String, codecs: String, indexCodecs: String,
                loc: String): String =
      s"""[{"name": "sharding_indexed", "configuration": {
            "chunk_shape": $inner, "codecs": $codecs,
            "index_codecs": $indexCodecs, "index_location": "$loc"}}]"""
    val idxPlain = s"[$bytesLE]"
    val idxCrc = s"""[$bytesLE, {"name": "crc32c"}]"""
    val meta = s"""{"zarr_format": 3, "node_type": "group",
      "consolidated_metadata": {"kind": "inline", "must_understand": false,
        "metadata": {
          "time": ${arr("\"int64\"", "0", s"[$bytesLE]",
            """{"units": "microseconds since 1970-01-01",
                "calendar": "proleptic_gregorian"}""")},
          "event_id": ${arr("\"int64\"", "0", s"[$bytesLE]")},
          "value": ${arr("\"float64\"", "\"NaN\"",
            s"""[$bytesLE, $zstdC,
                {"name": "crc32c"}]""")},
          "etype": ${arr("\"string\"", "\"\"",
            """[{"name": "vlen-utf8"}, {"name": "zstd"}]""")},
          "eid_sh": ${arr2(s"[$n]", "\"int64\"", "0", s"[$ShardRec]",
            sharded(s"[$Chunk]", s"[$bytesLE]", idxPlain, "start"),
            """["time"]""")},
          "value_sh": ${arr2(s"[$n]", "\"float64\"", "\"NaN\"",
            s"[$ShardRecBig]",
            sharded(s"[$Chunk]", s"[$bytesLE, $zstdC, {\"name\": \"crc32c\"}]",
              idxCrc, "end"),
            """["time"]""")},
          "stamp3": ${arr2(s"[$n]",
            """{"name": "numpy.datetime64",
                "configuration": {"unit": "ns", "scale_factor": 1}}""",
            "\"NaT\"", s"[$Chunk]", s"[$bytesLE]", """["time"]""")},
          "spec3": ${arr2(s"[$n, $Bands]", "\"float64\"", "\"NaN\"",
            s"[$Chunk, $SpecColChunk]",
            s"""[{"name": "transpose", "configuration": {"order": [1, 0]}},
                 $bytesLE, $zstdC]""",
            """["time", "band"]""")},
          "spec_sh": ${arr2(s"[$n, $Bands]", "\"float64\"", "\"NaN\"",
            s"[$ShardRec, $Bands]",
            sharded(s"[$Chunk, $SpecColChunk]", s"[$bytesLE, $zstdC]",
              idxCrc, "end"),
            """["time", "band"]""")},
          "beam3_sh": ${arr2(s"[$n, $Bins, $Beams]", "\"float64\"",
            "\"NaN\"", s"[$ShardRec, $BinChunk, ${2 * BeamChunk}]",
            sharded(s"[$Chunk, $BinChunk, $BeamChunk]",
              s"[$bytesLE, $zstdC]", idxCrc, "end"),
            """["time", "bin", "beam"]""")}}}}"""
    Files.write(Paths.get(out, "zarr.json"), meta.getBytes("UTF-8"))
    out
  }

  private def deflateBytes(src: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(src); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

  private def build(spark: SparkSession, dir: String): String = {
    val slice = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "value", "event_type")
      .orderBy("event_id").limit(SliceRows)
      .collect()
      .sortBy(r => (micros(r.getTimestamp(1)), r.getLong(0)))
    val n = slice.length
    require(n > 0, s"zarr gate store: $dir/events.parquet is empty")
    // ts / user_id / event_type are NOT NULL in every testdata
    // generation to date; a regen that breaks that must fail HERE with
    // the row, not as an NPE or a confusing oracle hash mismatch (null
    // value is the one nullable column both sides treat as missing)
    slice.foreach { r =>
      require(!r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(4),
        s"zarr gate store: null ts/user_id/event_type at event_id=" +
          s"${r.getLong(0)} — the store layout assumes these NOT NULL")
    }
    val time = slice.map(r => micros(r.getTimestamp(1)))
    val eventId = slice.map(_.getLong(0))
    val userId = slice.map(_.getLong(2))
    val value = slice.map(r => if (r.isNullAt(3)) Double.NaN else r.getDouble(3))
    val gapped = slice.map { r =>
      if (r.isNullAt(3) || r.getLong(0) % 13 == 3) Double.NaN else r.getDouble(3)
    }
    val spectrum: Array[Array[Double]] = slice.map { r =>
      Array.tabulate(Bands)(k =>
        if (r.isNullAt(3) || (r.getLong(0) % 7 == 5 && k == 2)) Double.NaN
        else r.getDouble(3) * (k + 1))
    }
    val etype: Array[String] = slice.map(_.getString(4))
    // raw datetime64 twin of ts: <M8[ns] epoch offsets with NaT planted
    // at event_id % 11 == 7 — the round-14 datetime decode on the oracle
    // gate (ns = µs·1000, exact in int64 well past 2200; NaT → null)
    val stampNs: Array[Long] = slice.map(r =>
      if (r.getLong(0) % 11 == 7) Long.MinValue
      else Math.multiplyExact(micros(r.getTimestamp(1)), 1000L))
    // M8[D] twin: ts floored to epoch days, NaT at event_id % 17 == 11
    val dayOf: Array[Long] = slice.map(r =>
      if (r.getLong(0) % 17 == 11) Long.MinValue
      else Math.floorDiv(micros(r.getTimestamp(1)), 86400000000L))
    // fixedscaleoffset payload: m = event_id % 9000 fits <i2 exactly
    val pressEnc: Array[Short] = slice.map(r => (r.getLong(0) % 9000).toShort)
    // M8[h] / M8[m] twins: ts floored to hours / minutes, NaT planted
    val hourOf: Array[Long] = slice.map(r =>
      if (r.getLong(0) % 19 == 13) Long.MinValue
      else Math.floorDiv(micros(r.getTimestamp(1)), 3600000000L))
    val minuteOf: Array[Long] = slice.map(r =>
      if (r.getLong(0) % 23 == 17) Long.MinValue
      else Math.floorDiv(micros(r.getTimestamp(1)), 60000000L))
    // bitshuffle payloads (both SQL-recomputable from event_id)
    val seq4: Array[Int] = slice.map(r => (r.getLong(0) % 100000).toInt)
    val qflag: Array[Byte] = slice.map(r => (r.getLong(0) % 5).toByte)
    // 2-D |S16 strings: tags[k] = event_type || '_' || k
    val tags: Array[Array[String]] = slice.map(r =>
      Array.tabulate(Slots)(k => s"${r.getString(4)}_$k"))

    val out = Files.createTempDirectory("graft_zarr_gate").toString
    val nChunks = (n + Chunk - 1) / Chunk
    def put(arr: String, c: Int, bytes: Array[Byte]): Unit = {
      Files.createDirectories(Paths.get(out, arr))
      Files.write(Paths.get(out, arr, c.toString), bytes)
    }
    def leL(vs: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putLong); bb.array()
    }
    def leD(vs: Array[Double]): Array[Byte] = {
      val bb = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putDouble); bb.array()
    }
    def deflate(src: Array[Byte]): Array[Byte] = deflateBytes(src)
    // on-disk chunks are PADDED to the full chunk length (zarr spec)
    def padL(a: Array[Long], c: Int): Array[Long] =
      Array.tabulate(Chunk)(k => if (c * Chunk + k < n) a(c * Chunk + k) else 0L)
    def padD(a: Array[Double], c: Int): Array[Double] =
      Array.tabulate(Chunk)(k =>
        if (c * Chunk + k < n) a(c * Chunk + k) else Double.NaN)
    for (c <- 0 until nChunks) {
      put("time", c, deflate(leL(padL(time, c))))
      put("event_id", c, deflate(leL(padL(eventId, c))))
      put("user_id", c, leL(padL(userId, c)))
      put("value", c, deflate(leD(padD(value, c))))
      if (c != MissingChunk) // fill_value(NaN) run when it exists
        put("value_gapped", c, deflate(leD(padD(gapped, c))))
      // |S10 fixed-width strings, NUL-padded, zlib. A value wider than
      // the dtype would TRUNCATE and hash-fail the oracle confusingly —
      // fail at build time with the value instead (a regenerated events
      // table with longer event types raises here, loudly)
      val sBuf = new Array[Byte](Chunk * 10)
      for (r <- 0 until Chunk if c * Chunk + r < n) {
        val b = etype(c * Chunk + r).getBytes("UTF-8")
        require(b.length <= 10,
          s"zarr gate store: event_type '${etype(c * Chunk + r)}' exceeds " +
            "the |S10 dtype — widen etype's dtype in ZarrGateStore")
        System.arraycopy(b, 0, sBuf, r * 10, b.length)
      }
      put("etype", c, deflate(sBuf))
      // the same values as a VLenUTF8 object chunk (numcodecs format:
      // u4-LE item count, then per item u4-LE length + UTF-8 bytes;
      // edge chunks padded with "" like numpy's 0-fill)
      val items = Array.tabulate(Chunk)(r =>
        if (c * Chunk + r < n) etype(c * Chunk + r) else "")
      val vbos = new java.io.ByteArrayOutputStream()
      def u4le(v: Int): Unit = {
        vbos.write(v & 0xff); vbos.write((v >> 8) & 0xff)
        vbos.write((v >> 16) & 0xff); vbos.write((v >> 24) & 0xff)
      }
      u4le(items.length)
      items.foreach { s =>
        val b = s.getBytes("UTF-8"); u4le(b.length); vbos.write(b, 0, b.length)
      }
      put("etype_vlen", c, deflate(vbos.toByteArray))
      // |b1 bool, raw bytes
      put("flag", c, Array.tabulate[Byte](Chunk)(r =>
        if (c * Chunk + r < n && eventId(c * Chunk + r) % 2 == 0) 1 else 0))
      // <M8[ns] raw datetime64, zlib (pad value never read)
      put("stamp", c, deflate(leL(padL(stampNs, c))))
      // <M8[D] raw datetime64 day unit, zlib
      put("day", c, deflate(leL(padL(dayOf, c))))
      // <M8[h] / <M8[m] raw datetime64 coarse units, zlib
      put("hstamp", c, deflate(leL(padL(hourOf, c))))
      put("mstamp", c, deflate(leL(padL(minuteOf, c))))
      // <i4 behind a blosc BIT-shuffle frame with zlib blocks of
      // BitBlockBytes (100 elements → round-to-96 + 4-element tail on
      // every full block)
      val sBytes = ByteBuffer.allocate(Chunk * 4).order(ByteOrder.LITTLE_ENDIAN)
      for (k <- 0 until Chunk)
        sBytes.putInt(if (c * Chunk + k < n) seq4(c * Chunk + k) else 0)
      put("seq4", c, bloscBitFrame(sBytes.array(), typesize = 4,
        blocksize = BitBlockBytes, deflateBlocks = true))
      // |i1 behind a bitshuffled STORED-block blosc frame (one block)
      val qBytes = Array.tabulate[Byte](Chunk)(k =>
        if (c * Chunk + k < n) qflag(c * Chunk + k) else 0)
      put("qflag", c, bloscBitFrame(qBytes, typesize = 1,
        blocksize = Chunk, deflateBlocks = false))
      // 2-D |S16 string chunks: (Chunk × SlotChunk) row-major,
      // NUL-padded elements, zlib — col chunks of widths 2+1
      for (j <- 0 until (Slots + SlotChunk - 1) / SlotChunk) {
        val buf = new Array[Byte](Chunk * SlotChunk * 16)
        for (r <- 0 until Chunk; k <- 0 until SlotChunk) {
          val row = c * Chunk + r; val colIdx = j * SlotChunk + k
          if (row < n && colIdx < Slots) {
            val b = tags(row)(colIdx).getBytes("UTF-8")
            require(b.length <= 16,
              s"zarr gate store: tag '${tags(row)(colIdx)}' exceeds the " +
                "|S16 dtype — widen tags' dtype in ZarrGateStore")
            System.arraycopy(b, 0, buf, (r * SlotChunk + k) * 16, b.length)
          }
        }
        Files.createDirectories(Paths.get(out, "tags"))
        Files.write(Paths.get(out, "tags", s"$c.$j"), deflate(buf))
      }
      // delta(<i8 → <i4) + zlib: encode restarts per chunk (enc[0] is
      // the chunk's first raw value). Every encoded value must fit the
      // astype — fail HERE with the value if a regenerated layout grows
      // event ids past i4, never as a silent wrong decode
      val padEid = padL(eventId, c)
      val enc = Array.tabulate(Chunk) { k =>
        val d = if (k == 0) padEid(0) else padEid(k) - padEid(k - 1)
        require(d >= Int.MinValue && d <= Int.MaxValue,
          s"zarr gate store: delta $d of eid_delta exceeds the <i4 astype " +
            "— widen the astype in ZarrGateStore")
        d.toInt
      }
      val encBytes = ByteBuffer.allocate(Chunk * 4).order(ByteOrder.LITTLE_ENDIAN)
      enc.foreach(encBytes.putInt)
      put("eid_delta", c, deflate(encBytes.array()))
      // [fixedscaleoffset(<f8 → <i2), shuffle(2)] + zlib: on-disk bytes
      // are zlib(shuffle(i2-LE(m)))
      val pBytes = ByteBuffer.allocate(Chunk * 2).order(ByteOrder.LITTLE_ENDIAN)
      for (k <- 0 until Chunk)
        pBytes.putShort(if (c * Chunk + k < n) pressEnc(c * Chunk + k) else 0)
      val pArr = pBytes.array()
      val shuffled = new Array[Byte](pArr.length)
      val neles = pArr.length / 2
      for (i <- 0 until neles; b <- 0 until 2)
        shuffled(b * neles + i) = pArr(i * 2 + b)
      put("press", c, deflate(shuffled))
      // 2-D chunks: (Chunk × BandChunk) row-major, padded in BOTH dims
      for (j <- 0 until (Bands + BandChunk - 1) / BandChunk) {
        val buf = new Array[Double](Chunk * BandChunk)
        for (r <- 0 until Chunk; k <- 0 until BandChunk) {
          val row = c * Chunk + r; val colIdx = j * BandChunk + k
          buf(r * BandChunk + k) =
            if (row >= n || colIdx >= Bands) Double.NaN
            else spectrum(row)(colIdx)
        }
        Files.createDirectories(Paths.get(out, "spectrum"))
        Files.write(Paths.get(out, "spectrum", s"$c.$j"), deflate(leD(buf)))
        // spec_f: the SAME spectrum chunk stored Fortran-order
        // (`order: "F"` — element (r, k) at stored position k·Chunk + r),
        // the round-18 v2 F-order decode on the oracle gate
        val stored = new Array[Double](Chunk * BandChunk)
        for (r <- 0 until Chunk; k <- 0 until BandChunk)
          stored(k * Chunk + r) = buf(r * BandChunk + k)
        Files.createDirectories(Paths.get(out, "spec_f"))
        Files.write(Paths.get(out, "spec_f", s"$c.$j"), deflate(leD(stored)))
      }
      // beam3: rank-3 (time × bin × beam) f8 chunks, C-order
      // (Chunk × BinChunk × BeamChunk), padded in every dim —
      // beam3[i][j][k] = value·(j+1) + k·0.5 (IEEE-exact in both
      // engines: an exact product plus an exactly-representable half),
      // NaN element planted at (event_id % 7 == 5, bin 1, beam 0)
      def beamVal(i: Int, j: Int, k: Int): Double =
        if (value(i).isNaN || (eventId(i) % 7 == 5 && j == 1 && k == 0))
          Double.NaN
        else value(i) * (j + 1) + k * 0.5
      for (j1 <- 0 until (Bins + BinChunk - 1) / BinChunk;
           j2 <- 0 until (Beams + BeamChunk - 1) / BeamChunk) {
        val buf = new Array[Double](Chunk * BinChunk * BeamChunk)
        for (r <- 0 until Chunk; jj <- 0 until BinChunk; kk <- 0 until BeamChunk) {
          val row = c * Chunk + r
          val bin = j1 * BinChunk + jj
          val beam = j2 * BeamChunk + kk
          buf((r * BinChunk + jj) * BeamChunk + kk) =
            if (row >= n || bin >= Bins || beam >= Beams) Double.NaN
            else beamVal(row, bin, beam)
        }
        Files.createDirectories(Paths.get(out, "beam3"))
        Files.write(Paths.get(out, "beam3", s"$c.$j1.$j2"), deflate(leD(buf)))
      }
    }
    def zarray(dtype: String, comp: Boolean, fill: String): String = {
      val c = if (comp) """{"id": "zlib", "level": 1}""" else "null"
      s"""{"shape": [$n], "chunks": [$Chunk], "dtype": "$dtype",
          "compressor": $c, "fill_value": $fill, "order": "C",
          "filters": null, "zarr_format": 2}"""
    }
    val meta = s"""{"metadata": {
      "time/.zarray": ${zarray("<i8", comp = true, "0")},
      "time/.zattrs": {"_ARRAY_DIMENSIONS": ["time"],
        "units": "microseconds since 1970-01-01",
        "calendar": "proleptic_gregorian"},
      "event_id/.zarray": ${zarray("<i8", comp = true, "0")},
      "event_id/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "user_id/.zarray": ${zarray("<i8", comp = false, "0")},
      "user_id/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "value/.zarray": ${zarray("<f8", comp = true, "\"NaN\"")},
      "value/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "value_gapped/.zarray": ${zarray("<f8", comp = true, "\"NaN\"")},
      "value_gapped/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "spectrum/.zarray": {"shape": [$n, $Bands], "chunks": [$Chunk, $BandChunk],
        "dtype": "<f8", "compressor": {"id": "zlib", "level": 1},
        "fill_value": "NaN", "order": "C", "filters": null,
        "zarr_format": 2},
      "spectrum/.zattrs": {"_ARRAY_DIMENSIONS": ["time", "band"]},
      "spec_f/.zarray": {"shape": [$n, $Bands], "chunks": [$Chunk, $BandChunk],
        "dtype": "<f8", "compressor": {"id": "zlib", "level": 1},
        "fill_value": "NaN", "order": "F", "filters": null,
        "zarr_format": 2},
      "spec_f/.zattrs": {"_ARRAY_DIMENSIONS": ["time", "band"]},
      "beam3/.zarray": {"shape": [$n, $Bins, $Beams],
        "chunks": [$Chunk, $BinChunk, $BeamChunk],
        "dtype": "<f8", "compressor": {"id": "zlib", "level": 1},
        "fill_value": "NaN", "order": "C", "filters": null,
        "zarr_format": 2},
      "beam3/.zattrs": {"_ARRAY_DIMENSIONS": ["time", "bin", "beam"]},
      "etype/.zarray": {"shape": [$n], "chunks": [$Chunk], "dtype": "|S10",
        "compressor": {"id": "zlib", "level": 1}, "fill_value": "",
        "order": "C", "filters": null, "zarr_format": 2},
      "etype/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "etype_vlen/.zarray": {"shape": [$n], "chunks": [$Chunk], "dtype": "|O",
        "compressor": {"id": "zlib", "level": 1}, "fill_value": null,
        "order": "C", "filters": [{"id": "vlen-utf8"}], "zarr_format": 2},
      "etype_vlen/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "flag/.zarray": {"shape": [$n], "chunks": [$Chunk], "dtype": "|b1",
        "compressor": null, "fill_value": false,
        "order": "C", "filters": null, "zarr_format": 2},
      "flag/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "stamp/.zarray": ${zarray("<M8[ns]", comp = true, "-9223372036854775808")},
      "stamp/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "day/.zarray": ${zarray("<M8[D]", comp = true, "-9223372036854775808")},
      "day/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "hstamp/.zarray": ${zarray("<M8[h]", comp = true, "-9223372036854775808")},
      "hstamp/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "mstamp/.zarray": ${zarray("<M8[m]", comp = true, "-9223372036854775808")},
      "mstamp/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "seq4/.zarray": {"shape": [$n], "chunks": [$Chunk], "dtype": "<i4",
        "compressor": {"id": "blosc", "cname": "zlib", "clevel": 1,
          "shuffle": 2, "blocksize": $BitBlockBytes},
        "fill_value": 0, "order": "C", "filters": null, "zarr_format": 2},
      "seq4/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "qflag/.zarray": {"shape": [$n], "chunks": [$Chunk], "dtype": "|i1",
        "compressor": {"id": "blosc", "cname": "zlib", "clevel": 0,
          "shuffle": 2, "blocksize": $Chunk},
        "fill_value": 0, "order": "C", "filters": null, "zarr_format": 2},
      "qflag/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "tags/.zarray": {"shape": [$n, $Slots], "chunks": [$Chunk, $SlotChunk],
        "dtype": "|S16", "compressor": {"id": "zlib", "level": 1},
        "fill_value": "", "order": "C", "filters": null, "zarr_format": 2},
      "tags/.zattrs": {"_ARRAY_DIMENSIONS": ["time", "slot"]},
      "eid_delta/.zarray": {"shape": [$n], "chunks": [$Chunk], "dtype": "<i8",
        "compressor": {"id": "zlib", "level": 1}, "fill_value": 0,
        "order": "C",
        "filters": [{"id": "delta", "dtype": "<i8", "astype": "<i4"}],
        "zarr_format": 2},
      "eid_delta/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "press/.zarray": {"shape": [$n], "chunks": [$Chunk], "dtype": "<f8",
        "compressor": {"id": "zlib", "level": 1}, "fill_value": "NaN",
        "order": "C",
        "filters": [
          {"id": "fixedscaleoffset", "offset": -1000.0, "scale": 4.0,
           "dtype": "<f8", "astype": "<i2"},
          {"id": "shuffle", "elementsize": 2}],
        "zarr_format": 2},
      "press/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]}},
      "zarr_consolidated_format": 1}"""
    Files.write(Paths.get(out, ".zmetadata"), meta.getBytes("UTF-8"))
    out
  }
}
