package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Round-16 decode pins: blosc BIT-shuffle (c-blosc ≥1.18 / format-2
  * block layout), `M8[h]`/`M8[m]` coarse datetime64 units, 2-D string
  * arrays (fixed-width and vlen) through the trailing-dim stitch, the
  * 2-D integral fill-run exact-fill path, timezone-independent Date
  * filter pruning, and parse-time rejection of shuffle filter chains on
  * non-numeric dtypes.
  *
  * The bitshuffle layout pins are KNOWN VECTORS computed by hand from
  * the public algorithm (bit-plane-major, planes LSB-first, element j
  * of a group at bit j): they fix the on-disk convention independently
  * of the encoder, so an encode/decode round-trip cannot mask a
  * mirrored-convention bug on both sides.
  */
class ZarrBitshuffleSpec extends SparkSpec {

  private def leL(ls: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(ls.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    ls.foreach(bb.putLong); bb.array()
  }
  private def beL(ls: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(ls.length * 8).order(ByteOrder.BIG_ENDIAN)
    ls.foreach(bb.putLong); bb.array()
  }
  private def leI(is: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(is.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    is.foreach(bb.putInt); bb.array()
  }
  private def deflate(src: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(src); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // ---- bitshuffle kernel: known-vector layout pins -------------------------

  test("bitshuffle layout: LSB-first bit planes, element j at bit j (known vectors)") {
    // 8 one-byte elements, element 0 = 0x01: the single set bit is bit 0
    // of element 0 → plane 0 (the FIRST size/8-byte run), bit 0
    ZarrMeta.bitshuffleBytes(
      Array[Byte](1, 0, 0, 0, 0, 0, 0, 0), 1).toSeq shouldBe
      Seq[Byte](1, 0, 0, 0, 0, 0, 0, 0)
    // element 0 = 0x80: bit 7 → plane 7 (the LAST run), bit 0
    ZarrMeta.bitshuffleBytes(
      Array[Byte](0x80.toByte, 0, 0, 0, 0, 0, 0, 0), 1).toSeq shouldBe
      Seq[Byte](0, 0, 0, 0, 0, 0, 0, 1)
    // element 5 = 0x01: plane 0, bit 5 → 0x20
    ZarrMeta.bitshuffleBytes(
      Array[Byte](0, 0, 0, 0, 0, 1, 0, 0), 1).toSeq shouldBe
      Seq[Byte](0x20, 0, 0, 0, 0, 0, 0, 0)
    // all elements 0x01 → plane 0 all-ones, planes 1..7 zero
    ZarrMeta.bitshuffleBytes(Array.fill[Byte](8)(1), 1).toSeq shouldBe
      (Seq[Byte](0xff.toByte) ++ Seq.fill[Byte](7)(0))
    // typesize 4, 8 elements, element e = 1 << e (i4 LE): only byte
    // position 0 is nonzero, and within its 8 planes, plane k holds
    // exactly element k's bit → plane-k byte = 1 << k
    val d4 = leI(Array.tabulate(8)(e => 1 << e))
    val s4 = ZarrMeta.bitshuffleBytes(d4, 4)
    s4.slice(0, 8).toSeq shouldBe Seq.tabulate[Byte](8)(k => (1 << k).toByte)
    s4.drop(8).forall(_ == 0) shouldBe true
    // and decode inverts the pinned layout exactly
    ZarrMeta.bitunshuffle(s4, 4).toSeq shouldBe d4.toSeq
  }

  test("bitshuffle rounds to 8 elements and copies the tail verbatim") {
    val rnd = new scala.util.Random(16)
    for (ts <- Seq(1, 2, 4, 8, 12); nElems <- Seq(8, 96, 100, 101)) {
      val d = new Array[Byte](ts * nElems)
      rnd.nextBytes(d)
      val s = ZarrMeta.bitshuffleBytes(d, ts)
      // the last nElems % 8 elements are NOT shuffled: verbatim bytes
      val done = (nElems - nElems % 8) * ts
      s.drop(done).toSeq shouldBe d.drop(done).toSeq
      ZarrMeta.bitunshuffle(s, ts).toSeq shouldBe d.toSeq
    }
    // a sub-8-element buffer passes through untouched
    val tiny = Array[Byte](1, 2, 3, 4, 5, 6)
    ZarrMeta.bitunshuffle(tiny, 2).toSeq shouldBe tiny.toSeq
  }

  // ---- blosc frames with the bit-shuffle flag ------------------------------

  /** Test-side twin of the gate store's frame builder (flags bit 2,
    * format version settable to pin the version guard).
    */
  private def bitFrame(raw: Array[Byte], typesize: Int, blocksize: Int,
                       deflateBlocks: Boolean, version: Byte = 2,
                       extraFlags: Int = 0): Array[Byte] = {
    val nbytes = raw.length
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val blocks = (0 until nblocks).map { i =>
      val ubs = math.min(blocksize, nbytes - i * blocksize)
      val sh = ZarrMeta.bitshuffleBytes(
        java.util.Arrays.copyOfRange(raw, i * blocksize, i * blocksize + ubs),
        typesize)
      val comp = if (deflateBlocks) deflate(sh) else sh
      if (comp.length < ubs) (comp, ubs) else (sh, ubs)
    }
    val headerAndStarts = 16 + 4 * nblocks
    val offsets = blocks.scanLeft(headerAndStarts) {
      case (off, (data, _)) => off + 4 + data.length
    }
    val bb = ByteBuffer.allocate(offsets.last).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(version).put(1.toByte)
      .put((0x4 | (3 << 5) | extraFlags).toByte).put(typesize.toByte)
    bb.putInt(nbytes).putInt(blocksize).putInt(offsets.last)
    offsets.init.foreach(bb.putInt)
    blocks.foreach { case (data, ubs) =>
      bb.putInt(if (data.length == ubs) ubs else data.length)
      bb.put(data)
    }
    bb.array()
  }

  private def i4Meta(n: Int, comp: String = """{"id": "blosc", "cname": "zlib"}"""): ZarrMeta.ArrayMeta =
    ZarrMeta.parseArray("x",
      mapper.readTree(s"""{"shape": [$n], "chunks": [$n], "dtype": "<i4",
        "compressor": $comp, "fill_value": 0, "order": "C",
        "filters": null}"""),
      mapper.readTree("{}")).get

  test("blosc bit-shuffle frames decode: zlib blocks, stored blocks, leftover blocks") {
    val vals = Array.tabulate(256)(i => i * 7919 - 1000)
    val raw = leI(vals)
    // blocksize 400 = 100 i4 elements — NOT a multiple of 8, so every
    // full block exercises the round-to-96 + 4-element verbatim tail
    ZarrMeta.decodeChunk(i4Meta(256),
      bitFrame(raw, typesize = 4, blocksize = 400, deflateBlocks = true))
      .toSeq shouldBe raw.toSeq
    // stored (incompressible) blocks take the csize == ubs path
    ZarrMeta.decodeChunk(i4Meta(256),
      bitFrame(raw, typesize = 4, blocksize = 256, deflateBlocks = false))
      .toSeq shouldBe raw.toSeq
    // single-byte typesize still bit-shuffles (unlike byte shuffle)
    val bytes = Array.tabulate[Byte](64)(i => (i % 5).toByte)
    val m1 = ZarrMeta.parseArray("q",
      mapper.readTree("""{"shape": [64], "chunks": [64], "dtype": "|i1",
        "compressor": {"id": "blosc", "cname": "zlib"}, "fill_value": 0,
        "order": "C", "filters": null}"""),
      mapper.readTree("{}")).get
    ZarrMeta.decodeChunk(m1,
      bitFrame(bytes, typesize = 1, blocksize = 64, deflateBlocks = true))
      .toSeq shouldBe bytes.toSeq
  }

  test("bit-shuffle guards: double-shuffle headers fail loudly; the version byte carries no tail signal") {
    val raw = leI(Array.tabulate(16)(identity))
    intercept[IllegalArgumentException] {
      ZarrMeta.decodeChunk(i4Meta(16),
        bitFrame(raw, 4, 64, deflateBlocks = false, extraFlags = 0x1))
    }.getMessage should include("BOTH")
    // BLOSC_VERSION_FORMAT has been 2 for the whole c-blosc 1.x line, so
    // the version byte CANNOT discriminate the pre-1.18 leftover-copy bug
    // (those streams are corrupt at rest; modern c-blosc reads them wrong
    // too). The decode therefore keys the tail convention on nothing but
    // the layout itself — a frame differing only in the version byte
    // decodes identically (round-17, ADVICE item on the dropped guard).
    ZarrMeta.decodeChunk(i4Meta(16),
      bitFrame(raw, 4, 64, deflateBlocks = false, version = 1))
      .toSeq shouldBe raw.toSeq
  }

  // ---- M8[h] / M8[m] -------------------------------------------------------

  private lazy val hourStore: String = {
    val dir = Files.createTempDirectory("graft_zarr_hm").toString
    def put(arr: String, chunk: Int, bytes: Array[Byte]): Unit = {
      Files.createDirectories(Paths.get(dir, arr))
      Files.write(Paths.get(dir, arr, chunk.toString), bytes)
    }
    val NaT = Long.MinValue
    for (c <- 0 until 2)
      put("time", c, leL(Array.tabulate(4)(k => (c * 4 + k).toLong)))
    // epoch hours: 1970-01-01 00/01h, NaT, pre-epoch 1969-12-31 23h
    put("hs", 0, deflate(leL(Array(0L, 1L, NaT, -1L))))
    // chunk 1 missing → NaT fill run (null timestamps)
    // epoch minutes as the BIG-endian twin, incl. 2024-01-01 00:30
    put("ms_be", 0, beL(Array(0L, 90L, NaT, 28401150L)))
    put("ms_be", 1, beL(Array(-1L, 1L, 0L, 0L)))
    val meta = s"""{"metadata": {
      "time/.zarray": {"shape": [6], "chunks": [4], "dtype": "<i8",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": null, "zarr_format": 2},
      "time/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "hs/.zarray": {"shape": [6], "chunks": [4], "dtype": "<M8[h]",
        "compressor": {"id": "zlib", "level": 1},
        "fill_value": -9223372036854775808, "order": "C",
        "filters": null, "zarr_format": 2},
      "hs/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "ms_be/.zarray": {"shape": [6], "chunks": [4], "dtype": ">M8[m]",
        "compressor": null, "fill_value": null, "order": "C",
        "filters": null, "zarr_format": 2},
      "ms_be/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]}},
      "zarr_consolidated_format": 1}"""
    Files.write(Paths.get(dir, ".zmetadata"), meta.getBytes("UTF-8"))
    dir
  }

  test("M8[h] and M8[m] decode as exact-micros timestamps: NaT, pre-epoch, BE twin") {
    val df = spark.read.format("zarr").load(hourStore)
    df.schema("hs").dataType shouldBe TimestampType
    df.schema("ms_be").dataType shouldBe TimestampType
    val rows = df.orderBy("time")
      .select(col("hs").cast("string"), col("ms_be").cast("string"))
      .collect()
    def s(r: Int, c: Int): String = if (rows(r).isNullAt(c)) null else rows(r).getString(c)
    (0 until 6).map(s(_, 0)) shouldBe Seq(
      "1970-01-01 00:00:00", "1970-01-01 01:00:00", null,
      "1969-12-31 23:00:00", null, null) // chunk 1 = the NaT fill run
    (0 until 6).map(s(_, 1)) shouldBe Seq(
      "1970-01-01 00:00:00", "1970-01-01 01:30:00", null,
      "2024-01-01 00:30:00", "1969-12-31 23:59:00", "1970-01-01 00:01:00")
  }

  // ---- 2-D strings ---------------------------------------------------------

  /** (6 × 3) string arrays over record chunks [4] and slot chunks [2]
    * (widths 2+1): `tg` fixed-width |S5 with record chunk 1's files
    * MISSING → fill("na") runs; `tu` <U3 (UTF-32-LE incl. a non-ASCII
    * code point); `tv` object dtype behind vlen-utf8 (items = the
    * flattened 4×2 / 4×1 chunk buffer).
    */
  private lazy val str2dStore: String = {
    val dir = Files.createTempDirectory("graft_zarr_s2d").toString
    def put(arr: String, name: String, bytes: Array[Byte]): Unit = {
      Files.createDirectories(Paths.get(dir, arr))
      Files.write(Paths.get(dir, arr, name), bytes)
    }
    for (c <- 0 until 2)
      put("time", c.toString, leL(Array.tabulate(4)(k => (c * 4 + k).toLong)))
    def tag(r: Int, k: Int): String = s"r${r}s$k"
    // every chunk is the FULL (4 × 2) padded buffer (zarr pads edge
    // chunks in both dims — slot 3 of col chunk 1 is padding)
    // |S5 chunks, row-major, NUL-padded elements
    for (j <- 0 until 2) {
      val buf = new Array[Byte](4 * 2 * 5)
      for (r <- 0 until 4; k <- 0 until 2) {
        val s = if (j * 2 + k < 3) tag(r, j * 2 + k) else ""
        val b = s.getBytes("UTF-8")
        System.arraycopy(b, 0, buf, (r * 2 + k) * 5, b.length)
      }
      put("tg", s"0.$j", deflate(buf))
      // record chunk 1 of tg is NOT written → fill("na") runs
    }
    // <U3 chunks: UTF-32-LE code points, incl. 'é' (0xE9)
    for (c <- 0 until 2; j <- 0 until 2) {
      val bb = ByteBuffer.allocate(4 * 2 * 12).order(ByteOrder.LITTLE_ENDIAN)
      for (r <- 0 until 4; k <- 0 until 2) {
        val row = c * 4 + r
        val s = if (j * 2 + k < 3 && row < 6) s"é$row${j * 2 + k}" else ""
        for (i <- 0 until 3) bb.putInt(if (i < s.length) s.codePointAt(i) else 0)
      }
      put("tu", s"$c.$j", bb.array())
    }
    // vlen-utf8 chunks: u4-LE count (= 8, the PADDED element count),
    // then per item u4-LE length + UTF-8
    for (c <- 0 until 2; j <- 0 until 2) {
      val bos = new java.io.ByteArrayOutputStream()
      def u4(v: Int): Unit = {
        bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
        bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
      }
      u4(4 * 2)
      for (r <- 0 until 4; k <- 0 until 2) {
        val row = c * 4 + r
        val s = if (j * 2 + k < 3 && row < 6) s"v_${tag(row, j * 2 + k)}" else ""
        val b = s.getBytes("UTF-8"); u4(b.length); bos.write(b, 0, b.length)
      }
      put("tv", s"$c.$j", deflate(bos.toByteArray))
    }
    def z2(dtype: String, comp: String, fill: String): String =
      s"""{"shape": [6, 3], "chunks": [4, 2], "dtype": "$dtype",
          "compressor": $comp, "fill_value": $fill, "order": "C",
          "filters": ${if (dtype == "|O") """[{"id": "vlen-utf8"}]""" else "null"},
          "zarr_format": 2}"""
    val meta = s"""{"metadata": {
      "time/.zarray": {"shape": [6], "chunks": [4], "dtype": "<i8",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": null, "zarr_format": 2},
      "time/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "tg/.zarray": ${z2("|S5", """{"id": "zlib", "level": 1}""",
        "\"" + java.util.Base64.getEncoder.encodeToString("na".getBytes) + "\"")},
      "tg/.zattrs": {"_ARRAY_DIMENSIONS": ["time", "slot"]},
      "tu/.zarray": ${z2("<U3", "null", "\"\"")},
      "tu/.zattrs": {"_ARRAY_DIMENSIONS": ["time", "slot"]},
      "tv/.zarray": ${z2("|O", """{"id": "zlib", "level": 1}""", "null")},
      "tv/.zattrs": {"_ARRAY_DIMENSIONS": ["time", "slot"]}},
      "zarr_consolidated_format": 1}"""
    Files.write(Paths.get(dir, ".zmetadata"), meta.getBytes("UTF-8"))
    dir
  }

  test("2-D string arrays surface as ArrayType(StringType) through the stitch") {
    val df = spark.read.format("zarr").load(str2dStore)
    df.schema("tg").dataType shouldBe ArrayType(StringType, containsNull = false)
    df.schema("tu").dataType shouldBe ArrayType(StringType, containsNull = false)
    df.schema("tv").dataType shouldBe ArrayType(StringType, containsNull = false)
    val rows = df.orderBy("time").collect()
    def arr(r: Int, c: String): Seq[String] = rows(r).getSeq[String](rows(r).fieldIndex(c))
    arr(0, "tg") shouldBe Seq("r0s0", "r0s1", "r0s2")
    arr(3, "tg") shouldBe Seq("r3s0", "r3s1", "r3s2")
    // record chunk 1's files are missing → the |S fill ("na") run
    arr(4, "tg") shouldBe Seq("na", "na", "na")
    arr(5, "tg") shouldBe Seq("na", "na", "na")
    arr(0, "tu") shouldBe Seq("é00", "é01", "é02")
    arr(5, "tu") shouldBe Seq("é50", "é51", "é52")
    arr(2, "tv") shouldBe Seq("v_r2s0", "v_r2s1", "v_r2s2")
    arr(5, "tv") shouldBe Seq("v_r5s0", "v_r5s1", "v_r5s2")
  }

  test("a missing 2-D string chunk with NO fill_value fails loudly") {
    val dir = Files.createTempDirectory("graft_zarr_s2dnf").toString
    Files.createDirectories(Paths.get(dir, "time"))
    Files.write(Paths.get(dir, "time", "0"),
      leL(Array.tabulate(4)(_.toLong)))
    // no tg chunk files at all, and fill_value null
    val meta = """{"metadata": {
      "time/.zarray": {"shape": [4], "chunks": [4], "dtype": "<i8",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": null, "zarr_format": 2},
      "time/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "tg/.zarray": {"shape": [4, 2], "chunks": [4, 2], "dtype": "|S5",
        "compressor": null, "fill_value": null, "order": "C",
        "filters": null, "zarr_format": 2},
      "tg/.zattrs": {"_ARRAY_DIMENSIONS": ["time", "slot"]}},
      "zarr_consolidated_format": 1}"""
    Files.write(Paths.get(dir, ".zmetadata"), meta.getBytes("UTF-8"))
    val e = intercept[Exception] {
      spark.read.format("zarr").load(dir).collect()
    }
    e.getMessage should include("no fill_value")
  }

  // ---- 2-D integral fill runs use the exact JSON-integer fill --------------

  test("a missing 2-D i8 chunk fills exactly past 2^53 (fillLong, not the double leg)") {
    val dir = Files.createTempDirectory("graft_zarr_2dfill").toString
    Files.createDirectories(Paths.get(dir, "time"))
    Files.write(Paths.get(dir, "time", "0"), leL(Array.tabulate(4)(_.toLong)))
    Files.createDirectories(Paths.get(dir, "big"))
    Files.write(Paths.get(dir, "big", "0.0"),
      leL(Array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)))
    // col chunk 0.1 missing → fill run of 2^53 + 1 (rounds to 2^53
    // through a double)
    val meta = """{"metadata": {
      "time/.zarray": {"shape": [4], "chunks": [4], "dtype": "<i8",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": null, "zarr_format": 2},
      "time/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "big/.zarray": {"shape": [4, 3], "chunks": [4, 2], "dtype": "<i8",
        "compressor": null, "fill_value": 9007199254740993, "order": "C",
        "filters": null, "zarr_format": 2},
      "big/.zattrs": {"_ARRAY_DIMENSIONS": ["time", "slot"]}},
      "zarr_consolidated_format": 1}"""
    Files.write(Paths.get(dir, ".zmetadata"), meta.getBytes("UTF-8"))
    val rows = spark.read.format("zarr").load(dir).orderBy("time").collect()
    rows(0).getSeq[Long](rows(0).fieldIndex("big")) shouldBe
      Seq(1L, 2L, 9007199254740993L)
    rows(3).getSeq[Long](rows(3).fieldIndex("big")) shouldBe
      Seq(7L, 8L, 9007199254740993L)
  }

  // ---- Date filter pruning is timezone-independent -------------------------

  test("pushed java.sql.Date filters prune in UTC day space on a non-UTC JVM") {
    val dir = Files.createTempDirectory("graft_zarr_datetz").toString
    def put(arr: String, chunk: Int, bytes: Array[Byte]): Unit = {
      Files.createDirectories(Paths.get(dir, arr))
      Files.write(Paths.get(dir, arr, chunk.toString), bytes)
    }
    for (c <- 0 until 2)
      put("day", c, leL(Array.tabulate(4)(k => (c * 4 + k).toLong)))
    val meta = s"""{"metadata": {
      "day/.zarray": {"shape": [8], "chunks": [4], "dtype": "<M8[D]",
        "compressor": null, "fill_value": null, "order": "C",
        "filters": null, "zarr_format": 2},
      "day/.zattrs": {"_ARRAY_DIMENSIONS": ["day"]}},
      "zarr_consolidated_format": 1}"""
    Files.write(Paths.get(dir, ".zmetadata"), meta.getBytes("UTF-8"))
    val metas = ZarrMeta.parseConsolidated(new String(
      Files.readAllBytes(Paths.get(dir, ".zmetadata")), "UTF-8")).values.toSeq
    val tz = java.util.TimeZone.getDefault
    try {
      // UTC+9: local midnight of epoch day 4 is 9h BEFORE the UTC day
      // start, so an instant-based bound (getTime) lands at day4 − 9h —
      // below chunk 1's [day4, day7] span — and equality pruning DROPS
      // the chunk holding the match (the fixed calendar-field bound
      // keeps it; the sorted path's strict lower floor also keeps chunk
      // 0, hence 2 partitions, never 1)
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("Asia/Tokyo"))
      val d4 = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(4))
      val sb = new ZarrScanBuilder(dir, "day", metas, sorted = SortedMode.Auto)
      sb.pushFilters(Array(org.apache.spark.sql.sources.EqualTo("day", d4)))
      sb.build().toBatch.planInputPartitions().length shouldBe 2
      // and end to end the matching row SURVIVES pruning (Spark itself
      // hands the scan a default-timezone java.sql.Date at planning)
      spark.read.format("zarr").load(dir)
        .filter(col("day") === lit("1970-01-05").cast("date"))
        .count() shouldBe 1L
    } finally java.util.TimeZone.setDefault(tz)
  }

  // ---- shuffle filter chains on non-numeric dtypes reject at parse ---------

  test("a shuffle filter on a string/datetime stage is rejected at parse, with the name") {
    intercept[IllegalArgumentException] {
      ZarrMeta.parseArray("labels",
        mapper.readTree("""{"shape": [4], "chunks": [4], "dtype": "|S6",
          "compressor": null, "fill_value": "", "order": "C",
          "filters": [{"id": "shuffle", "elementsize": 6}]}"""),
        mapper.readTree("{}"))
    }.getMessage should include("labels")
    intercept[IllegalArgumentException] {
      ZarrMeta.parseArray("stamps",
        mapper.readTree("""{"shape": [4], "chunks": [4], "dtype": "<M8[ns]",
          "compressor": null, "fill_value": null, "order": "C",
          "filters": [{"id": "shuffle", "elementsize": 8}]}"""),
        mapper.readTree("{}"))
    }.getMessage should include("stamps")
    // numeric stages still parse (the press chain in the gate store)
    ZarrMeta.parseArray("ok",
      mapper.readTree("""{"shape": [4], "chunks": [4], "dtype": "<i2",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": [{"id": "shuffle", "elementsize": 2}]}"""),
      mapper.readTree("{}")).get.filters should have size 1
  }
}
