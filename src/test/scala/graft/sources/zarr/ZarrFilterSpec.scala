package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Round-15 decode pins for the numcodecs FILTER chains
  * (delta / fixedscaleoffset / shuffle — `ZarrMeta.ZarrFilter`), the
  * `M8[D]` → DateType mapping, and the opt-in `u8` → Decimal(20,0)
  * read. Every fixture is written to the public numcodecs formats
  * (delta.py / fixedscaleoffset.py / shuffle.py) so the reader decodes
  * real encoder output, and every value is pinned exactly.
  */
class ZarrFilterSpec extends SparkSpec {

  // ---- byte helpers (self-contained; LE/BE variants per fixture) ----------

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
  private def beI(is: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(is.length * 4).order(ByteOrder.BIG_ENDIAN)
    is.foreach(bb.putInt); bb.array()
  }
  private def leS(ss: Array[Short]): Array[Byte] = {
    val bb = ByteBuffer.allocate(ss.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    ss.foreach(bb.putShort); bb.array()
  }
  private def leF(fs: Array[Float]): Array[Byte] = {
    val bb = ByteBuffer.allocate(fs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    fs.foreach(bb.putFloat); bb.array()
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
  /** numcodecs Shuffle ENCODE (byte transpose at `ts` stride) — the
    * inverse of the reader's unshuffle.
    */
  private def shuffleBytes(in: Array[Byte], ts: Int): Array[Byte] = {
    val neles = in.length / ts
    val out = new Array[Byte](in.length)
    for (i <- 0 until neles; b <- 0 until ts)
      out(b * neles + i) = in(i * ts + b)
    System.arraycopy(in, neles * ts, out, neles * ts, in.length - neles * ts)
    out
  }
  /** Per-chunk delta ENCODE in `Long` space (the numcodecs layout:
    * enc[0] = x[0], enc[i] = x[i] − x[i−1]).
    */
  private def deltaEnc(vs: Array[Long]): Array[Long] =
    Array.tabulate(vs.length)(i => if (i == 0) vs(0) else vs(i) - vs(i - 1))

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // ---- fixture: filters store ----------------------------------------------

  /** time (plain <i8 0..5), plus:
    *  - `ev` <i8 behind delta(astype <i4) + zlib;
    *  - `ev_be` >i8 twin behind delta(astype >i4), raw;
    *  - `press` <f8 behind [fixedscaleoffset(offset −1000, scale 4,
    *    astype <i2), shuffle(2)], raw — a CHAIN, decode must reverse;
    *  - `fdelta` <f4 behind delta(astype <f4), raw.
    */
  private lazy val filterStore: String = {
    val dir = Files.createTempDirectory("graft_zarr_filt").toString
    def put(arr: String, chunk: Int, bytes: Array[Byte]): Unit = {
      Files.createDirectories(Paths.get(dir, arr))
      Files.write(Paths.get(dir, arr, chunk.toString), bytes)
    }
    for (c <- 0 until 2)
      put("time", c, leL(Array.tabulate(4)(k => (c * 4 + k).toLong)))
    // ev values (chunk-padded with 0; pad rows never read)
    val ev = Array(100L, 7L, -14L, 57L) // deltas of [100,107,93,150]
    val ev1 = deltaEnc(Array(151L, 149L, 0L, 0L)) // [151,-2,-149,0]
    put("ev", 0, deflate(leI(ev.map(_.toInt))))
    put("ev", 1, deflate(leI(ev1.map(_.toInt))))
    put("ev_be", 0, beI(ev.map(_.toInt)))
    put("ev_be", 1, beI(ev1.map(_.toInt)))
    // press: p = m·0.25 − 1000 with m = round((p+1000)·4) ∈ i2; the
    // on-disk bytes are shuffle(i2-LE(m))
    val m0 = Array[Short](0, 1, 2, 40)
    val m1 = Array[Short](8999, 123, 0, 0)
    put("press", 0, shuffleBytes(leS(m0), 2))
    put("press", 1, shuffleBytes(leS(m1), 2))
    // fdelta: f4 cumsum accumulates in FLOAT; encode restarts PER CHUNK
    // (numcodecs filters see one chunk buffer at a time), so chunk 1's
    // first element is the raw row-4 value
    put("fdelta", 0, leF(Array(1.5f, 0.75f, -2.75f, 10.5f)))
    put("fdelta", 1, leF(Array(10.25f, -0.25f, 0f, 0f)))
    val meta = s"""{"metadata": {
      "time/.zarray": {"shape": [6], "chunks": [4], "dtype": "<i8",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": null, "zarr_format": 2},
      "time/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "ev/.zarray": {"shape": [6], "chunks": [4], "dtype": "<i8",
        "compressor": {"id": "zlib", "level": 1}, "fill_value": 0,
        "order": "C",
        "filters": [{"id": "delta", "dtype": "<i8", "astype": "<i4"}],
        "zarr_format": 2},
      "ev/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "ev_be/.zarray": {"shape": [6], "chunks": [4], "dtype": ">i8",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": [{"id": "delta", "dtype": ">i8", "astype": ">i4"}],
        "zarr_format": 2},
      "ev_be/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "press/.zarray": {"shape": [6], "chunks": [4], "dtype": "<f8",
        "compressor": null, "fill_value": "NaN", "order": "C",
        "filters": [
          {"id": "fixedscaleoffset", "offset": -1000.0, "scale": 4.0,
           "dtype": "<f8", "astype": "<i2"},
          {"id": "shuffle", "elementsize": 2}],
        "zarr_format": 2},
      "press/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "fdelta/.zarray": {"shape": [6], "chunks": [4], "dtype": "<f4",
        "compressor": null, "fill_value": "NaN", "order": "C",
        "filters": [{"id": "delta", "dtype": "<f4", "astype": "<f4"}],
        "zarr_format": 2},
      "fdelta/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]}},
      "zarr_consolidated_format": 1}"""
    Files.write(Paths.get(dir, ".zmetadata"), meta.getBytes("UTF-8"))
    dir
  }

  test("delta filter (i8 behind i4 astype, LE and BE) decodes the cumulative sum") {
    val df = spark.read.format("zarr").load(filterStore)
    df.schema("ev").dataType shouldBe LongType
    df.schema("ev_be").dataType shouldBe LongType
    val rows = df.orderBy("time").collect()
    rows.map(_.getLong(rows(0).fieldIndex("ev"))).toSeq shouldBe
      Seq(100L, 107L, 93L, 150L, 151L, 149L)
    rows.map(_.getLong(rows(0).fieldIndex("ev_be"))).toSeq shouldBe
      Seq(100L, 107L, 93L, 150L, 151L, 149L)
  }

  test("fixedscaleoffset + shuffle CHAIN decodes in reverse declaration order") {
    val df = spark.read.format("zarr").load(filterStore)
    df.schema("press").dataType shouldBe DoubleType
    val rows = df.orderBy("time").collect()
    val idx = rows(0).fieldIndex("press")
    // p = m/4 − 1000, exact quarter values (scale is a power of two)
    rows.map(_.getDouble(idx)).toSeq shouldBe
      Seq(0, 1, 2, 40, 8999, 123).map(m => m / 4.0 - 1000.0)
  }

  test("float delta (f4) accumulates in float32 like numpy's cumsum") {
    val df = spark.read.format("zarr").load(filterStore)
    df.schema("fdelta").dataType shouldBe FloatType
    val rows = df.orderBy("time").collect()
    val idx = rows(0).fieldIndex("fdelta")
    rows.map(_.getFloat(idx)).toSeq shouldBe
      Seq(1.5f, 2.25f, -0.5f, 10.0f, 10.25f, 10.0f)
  }

  test("delta decode WRAPS partial sums at the dtype width (numpy cumsum parity)") {
    // i2 accumulator: 30000 + 10000 = 40000 wraps to -25536 in int16
    val meta = ZarrMeta.parseArray("x",
      mapper.readTree("""{"shape": [2], "chunks": [2], "dtype": "<i2",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": [{"id": "delta", "dtype": "<i2", "astype": "<i2"}]}"""),
      mapper.readTree("{}")).get
    val out = ZarrMeta.decodeChunk(meta, leS(Array[Short](30000, 10000)))
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    Seq(bb.getShort(0), bb.getShort(2)) shouldBe Seq(30000.toShort, (-25536).toShort)
  }

  test("fixedscaleoffset with an INTEGER dtype truncates toward zero (numpy astype)") {
    val meta = ZarrMeta.parseArray("x",
      mapper.readTree("""{"shape": [4], "chunks": [4], "dtype": "<i4",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": [{"id": "fixedscaleoffset", "offset": 0.0, "scale": 3.0,
                     "dtype": "<i4", "astype": "<i2"}]}"""),
      mapper.readTree("{}")).get
    val out = ZarrMeta.decodeChunk(meta, leS(Array[Short](7, -7, 9, 0)))
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    // 7/3 = 2.33 → 2; −7/3 = −2.33 → −2 (toward zero, NOT floor)
    (0 until 4).map(i => bb.getInt(i * 4)) shouldBe Seq(2, -2, 3, 0)
  }

  test("a filtered chunk decompressing to the wrong DISK size fails loudly") {
    val meta = ZarrMeta.parseArray("x",
      mapper.readTree("""{"shape": [4], "chunks": [4], "dtype": "<i8",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": [{"id": "delta", "dtype": "<i8", "astype": "<i4"}]}"""),
      mapper.readTree("{}")).get
    // 4 i4 elements are 16 disk bytes; hand it 32 (the ARRAY size —
    // exactly the confusion a missing astype accounting would cause)
    val e = intercept[IllegalArgumentException] {
      ZarrMeta.decodeChunk(meta, new Array[Byte](32))
    }
    e.getMessage should include("decompressed")
  }

  test("chained typed filters validate stage dtypes at parse") {
    // a second delta whose dtype matches the FIRST filter's astype parses
    ZarrMeta.parseArray("x",
      mapper.readTree("""{"shape": [4], "chunks": [4], "dtype": "<i8",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": [{"id": "delta", "dtype": "<i8", "astype": "<i4"},
                    {"id": "delta", "dtype": "<i4", "astype": "<i4"}]}"""),
      mapper.readTree("{}")).isDefined shouldBe true
    // one that contradicts the stage it sees rejects with both dtypes
    val e = intercept[IllegalArgumentException] {
      ZarrMeta.parseArray("x",
        mapper.readTree("""{"shape": [4], "chunks": [4], "dtype": "<i8",
          "compressor": null, "fill_value": 0, "order": "C",
          "filters": [{"id": "delta", "dtype": "<i8", "astype": "<i4"},
                      {"id": "delta", "dtype": "<i8", "astype": "<i4"}]}"""),
        mapper.readTree("{}"))
    }
    e.getMessage should include("stage it decodes to is '<i4'")
  }

  test("astype filter casts between dtypes: integer path keeps exact low bits") {
    // array <i8 stored as <i4 on disk (decode = view(i4).astype(i8))
    val meta = ZarrMeta.parseArray("x",
      mapper.readTree("""{"shape": [4], "chunks": [4], "dtype": "<i8",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": [{"id": "astype", "encode_dtype": "<i4",
                     "decode_dtype": "<i8"}]}"""),
      mapper.readTree("{}")).get
    val out = ZarrMeta.decodeChunk(meta, leI(Array(5, -7, Int.MaxValue, 0)))
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 4).map(i => bb.getLong(i * 8)) shouldBe
      Seq(5L, -7L, Int.MaxValue.toLong, 0L)
    // a decode_dtype contradicting the array dtype is wrong metadata
    intercept[IllegalArgumentException] {
      ZarrMeta.parseArray("x",
        mapper.readTree("""{"shape": [4], "chunks": [4], "dtype": "<i8",
          "compressor": null, "fill_value": 0, "order": "C",
          "filters": [{"id": "astype", "encode_dtype": "<i4",
                       "decode_dtype": "<i2"}]}"""),
        mapper.readTree("{}"))
    }.getMessage should include("decode_dtype")
  }

  test("quantize filter decodes as the identity cast (lossy on encode only)") {
    val meta = ZarrMeta.parseArray("x",
      mapper.readTree("""{"shape": [3], "chunks": [3], "dtype": "<f8",
        "compressor": null, "fill_value": "NaN", "order": "C",
        "filters": [{"id": "quantize", "digits": 2, "dtype": "<f8",
                     "astype": "<f8"}]}"""),
      mapper.readTree("{}")).get
    // the STORED values are already quantized; decode must not touch them
    val vals = Array(1.23, -45.67, 0.0)
    val bb = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putDouble)
    val out = ZarrMeta.decodeChunk(meta, bb.array())
    val ob = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 3).map(i => ob.getDouble(i * 8)) shouldBe vals.toSeq
    // quantize on an integer dtype is not a thing numcodecs writes
    intercept[IllegalArgumentException] {
      ZarrMeta.parseArray("x",
        mapper.readTree("""{"shape": [3], "chunks": [3], "dtype": "<i4",
          "compressor": null, "fill_value": 0, "order": "C",
          "filters": [{"id": "quantize", "digits": 2, "dtype": "<i4"}]}"""),
        mapper.readTree("{}"))
    }.getMessage should include("float")
  }

  // ---- fixture: M8[D] (DateType) store --------------------------------------

  private lazy val dateStore: String = {
    val dir = Files.createTempDirectory("graft_zarr_date").toString
    def put(arr: String, chunk: Int, bytes: Array[Byte]): Unit = {
      Files.createDirectories(Paths.get(dir, arr))
      Files.write(Paths.get(dir, arr, chunk.toString), bytes)
    }
    val NaT = Long.MinValue
    for (c <- 0 until 2)
      put("time", c, leL(Array.tabulate(4)(k => (c * 4 + k).toLong)))
    // epoch days: 1970-01-01, 2024-01-01, NaT, pre-epoch 1969-12-27
    put("day", 0, deflate(leL(Array(0L, 19723L, NaT, -5L))))
    // chunk 1 missing → NaT fill run (null dates)
    put("day_be", 0, beL(Array(0L, 19723L, NaT, -5L)))
    put("day_be", 1, beL(Array(19724L, 19725L, 0L, 0L)))
    val meta = s"""{"metadata": {
      "time/.zarray": {"shape": [6], "chunks": [4], "dtype": "<i8",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": null, "zarr_format": 2},
      "time/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "day/.zarray": {"shape": [6], "chunks": [4], "dtype": "<M8[D]",
        "compressor": {"id": "zlib", "level": 1},
        "fill_value": -9223372036854775808, "order": "C",
        "filters": null, "zarr_format": 2},
      "day/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "day_be/.zarray": {"shape": [6], "chunks": [4], "dtype": ">M8[D]",
        "compressor": null, "fill_value": null, "order": "C",
        "filters": null, "zarr_format": 2},
      "day_be/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]}},
      "zarr_consolidated_format": 1}"""
    Files.write(Paths.get(dir, ".zmetadata"), meta.getBytes("UTF-8"))
    dir
  }

  test("M8[D] decodes as DateType: epoch days, NaT → null, NaT fill run, BE twin") {
    val df = spark.read.format("zarr").load(dateStore)
    df.schema("day").dataType shouldBe DateType
    df.schema("day_be").dataType shouldBe DateType
    // string-cast comparison sidesteps JVM-default-timezone Date boxing
    val rows = df.orderBy("time")
      .select(col("day").cast("string"), col("day_be").cast("string"))
      .collect()
    def s(r: Int, c: Int): String = if (rows(r).isNullAt(c)) null else rows(r).getString(c)
    (0 until 6).map(s(_, 0)) shouldBe
      Seq("1970-01-01", "2024-01-01", null, "1969-12-27", null, null)
    (0 until 6).map(s(_, 1)) shouldBe
      Seq("1970-01-01", "2024-01-01", null, "1969-12-27", "2024-01-02", "2024-01-03")
  }

  test("an M8[D] record coordinate prunes chunks from pushed Date filters") {
    val dir = Files.createTempDirectory("graft_zarr_datec").toString
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
    def kept(v: Any): Int = {
      val sb = new ZarrScanBuilder(dir, "day", metas, sorted = SortedMode.Auto)
      sb.pushFilters(Array(
        org.apache.spark.sql.sources.GreaterThanOrEqual("day", v)))
      sb.build().toBatch.planInputPartitions().length
    }
    // epoch day 5 (1970-01-06) lands in chunk 1: only it survives, from
    // BOTH the java.sql.Date and the java.time.LocalDate filter spellings
    kept(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(5))) shouldBe 1
    kept(java.time.LocalDate.ofEpochDay(5)) shouldBe 1
    // and the end-to-end frame filters exactly
    val df = spark.read.format("zarr").load(dir)
    df.filter(col("day") >= lit("1970-01-06").cast("date")).count() shouldBe 3L
  }

  // ---- fixture: u8 store ----------------------------------------------------

  private lazy val u8Store: String = {
    val dir = Files.createTempDirectory("graft_zarr_u8").toString
    def put(arr: String, chunk: Int, bytes: Array[Byte]): Unit = {
      Files.createDirectories(Paths.get(dir, arr))
      Files.write(Paths.get(dir, arr, chunk.toString), bytes)
    }
    for (c <- 0 until 2)
      put("time", c, leL(Array.tabulate(4)(k => (c * 4 + k).toLong)))
    // raw u8 bits: 0, 1, 2^64−1 (−1L), Long.MaxValue+1 (MinValue bits)
    put("big", 0, deflate(leL(Array(0L, 1L, -1L, Long.MinValue))))
    // chunk 1 missing → fill run of 18446744073709551615 (2^64−1): only
    // exact through the JSON-integer fillLong path
    put("big_be", 0, beL(Array(0L, 1L, -1L, Long.MinValue)))
    put("big_be", 1, beL(Array(12345L, 98765L, 0L, 0L)))
    val meta = s"""{"metadata": {
      "time/.zarray": {"shape": [6], "chunks": [4], "dtype": "<i8",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": null, "zarr_format": 2},
      "time/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "big/.zarray": {"shape": [6], "chunks": [4], "dtype": "<u8",
        "compressor": {"id": "zlib", "level": 1},
        "fill_value": 18446744073709551615, "order": "C",
        "filters": null, "zarr_format": 2},
      "big/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]},
      "big_be/.zarray": {"shape": [6], "chunks": [4], "dtype": ">u8",
        "compressor": null, "fill_value": 0, "order": "C",
        "filters": null, "zarr_format": 2},
      "big_be/.zattrs": {"_ARRAY_DIMENSIONS": ["time"]}},
      "zarr_consolidated_format": 1}"""
    Files.write(Paths.get(dir, ".zmetadata"), meta.getBytes("UTF-8"))
    dir
  }

  test("u8 stays rejected by default, with the opt-in named in the error") {
    val e = intercept[Exception] {
      spark.read.format("zarr").load(u8Store).schema
    }
    e.getMessage should include("u8")
    e.getMessage should include("decimal")
  }

  test("option(u8, decimal) reads u8 as Decimal(20,0): full range, exact fill, BE") {
    val df = spark.read.format("zarr").option("u8", "decimal").load(u8Store)
    df.schema("big").dataType shouldBe DecimalType(20, 0)
    df.schema("big_be").dataType shouldBe DecimalType(20, 0)
    val rows = df.orderBy("time").collect()
    def big(r: Int, c: String): BigDecimal = {
      val d = rows(r).getDecimal(rows(r).fieldIndex(c))
      if (d == null) null else BigDecimal(d)
    }
    val maxU8 = BigDecimal("18446744073709551615")
    (0 until 6).map(big(_, "big")) shouldBe Seq(
      BigDecimal(0), BigDecimal(1), maxU8,
      BigDecimal("9223372036854775808"), // Long.MinValue bits = 2^63
      maxU8, maxU8) // the 2^64−1 fill run — exact via fillLong
    (0 until 6).map(big(_, "big_be")) shouldBe Seq(
      BigDecimal(0), BigDecimal(1), maxU8,
      BigDecimal("9223372036854775808"),
      BigDecimal(12345), BigDecimal(98765))
  }

  test("u8 option values are validated; reject is the explicit default") {
    intercept[IllegalArgumentException] {
      spark.read.format("zarr").option("u8", "bignum").load(u8Store).schema
    }.getMessage should include("reject/decimal")
    intercept[Exception] {
      spark.read.format("zarr").option("u8", "reject").load(u8Store).schema
    }.getMessage should include("u8")
  }
}
