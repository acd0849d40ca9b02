package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Round-17 decode pins: Zarr v3 `sharding_indexed` (public v3 core
  * spec — shard files of inner chunks + a uint64-LE (offset, nbytes)
  * index at the file's end or start, optionally crc32c-framed, all-ones
  * sentinel for unwritten inner chunks), the `transpose` codec
  * (order [1, 0] → chunks stored column-major), and the recursive
  * non-consolidated discovery of arrays nested inside v3 groups.
  * Encoder-independent: every fixture is written by THIS spec from the
  * spec'd byte layout, never round-tripped through the reader's own
  * encode helpers.
  */
class ZarrV3ShardingSpec extends SparkSpec {

  private def leL(ls: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(ls.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    ls.foreach(bb.putLong); bb.array()
  }
  private def leD(ds: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(ds.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    ds.foreach(bb.putDouble); bb.array()
  }
  private def withCrc(src: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32C()
    crc.update(src, 0, src.length)
    val bb = ByteBuffer.allocate(src.length + 4).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(src).putInt(crc.getValue.toInt)
    bb.array()
  }
  private def zstd(b: Array[Byte]): Array[Byte] = ZarrFixture.zstdBytes(b)
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** One shard file from its inner-chunk payloads (None = sentinel). */
  private def shardFile(inners: Seq[Option[Array[Byte]]], atEnd: Boolean,
                        idxCrc: Boolean): Array[Byte] = {
    val idxLen = inners.size * 16 + (if (idxCrc) 4 else 0)
    val dataLen = inners.flatten.map(_.length).sum
    val idx = ByteBuffer.allocate(idxLen).order(ByteOrder.LITTLE_ENDIAN)
    val data = new java.io.ByteArrayOutputStream()
    var pos = if (atEnd) 0L else idxLen.toLong
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

  private val bytesLE = """{"name": "bytes", "configuration": {"endian": "little"}}"""
  private val zstdC = """{"name": "zstd", "configuration": {"level": 3}}"""

  private def arr(shape: String, grid: String, dtype: String, fill: String,
                  codecs: String, dims: String): String =
    s"""{"zarr_format": 3, "node_type": "array", "shape": $shape,
        "data_type": $dtype,
        "chunk_grid": {"name": "regular",
          "configuration": {"chunk_shape": $grid}},
        "chunk_key_encoding": {"name": "default",
          "configuration": {"separator": "/"}},
        "fill_value": $fill, "codecs": $codecs,
        "dimension_names": $dims, "attributes": {}}"""

  private def sharded(inner: String, codecs: String, indexCodecs: String,
                      loc: String): String =
    s"""[{"name": "sharding_indexed", "configuration": {
          "chunk_shape": $inner, "codecs": $codecs,
          "index_codecs": $indexCodecs, "index_location": "$loc"}}]"""

  /** 10-row store, record chunks [3] (inner), shards [6]:
    *  - `t` i8 raw UNSHARDED (the coordinate; mixed stores are legal);
    *  - `a` f8 sharded, inner [bytes, zstd, crc32c], index END + crc,
    *    inner chunk 1 (rows 3..5) the all-ones SENTINEL → NaN fill;
    *  - `b` i8 sharded, raw inners, index at START, no index crc;
    *  - `m` 2-D (10 × 4) f8 sharded [6, 4] of inners [3, 2], the inner
    *    chain [transpose [1,0], bytes, zstd] — column-major inner
    *    chunks INSIDE shards, the full composition.
    */
  private def writeShardedStore(): String = {
    val dir = Files.createTempDirectory("graft_zarr_v3_shard").toString
    def put(parts: Seq[String], bytes: Array[Byte]): Unit = {
      Files.createDirectories(Paths.get(dir, parts.init: _*))
      Files.write(Paths.get(dir, parts: _*), bytes)
    }
    val n = 10
    put(Seq("t", "c", "0"), leL(Array(0L, 1L, 2L)))
    put(Seq("t", "c", "1"), leL(Array(3L, 4L, 5L)))
    put(Seq("t", "c", "2"), leL(Array(6L, 7L, 8L)))
    put(Seq("t", "c", "3"), leL(Array(9L, 0L, 0L)))
    def aChunk(c: Int): Array[Byte] = withCrc(zstd(leD(
      Array.tabulate(3)(k => if (c * 3 + k < n) (c * 3 + k) * 1.25 else Double.NaN))))
    put(Seq("a", "c", "0"), shardFile(
      Seq(Some(aChunk(0)), None), atEnd = true, idxCrc = true))
    put(Seq("a", "c", "1"), shardFile(
      Seq(Some(aChunk(2)), Some(aChunk(3))), atEnd = true, idxCrc = true))
    def bChunk(c: Int): Array[Byte] = leL(
      Array.tabulate(3)(k => if (c * 3 + k < n) 100L + c * 3 + k else 0L))
    put(Seq("b", "c", "0"), shardFile(
      Seq(Some(bChunk(0)), Some(bChunk(1))), atEnd = false, idxCrc = false))
    put(Seq("b", "c", "1"), shardFile(
      Seq(Some(bChunk(2)), Some(bChunk(3))), atEnd = false, idxCrc = false))
    // m inner chunk (c, j): rows c·3..c·3+2, cols j·2..j·2+1, stored
    // COLUMN-major (transpose [1, 0]): element (i, k) at k·3 + i
    def mChunk(c: Int, j: Int): Array[Byte] = {
      val stored = new Array[Double](3 * 2)
      for (i <- 0 until 3; k <- 0 until 2) {
        val (r, col) = (c * 3 + i, j * 2 + k)
        stored(k * 3 + i) = if (r < n) r * 10.0 + col else Double.NaN
      }
      zstd(leD(stored))
    }
    // shard s holds inners (2 rec × 2 col, C-order): (2s,0)(2s,1)(2s+1,0)(2s+1,1)
    for (s <- 0 until 2)
      put(Seq("m", "c", s.toString, "0"), shardFile(
        Seq(Some(mChunk(2 * s, 0)), Some(mChunk(2 * s, 1)),
          Some(mChunk(2 * s + 1, 0)), Some(mChunk(2 * s + 1, 1))),
        atEnd = true, idxCrc = true))
    val idxPlain = s"[$bytesLE]"
    val idxCrc = s"""[$bytesLE, {"name": "crc32c"}]"""
    val root = s"""{"zarr_format": 3, "node_type": "group",
      "consolidated_metadata": {"kind": "inline", "must_understand": false,
        "metadata": {
          "t": ${arr("[10]", "[3]", "\"int64\"", "0", s"[$bytesLE]", """["t"]""")},
          "a": ${arr("[10]", "[6]", "\"float64\"", "\"NaN\"",
            sharded("[3]", s"[$bytesLE, $zstdC, {\"name\": \"crc32c\"}]",
              idxCrc, "end"), """["t"]""")},
          "b": ${arr("[10]", "[6]", "\"int64\"", "0",
            sharded("[3]", s"[$bytesLE]", idxPlain, "start"), """["t"]""")},
          "m": ${arr("[10, 4]", "[6, 4]", "\"float64\"", "\"NaN\"",
            sharded("[3, 2]",
              s"""[{"name": "transpose", "configuration": {"order": [1, 0]}},
                   $bytesLE, $zstdC]""",
              idxCrc, "end"), """["t", "slot"]""")}}}}"""
    Files.write(Paths.get(dir, "zarr.json"), root.getBytes("UTF-8"))
    dir
  }

  test("sharded v3 store: end/start indexes, crc framing, sentinel fill, transposed inners") {
    val df = spark.read.format("zarr").load(writeShardedStore())
    df.schema("a").dataType shouldBe DoubleType
    df.schema("b").dataType shouldBe LongType
    df.schema("m").dataType shouldBe ArrayType(DoubleType, containsNull = false)
    val rows = df.orderBy("t").collect()
    rows.length shouldBe 10
    (0 until 10).foreach { r =>
      val iA = rows(r).fieldIndex("a")
      if (r >= 3 && r <= 5) rows(r).isNullAt(iA) shouldBe true // sentinel
      else rows(r).getDouble(iA) shouldBe r * 1.25
      rows(r).getAs[Long]("b") shouldBe 100L + r
      rows(r).getSeq[Double](rows(r).fieldIndex("m")) shouldBe
        (0 until 4).map(k => r * 10.0 + k)
    }
  }

  test("a MISSING shard file is a fill run for every inner chunk it would hold") {
    val dir = writeShardedStore()
    // drop b's shard 1 entirely (rows 6..9): the whole-shard-missing
    // path must behave like v2's missing chunk — a fill run, here the
    // int64 fill 0 — and the per-JVM index cache must key it per store
    // (a fresh temp dir per call keeps runs independent)
    java.nio.file.Files.delete(Paths.get(dir, "b", "c", "1"))
    val rows = spark.read.format("zarr").load(dir).orderBy("t").collect()
    (0 until 6).foreach(r => rows(r).getAs[Long]("b") shouldBe 100L + r)
    (6 until 10).foreach(r => rows(r).getAs[Long]("b") shouldBe 0L)
  }

  test("a corrupt shard index crc fails loudly with the array name") {
    val dir = writeShardedStore()
    // flip one byte of a's shard-0 index (the last 4 bytes are the crc;
    // corrupt an index byte before it)
    val p = Paths.get(dir, "a", "c", "0")
    val bytes = Files.readAllBytes(p)
    bytes(bytes.length - 8) = (bytes(bytes.length - 8) ^ 0x1).toByte
    Files.write(p, bytes)
    val e = intercept[Exception] {
      spark.read.format("zarr").load(dir).orderBy("t").collect()
    }
    e.getMessage should include("crc32c mismatch on the shard index")
    e.getMessage should include("'a'")
  }

  test("non-consolidated discovery recurses into v3 subgroups") {
    val dir = Files.createTempDirectory("graft_zarr_v3_nested").toString
    def put(parts: Seq[String], bytes: Array[Byte]): Unit = {
      Files.createDirectories(Paths.get(dir, parts.init: _*))
      Files.write(Paths.get(dir, parts: _*), bytes)
    }
    put(Seq("t", "c", "0"), leL(Array(0L, 1L, 2L, 3L)))
    put(Seq("t", "zarr.json"),
      arr("[4]", "[4]", "\"int64\"", "0", s"[$bytesLE]", """["t"]""")
        .getBytes("UTF-8"))
    // an array nested one group deep: grp/x
    put(Seq("grp", "zarr.json"),
      """{"zarr_format": 3, "node_type": "group"}""".getBytes("UTF-8"))
    put(Seq("grp", "x", "c", "0"), leD(Array(0.5, 1.5, 2.5, 3.5)))
    put(Seq("grp", "x", "zarr.json"),
      arr("[4]", "[4]", "\"float64\"", "\"NaN\"", s"[$bytesLE]", """["t"]""")
        .getBytes("UTF-8"))
    Files.write(Paths.get(dir, "zarr.json"),
      """{"zarr_format": 3, "node_type": "group"}""".getBytes("UTF-8"))
    val df = spark.read.format("zarr").load(dir)
    df.columns.toSet shouldBe Set("t", "grp/x")
    df.orderBy("t").select("`grp/x`").collect().map(_.getDouble(0)).toSeq shouldBe
      Seq(0.5, 1.5, 2.5, 3.5)
  }

  // ---- parse guards --------------------------------------------------------

  private def parseOne(json: String): Option[ZarrMeta.ArrayMeta] =
    ZarrMeta.parseV3Array("x", mapper.readTree(json))

  test("sharding parse guards fail loudly") {
    // sharding must be the sole codec
    intercept[IllegalArgumentException] {
      parseOne(arr("[10]", "[6]", "\"int64\"", "0",
        sharded("[3]", s"[$bytesLE]", s"[$bytesLE]", "end").dropRight(1) +
          s", $zstdC]", """["t"]"""))
    }.getMessage should include("only codec")
    // nested sharding
    intercept[IllegalArgumentException] {
      parseOne(arr("[10]", "[6]", "\"int64\"", "0",
        sharded("[3]", sharded("[3]", s"[$bytesLE]", s"[$bytesLE]", "end"),
          s"[$bytesLE]", "end"), """["t"]"""))
    }.getMessage should include("nests sharding_indexed")
    // inner chunk must tile the shard evenly
    intercept[IllegalArgumentException] {
      parseOne(arr("[10]", "[6]", "\"int64\"", "0",
        sharded("[4]", s"[$bytesLE]", s"[$bytesLE]", "end"), """["t"]"""))
    }.getMessage should include("evenly divide")
    // index must be little-endian bytes
    intercept[IllegalArgumentException] {
      parseOne(arr("[10]", "[6]", "\"int64\"", "0",
        sharded("[3]", s"[$bytesLE]",
          """[{"name": "bytes", "configuration": {"endian": "big"}}]""",
          "end"), """["t"]"""))
    }.getMessage should include("little-endian")
    // unknown index_location
    intercept[IllegalArgumentException] {
      parseOne(arr("[10]", "[6]", "\"int64\"", "0",
        sharded("[3]", s"[$bytesLE]", s"[$bytesLE]", "middle"), """["t"]"""))
    }.getMessage should include("index_location")
  }

  test("transpose parse guards and identity no-op") {
    // identity order on rank 2 → no-op, not an error
    parseOne(arr("[10, 4]", "[5, 4]", "\"float64\"", "\"NaN\"",
      s"""[{"name": "transpose", "configuration": {"order": [0, 1]}},
           $bytesLE]""", """["t", "slot"]""")).get.transposed shouldBe false
    // [1, 0] sets the flag
    parseOne(arr("[10, 4]", "[5, 4]", "\"float64\"", "\"NaN\"",
      s"""[{"name": "transpose", "configuration": {"order": [1, 0]}},
           $bytesLE]""", """["t", "slot"]""")).get.transposed shouldBe true
    // not a permutation
    intercept[IllegalArgumentException] {
      parseOne(arr("[10, 4]", "[5, 4]", "\"float64\"", "\"NaN\"",
        s"""[{"name": "transpose", "configuration": {"order": [1, 1]}},
             $bytesLE]""", """["t", "slot"]"""))
    }.getMessage should include("not a permutation")
    // rank mismatch
    intercept[IllegalArgumentException] {
      parseOne(arr("[10]", "[5]", "\"float64\"", "\"NaN\"",
        s"""[{"name": "transpose", "configuration": {"order": [1, 0]}},
             $bytesLE]""", """["t"]"""))
    }.getMessage should include("rank")
    // transpose cannot pair with vlen-utf8
    intercept[IllegalArgumentException] {
      parseOne(arr("[10, 4]", "[5, 4]", "\"string\"", "\"\"",
        s"""[{"name": "transpose", "configuration": {"order": [1, 0]}},
             {"name": "vlen-utf8"}]""", """["t", "slot"]"""))
    }.getMessage should include("vlen-utf8")
    // transpose after the bytes codec is out of order
    intercept[IllegalArgumentException] {
      parseOne(arr("[10, 4]", "[5, 4]", "\"float64\"", "\"NaN\"",
        s"""[$bytesLE,
             {"name": "transpose", "configuration": {"order": [1, 0]}}]""",
        """["t", "slot"]"""))
    }.getMessage should include("precede")
  }

  test("codec-order violations name the actual violation") {
    // compressor AFTER crc32c: an ordering error ("crc32c must be the
    // last codec" fires at the crc32c position), never the misleading
    // "more than one compressor" (round-17 ADVICE fix)
    intercept[IllegalArgumentException] {
      parseOne(arr("[10]", "[5]", "\"float64\"", "\"NaN\"",
        s"""[$bytesLE, {"name": "crc32c"}, $zstdC]""", """["t"]"""))
    }.getMessage should include("crc32c must be the last codec")
    // two compressors still reports multiplicity
    intercept[IllegalArgumentException] {
      parseOne(arr("[10]", "[5]", "\"float64\"", "\"NaN\"",
        s"""[$bytesLE, {"name": "gzip"}, $zstdC]""", """["t"]"""))
    }.getMessage should include("more than one compressor")
  }

  test("untranspose2D is the exact inverse of column-major storage") {
    // 3 × 2 grid of i2 elements: C-order values 0..5, stored F-order
    val meta = parseOne(arr("[3, 2]", "[3, 2]", "\"int16\"", "0",
      s"""[{"name": "transpose", "configuration": {"order": [1, 0]}},
           $bytesLE]""", """["t", "slot"]""")).get
    val stored = new Array[Byte](12)
    val bb = ByteBuffer.wrap(stored).order(ByteOrder.LITTLE_ENDIAN)
    // stored (j·3 + i) = C (i·2 + j): columns [0,2,4] then [1,3,5]
    Seq(0, 2, 4, 1, 3, 5).foreach(v => bb.putShort(v.toShort))
    val out = ZarrMeta.decodeChunk(meta, stored)
    val ob = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 6).map(i => ob.getShort(i * 2).toInt) shouldBe (0 until 6)
  }
}
