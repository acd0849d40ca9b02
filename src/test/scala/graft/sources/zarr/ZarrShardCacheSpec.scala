package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration

import graft.SparkSpec

/** The shard-index cache's LRU bound under a working set LARGER than
  * the bound (round-18, VERDICT item 6 + ADVICE): >4096 distinct shard
  * indexes driven through one JVM must (a) keep every read correct —
  * eviction is a slowdown, never a wrong answer, (b) hold the entry
  * count at the bound (single-eldest LRU eviction, not the former
  * wholesale clear), and (c) re-resolve evicted entries — including
  * MissingShard negatives — on the next access. The immutable-store
  * assumption (entries never invalidated while cached) is the
  * documented contract at the cache itself.
  */
class ZarrShardCacheSpec extends SparkSpec {

  private val NShards = 4300 // > the 4096 cache bound
  private val InnersPerShard = 2
  private val Chunk = 4 // elements per inner chunk
  private val MissingShards = Set(7, 4200) // whole shard files absent
  private val SentinelShard = 11 // inner 1 of this shard = all-ones index

  private def leL(vs: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putLong); bb.array()
  }

  private def expected(c: Int, k: Int): Long = c.toLong * Chunk + k

  /** A v3 sharded store of NShards shard files (2 inner chunks each,
    * raw bytes, plain end index): v[i] = i, with two whole shard files
    * missing and one all-ones sentinel inner — both fill(-1) runs.
    */
  private lazy val store: String = {
    val dir = Files.createTempDirectory("graft_zarr_shardcache").toString
    val n = NShards.toLong * InnersPerShard * Chunk
    Files.createDirectories(Paths.get(dir, "v", "c"))
    for (s <- 0 until NShards if !MissingShards.contains(s)) {
      val idx = ByteBuffer.allocate(InnersPerShard * 16)
        .order(ByteOrder.LITTLE_ENDIAN)
      val data = new java.io.ByteArrayOutputStream()
      var pos = 0L
      for (i <- 0 until InnersPerShard) {
        if (s == SentinelShard && i == 1) {
          idx.putLong(-1L).putLong(-1L) // unwritten inner → fill run
        } else {
          val c = s * InnersPerShard + i
          val b = leL(Array.tabulate(Chunk)(k => expected(c, k)))
          idx.putLong(pos).putLong(b.length.toLong)
          data.write(b, 0, b.length); pos += b.length
        }
      }
      val out = ByteBuffer.allocate(data.size() + idx.capacity())
        .put(data.toByteArray).put(idx.array())
      Files.write(Paths.get(dir, "v", "c", s.toString), out.array())
    }
    val bytesLE = """{"name": "bytes", "configuration": {"endian": "little"}}"""
    Files.write(Paths.get(dir, "zarr.json"),
      s"""{"zarr_format": 3, "node_type": "group",
        "consolidated_metadata": {"kind": "inline", "must_understand": false,
          "metadata": {"v": {
            "zarr_format": 3, "node_type": "array", "shape": [$n],
            "data_type": "int64",
            "chunk_grid": {"name": "regular",
              "configuration": {"chunk_shape": [${InnersPerShard * Chunk}]}},
            "chunk_key_encoding": {"name": "default",
              "configuration": {"separator": "/"}},
            "fill_value": -1,
            "codecs": [{"name": "sharding_indexed", "configuration": {
              "chunk_shape": [$Chunk],
              "codecs": [$bytesLE],
              "index_codecs": [$bytesLE],
              "index_location": "end"}}],
            "dimension_names": ["t"],
            "attributes": {}}}}}""".getBytes("UTF-8"))
    dir
  }

  private def checkChunk(conf: Configuration, meta: ZarrMeta.ArrayMeta,
                         c: Long): Unit = {
    val s = (c / InnersPerShard).toInt
    val bytes = ZarrReader.readChunkBytes(conf, store, meta, c)
    if (MissingShards.contains(s) ||
        (s == SentinelShard && c % InnersPerShard == 1)) {
      assert(bytes.isEmpty, s"chunk $c of shard $s should be a fill run")
    } else {
      val got = ZarrMeta.longsOf(meta, bytes.get)
      for (k <- 0 until Chunk)
        assert(got(k) == expected(c.toInt, k),
          s"chunk $c element $k: got ${got(k)}")
    }
  }

  test("reads stay correct past the LRU bound, and the bound holds") {
    val conf = new Configuration()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = ZarrMeta.parseV3(
      mapper.readTree(new String(
        Files.readAllBytes(Paths.get(store, "zarr.json")), "UTF-8")),
      _ => Nil, _ => None)("v")
    meta.isSharded shouldBe true
    val nChunks = NShards * InnersPerShard
    // first pass: touch every shard (4300 > the 4096 bound — the
    // earliest entries, incl. shard 7's MissingShard negative, evict)
    for (c <- 0L until nChunks.toLong) checkChunk(conf, meta, c)
    assert(ZarrReader.shardIndexCacheSize <= 4096,
      s"cache grew past its bound: ${ZarrReader.shardIndexCacheSize}")
    // second pass over the EARLY shards (evicted by the tail of pass 1):
    // every entry — present and MissingShard — re-resolves correctly
    for (c <- 0L until (500L * InnersPerShard)) checkChunk(conf, meta, c)
    // and the interleaved revisit pattern a real scan produces: jump
    // between head and tail so hits and misses alternate
    for (s <- 0 until 200) {
      checkChunk(conf, meta, s.toLong * InnersPerShard)
      checkChunk(conf, meta, (NShards - 1 - s).toLong * InnersPerShard)
    }
    assert(ZarrReader.shardIndexCacheSize <= 4096,
      s"cache grew past its bound: ${ZarrReader.shardIndexCacheSize}")
  }
}
