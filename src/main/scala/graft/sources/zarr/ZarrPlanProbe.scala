package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}

/** Measured evidence for the source's planning-scale story (the scaladoc
  * claims it; this probe measures it): at a MANY-chunK store, the
  * exact per-chunk min/max pruning is O(nChunks) driver-side chunk reads,
  * while the sorted binary search is O(log nChunks) — the difference
  * between a planning pass that reads 65k coordinate chunk files and one
  * that reads ~2·log2(65k) ≈ 32. Builds a synthetic store (int64
  * CF-seconds coordinate, ascending, `chunk` rows per chunk file, raw
  * codec), then times `planInputPartitions()` for a narrow span in four
  * modes: no-filter (partition enumeration only), forced-exact prune
  * (`sortedCoord=false`), forced binary search (`sortedCoord=true`), and
  * the DEFAULT `Auto` with no option set — which must land in
  * binary-search territory on this (sorted) store, the round-14 item:
  * an unadorned 1M-chunk read no longer pays the full planning pass.
  * The pruning modes must keep the SAME chunk range (the sorted path
  * may keep ≤ 1 extra boundary chunk). An UNSORTED store is probed
  * last: Auto must fall back to the exact pass and keep the exact set.
  *
  * Usage: runMain graft.sources.zarr.ZarrPlanProbe [nChunks]
  */
object ZarrPlanProbe {
  def main(args: Array[String]): Unit = {
    val nChunks = args.headOption.map(_.toInt).getOrElse(65536)
    val chunk = 16
    val n = nChunks.toLong * chunk
    val dir = Files.createTempDirectory("graft_zarr_plan").toString
    Files.createDirectories(Paths.get(dir, "time"))
    val t0 = System.nanoTime()
    var c = 0
    while (c < nChunks) {
      val bb = ByteBuffer.allocate(chunk * 8).order(ByteOrder.LITTLE_ENDIAN)
      var k = 0
      while (k < chunk) { bb.putLong(c.toLong * chunk + k); k += 1 }
      Files.write(Paths.get(dir, "time", c.toString), bb.array())
      c += 1
    }
    Files.write(Paths.get(dir, ".zmetadata"),
      s"""{"metadata": {
        "time/.zarray": {"shape": [$n], "chunks": [$chunk], "dtype": "<i8",
          "compressor": null, "fill_value": 0, "order": "C",
          "filters": null, "zarr_format": 2},
        "time/.zattrs": {"_ARRAY_DIMENSIONS": ["time"],
          "units": "seconds since 1970-01-01"}},
        "zarr_consolidated_format": 1}""".getBytes("UTF-8"))
    println(f"ZARRPLAN built nChunks=$nChunks rows=$n in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val metas = {
      val all = ZarrMeta.parseConsolidated(new String(
        Files.readAllBytes(Paths.get(dir, ".zmetadata")), "UTF-8"))
      all.values.toSeq
    }
    // a narrow span in the middle: rows [n/2, n/2 + 1000)
    val lo = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(n / 2))
    val hi = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(n / 2 + 999))
    def planAt(d: String, ms: Seq[ZarrMeta.ArrayMeta], mode: SortedMode,
               span: Option[(java.sql.Timestamp, java.sql.Timestamp)],
               label: String): Long = {
      val sb = new ZarrScanBuilder(d, "time", ms, sorted = mode)
      span.foreach { case (l, h) =>
        sb.pushFilters(Array(GreaterThanOrEqual("time", l),
          LessThanOrEqual("time", h)))
      }
      val t = System.nanoTime()
      val kept = sb.build().toBatch.planInputPartitions().length
      val dur = (System.nanoTime() - t) / 1e6
      println(f"ZARRPLAN $label%-22s kept=$kept%7d  plan=${dur}%10.1f ms")
      kept
    }
    def plan(mode: SortedMode, filtered: Boolean, label: String): Long =
      planAt(dir, metas, mode, if (filtered) Some((lo, hi)) else None, label)
    plan(SortedMode.Exact, filtered = false, "enumerate(no filter)")
    // min-of-2 each: the second run has warm fs caches, like a driver
    // that just wrote/loaded the store
    val e1 = (1 to 2).map(_ => plan(SortedMode.Exact, filtered = true,
      "exact full-scan prune")).last
    val s1 = (1 to 2).map(_ => plan(SortedMode.Forced, filtered = true,
      "sortedCoord search")).last
    val a1 = (1 to 2).map(_ => plan(SortedMode.Auto, filtered = true,
      "auto (default)")).last
    require(math.abs(e1 - s1) <= 2,
      s"pruning modes disagree: exact=$e1 sorted=$s1")
    require(a1 == s1,
      s"auto did not take the sorted path on a sorted store: auto=$a1 sorted=$s1")
    println("ZARRPLAN modes agree on the kept chunk range")

    // an UNSORTED store (first and last chunks internally sorted would
    // be the adversarial case — here even the first chunk is descending,
    // the common shape): Auto must fall back to the exact per-chunk pass
    val udir = Files.createTempDirectory("graft_zarr_plan_unsorted").toString
    Files.createDirectories(Paths.get(udir, "time"))
    val un = 64L * chunk
    for (c2 <- 0 until 64) {
      val bb = ByteBuffer.allocate(chunk * 8).order(ByteOrder.LITTLE_ENDIAN)
      var k = 0
      // descending within and across chunks
      while (k < chunk) { bb.putLong(un - (c2.toLong * chunk + k) - 1); k += 1 }
      Files.write(Paths.get(udir, "time", c2.toString), bb.array())
    }
    Files.write(Paths.get(udir, ".zmetadata"),
      s"""{"metadata": {
        "time/.zarray": {"shape": [$un], "chunks": [$chunk], "dtype": "<i8",
          "compressor": null, "fill_value": 0, "order": "C",
          "filters": null, "zarr_format": 2},
        "time/.zattrs": {"_ARRAY_DIMENSIONS": ["time"],
          "units": "seconds since 1970-01-01"}},
        "zarr_consolidated_format": 1}""".getBytes("UTF-8"))
    val umetas = ZarrMeta.parseConsolidated(new String(
      Files.readAllBytes(Paths.get(udir, ".zmetadata")), "UTF-8")).values.toSeq
    // a narrow span INSIDE the unsorted store's [0, un) value range
    val uspan = Some((
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(un / 2)),
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(un / 2 + 31))))
    val ue = planAt(udir, umetas, SortedMode.Exact, uspan, "unsorted: exact")
    val ua = planAt(udir, umetas, SortedMode.Auto, uspan, "unsorted: auto")
    require(ua == ue,
      s"auto mis-pruned an unsorted store: auto=$ua exact=$ue")
    println("ZARRPLAN auto fell back to the exact pass on the unsorted store")

    // SHARDED v3 twin (round-17): the SAME coordinate values, inner
    // chunks [16] packed 16-per-shard (so nChunks/16 shard files, each
    // with a crc32c-framed end index). Planning must keep the SAME
    // inner-chunk range as the unsharded store at the same probe count
    // — each probe costing one shard-index read (cached per JVM after
    // the first touch of a shard) + one inner-chunk range read, never a
    // whole shard. The exact pass is the stress case: nChunks range
    // reads against nChunks/16 index reads — linear like the unsharded
    // exact pass, just with the extra index hop.
    val innersPerShard = 16
    // the sharded twin declares the SAME total shape `n`; a non-multiple
    // nChunks would truncate here and the tail rows would silently
    // decode as fill, skewing the pruning comparison (round-18 ADVICE)
    require(nChunks % innersPerShard == 0,
      s"ZarrPlanProbe: nChunks=$nChunks must be a multiple of " +
        s"$innersPerShard (the sharded twin packs $innersPerShard inner " +
        "chunks per shard over the same declared shape)")
    val nShards = nChunks / innersPerShard
    val sdir = Files.createTempDirectory("graft_zarr_plan_sharded").toString
    Files.createDirectories(Paths.get(sdir, "time", "c"))
    val tS = System.nanoTime()
    var s = 0
    while (s < nShards) {
      val idx = ByteBuffer.allocate(innersPerShard * 16 + 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      val data = ByteBuffer.allocate(innersPerShard * chunk * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < innersPerShard) {
        idx.putLong((i * chunk * 8).toLong).putLong((chunk * 8).toLong)
        var k = 0
        while (k < chunk) {
          data.putLong((s.toLong * innersPerShard + i) * chunk + k); k += 1
        }
        i += 1
      }
      val crc = new java.util.zip.CRC32C()
      crc.update(idx.array(), 0, innersPerShard * 16)
      idx.putInt(crc.getValue.toInt)
      val out = ByteBuffer.allocate(data.capacity() + idx.capacity())
        .put(data.array()).put(idx.array())
      Files.write(Paths.get(sdir, "time", "c", s.toString), out.array())
      s += 1
    }
    Files.write(Paths.get(sdir, "zarr.json"),
      s"""{"zarr_format": 3, "node_type": "group",
        "consolidated_metadata": {"kind": "inline", "must_understand": false,
          "metadata": {"time": {
            "zarr_format": 3, "node_type": "array", "shape": [$n],
            "data_type": "int64",
            "chunk_grid": {"name": "regular",
              "configuration": {"chunk_shape": [${innersPerShard * chunk}]}},
            "chunk_key_encoding": {"name": "default",
              "configuration": {"separator": "/"}},
            "fill_value": 0,
            "codecs": [{"name": "sharding_indexed", "configuration": {
              "chunk_shape": [$chunk],
              "codecs": [{"name": "bytes",
                "configuration": {"endian": "little"}}],
              "index_codecs": [{"name": "bytes",
                "configuration": {"endian": "little"}}, {"name": "crc32c"}],
              "index_location": "end"}}],
            "dimension_names": ["time"],
            "attributes": {"units": "seconds since 1970-01-01"}}}}}"""
        .getBytes("UTF-8"))
    println(f"ZARRPLAN built SHARDED twin nShards=$nShards " +
      f"(innerChunks=$nChunks) in ${(System.nanoTime() - tS) / 1e9}%.1f s")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val smetas = ZarrMeta.parseV3(
      mapper.readTree(new String(
        Files.readAllBytes(Paths.get(sdir, "zarr.json")), "UTF-8")),
      _ => Nil, _ => None).values.toSeq
    require(smetas.head.isSharded && smetas.head.chunk == chunk,
      "sharded probe store did not parse as sharded inner chunks")
    val ss = (1 to 2).map(_ => planAt(sdir, smetas, SortedMode.Forced,
      Some((lo, hi)), "sharded: sorted search")).last
    val sa2 = (1 to 2).map(_ => planAt(sdir, smetas, SortedMode.Auto,
      Some((lo, hi)), "sharded: auto (default)")).last
    val se2 = (1 to 2).map(_ => planAt(sdir, smetas, SortedMode.Exact,
      Some((lo, hi)), "sharded: exact prune")).last
    require(ss == s1 && sa2 == a1,
      s"sharded pruning kept a different range: sharded=$ss/$sa2 " +
        s"unsharded=$s1/$a1")
    require(math.abs(se2 - e1) <= 2,
      s"sharded exact pass disagrees: sharded=$se2 unsharded=$e1")
    println("ZARRPLAN sharded store prunes to the same inner-chunk range")
  }
}
