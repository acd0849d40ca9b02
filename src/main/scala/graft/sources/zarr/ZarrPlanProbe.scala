package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}

/** Measured evidence for the source's planning-scale story (the scaladoc
  * claims it; this probe measures it): at a MANY-chunK store, the default
  * exact per-chunk min/max pruning is O(nChunks) driver-side chunk reads,
  * while `sortedCoord` is O(log nChunks) — the difference between a
  * planning pass that reads 65k coordinate chunk files and one that reads
  * ~2·log2(65k) ≈ 32. Builds a synthetic store (int64 CF-seconds
  * coordinate, ascending, `chunk` rows per chunk file, raw codec), then
  * times `planInputPartitions()` for a narrow span in three modes:
  * no-filter (partition enumeration only), exact full-scan prune, and
  * sortedCoord binary search. The two pruning modes must keep the SAME
  * chunk range (the sorted path may keep ≤ 1 extra boundary chunk).
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
    def plan(sorted: Boolean, filtered: Boolean, label: String): Long = {
      val sb = new ZarrScanBuilder(dir, "time", metas, sortedCoord = sorted)
      if (filtered)
        sb.pushFilters(Array(GreaterThanOrEqual("time", lo),
          LessThanOrEqual("time", hi)))
      val t = System.nanoTime()
      val kept = sb.build().toBatch.planInputPartitions().length
      val ms = (System.nanoTime() - t) / 1e6
      println(f"ZARRPLAN $label%-22s kept=$kept%7d  plan=${ms}%10.1f ms")
      kept
    }
    plan(sorted = false, filtered = false, "enumerate(no filter)")
    // min-of-2 each: the second run has warm fs caches, like a driver
    // that just wrote/loaded the store
    val e1 = (1 to 2).map(_ => plan(sorted = false, filtered = true,
      "exact full-scan prune")).last
    val s1 = (1 to 2).map(_ => plan(sorted = true, filtered = true,
      "sortedCoord search")).last
    require(math.abs(e1 - s1) <= 2,
      s"pruning modes disagree: exact=$e1 sorted=$s1")
    println("ZARRPLAN modes agree on the kept chunk range")
  }
}
