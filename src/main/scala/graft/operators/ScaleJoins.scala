package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-out join utilities — the levers the 100 TB design point needs
  * that no single query in the suite forces at test scale:
  *
  *  - [[saltedEquiJoin]]: skew mitigation when one join key dominates
  *    (AQE's skew-join split handles sort-merge skew at runtime, but a
  *    pathological hot key in a shuffle-hash or pre-AQE plan still
  *    funnels one reducer; salting makes the fan-out explicit and
  *    deterministic).
  *  - [[writeBucketed]]: co-located storage layout — both fact tables
  *    bucketed the same way on the join key join WITHOUT any exchange
  *    at read time, the classic repeated-join amortization.
  *  - [[bloomPrunedJoin]]: pre-shuffle probe-side reduction when the join
  *    is selective — most probe rows that would shuffle only to find no
  *    match are dropped at the scan.
  */
object ScaleJoins {

  /** Inner equi-join on `key` with the PROBE (left) side pre-filtered by a
    * Bloom filter built over the build (right) side's keys: when the join
    * is selective (most probe rows match nothing — dedup-pair lookups,
    * incremental-update joins), the filter drops non-matching rows BEFORE
    * the probe side shuffles, at a driver-bounded cost of one aggregate
    * over the build side's keys. False positives only (a few stragglers
    * shuffle and fall out of the join); never false negatives, so the
    * result equals the plain join row-for-row (spec-asserted).
    *
    * Spark's runtime bloom-filter injection (`runtime.bloomFilter.enabled`)
    * does this automatically for some shapes; this is the explicit,
    * always-on version with a tunable `expectedItems`/`fpp`, usable when
    * the optimizer declines (e.g. a non-column build expression or a
    * disabled-AQE environment). The filter itself is built distributed
    * (partial aggregation) and only the bitmap (≈1.2 bytes/item at 1% fpp)
    * reaches the driver for broadcast.
    */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame, key: String,
                      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = build.stat.bloomFilter(key, expectedItems, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bloom)
    val pruned = probe.schema(key).dataType match {
      case org.apache.spark.sql.types.StringType =>
        val f = udf((k: String) => k != null && bc.value.mightContainString(k))
        probe.filter(col(key).isNotNull && f(col(key)))
      case _ =>
        val f = udf((k: Long) => bc.value.mightContainLong(k))
        probe.filter(col(key).isNotNull &&
          f(coalesce(col(key).cast("long"), lit(0L))))
    }
    pruned.join(build, Seq(key))
  }

  /** Inner equi-join on `key` with the LEFT side's rows salted into
    * `saltFactor` sub-keys and the RIGHT side replicated across all of
    * them: a key holding n rows shuffles into `saltFactor` partitions of
    * ~n/saltFactor instead of one hot reducer, at the cost of
    * `saltFactor`× the (small) right side. Result equals the unsalted
    * join row-for-row.
    *
    * The salt is `xxhash64(entropyCol) mod saltFactor` — deterministic,
    * so re-runs shuffle identically (a `rand()` salt would defeat shuffle
    * reuse and reproducibility). Pick an `entropyCol` that varies within
    * the hot key (an id, a timestamp).
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     saltFactor: Int, entropyCol: String): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(entropyCol)), lit(saltFactor.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Write `df` as a bucketed, optionally bucket-sorted parquet table in
    * the session catalog. Two tables bucketed identically on their join
    * key sort-merge-join with ZERO exchanges at read time (asserted in
    * `ScaleJoinsSpec`) — the storage-layout answer to a join that runs
    * every pipeline invocation. Bucket count is a layout contract: pick
    * it once per dataset family (`numBuckets` ≈ data size / target
    * partition size) and keep it stable so co-location holds across
    * writers.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
    (sortCol match {
      case Some(s) => w.sortBy(s)
      case None => w
    }).saveAsTable(tableName)
  }
}
