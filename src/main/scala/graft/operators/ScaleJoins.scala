package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-out join utilities — the two levers the 100 TB design point
  * needs that no single query in the suite forces at test scale:
  *
  *  - [[saltedEquiJoin]]: skew mitigation when one join key dominates
  *    (AQE's skew-join split handles sort-merge skew at runtime, but a
  *    pathological hot key in a shuffle-hash or pre-AQE plan still
  *    funnels one reducer; salting makes the fan-out explicit and
  *    deterministic).
  *  - [[writeBucketed]]: co-located storage layout — both fact tables
  *    bucketed the same way on the join key join WITHOUT any exchange
  *    at read time, the classic repeated-join amortization.
  */
object ScaleJoins {

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
