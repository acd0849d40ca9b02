package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Compute rebalance for under-split scans.
  *
  * A parquet source yields at most one task per row group, so a file with
  * fewer row groups than the cluster has cores serializes every downstream
  * narrow operator — per-row text kernels, unpivots, shuffle *writes* — onto
  * a handful of tasks no matter how wide the cluster is. AQE never fixes
  * this direction (it only coalesces partitions, it cannot split a scan),
  * and `spark.sql.files.maxPartitionBytes` is inert below one row group
  * (measured: tools/ReshardProbe, PLANS.md "Multi-file layout probe" — the
  * same queries run up to 2× faster on a multi-file layout of identical
  * data).
  *
  * [[rebalance]] is the engine-side fix: when the planned scan has
  * materially fewer partitions than the session's default parallelism,
  * redistribute rows across the cores with ONE narrow exchange before the
  * compute-heavy work; otherwise it is a no-op returning the input plan
  * unchanged. On a real multi-row-group / multi-file layout (any
  * distributed writer's output — and any 100 TB table) the gate is false
  * and no shuffle is added; the helper exists for the single-digit-split
  * inputs a 100 TB pipeline still meets at its edges: a config table, one
  * consolidated upstream extract, a gzip'd drop file.
  *
  * Callers opt in at the point where per-row compute follows the scan;
  * rebalancing is NOT folded into [[Tables]] because a scan that feeds a
  * plain filter/projection or a broadcast build side is better left
  * un-shuffled. Opting in is only worth it when the per-row compute
  * downstream exceeds the cost of one exchange + one extra stage: measured
  * at sf0.1 (5k docs, ~1 CPU-s of text kernels), routing the 15
  * kernel-heaviest corpus queries through a rebalance REGRESSED the batch
  * 20.5 → 26.7 s — the fixed per-query cost of the added stage outweighed
  * the kernel parallelism, so the bench queries deliberately do not use it
  * (PLANS.md "Scan rebalance negative result"). The multi-file layout
  * probe's 2× kernel-query wins came from free scan parallelism with NO
  * added exchange — at real scale the layout, not this helper, is the fix.
  *
  * Catalyst pushes filters and column pruning through the added
  * `Repartition` node (`PushPredicateThroughNonJoin` / `ColumnPruning`), so
  * predicates written after a rebalance still reach the parquet scan —
  * asserted by `ScanBalanceSpec`.
  */
object ScanBalance {

  /** Kill switch + gate factor: rebalance only when
    * `scanPartitions * factor <= defaultParallelism` (default 2 — a scan
    * already within 2× of the core count gains less from redistribution
    * than the exchange costs).
    */
  val EnabledKey = "spark.graft.scan.rebalance.enabled"
  val FactorKey = "spark.graft.scan.rebalance.factor"

  /** Redistribute `df` across `defaultParallelism` partitions when its
    * planned scan is under-split; identity otherwise.
    *
    * `keyCols` picks hash partitioning on stable keys (deterministic
    * layout, no pre-shuffle sort); empty uses round-robin, which pays
    * Spark's determinism sort (`spark.sql.execution.sortBeforeRepartition`)
    * per partition — prefer a key when one exists.
    */
  def rebalance(df: DataFrame, keyCols: String*): DataFrame = {
    val spark = df.sparkSession
    if (!spark.conf.get(EnabledKey, "true").toBoolean) return df
    val factor = spark.conf.get(FactorKey, "2").toInt
    val target = spark.sparkContext.defaultParallelism
    // planned (not executed) partition count of the input: for a bare scan
    // this is the split count the FileSourceScanExec would run with
    val parts = df.rdd.getNumPartitions
    if (parts * factor <= target) {
      if (keyCols.nonEmpty) df.repartition(target, keyCols.map(col): _*)
      else df.repartition(target)
    } else df
  }
}
