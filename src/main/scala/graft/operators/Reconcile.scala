package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sink reconciliation algebra (SURVEY §2.2 K3/K4): the reference re-runs a
  * whole (site, span) query and then reconciles the object store against
  * the fresh artifact list — stale outputs are deleted
  * (qaqc/plots.py:467-511, set difference at :500) and same-basename
  * `.svg`/`.png` duplicates are resolved by keeping the newer file
  * (qaqc/plots.py:514-558, intersection at :543).
  */
object Reconcile {

  /** K3: names present before but not regenerated — the delete list.
    * Left-anti join, so it scales to object-store-sized listings (both
    * sides can be large; the shuffle carries names only).
    */
  def staleOutputs(existing: DataFrame, produced: DataFrame,
                   nameCol: String): DataFrame =
    existing.join(produced, Seq(nameCol), "left_anti")

  /** K4: for basenames present in BOTH `.png` and `.svg`, delete all but
    * the newest file (ties broken toward `.png`, then name, for
    * determinism). Input: (name, mtime); output: rows to delete.
    */
  def duplicateFormatDeletes(files: DataFrame, nameCol: String,
                             mtimeCol: String): DataFrame = {
    val ext = regexp_extract(col(nameCol), "\\.(png|svg)$", 1)
    val base = regexp_replace(col(nameCol), "\\.(png|svg)$", "")
    val tagged = files
      .withColumn("__ext", ext)
      .withColumn("__base", base)
      .filter(col("__ext").isin("png", "svg"))
    val wBase = Window.partitionBy(col("__base"))
    val wRank = Window.partitionBy(col("__base"))
      .orderBy(col(mtimeCol).desc, col("__ext").asc, col(nameCol).asc)
    tagged
      .withColumn("__n_ext", size(collect_set(col("__ext")).over(wBase)))
      .withColumn("__rk", row_number().over(wRank))
      .filter(col("__n_ext") === 2 && col("__rk") > 1)
      .drop("__ext", "__base", "__n_ext", "__rk")
  }
}
