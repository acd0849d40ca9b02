package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset constructor so graft's
  * custom logical operators (e.g. the native as-of join) can be exposed as
  * DataFrames. Standard technique for Spark extension libraries: the only
  * member used is `Dataset.ofRows`, which runs the full analyzer/optimizer
  * over the supplied plan.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
