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

  /** DataFrame over an `RDD[InternalRow]` without the external-Row round
    * trip (`df.rdd` + `createDataFrame` deserializes every column into
    * boxed objects and re-encodes them — the per-row cost the
    * optimization guide's "noop sink" section warns about). Used by
    * [[graft.operators.OrderedPosition]], whose row-id append needs an
    * RDD boundary but none of the external-row machinery.
    */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
