package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{QueriesCalibration, QueriesCuration, QueriesDocs, QueriesEvents, QueriesInvariants, QueriesPipeline, QueriesQaqc, QueriesRelational, QueriesScience, QueriesZarr}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-inventory surface: one named query per
  * implemented operator family (names carry the SURVEY §2 ids), each
  * backed by a DuckDB oracle in `oracleSql` where ANSI SQL can express it.
  */
object SparkEntry {

  // Shadows functions.round: every oracle-compared column rounds with
  // DuckDB-exact semantics (see graft.functions.Rounding) so half-boundary
  // values hash identically on both engines.
  private def round(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    graft.functions.Rounding.dround(c, scale)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per region: the full dim-join chain with broadcast dims.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    val r = Tables.region(spark, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("cnt"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesRelational.queries ++ QueriesEvents.queries ++ QueriesDocs.queries ++
      QueriesScience.queries ++ QueriesPipeline.queries ++ QueriesCalibration.queries ++ QueriesQaqc.queries ++
      QueriesCuration.queries ++ QueriesInvariants.queries ++ QueriesZarr.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (LTTB, MinHash/SimHash, LSH, language-ID heuristic) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    QueriesRelational.oracleSql ++ QueriesEvents.oracleSql ++ QueriesDocs.oracleSql ++
      QueriesScience.oracleSql ++ QueriesPipeline.oracleSql ++ QueriesCalibration.oracleSql ++ QueriesQaqc.oracleSql ++
      QueriesCuration.oracleSql ++ QueriesInvariants.oracleSql ++ QueriesZarr.oracleSql
}
