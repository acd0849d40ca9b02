package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{CalendarOps, Decimate, TemporalJoins}
import graft.sources.Tables

/** Relational-core query inventory on the TPC-H-ish tables, each paired with
  * a DuckDB oracle in [[QueriesRelational.oracleSql]]. Query names carry the
  * SURVEY §2 operator ids they exercise.
  */
object QueriesRelational {

  // Shadows functions.round: every oracle-compared column rounds with
  // DuckDB-exact semantics (see graft.functions.Rounding) so half-boundary
  // values hash identically on both engines.
  private def round(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    graft.functions.Rounding.dround(c, scale)

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A-series aggregation: groupBy + sum/avg/count (A10-A14)
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
    }),

    // P1/P3: projection pruning + time-range predicate (pushed to the scan)
    "q02_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-06-01").cast("timestamp") &&
          col("l_discount") < 0.03)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    // J4 equi-join chain + aggregation; small dims broadcast
    "q03_revenue_by_nation" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("cnt"))
    }),

    // P11 semi-join (EXISTS)
    "q04_semi_join" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // K3-shape anti-join (NOT EXISTS)
    "q05_anti_join" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // O2 top-k after aggregation (deterministic: rounded measure + key tiebreak)
    "q06_top_customers" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("total_spent"))
        .orderBy(col("total_spent").desc, col("custkey").asc)
        .limit(10)
    }),

    // W1 lead window: next order date per customer
    "q07_next_order" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          lead(col("o_orderdate"), 1).over(w).as("next_orderdate"))
    }),

    // J1 containment join: lineitems shipped within 60 days of their order
    "q13_interval_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      li.join(o,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
    }),

    // O5 except: parts never ordered
    "q17_except" -> ((s, d) =>
      Tables.part(s, d).select("p_partkey")
        .except(Tables.lineitem(s, d).select("l_partkey"))),

    // O6 intersect: customers that placed orders
    "q18_intersect" -> ((s, d) =>
      Tables.customer(s, d).select("c_custkey")
        .intersect(Tables.orders(s, d).select("o_custkey"))),

    // O4/O7 union + distinct: nations having customers or suppliers
    "q19_union_distinct" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("k"))
        .unionByName(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
        .distinct()),

    // O3 stride sampling: every 100th lineitem in (orderkey, linenumber) order.
    // Project to the 2 output columns BEFORE the position pass: the RDD
    // boundary inside OrderedPosition is opaque to Catalyst column pruning,
    // so whatever enters it is what the scan decodes and the range shuffle
    // carries — un-pruned, that's all 16 lineitem columns for a 2-column
    // answer (at 100 TB, an 8× scan+shuffle overhead).
    "q20_stride_sample" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("__ord"))
      Decimate.strideSample(li, Nil, "__ord", 100)
        .select("l_orderkey", "l_linenumber")
    }),

    // §2.8 calendar: ISO (year, week) regrouping
    "q32_iso_week" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(CalendarOps.isoYear(col("l_shipdate")).as("iso_year"),
          weekofyear(col("l_shipdate")).as("iso_week"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty"))
    }),

    // W6 year-over-year "time machine" alignment (365-day shift, leap-naive)
    "q33_yoy_align" -> ((s, d) => {
      CalendarOps.yearOverYear(
          Tables.lineitem(s, d), "l_shipdate", lit("2001-06-01").cast("timestamp"))
        .groupBy(col("year_diff"), month(col("plot_time")).as("mo"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
    }),

    // §3.3 transpose surface: unpivot (melt) wide measures to long + agg
    "q54_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
    }),

    // J3 validity-window construction via lead + default end
    "q36_validity_windows" -> ((s, d) => {
      TemporalJoins.validityWindows(
          Tables.orders(s, d), "o_custkey", "o_orderdate",
          defaultEnd = lit("2002-01-01").cast("timestamp"),
          tieBreak = Seq("o_orderkey"))
        .select("o_orderkey", "o_custkey", "valid_from", "valid_to")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q54_unpivot" -> """
      SELECT 'l_quantity' AS measure, count(*) AS cnt, round(sum(l_quantity), 2) AS total FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', count(*), round(sum(l_extendedprice), 2) FROM lineitem
      UNION ALL
      SELECT 'l_discount', count(*), round(sum(l_discount), 2) FROM lineitem""",
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-03-01'
           AND l_shipdate < TIMESTAMP '1995-06-01'
           AND l_discount < 0.03""",
    "q03_revenue_by_nation" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS cnt
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q04_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 100000)""",
    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q06_top_customers" ->
      """SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS total_spent
         FROM orders GROUP BY o_custkey
         ORDER BY total_spent DESC, custkey ASC LIMIT 10""",
    "q07_next_order" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS next_orderdate
         FROM orders""",
    "q13_interval_join" ->
      """SELECT o_orderpriority, count(*) AS cnt,
         round(sum(l_extendedprice), 2) AS sum_price
         FROM lineitem JOIN orders
           ON l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
         GROUP BY o_orderpriority""",
    "q17_except" ->
      "SELECT p_partkey FROM part EXCEPT SELECT l_partkey FROM lineitem",
    "q18_intersect" ->
      "SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders",
    "q19_union_distinct" ->
      """SELECT DISTINCT k FROM (
           SELECT c_nationkey AS k FROM customer
           UNION ALL SELECT s_nationkey AS k FROM supplier)""",
    "q20_stride_sample" ->
      """SELECT l_orderkey, l_linenumber FROM (
           SELECT l_orderkey, l_linenumber,
                  row_number() OVER (ORDER BY l_orderkey * 10 + l_linenumber) AS rn
           FROM lineitem)
         WHERE (rn - 1) % 100 = 0""",
    "q32_iso_week" ->
      """SELECT CAST(isoyear(l_shipdate) AS INT) AS iso_year,
         CAST(week(l_shipdate) AS INT) AS iso_week,
         count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY 1, 2""",
    "q33_yoy_align" ->
      """WITH t AS (
           SELECT l_extendedprice,
                  2001 - CAST(year(l_shipdate) AS INT) AS year_diff,
                  l_shipdate + (2001 - CAST(year(l_shipdate) AS INT)) * INTERVAL 365 DAY AS plot_time
           FROM lineitem)
         SELECT year_diff, CAST(month(plot_time) AS INT) AS mo,
                count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price
         FROM t GROUP BY 1, 2""",
    "q36_validity_windows" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_custkey, o_orderdate AS valid_from,
                  coalesce(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                                   ORDER BY o_orderdate, o_orderkey),
                           TIMESTAMP '2002-01-01') AS valid_to
           FROM orders)
         WHERE valid_from < valid_to"""
  )
}
