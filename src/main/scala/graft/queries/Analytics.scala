package graft.queries

import graft.{QueryGroup, Tables}
import graft.Tables.{dec2, one2, asDouble}
import org.apache.spark.sql.functions._

/** Composite analytics — TPC-H-shaped multi-operator queries run as
  * ONE plan each, the workload an analyst actually ships (the
  * per-operator keys isolate plan shapes; these prove the shapes
  * COMPOSE: multiway join order, dim broadcasts, decimal-exact
  * aggregation, and top-k all in a single Catalyst plan).
  *
  * Basis: the reference's dbt models are exactly such composite
  * SELECTs submitted through dbt-spark (`dbtoperator.py:342-360`);
  * the per-operator §2 keys are their decomposition.
  *
  * Revenue arithmetic: cast the RAW 2-dp columns to DECIMAL(12,2)
  * (safe — the data is 2-dp), multiply/sum in exact decimal, cast the
  * final sum to DOUBLE. Never sum raw doubles (order-dependent) and
  * never cast a COMPUTED double to DECIMAL (x.xx5-boundary drift).
  */
object Analytics extends QueryGroup {

  private def revenue = sum(
    dec2(col("l_extendedprice")) * (one2 - dec2(col("l_discount"))))

  override def queries: Map[String, Q] = Map(
    // TPC-H Q3 shape (shipping priority): 3-way join, selective
    // filters on BOTH fact sides pushed to the scans, grouped
    // decimal-exact revenue, deterministic top-10. customer is the
    // small side — broadcast; orders⋈lineitem shuffles on orderkey.
    "q_shipping_priority" -> ((s, d) => {
      val cutoff = lit("1997-01-01").cast("timestamp")
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(asDouble(revenue).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape (local supplier volume): 6-way join where the
    // customer and supplier must share a nation, one year of orders,
    // one region. region/nation broadcast (tiny dims); the
    // fact-to-fact joins shuffle on their keys once each.
    "q_local_supplier_volume" -> ((s, d) => {
      val y0 = lit("1996-01-01").cast("timestamp")
      val y1 = lit("1997-01-01").cast("timestamp")
      val nr = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val out = Tables.customer(s, d).select("c_custkey", "c_nationkey")
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= y0 && col("o_orderdate") < y1)
          .select("o_orderkey", "o_custkey"),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d)
          .select("l_orderkey", "l_suppkey", "l_extendedprice",
            "l_discount"),
          col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
      out.groupBy("n_name")
        .agg(asDouble(revenue).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "q_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate  > TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |             AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY 1
        |ORDER BY revenue DESC, n_name""".stripMargin
  )
}
