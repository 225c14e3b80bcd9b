package graft.queries

import graft.{QueryGroup, Tables}
import graft.Tables.{dec2, one2, asDouble}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
    }),

    // TPC-H Q18 shape (large-volume customers): aggregate-then-join —
    // the qualifying order keys come from a grouped HAVING over the
    // fact table, then re-join to attach customer/order attributes.
    // The HAVING side aggregates BEFORE joining (map-side partials on
    // the orderkey shuffle), so the join input is already one row per
    // qualifying order.
    "q_large_volume_customers" -> ((s, d) => {
      val bigOrders = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(asDouble(sum(dec2(col("l_quantity")))).as("total_qty"))
        .filter(col("total_qty") > 300.0)
      bigOrders
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
          "total_qty")
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q10 shape (returned-item report): which customers
    // returned the most revenue in a half-year — 4-way join with
    // selective filters on both fact sides pushed to the scans,
    // grouped decimal-exact revenue over customer attributes, top-20.
    // nation broadcasts (tiny); orders⋈lineitem shuffles on orderkey,
    // then one shuffle on custkey for the customer join + group.
    "q_returned_item_report" -> ((s, d) => {
      val y0 = lit("1997-01-01").cast("timestamp")
      val y1 = lit("1997-07-01").cast("timestamp")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= y0 && col("o_orderdate") < y1)
        .select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(asDouble(revenue).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q6 shape (forecast revenue change): the pure
    // scan-predicate aggregate — every filter (date range, discount
    // band, quantity cap) reaches the parquet scan as a pushed
    // predicate, the surviving rows fold into ONE exact-decimal sum
    // with map-side partials. The plan is a single codegen'd
    // scan→filter→partial-agg stage + a 1-row final agg.
    "q_forecast_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24.0)
        .agg(asDouble(sum(dec2(col("l_extendedprice")) *
          dec2(col("l_discount")))).as("revenue"))),

    // Period-over-period reporting (the dashboard staple): monthly
    // revenue + lag-derived month-over-month growth. The unpartitioned
    // lag window runs over the AGGREGATED frame — O(months) rows, a
    // size that does not grow with the corpus, so the single-task
    // window is safe at any SF (unlike a row-level global window; see
    // win_ntile_percent's distributed form for that case). Growth
    // divides two identical-formula doubles — engine-deterministic.
    "q_revenue_mom_growth" -> ((s, d) => {
      val monthly = Tables.lineitem(s, d)
        .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
        .agg(asDouble(revenue).as("revenue"))
      val w = Window.orderBy("month")
      monthly
        .withColumn("prev_rev", lag(col("revenue"), 1).over(w))
        .withColumn("mom_growth",
          (col("revenue") - col("prev_rev")) / col("prev_rev"))
        .orderBy("month")
    }),

    // TPC-H Q14 shape (promotion effect): conditional-aggregation
    // ratio — promo revenue share per order month. Revenue stays in
    // exact DECIMAL through both sums; only the final ratio divides
    // as double (exact-decimal inputs ⇒ engine-identical quotient).
    "q_promo_revenue_share" -> ((s, d) => {
      val rev = dec2(col("l_extendedprice")) *
        (one2 - dec2(col("l_discount")))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
        .agg(
          asDouble(sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast(DecimalType(12, 2))))).as("promo_rev"),
          asDouble(sum(rev)).as("total_rev"))
        .withColumn("promo_share",
          col("promo_rev") / col("total_rev"))
        .orderBy("month")
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
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_large_volume_customers" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |      AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |    > 300.0)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
        |FROM big
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q_returned_item_report" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-07-01'
        |  AND l_returnflag = 'R'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  AND l_discount >= CAST(0.05 AS DOUBLE)
        |  AND l_discount <= CAST(0.07 AS DOUBLE)
        |  AND l_quantity < 24.0""".stripMargin,

    "q_revenue_mom_growth" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
        |      AS month,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |      AS revenue
        |  FROM lineitem GROUP BY 1)
        |SELECT month, revenue,
        |  lag(revenue) OVER (ORDER BY month) AS prev_rev,
        |  (revenue - lag(revenue) OVER (ORDER BY month)) /
        |    lag(revenue) OVER (ORDER BY month) AS mom_growth
        |FROM m ORDER BY month""".stripMargin,

    "q_promo_revenue_share" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
        |    AS month,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
        |         (1 - CAST(l_discount AS DECIMAL(12,2)))
        |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_rev,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS total_rev,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
        |         (1 - CAST(l_discount AS DECIMAL(12,2)))
        |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY month""".stripMargin
  )
}
