package graft.queries

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.SparkSession

/** SQL-text surface a dbt-spark model actually ships (SURVEY §0 layer
  * 3): correlated subqueries and recursive CTEs submitted as SQL, so
  * Catalyst's decorrelation (`RewriteCorrelatedScalarSubquery`,
  * exists→semi-join) and the Spark 4 recursive-CTE executor are
  * exercised through the same `spark.sql` path dbt uses — not
  * pre-lowered DataFrame calls.
  *
  * Determinism note: correlated thresholds compare DECIMAL-exact sums
  * (never a floating avg — order-dependent across engines).
  */
object SqlSurface extends QueryGroup {

  private def withViews(s: SparkSession, d: String): Unit = {
    Tables.orders(s, d).createOrReplaceTempView("sqls_orders")
    Tables.customer(s, d).createOrReplaceTempView("sqls_customer")
  }

  override def queries: Map[String, Q] = Map(
    // orders 1.5× above their customer's average order value —
    // correlated scalar subqueries, decorrelated to an aggregate+join
    "sql_subquery_scalar" -> ((s, d) => {
      withViews(s, d)
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM sqls_orders o
          |WHERE CAST(o_totalprice AS DECIMAL(12,2)) *
          |      (SELECT 2 * count(*) FROM sqls_orders o2
          |       WHERE o2.o_custkey = o.o_custkey)
          |    > (SELECT 3 * SUM(CAST(o_totalprice AS DECIMAL(12,2)))
          |       FROM sqls_orders o3 WHERE o3.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // EXISTS + NOT EXISTS in one predicate → semi ∧ anti join plan
    "sql_subquery_exists" -> ((s, d) => {
      withViews(s, d)
      s.sql(
        """SELECT c_custkey, c_name
          |FROM sqls_customer c
          |WHERE EXISTS (SELECT 1 FROM sqls_orders o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_orderstatus = 'F')
          |  AND NOT EXISTS (SELECT 1 FROM sqls_orders o
          |                  WHERE o.o_custkey = c.c_custkey
          |                    AND o.o_orderstatus = 'P')
          |ORDER BY c_custkey""".stripMargin)
    }),

    // LATERAL correlated subquery with per-row ORDER BY/LIMIT — the
    // SQL-text top-N-per-group a dbt model ships (Catalyst rewrites
    // the lateral to a decorrelated ranked join; the DataFrame
    // equivalent is win_topk_per_group). Ties broken by o_orderkey.
    "sql_lateral_join" -> ((s, d) => {
      withViews(s, d)
      s.sql(
        """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          |FROM sqls_customer c,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM sqls_orders o
          |         WHERE o.o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
    }),

    // SQL-text PIVOT clause (the wide-report shape dbt marts ship as
    // SQL; the DataFrame equivalent is agg_pivot). DECIMAL-exact sums
    // surfaced as DOUBLE.
    "sql_pivot" -> ((s, d) => {
      withViews(s, d)
      s.sql(
        """SELECT * FROM (
          |  SELECT o_orderpriority, o_orderstatus,
          |         CAST(o_totalprice AS DECIMAL(12,2)) AS p
          |  FROM sqls_orders)
          |PIVOT (CAST(SUM(p) AS DOUBLE)
          |       FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS pp))
          |ORDER BY o_orderpriority""".stripMargin)
    }),

    // Spark 4 recursive CTE: generated month spine left-joined to
    // facts (the calendar-dimension pattern dbt models build)
    "sql_cte_recursive" -> ((s, d) => {
      withViews(s, d)
      s.sql(
        """WITH RECURSIVE months(m) AS (
          |  SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12)
          |SELECT m, count(o_orderkey) AS n_orders
          |FROM months LEFT JOIN sqls_orders ON month(o_orderdate) = m
          |GROUP BY m ORDER BY m""".stripMargin)
    })
  )

  override def oracles: Map[String, String] = Map(
    "sql_subquery_scalar" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(12,2)) *
        |      (SELECT 2 * count(*) FROM orders o2
        |       WHERE o2.o_custkey = o.o_custkey)
        |    > (SELECT 3 * SUM(CAST(o_totalprice AS DECIMAL(12,2)))
        |       FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "sql_subquery_exists" ->
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "sql_lateral_join" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "sql_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F'
        |        THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)
        |    AS f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O'
        |        THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)
        |    AS o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P'
        |        THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)
        |    AS pp
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "sql_cte_recursive" ->
      """WITH RECURSIVE months(m) AS (
        |  SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12)
        |SELECT m, count(o_orderkey) AS n_orders
        |FROM months LEFT JOIN orders ON CAST(month(o_orderdate) AS INTEGER) = m
        |GROUP BY m ORDER BY m""".stripMargin
  )
}
