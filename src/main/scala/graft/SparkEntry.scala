package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{dec2, one2, asDouble}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query keys follow SURVEY §2's operator inventory exactly; each group
  * object under `graft.queries` contributes its keys + DuckDB oracle
  * SQL. The flagship `entry` is the Phase-0 TPC-H-Q1-style pricing
  * summary (SURVEY §7 Phase 0).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: scan → filter → hash-agg → sort, all
    * whole-stage-codegen'd, filter pushed into the parquet scan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        asDouble(sum(dec2(col("l_quantity")))).as("sum_qty"),
        asDouble(sum(dec2(col("l_extendedprice")))).as("sum_base_price"),
        asDouble(sum(dec2(col("l_extendedprice")) * (one2 - dec2(col("l_discount")))))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private[graft] val groups: Seq[QueryGroup] = Seq(
    _root_.graft.queries.Scans,
    _root_.graft.queries.Projections,
    _root_.graft.queries.Joins,
    _root_.graft.queries.Aggregates,
    _root_.graft.queries.Windows,
    _root_.graft.queries.SortLimit,
    _root_.graft.queries.SetOps,
    _root_.graft.queries.ScalarFuncs,
    _root_.graft.queries.UdfOps,
    _root_.graft.queries.EventWindows,
    _root_.graft.queries.LlmOps,
    _root_.graft.queries.BpeOps,
    _root_.graft.queries.PipelineOps,
    _root_.graft.queries.SqlSurface,
    _root_.graft.queries.Analytics
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracles).toMap
}
