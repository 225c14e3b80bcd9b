package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge for graft's gateway: wrap an
  * analyzed [[LogicalPlan]] back into a [[DataFrame]]
  * (`Dataset.ofRows` is package-private in Spark 4's classic module).
  * The standard pattern for Spark extension libraries — e.g. Delta
  * Lake's `org.apache.spark.sql.delta` package does the same; kept to
  * this ONE accessor so the engine's dependency on Spark internals
  * stays auditable.
  */
object GraftSqlBridge {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      session.asInstanceOf[classic.SparkSession], plan)

  /** Wrap an analyzed catalyst [[Expression]] back into a [[Column]]
    * (`ExpressionUtils.column` is `private[sql]` in Spark 4's classic
    * module). Used by the gateway's conditional-MERGE compiler to
    * re-apply the statement's resolved conditions/assignments onto
    * the target⋈source join it builds.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
