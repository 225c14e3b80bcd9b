package graft.gateway

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.CreateDataSourceTableAsSelectCommand

/** `CREATE TABLE ... USING delta|iceberg PARTITIONED BY (...) AS` —
  * carry the statement's partition columns to the v1 writable
  * sources. Spark's SQL CTAS path (`CreateDataSourceTableAsSelect
  * Command` → `DataSource.writeAndRead`) hands a
  * `CreatableRelationProvider` only the storage options; the
  * `__partition_columns` JSON convention that the DataFrameWriter
  * path uses is NEVER added, so the `PARTITIONED BY` clause would be
  * SILENTLY DROPPED — the table materializes unpartitioned (verified
  * against Spark 4.1). This post-hoc rule (running after the built-in
  * `DataSourceAnalysis` that creates the command) re-encodes the
  * catalog table's partition columns into that option, which
  * [[graft.sources.GraftLakeWritableSource.partitionColumnsOf]]
  * already decodes — SQL CTAS and `df.write.partitionBy` then land
  * on the identical creation commit.
  */
case class CtasPartitioningRoute(session: SparkSession)
    extends Rule[LogicalPlan] {

  private val Providers = Set("delta", "iceberg")

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case c: CreateDataSourceTableAsSelectCommand
        if c.table.provider.exists(p =>
          Providers(p.toLowerCase(java.util.Locale.ROOT))) &&
          c.table.partitionColumnNames.nonEmpty &&
          !c.table.storage.properties.contains("__partition_columns") =>
      import org.json4s.JsonDSL._
      val json = org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(
          c.table.partitionColumnNames.toList))
      c.copy(table = c.table.copy(storage = c.table.storage.copy(
        properties = c.table.storage.properties +
          ("__partition_columns" -> json))))
    case other => other
  }
}
