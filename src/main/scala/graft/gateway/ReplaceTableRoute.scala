package graft.gateway

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, OptionList, ReplaceTableAsSelect, UnresolvedTableSpec}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.command.RunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** `CREATE OR REPLACE TABLE <name> USING delta|iceberg [PARTITIONED
  * BY (...)] [LOCATION ...] AS <query>` — the modern warehouse
  * spelling of a lakehouse table rebuild (dbt-spark's
  * `create_table_as` family around the reference's pin,
  * `dbtoperator.py:274`) — executed through the engine's ATOMIC
  * replace protocols ([[graft.sources.DeltaWrite.replace]] /
  * [[graft.sources.IcebergWrite.replace]]): one commit swaps the
  * whole table, every prior version stays time-travelable. Plain
  * `REPLACE TABLE ... AS` (no OR CREATE) requires the table to exist,
  * SQL's contract.
  *
  * Why a PARSER wrapper (not an analyzer rule): Spark's session
  * catalog is v1, and its `ResolveSessionCatalog` throws the v2-only
  * `UNSUPPORTED_FEATURE.TABLE_OPERATION` error for
  * `ReplaceTableAsSelect` in the same resolution iteration that
  * resolves the identifier — a custom RESOLUTION rule (which runs
  * after it in the batch) never sees the statement, and custom HINT
  * rules are dropped by `HiveSessionStateBuilder`'s analyzer (it
  * overrides `extendedResolutionRules` but not `hintResolutionRules`
  * — verified against Spark 4.1). Wrapping the parser is the one
  * extension point guaranteed to run first on every SQL entry (the
  * session's `spark.sql` and each Thrift connection share
  * `sessionState.sqlParser`); the rewritten command keeps the query
  * as a real CHILD, so the normal resolution fixed point analyzes it
  * afterwards. The same pattern Delta Lake's own SQL extension used
  * pre-3.0 (public delta.io history).
  *
  * Routed shape (anything else keeps Spark's own loud error):
  * session-catalog identifier (1/2-part, or 3-part under
  * `spark_catalog`), provider `delta`/`iceberg`, identity
  * `PARTITIONED BY` columns only, no TBLPROPERTIES/OPTIONS/column
  * list. The catalog entry is created (or its schema realigned) so
  * follow-up reads resolve through the registered writable sources
  * ([[graft.sources.GraftDeltaCatalogSource]] /
  * [[graft.sources.GraftIcebergCatalogSource]]) exactly like the
  * plain-CTAS path.
  */
object ReplaceTableRoute {

  private val Providers = Set("delta", "iceberg")

  private def identityCols(partitioning: Seq[Transform])
      : Option[Seq[String]] = {
    val ids: Seq[Option[String]] = partitioning.map { t =>
      if (t.name == "identity" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1)
        Some(t.references.head.fieldNames.head)
      else None
    }
    if (ids.forall(_.isDefined)) Some(ids.flatten) else None
  }

  /** Rewrite a just-parsed top-level plan; anything non-routable is
    * returned untouched (Spark's own errors stay authoritative).
    */
  def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case r: ReplaceTableAsSelect => (r.name, r.tableSpec) match {
      case (UnresolvedIdentifier(parts, _), spec: UnresolvedTableSpec)
          if spec.provider.exists(p =>
            Providers(p.toLowerCase(java.util.Locale.ROOT))) &&
            // session-catalog names only — a name addressing a real
            // v2 catalog must keep Spark's own routing
            (parts.size <= 2 || (parts.size == 3 &&
              parts.head.equalsIgnoreCase("spark_catalog"))) &&
            // only the clean dbt shape routes; TBLPROPERTIES/OPTIONS
            // keep Spark's loud v2-only error rather than being
            // silently dropped (`r.columns` is derived FROM the
            // query on an AS-SELECT plan, so it is no user signal)
            spec.properties.isEmpty &&
            (spec.optionExpression match {
              case OptionList(opts) => opts.isEmpty
            }) &&
            identityCols(r.partitioning).isDefined =>
        GraftReplaceTableAsSelectCommand(
          parts.takeRight(2),
          spec.provider.get.toLowerCase(java.util.Locale.ROOT),
          identityCols(r.partitioning).get,
          spec.location,
          r.orCreate,
          r.query)
      case _ => r
    }
    case other => other
  }
}

/** See [[ReplaceTableRoute]]: a pure-delegation parser whose ONLY
  * addition is the top-level [[ReplaceTableRoute.rewrite]] on parsed
  * plans (`parsePlanWithParameters`'s default implementation funnels
  * into `parsePlan`, so parameterized entry points are covered too).
  */
case class GraftSqlParser(session: SparkSession,
    delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    ReplaceTableRoute.rewrite(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** See [[ReplaceTableRoute]]. `query` is a real child, analyzed by
  * the resolution fixed point after the hint-batch rewrite; `run`
  * executes it once through the engine writer's ONE staged job.
  */
case class GraftReplaceTableAsSelectCommand(nameParts: Seq[String],
    provider: String, partitionBy: Seq[String],
    location: Option[String], orCreate: Boolean, query: LogicalPlan)
    extends RunnableCommand {

  override def children: Seq[LogicalPlan] = query :: Nil

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): LogicalPlan =
    copy(query = newChildren.head)

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val catalog = sparkSession.sessionState.catalog
    val (db, table) = nameParts match {
      case Seq(t) => (catalog.getCurrentDatabase, t)
      case Seq(d, t) => (d, t)
      case other => sys.error(s"unexpected table name parts: $other")
    }
    val ident = TableIdentifier(table, Some(db))
    val existing: Option[CatalogTable] =
      if (catalog.tableExists(ident))
        Some(catalog.getTableMetadata(ident))
      else None
    require(existing.nonEmpty || orCreate,
      s"REPLACE TABLE $db.$table: table does not exist — use CREATE " +
        s"OR REPLACE TABLE to create it")
    existing.foreach { meta =>
      require(meta.tableType != CatalogTableType.VIEW,
        s"CREATE OR REPLACE TABLE $db.$table: the existing object is " +
          s"a VIEW")
      require(meta.provider.exists(_.equalsIgnoreCase(provider)),
        s"CREATE OR REPLACE TABLE $db.$table USING $provider: the " +
          s"existing table's provider is ${meta.provider.getOrElse("?")}" +
          s" — cross-provider replace would orphan the old format's " +
          s"data; DROP TABLE first")
      require(location.forall(l =>
        new java.net.URI(l) == meta.location ||
          java.nio.file.Paths.get(l).toAbsolutePath.toString ==
            java.nio.file.Paths.get(meta.location).toAbsolutePath.toString),
        s"CREATE OR REPLACE TABLE $db.$table: LOCATION differs from " +
          s"the existing table's (${meta.location}) — DROP TABLE first")
    }
    val locationUri: java.net.URI = existing.map(_.location).getOrElse(
      location.map(l => java.nio.file.Paths.get(l).toUri)
        .getOrElse(catalog.defaultTablePath(ident)))
    val path = java.nio.file.Paths.get(locationUri).toString

    val df = org.apache.spark.sql.GraftSqlBridge
      .ofRows(sparkSession, query)
    partitionBy.foreach(p => require(df.columns.contains(p),
      s"CREATE OR REPLACE TABLE $db.$table: PARTITIONED BY column " +
        s"'$p' is not in the query's output (${df.columns.mkString(",")})"))
    provider match {
      case "delta" => graft.sources.DeltaWrite.replace(
        sparkSession, path, df, partitionBy = partitionBy): Unit
      case "iceberg" => graft.sources.IcebergWrite.replace(
        sparkSession, path, df, partitionBy = partitionBy): Unit
      case other => sys.error(s"unroutable provider $other") // unreachable
    }

    existing match {
      case None =>
        catalog.createTable(CatalogTable(
          identifier = ident,
          tableType =
            if (location.isDefined) CatalogTableType.EXTERNAL
            else CatalogTableType.MANAGED,
          storage = CatalogStorageFormat.empty.copy(
            locationUri = Some(locationUri)),
          schema = df.schema,
          provider = Some(provider),
          partitionColumnNames = partitionBy),
          // ignoreIfExists = false; validateLocation = false — the
          // data commit above legitimately created the location (the
          // same order Spark's own CTAS command uses)
          false, false)
      case Some(meta) =>
        // the entry's stored schema must track the replace — the v1
        // read path verifies it against the relation's schema; stale
        // entries would refuse reads loudly
        if (meta.schema.fields.map(f => (f.name, f.dataType)).toSeq !=
            df.schema.fields.map(f => (f.name, f.dataType)).toSeq ||
            meta.partitionColumnNames != partitionBy)
          catalog.alterTable(meta.copy(schema = df.schema,
            partitionColumnNames = partitionBy))
        // drop cached plans/relations of the pre-replace state
        catalog.refreshTable(ident)
    }
    Seq.empty
  }
}
