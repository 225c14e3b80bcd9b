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

/** `SELECT ... FROM <catalog table> VERSION AS OF v | TIMESTAMP AS
  * OF <literal>` on a `USING delta`/`USING iceberg` session-catalog
  * table — SQL time travel for the tables the CTAS / CREATE OR
  * REPLACE routes create. Spark's own `ResolveRelations` throws its
  * unsupported-time-travel error the moment the name resolves to a
  * v1 catalog table (before any injected rule — same mechanics as
  * [[ReplaceTableRoute]]), so this too rewrites at PARSE time: a
  * time-travel relation over an unshadowed session-catalog
  * delta/iceberg table becomes the registered read source's pinned
  * scan (`versionAsOf` / Iceberg snapshot id), with `TIMESTAMP AS
  * OF` literals evaluated in the session timezone and resolved
  * driver-side by the same per-backend resolvers the published-name
  * route uses ([[TimeTravelRoutes]] registrations, local temp views,
  * and non-lakehouse tables all stay untouched — Spark's own errors
  * remain authoritative there).
  */
object CatalogTimeTravelRoute {
  import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}

  def rewrite(session: SparkSession, plan: LogicalPlan): LogicalPlan =
    // pattern-gated: statements without a time-travel relation pay
    // one bitset check, never a tree walk
    if (!plan.containsPattern(
        org.apache.spark.sql.catalyst.trees.TreePattern.RELATION_TIME_TRAVEL))
      plan
    else plan.resolveOperatorsUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, tsOpt, vOpt) =>
        route(session, u.multipartIdentifier, tsOpt, vOpt).getOrElse(tt)
    }

  private def route(session: SparkSession, parts: Seq[String],
      tsOpt: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      vOpt: Option[String]): Option[LogicalPlan] = {
    if (parts.size > 3) return None
    if (parts.size == 3 && !parts.head.equalsIgnoreCase("spark_catalog"))
      return None
    val catalog = session.sessionState.catalog
    // shadowing + published-name precedence: a local temp view wins
    // (Spark's own temp-view time-travel error), and a relation with
    // a registered TimeTravelRoutes handler keeps the resolution-rule
    // path
    if (parts.size == 1 && catalog.getTempView(parts.head).isDefined)
      return None
    if (TimeTravelRoutes.lookup(
        RouteNames.demangle(parts.mkString("."))).isDefined) return None
    val ident = parts.takeRight(2) match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case _ => return None
    }
    if (!scala.util.Try(catalog.tableExists(ident)).getOrElse(false))
      return None
    val meta = catalog.getTableMetadata(ident)
    val provider = meta.provider.map(
      _.toLowerCase(java.util.Locale.ROOT)).getOrElse("")
    if (provider != "delta" && provider != "iceberg") return None
    val path = java.nio.file.Paths.get(meta.location).toString
    val version: Option[Long] = (vOpt, tsOpt) match {
      case (Some(v), _) =>
        // numeric version literals only — anything else keeps
        // Spark's descriptive error
        if (v.nonEmpty && v.length <= 18 && v.forall(_.isDigit))
          Some(v.toLong)
        else None
      case (None, Some(ts)) => evalMicros(session, ts).map { micros =>
        // the same driver-side at-or-before resolution the
        // published-name route uses; refuses loudly out of range
        if (provider == "delta")
          graft.sources.DeltaRead.versionAtTimestamp(path, micros)
        else graft.sources.IcebergRead.snapshotIdAtTimestamp(path, micros)
      }
      case _ => None
    }
    version.map { v =>
      val reader = session.read
        .format(if (provider == "delta") "graft-delta"
                else "graft-iceberg")
        .option(if (provider == "delta") "versionAsOf" else "snapshotId",
          v.toString)
      reader.load(path).queryExecution.analyzed
    }
  }

  private def evalMicros(session: SparkSession,
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[Long] = {
    if (!e.resolved || !e.foldable || !e.deterministic) return None
    val cast = org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.TimestampType,
      Some(session.sessionState.conf.sessionLocalTimeZone))
    scala.util.Try(Option(cast.eval(null))).toOption.flatten.collect {
      case micros: Long => micros
    }
  }
}

/** See [[ReplaceTableRoute]]: a pure-delegation parser whose ONLY
  * additions are the top-level [[ReplaceTableRoute.rewrite]] and the
  * [[CatalogTimeTravelRoute]] rewrite on parsed plans
  * (`parsePlanWithParameters`'s default implementation funnels
  * into `parsePlan`, so parameterized entry points are covered too).
  */
case class GraftSqlParser(session: SparkSession,
    delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    CatalogTimeTravelRoute.rewrite(session,
      ReplaceTableRoute.rewrite(delegate.parsePlan(sqlText)))
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
