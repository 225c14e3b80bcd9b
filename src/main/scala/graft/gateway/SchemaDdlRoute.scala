package graft.gateway

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedTable
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{AddColumns, LogicalPlan, QualifiedColType}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructField

/** `ALTER TABLE <relation> ADD COLUMNS (...)` routed onto the
  * engine's schema evolution.
  *
  * dbt-spark's `on_schema_change: append_new_columns` emits exactly
  * this statement before the incremental insert when a model's
  * SELECT grew a column — vanilla Spark cannot execute it against
  * the engine's published relations (they are views over
  * Delta/Iceberg/manifest state). For relations with a registered
  * route the statement lands on the same evolution machinery the
  * merge path uses: a metaData-only Delta commit / schema-only
  * Iceberg snapshot with fresh field ids / a manifest republish with
  * the widened `#schema:` header — in every case carried data files
  * surface NULL for the new columns via schema-on-read.
  *
  * Routed shape: TOP-LEVEL columns only, no position clause, no
  * default value (dbt emits none of those). Anything else — nested
  * paths, FIRST/AFTER, defaults, an unrouted relation — stays with
  * Spark's own loud error; never a silent partial DDL.
  *
  * Scale notes: pure metadata — no data job runs; cost is one
  * log/metadata commit regardless of table size.
  */
object DdlRoutes {

  /** (session, appended top-level fields) — widens the table schema. */
  type AddColumnsHandler = (SparkSession, Seq[StructField]) => Unit

  /** (session, dropped top-level column names) — narrows the table
    * schema (dbt `on_schema_change: sync_all_columns`' remove leg).
    */
  type DropColumnsHandler = (SparkSession, Seq[String]) => Unit

  private val routes = new RouteRegistry[AddColumnsHandler]
  private val dropRoutes = new RouteRegistry[DropColumnsHandler]

  def register(relation: String, handler: AddColumnsHandler): Unit =
    routes.register(relation, handler)

  /** Owned registration — see [[RouteRegistry]]'s ownership rules. */
  def register(relation: String, owner: AnyRef,
      handler: AddColumnsHandler): Unit =
    routes.register(relation, owner, handler)

  def unregister(relation: String): Unit = routes.unregister(relation)

  def unregister(relation: String, owner: AnyRef): Unit =
    routes.unregister(relation, owner)

  def lookup(relation: String): Option[AddColumnsHandler] =
    routes.lookup(relation)

  def registerDrop(relation: String, handler: DropColumnsHandler): Unit =
    dropRoutes.register(relation, handler)

  def registerDrop(relation: String, owner: AnyRef,
      handler: DropColumnsHandler): Unit =
    dropRoutes.register(relation, owner, handler)

  def unregisterDrop(relation: String): Unit =
    dropRoutes.unregister(relation)

  def unregisterDrop(relation: String, owner: AnyRef): Unit =
    dropRoutes.unregister(relation, owner)

  def lookupDrop(relation: String): Option[DropColumnsHandler] =
    dropRoutes.lookup(relation)
}

/** See [[DdlRoutes]]. The target arrives as an [[UnresolvedTable]]:
  * published relations are global temp views, which Spark's own
  * ALTER TABLE resolution rejects — so a routed name is matched
  * while still unresolved, exactly like the other routing rules.
  */
case class SchemaDdlRoute(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case a @ AddColumns(u: UnresolvedTable, cols) =>
        (for {
          handler <- DdlRoutes.lookup(RouteNames.demangle(
            u.multipartIdentifier.mkString(".")))
          fields <- fieldsOf(cols)
        } yield GraftAddColumnsCommand(
          u.multipartIdentifier.mkString("."), fields, handler))
          .getOrElse(a)

      // `ALTER TABLE ... DROP COLUMNS (a, b)` — dbt-spark's
      // on_schema_change=sync_all_columns remove leg (emitted for
      // lakehouse file_formats only). Routed shape: TOP-LEVEL names,
      // no IF EXISTS (dbt emits none); nested paths / IF EXISTS / an
      // unrouted relation stay with Spark's own loud error.
      case dcase @ org.apache.spark.sql.catalyst.plans.logical
          .DropColumns(u: UnresolvedTable, cols, false) =>
        (for {
          handler <- DdlRoutes.lookupDrop(RouteNames.demangle(
            u.multipartIdentifier.mkString(".")))
          names <- {
            val ns = cols.map {
              case org.apache.spark.sql.catalyst.analysis
                  .UnresolvedFieldName(Seq(n)) => Some(n)
              case _ => None
            }
            if (ns.exists(_.isEmpty) || ns.isEmpty) None
            else Some(ns.flatten)
          }
        } yield GraftDropColumnsCommand(
          u.multipartIdentifier.mkString("."), names, handler))
          .getOrElse(dcase)
    }

  /** The routed column shape: top-level, no position, no default.
    * None leaves the statement to Spark's own error.
    */
  private def fieldsOf(cols: Seq[QualifiedColType])
      : Option[Seq[StructField]] = {
    val fields = cols.map {
      case QualifiedColType(None, name, dt, nullable, comment,
          None, None) =>
        val meta = comment.fold(org.apache.spark.sql.types.Metadata.empty)(
          c => new org.apache.spark.sql.types.MetadataBuilder()
            .putString("comment", c).build())
        Some(StructField(name, dt, nullable, meta))
      case _ => None
    }
    if (fields.exists(_.isEmpty)) None else Some(fields.flatten)
  }
}

/** The routed ALTER as an eagerly-executed command (empty output,
  * like Spark's own DDL).
  */
case class GraftAddColumnsCommand(relation: String,
    fields: Seq[StructField], handler: DdlRoutes.AddColumnsHandler)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(sparkSession: SparkSession): Seq[Row] = {
    handler(sparkSession, fields)
    Nil
  }
}

/** The routed DROP COLUMNS as an eagerly-executed command. */
case class GraftDropColumnsCommand(relation: String,
    names: Seq[String], handler: DdlRoutes.DropColumnsHandler)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(sparkSession: SparkSession): Seq[Row] = {
    handler(sparkSession, names)
    Nil
  }
}
