package graft.gateway

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** `UPDATE` / `DELETE FROM` SQL routed into the engine.
  *
  * Vanilla Spark parses both statements but cannot execute them on
  * v1/parquet relations ("UPDATE/DELETE is only supported with v2
  * tables") — yet they are the first DML a warehouse user types. For
  * relations with a registered route:
  *
  *  - `UPDATE t SET col = expr[, ...] [WHERE p]` compiles onto the
  *    relation's UPSERT handler ([[MergeRoutes]]): the post-image of
  *    the matching rows (assignments applied, unassigned columns
  *    kept, values cast to the column type) merges back on the
  *    relation's DECLARED unique key. Assigning a key column is
  *    rejected loudly — the upsert could not relocate the row.
  *  - `DELETE FROM t [WHERE p]` routes to the relation's registered
  *    delete implementation when one exists ([[DmlRoutes.Ops]]) —
  *    for Delta-backed relations that is `DeltaWrite.deleteWhere`,
  *    the deletion-vector MERGE-ON-READ delete (masks rows, rewrites
  *    no data file). The predicate travels as re-rendered SQL TEXT
  *    (`Expression.sql`), not a bound Column — it must bind to the
  *    delete implementation's own scan of the table.
  *
  * Anything unrouted (no route, no delete capability, an assignment
  * shape the compile can't honor) is left untouched so Spark's own
  * loud unsupported error surfaces — never a silent partial write.
  * Scale: UPDATE costs one filtered scan + the engine merge
  * (O(touched files + matches)); DELETE costs one filtered scan +
  * O(matching files) DV commit.
  */
object DmlRoutes {

  /** Per-relation DML capabilities: the declared unique key (what
    * UPDATE's post-image merges on — `MERGE INTO` carries its keys in
    * the ON clause, UPDATE has no equivalent, so the registration
    * supplies them) and an optional delete implementation
    * `(session, predicate SQL) → rows deleted`.
    */
  final case class Ops(declaredKeys: Seq[String],
      deleteWhere: Option[(SparkSession, String) => Long] = None)

  private val routes = new RouteRegistry[Ops]

  def register(relation: String, ops: Ops): Unit =
    routes.register(relation, ops)

  /** Owned registration — see [[RouteRegistry]]'s ownership rules. */
  def register(relation: String, owner: AnyRef, ops: Ops): Unit =
    routes.register(relation, owner, ops)

  def unregister(relation: String): Unit = routes.unregister(relation)

  def unregister(relation: String, owner: AnyRef): Unit =
    routes.unregister(relation, owner)

  def lookup(relation: String): Option[Ops] = routes.lookup(relation)
}

/** See [[DmlRoutes]]. Resolution-time rewrite, the same mechanism as
  * [[MergeIntoRoute]] (injected by [[GraftSqlExtensions]], live in
  * `spark.sql` and every Thrift connection).
  */
case class DmlRoute(session: SparkSession) extends Rule[LogicalPlan] {

  import RouteNames.{nameOf, targetName}

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u @ UpdateTable(table, assignments, cond)
          if table.resolved && cond.forall(_.resolved) &&
            assignments.forall(a => a.value.resolved) =>
        (for {
          name <- targetName(table)
          ops <- DmlRoutes.lookup(name)
          handler <- MergeRoutes.lookup(name)
          assigns <- normalize(assignments, table)
        } yield GraftUpdateCommand(name, ops.declaredKeys, table,
          assigns, cond, handler)).getOrElse(u)

      case d @ DeleteFromTable(table, cond)
          if table.resolved && cond.resolved &&
            // the predicate ships as re-rendered SQL TEXT
            // (Expression.sql) that must re-parse against the delete
            // implementation's own scan — IN/EXISTS subqueries and
            // non-table references don't round-trip, so route only
            // plain-attribute, subquery-free conditions and leave the
            // rest to Spark's own descriptive unsupported error
            cond.references.subsetOf(table.outputSet) &&
            !cond.exists(_.isInstanceOf[org.apache.spark.sql
              .catalyst.expressions.SubqueryExpression]) =>
        (for {
          name <- targetName(table)
          ops <- DmlRoutes.lookup(name)
          del <- ops.deleteWhere
        } yield {
          // render WITHOUT view qualifiers (global_temp.t.id) — the
          // text must bind to the delete implementation's own scan
          val bare = cond.transform {
            case a: org.apache.spark.sql.catalyst.expressions
                .AttributeReference => a.withQualifier(Seq.empty)
          }
          GraftDeleteCommand(name, bare.sql, del)
        }).getOrElse(d)
    }

  // assignment list → LOWERCASE target-column-name → value
  // expression. A DUPLICATE assignment to one column leaves the
  // statement unrouted (Spark's own DUPLICATE_ASSIGNMENTS-class
  // rejection stays loud) rather than silently keeping the last.
  private def normalize(assignments: Seq[Assignment],
      table: LogicalPlan): Option[Map[String, Expression]] = {
    val pairs = assignments.map { a =>
      nameOf(a.key)
        .filter(k => table.output.exists(_.name.equalsIgnoreCase(k)))
        .map(k => k.toLowerCase(java.util.Locale.ROOT) -> a.value)
    }
    if (pairs.exists(_.isEmpty) ||
        pairs.flatten.map(_._1).distinct.size != pairs.size) None
    else Some(pairs.flatten.toMap)
  }
}

/** The routed UPDATE: post-image upsert of the matching rows. */
case class GraftUpdateCommand(relation: String, keys: Seq[String],
    table: LogicalPlan, assigns: Map[String, Expression],
    cond: Option[Expression], handler: MergeRoutes.Handler)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "num_affected_rows", org.apache.spark.sql.types.LongType,
      nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.GraftSqlBridge.{column, ofRows}
    import org.apache.spark.sql.functions.lit
    keys.foreach(k => require(!assigns.contains(
      k.toLowerCase(java.util.Locale.ROOT)),
      s"UPDATE $relation: cannot assign unique-key column '$k' — the " +
        s"merge could not relocate the row (delete + insert instead)"))
    val t = ofRows(sparkSession, table)
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val post = t.filter(cond.map(column).getOrElse(lit(true)))
      .select(table.output.map { a =>
        assigns.get(lc(a.name)).map(column).getOrElse(column(a))
          .cast(a.dataType).as(a.name)
      }: _*)
    Seq(Row(handler(sparkSession, post, keys)))
  }
}

/** The routed DELETE: delegate to the relation's delete
  * implementation with the predicate as SQL text.
  */
case class GraftDeleteCommand(relation: String, predicateSql: String,
    deleteWhere: (SparkSession, String) => Long)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "num_affected_rows", org.apache.spark.sql.types.LongType,
      nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] =
    Seq(Row(deleteWhere(sparkSession, predicateSql)))
}
