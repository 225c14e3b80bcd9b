package graft.gateway

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias}
import org.apache.spark.sql.catalyst.plans.logical.UpdateStarAction
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** `MERGE INTO` SQL routed into the engine's merge machinery.
  *
  * dbt-spark's `incremental` materialization with
  * `incremental_strategy: merge` emits exactly this statement shape
  * over the Thrift connection (the reference's production loop,
  * `dbtoperator.py:274,342-360`):
  *
  * {{{
  *   MERGE INTO tgt AS DBT_INTERNAL_DEST
  *   USING src AS DBT_INTERNAL_SOURCE
  *   ON DBT_INTERNAL_DEST.k = DBT_INTERNAL_SOURCE.k [AND ...]
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Vanilla Spark parses it but cannot EXECUTE it against v1/parquet
  * relations ("MERGE INTO TABLE is not supported temporarily"). The
  * [[MergeIntoRoute]] resolution rule — injected by
  * [[GraftSqlExtensions]], so it is live in `spark.sql` AND in every
  * per-connection Thrift session — rewrites that exact shape into a
  * [[GraftMergeIntoCommand]] when the target relation has a
  * registered [[MergeRoutes]] handler (`PipelineRunner` registers one
  * per published incremental-merge model, routing to
  * `DeltaWrite.merge` / `IcebergWrite.merge` / the manifest-warehouse
  * merge by the model's file_format). Any other MERGE shape or an
  * unrouted relation is left untouched, so Spark's own loud
  * unsupported error still surfaces — never a silent partial merge.
  *
  * Scale notes: the rewrite is pure name/shape matching during
  * resolution; execution delegates to the registered engine merge,
  * which is the same O(touched files + batch) staged path every
  * `queries()` merge key runs — nothing about arriving as SQL text
  * changes the physical plan.
  */
object MergeRoutes {

  /** (session, source batch, equality-key columns) → rows merged. */
  type Handler = (SparkSession, DataFrame, Seq[String]) => Long

  private val routes =
    new java.util.concurrent.ConcurrentHashMap[String, Handler]()

  private def norm(relation: String): String =
    relation.toLowerCase(java.util.Locale.ROOT)

  /** Register (or replace) the merge handler for a relation name as
    * clients address it in SQL — `orders` or `sales.orders`.
    * JVM-global: Thrift connections run in fresh `newSession()`s but
    * share the process, exactly like the published global temp views
    * they read.
    */
  def register(relation: String, handler: Handler): Unit =
    routes.put(norm(relation), handler): Unit

  def unregister(relation: String): Unit =
    routes.remove(norm(relation)): Unit

  def lookup(relation: String): Option[Handler] =
    Option(routes.get(norm(relation)))
}

/** See [[MergeRoutes]]. Matches during the analyzer's resolution
  * fixed point: the TARGET is matched structurally by NAME (it may
  * still be an [[UnresolvedRelation]], or already resolved through
  * the published-view fallback — both carry the client-addressed
  * name), the SOURCE must be fully resolved (it becomes the merge
  * batch), and the action list must be the dbt shape
  * (unconditional `UPDATE SET *` + `INSERT *`).
  */
case class MergeIntoRoute(session: SparkSession)
    extends Rule[LogicalPlan] {

  // Back from the RESOLVED name to the client-addressed one: strip
  // the global-temp database and undo the runner's `graft_ns__` view
  // mangling for `schema.identifier` relations.
  private def demangle(name: String): String = {
    val n = name.stripPrefix("global_temp.")
    if (n.startsWith("graft_ns__"))
      n.stripPrefix("graft_ns__").replace("__", ".")
    else n
  }

  // The client-addressed relation name of a MERGE target. The rule
  // waits for the target to RESOLVE (dbt targets always exist as
  // relations), so the name is recovered from the resolved tree: a
  // temp/global view keeps it on the View's catalog identifier, a
  // catalog table on its qualified SubqueryAlias; dbt's bare
  // `AS DBT_INTERNAL_DEST` alias (no qualifier, no view child) is
  // skipped.
  private def targetName(plan: LogicalPlan): Option[String] = plan match {
    case s: SubqueryAlias =>
      targetName(s.child).orElse {
        if (s.identifier.qualifier.nonEmpty)
          Some(demangle(s.identifier.name))
        else None
      }
    case v: org.apache.spark.sql.catalyst.plans.logical.View =>
      Some(demangle(v.desc.identifier.table))
    case u: UnresolvedRelation =>
      Some(demangle(u.multipartIdentifier.mkString(".")))
    case _ => None
  }

  // ON conjunction of same-named equality columns → key column names
  private def keysOf(cond: Expression): Option[Seq[String]] = cond match {
    case And(l, r) =>
      for { lk <- keysOf(l); rk <- keysOf(r) } yield lk ++ rk
    case EqualTo(l, r) =>
      def nameOf(e: Expression): Option[String] = e match {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          Some(a.nameParts.last)
        case a: Attribute => Some(a.name)
        // type coercion casts mismatched ON sides — still a column
        case c: org.apache.spark.sql.catalyst.expressions.Cast =>
          nameOf(c.child)
        case _ => None
      }
      for { ln <- nameOf(l); rn <- nameOf(r)
            if ln.equalsIgnoreCase(rn) } yield Seq(ln)
    case _ => None
  }

  // `UPDATE SET *` / `INSERT *` — either still star-form, or already
  // expanded by the analyzer's ResolveReferences (built-in rules run
  // BEFORE injected ones inside each Resolution iteration, so by the
  // time this rule sees a fully-resolved merge the stars are explicit
  // same-name column-to-column assignment lists)
  private def isStarShape(action: org.apache.spark.sql.catalyst.plans
      .logical.MergeAction): Boolean = action match {
    case UpdateStarAction(None) => true
    case InsertStarAction(None) => true
    case org.apache.spark.sql.catalyst.plans.logical.UpdateAction(
        None, assigns, _) => assigns.forall(sameNameColumnAssign)
    case org.apache.spark.sql.catalyst.plans.logical.InsertAction(
        None, assigns) => assigns.forall(sameNameColumnAssign)
    case _ => false
  }

  private def sameNameColumnAssign(
      a: org.apache.spark.sql.catalyst.plans.logical.Assignment): Boolean = {
    def nameOf(e: Expression): Option[String] = e match {
      case at: Attribute => Some(at.name)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        Some(u.nameParts.last)
      // star expansion casts source values to the target's types —
      // still the same-name column-to-column shape
      case c: org.apache.spark.sql.catalyst.expressions.Cast =>
        nameOf(c.child)
      case _ => None
    }
    (nameOf(a.key), nameOf(a.value)) match {
      case (Some(k), Some(v)) => k.equalsIgnoreCase(v)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case m @ MergeIntoTable(target, source, cond,
          Seq(matched), Seq(notMatched), Seq(), false)
          if source.resolved && target.resolved &&
            isStarShape(matched) && isStarShape(notMatched) =>
        (for {
          name <- targetName(target)
          handler <- MergeRoutes.lookup(name)
          keys <- keysOf(cond)
        } yield GraftMergeIntoCommand(name, keys, source, handler,
          // the analyzer's star expansion casts source columns to the
          // TARGET's types — replicate by casting the batch to the
          // resolved target schema
          org.apache.spark.sql.types.StructType(target.output.map(a =>
            org.apache.spark.sql.types.StructField(
              a.name, a.dataType, a.nullable)))))
          .getOrElse(m)
    }
}

/** The routed merge as an eagerly-executed command: Spark's own
  * `BasicOperators` strategy turns any [[LeafRunnableCommand]] into
  * `ExecutedCommandExec`, so no custom strategy is needed. Output is
  * dbt/beeline-friendly: one `num_affected_rows` row, the engine
  * merge's return value.
  */
case class GraftMergeIntoCommand(relation: String, keys: Seq[String],
    source: LogicalPlan, handler: MergeRoutes.Handler,
    targetSchema: org.apache.spark.sql.types.StructType)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "num_affected_rows", org.apache.spark.sql.types.LongType,
      nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val raw = org.apache.spark.sql.GraftSqlBridge.ofRows(
      sparkSession, source)
    keys.foreach(k => require(raw.columns.exists(_.equalsIgnoreCase(k)),
      s"MERGE INTO $relation: ON key '$k' is not a source column " +
        s"(${raw.columns.mkString(", ")})"))
    // `UPDATE SET * / INSERT *` semantics: the batch lands in the
    // target's column ORDER and TYPES (the analyzer's star expansion
    // is a same-name assignment list with casts — replicated here)
    val batch = raw.select(targetSchema.fields.toIndexedSeq.map { f =>
      val src = raw.columns.find(_.equalsIgnoreCase(f.name)).getOrElse(
        throw new IllegalArgumentException(
          s"MERGE INTO $relation: target column '${f.name}' has no " +
            s"source column (INSERT * needs all of them; source has " +
            s"${raw.columns.mkString(", ")})"))
      org.apache.spark.sql.functions.col(s"`$src`")
        .cast(f.dataType).as(f.name)
    }: _*)
    Seq(Row(handler(sparkSession, batch, keys)))
  }
}
