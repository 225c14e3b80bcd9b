package graft.gateway

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction}
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
  * and dbt SNAPSHOTS emit the CONDITIONED shape
  * (`spark__snapshot_merge_sql`, the SCD2 update path):
  *
  * {{{
  *   MERGE INTO snap AS DBT_INTERNAL_DEST
  *   USING snap__dbt_tmp AS DBT_INTERNAL_SOURCE
  *   ON DBT_INTERNAL_SOURCE.dbt_scd_id = DBT_INTERNAL_DEST.dbt_scd_id
  *   WHEN MATCHED AND DBT_INTERNAL_DEST.dbt_valid_to IS NULL
  *        AND DBT_INTERNAL_SOURCE.dbt_change_type IN ('update','delete')
  *     THEN UPDATE SET dbt_valid_to = DBT_INTERNAL_SOURCE.dbt_valid_to
  *   WHEN NOT MATCHED AND DBT_INTERNAL_SOURCE.dbt_change_type = 'insert'
  *     THEN INSERT *
  * }}}
  *
  * Vanilla Spark parses both but cannot EXECUTE them against
  * v1/parquet relations ("MERGE INTO TABLE is not supported
  * temporarily"). The [[MergeIntoRoute]] resolution rule — injected
  * by [[GraftSqlExtensions]], so it is live in `spark.sql` AND in
  * every per-connection Thrift session — rewrites these shapes into
  * engine commands when the target relation has a registered
  * [[MergeRoutes]] handler (`PipelineRunner` registers one per
  * published incremental-merge model, routing to `DeltaWrite.merge` /
  * `IcebergWrite.merge` / the manifest-warehouse merge by the model's
  * file_format):
  *
  *  - the unconditional star shape goes straight to the handler (no
  *    target read — the handler IS `UPDATE SET * / INSERT *`);
  *  - conditional merges (any number of `WHEN MATCHED [AND c] THEN
  *    UPDATE SET col = expr, ...` actions, any number of `WHEN NOT
  *    MATCHED [AND c] THEN INSERT [*|(cols) VALUES]` actions) are
  *    COMPILED onto the same handler: join target⋈source on the ON
  *    keys, build each touched row's post-image (first matching
  *    action wins, unassigned update columns keep the target value,
  *    unassigned insert columns are NULL, values cast to the target
  *    type — Spark's own star-expansion semantics), and upsert the
  *    post-image batch. Untouched matched rows are EXCLUDED from the
  *    batch, so the engine merge rewrites no more files than the
  *    conditions touch.
  *
  * dbt's `incremental_predicates` config appends extra NON-equality
  * conjuncts to the star shape's ON clause (`ON k = k AND
  * DBT_INTERNAL_DEST.ts > '...'` — it exists to prune big merges).
  * The route splits the condition into equality keys + residuals and
  * hands the residual SQL to handlers that support it
  * ([[MergeRoutes.Handler.supportsResidual]] — the Delta/Iceberg
  * engine merges, which prune their touched-file probe through
  * per-file stats/bounds and narrow the matched set to in-window
  * rows, SQL MERGE semantics). Residuals referencing the source
  * side, subqueries, or a handler without support leave the
  * statement unrouted — loud, never a silently-plain merge.
  *
  * `WHEN MATCHED [AND c] THEN DELETE` routes when the relation can
  * delete: preferably FUSED into the engine merge's own atomic
  * commit ([[MergeRoutes.Handler.supportsMergeDelete]] — delete +
  * upsert land in ONE table version, SQL MERGE's atomicity), else
  * through the registered [[DmlRoutes.Ops.deleteWhere]] (Delta's DV
  * masking, Iceberg's equality-delete append) as its own commit
  * before the upsert. The delete keys ship as a bounded flat
  * keys-in-batch predicate; first-matching-action semantics hold
  * across the legs, and an update+delete pair on one key refuses as
  * SQL MERGE's cardinality violation. `WHEN NOT MATCHED BY SOURCE
  * [AND c] THEN UPDATE/DELETE` (full-sync merges) compiles the same
  * way over the target-side anti-join: by-source updates join the
  * upsert batch (target-only expressions, SQL's own visibility
  * rule), by-source deletes join the bounded delete set — their keys
  * are disjoint from matched and inserted keys by construction.
  * Without any delete capability the statement stays untouched, as
  * does any unrouted relation: Spark's own loud unsupported error
  * surfaces; never a silent partial merge. dbt never emits these
  * over this wire (snapshot hard-deletes arrive as
  * `dbt_change_type='delete'` UPDATE rows).
  *
  * Scale notes: the rewrite is pure name/shape matching during
  * resolution; execution delegates to the registered engine merge,
  * which is the same O(touched files + batch) staged path every
  * `queries()` merge key runs. The conditional compile adds one
  * target⋈batch join (AQE broadcasts the small batch side) and an
  * anti-join probe against the target's KEY COLUMNS only — the same
  * cost class as the engine merge's own touched-file probe.
  */
object MergeRoutes {

  /** The engine merge a routed statement executes. SAM-convertible:
    * plain `(session, batch, keys) => n` lambdas register the basic
    * upsert. Handlers for backends whose merge understands residual
    * ON conjuncts (dbt `incremental_predicates` — extra non-equality
    * predicates in the ON clause) additionally override
    * [[supportsResidual]]/[[mergeWithResidual]]; statements carrying
    * residuals against a handler that doesn't are left UNROUTED so
    * Spark's own loud unsupported error surfaces.
    */
  trait Handler {
    /** (session, source batch, equality-key columns) → rows merged. */
    def apply(session: SparkSession, batch: DataFrame,
        keys: Seq[String]): Long

    def supportsResidual: Boolean = false

    /** Merge with residual ON predicates: `residualSql` is the AND of
      * the non-equality ON conjuncts, rendered over the TARGET's bare
      * column names. Only called when [[supportsResidual]].
      */
    def mergeWithResidual(session: SparkSession, batch: DataFrame,
        keys: Seq[String], residualSql: String): Long =
      sys.error("merge handler does not support residual ON predicates")

    /** True when the handler can execute a matched-DELETE leg FUSED
      * into the merge's own atomic commit (`deletePredicateSql` rows
      * removed + `batch` upserted, one table version) — the backend's
      * single-commit MERGE semantics. Handlers without it fall back
      * to the registered [[DmlRoutes.Ops.deleteWhere]] as a separate
      * commit before the upsert (see [[GraftConditionalMergeCommand]]
      * for the documented two-commit window).
      */
    def supportsMergeDelete: Boolean = false

    /** Merge with a fused delete leg: delete the target rows matching
      * `deletePredicateSql`, upsert `batch` (possibly EMPTY for a
      * delete-only merge), ONE commit. Returns deleted + merged rows.
      * Only called when [[supportsMergeDelete]].
      */
    def mergeWithDelete(session: SparkSession, batch: DataFrame,
        keys: Seq[String], deletePredicateSql: String): Long =
      sys.error("merge handler does not support a fused delete leg")
  }

  private val routes = new RouteRegistry[Handler]

  /** Register (or replace) the merge handler for a relation name as
    * clients address it in SQL — see [[RouteRegistry]].
    */
  def register(relation: String, handler: Handler): Unit =
    routes.register(relation, handler)

  /** Owned registration — see [[RouteRegistry]]'s ownership rules. */
  def register(relation: String, owner: AnyRef, handler: Handler): Unit =
    routes.register(relation, owner, handler)

  def unregister(relation: String): Unit = routes.unregister(relation)

  def unregister(relation: String, owner: AnyRef): Unit =
    routes.unregister(relation, owner)

  def lookup(relation: String): Option[Handler] = routes.lookup(relation)
}

/** See [[MergeRoutes]]. Matches during the analyzer's resolution
  * fixed point: the TARGET is matched structurally by NAME (it may
  * still be an [[UnresolvedRelation]], or already resolved through
  * the published-view fallback — both carry the client-addressed
  * name), the SOURCE must be fully resolved (it becomes the merge
  * batch), and the action list must be upsert-shaped (updates and
  * inserts only — see the object scaladoc for what routes vs what is
  * left to Spark's own error).
  */
private[gateway] object RouteNames {

  /** Back from the RESOLVED name to the client-addressed one: strip
    * the global-temp database and undo the runner's `graft_ns__` view
    * mangling for `schema.identifier` relations.
    */
  def demangle(name: String): String = {
    val n = name.stripPrefix("global_temp.")
    if (n.startsWith("graft_ns__"))
      n.stripPrefix("graft_ns__").replace("__", ".")
    else n
  }

  /** The client-addressed relation name of a routed statement's
    * target. The rules wait for the target to RESOLVE (dbt targets
    * always exist as relations), so the name is recovered from the
    * resolved tree: a temp/global view keeps it on the View's catalog
    * identifier, a catalog table on its qualified SubqueryAlias; a
    * bare alias (no qualifier, no view child) is skipped.
    */
  def targetName(plan: LogicalPlan): Option[String] = plan match {
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

  /** The column name an expression addresses, seen through the casts
    * the analyzer inserts for type coercion / star expansion.
    */
  def nameOf(e: Expression): Option[String] = e match {
    case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
      Some(a.nameParts.last)
    case a: Attribute => Some(a.name)
    case c: org.apache.spark.sql.catalyst.expressions.Cast =>
      nameOf(c.child)
    case _ => None
  }

  /** A same-named equality binding one TARGET attribute and one
    * SOURCE attribute (either order) → the key name. The side check
    * is what makes a conjunct a JOIN key: a degenerate `ON t.k = t.k`
    * (both sides the target's column) is match-everything SQL, not an
    * upsert key — classifying it as one would execute a
    * cardinality-violating statement as a clean upsert.
    */
  private def crossSideKey(l: Expression, r: Expression,
      target: LogicalPlan, source: LogicalPlan): Option[String] = {
    def sideOf(e: Expression): Option[Boolean] = { // true = target side
      val refs = e.references
      if (refs.size != 1) None
      else if (refs.subsetOf(target.outputSet)) Some(true)
      else if (refs.subsetOf(source.outputSet)) Some(false)
      else None
    }
    for {
      ln <- nameOf(l); rn <- nameOf(r) if ln.equalsIgnoreCase(rn)
      ls <- sideOf(l); rs <- sideOf(r) if ls != rs
    } yield ln
  }

  /** ON conjunction of same-named CROSS-SIDE equality columns → key
    * column names (see [[crossSideKey]]). Requires a RESOLVED
    * condition — side membership is an exprId test.
    */
  def keysOf(cond: Expression, target: LogicalPlan,
      source: LogicalPlan): Option[Seq[String]] = cond match {
    case And(l, r) =>
      for { lk <- keysOf(l, target, source)
            rk <- keysOf(r, target, source) } yield lk ++ rk
    case EqualTo(l, r) => crossSideKey(l, r, target, source).map(Seq(_))
    case _ => None
  }

  /** Split an ON conjunction into same-named cross-side equality KEY
    * columns ([[crossSideKey]]) and RESIDUAL conjuncts (dbt
    * `incremental_predicates` appends them to the merge macro's ON
    * clause to prune big merges). None when no equality key is
    * present — such a statement has no routable upsert key.
    */
  def splitCond(cond: Expression, target: LogicalPlan,
      source: LogicalPlan): Option[(Seq[String], Seq[Expression])] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val parts: Seq[Either[String, Expression]] = conjuncts(cond).map {
      case eq @ EqualTo(l, r) =>
        crossSideKey(l, r, target, source) match {
          case Some(k) => Left(k)
          case None => Right(eq)
        }
      case other => Right(other)
    }
    val keys = parts.collect { case Left(k) => k }
    if (keys.isEmpty) None
    else Some((keys, parts.collect { case Right(e) => e }))
  }
}

case class MergeIntoRoute(session: SparkSession)
    extends Rule[LogicalPlan] {

  import RouteNames.{keysOf, nameOf, targetName}

  // `UPDATE SET *` / `INSERT *` — either still star-form, or already
  // expanded by the analyzer's ResolveReferences (built-in rules run
  // BEFORE injected ones inside each Resolution iteration, so by the
  // time this rule sees a fully-resolved merge the stars are explicit
  // same-name column-to-column assignment lists)
  private def isStarShape(action: MergeAction): Boolean = action match {
    case UpdateStarAction(None) => true
    case InsertStarAction(None) => true
    case UpdateAction(None, assigns, _) =>
      assigns.forall(sameNameColumnAssign)
    case InsertAction(None, assigns) =>
      assigns.forall(sameNameColumnAssign)
    case _ => false
  }

  private def sameNameColumnAssign(a: Assignment): Boolean =
    (nameOf(a.key), nameOf(a.value)) match {
      case (Some(k), Some(v)) => k.equalsIgnoreCase(v)
      case _ => false
    }

  // ---- conditional-shape normalization ----------------------------

  /** One routed action: (condition, Some(assignments keyed by
    * LOWERCASE target column name)) for UPDATE/INSERT, (condition,
    * None) for a matched DELETE. A star action normalizes to the
    * analyzer's own expansion — every target column from the
    * same-named source column (extra source columns ignored, exactly
    * Spark/Delta `INSERT *` semantics).
    */
  private type Norm = (Option[Expression], Option[Map[String, Expression]])

  private def normalizeActions(actions: Seq[MergeAction],
      target: LogicalPlan, source: LogicalPlan,
      updateSide: Boolean): Option[Seq[Norm]] = {
    val srcByName = source.output
      .map(a => a.name.toLowerCase(java.util.Locale.ROOT) -> a).toMap
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)

    // star: target-driven same-name map; unroutable if a target
    // column has no source counterpart (Spark's expansion errors on
    // the same condition — leave it the loud path)
    def star: Option[Map[String, Expression]] = {
      val pairs = target.output.map(ta =>
        srcByName.get(lc(ta.name)).map(sa => lc(ta.name) -> (sa: Expression)))
      if (pairs.exists(_.isEmpty)) None else Some(pairs.flatten.toMap)
    }

    // duplicate assignments to one column leave the merge unrouted
    // (Spark's own loud rejection) instead of silently keeping the
    // last entry
    def explicit(assigns: Seq[Assignment]): Option[Map[String, Expression]] = {
      val pairs = assigns.map { a =>
        nameOf(a.key).filter(k =>
          target.output.exists(_.name.equalsIgnoreCase(k)))
          .filter(_ => a.value.resolved)
          .map(k => lc(k) -> a.value)
      }
      if (pairs.exists(_.isEmpty) ||
          pairs.flatten.map(_._1).distinct.size != pairs.size) None
      else Some(pairs.flatten.toMap)
    }

    // a NOT MATCHED condition may only see the source row (there is
    // no target row) — SQL's own rule; reject anything else rather
    // than evaluate it wrong
    def condOk(c: Option[Expression]): Boolean = c.forall(e =>
      e.resolved &&
        (updateSide || e.references.subsetOf(source.outputSet)))

    val normed: Seq[Option[Norm]] = actions.map {
      case UpdateStarAction(c) if updateSide && condOk(c) =>
        star.map(m => c -> Some(m))
      case UpdateAction(c, assigns, _) if updateSide && condOk(c) =>
        explicit(assigns).map(m => c -> Some(m))
      case InsertStarAction(c) if !updateSide && condOk(c) =>
        star.map(m => c -> Some(m))
      case InsertAction(c, assigns) if !updateSide && condOk(c) =>
        explicit(assigns).map(m => c -> Some(m))
      // WHEN MATCHED [AND c] THEN DELETE routes onto the relation's
      // registered delete implementation (the route only fires when
      // one exists — see deleteCapability); NOT MATCHED BY SOURCE
      // actions are normalized separately (normalizeBySource)
      case DeleteAction(c) if updateSide && condOk(c) =>
        Some(c -> None)
      case _ => None
    }
    if (normed.exists(_.isEmpty)) None else Some(normed.flatten)
  }

  /** `WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE/DELETE` — the
    * full-sync legs over target rows with NO source match. SQL's own
    * rule: there is no source row, so conditions AND update values
    * may reference the TARGET side only; star assignments don't
    * exist in this clause; assigning a key column refuses (the
    * upsert could not relocate the row) by leaving the statement
    * unrouted to Spark's loud error.
    */
  private def normalizeBySource(actions: Seq[MergeAction],
      target: LogicalPlan, keys: Seq[String]): Option[Seq[Norm]] = {
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    def targetOnly(e: Expression): Boolean =
      e.resolved && e.references.subsetOf(target.outputSet)
    def explicit(assigns: Seq[Assignment]): Option[Map[String, Expression]] = {
      val pairs = assigns.map { a =>
        nameOf(a.key).filter(k =>
          target.output.exists(_.name.equalsIgnoreCase(k)))
          .filter(k => !keys.exists(_.equalsIgnoreCase(k)))
          .filter(_ => targetOnly(a.value))
          .map(k => lc(k) -> a.value)
      }
      if (pairs.exists(_.isEmpty) ||
          pairs.flatten.map(_._1).distinct.size != pairs.size) None
      else Some(pairs.flatten.toMap)
    }
    val normed: Seq[Option[Norm]] = actions.map {
      case UpdateAction(c, assigns, _) if c.forall(targetOnly) =>
        explicit(assigns).map(m => c -> Some(m))
      case DeleteAction(c) if c.forall(targetOnly) =>
        Some(c -> None)
      case _ => None
    }
    if (normed.exists(_.isEmpty)) None else Some(normed.flatten)
  }

  /** The delete implementation a matched-DELETE-bearing merge routes
    * through — preferring the handler's own FUSED single-commit leg
    * ([[MergeRoutes.Handler.supportsMergeDelete]]), falling back to
    * the registered [[DmlRoutes.Ops.deleteWhere]] (Delta's DV
    * masking, Iceberg's equality-delete append) as a separate commit.
    * `Some(None)` = no separate implementation needed (no delete
    * action, or the handler fuses it); `None` = a delete action with
    * no capability at all — leave the statement to Spark's own loud
    * error, never a partial merge.
    */
  private def deleteCapability(name: String, matched: Seq[Norm],
      handler: MergeRoutes.Handler)
      : Option[Option[(SparkSession, String) => Long]] =
    if (!matched.exists(_._2.isEmpty)) Some(None)
    else if (handler.supportsMergeDelete) Some(None)
    else DmlRoutes.lookup(name).flatMap(_.deleteWhere) match {
      case Some(f) => Some(Some(f))
      case None => None
    }

  /** Residual ON conjuncts → the SQL text the handler's merge
    * re-binds against its own table scan. `Some(None)` = no residual
    * (plain merge); `None` = unroutable (leave the statement to
    * Spark's own loud error): handler can't execute residuals, a
    * conjunct references the source side / a subquery / is
    * non-deterministic, or the text doesn't render.
    */
  private def renderResidual(residuals: Seq[Expression],
      target: LogicalPlan,
      handler: MergeRoutes.Handler): Option[Option[String]] =
    if (residuals.isEmpty) Some(None)
    else if (!handler.supportsResidual) None
    else {
      val ok = residuals.forall(e => e.resolved && e.deterministic &&
        e.references.subsetOf(target.outputSet) &&
        !e.exists(_.isInstanceOf[org.apache.spark.sql.catalyst
          .expressions.SubqueryExpression]))
      if (!ok) None
      else {
        val combined = residuals.reduce(And)
        // strip view qualifiers (global_temp.t.ts) — the text must
        // bind to the merge's own scan of the table
        val bare = combined.transform {
          case a: org.apache.spark.sql.catalyst.expressions
              .AttributeReference => a.withQualifier(Seq.empty)
        }
        scala.util.Try(bare.sql).toOption.map(Some(_))
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // the dbt incremental shape: unconditional UPDATE SET * +
      // INSERT * — straight to the handler, no target read
      case m @ MergeIntoTable(target, source, cond,
          Seq(matched), Seq(notMatched), Seq(), false)
          if source.resolved && target.resolved && cond.resolved &&
            isStarShape(matched) && isStarShape(notMatched) =>
        (for {
          name <- targetName(target)
          handler <- MergeRoutes.lookup(name)
          (keys, residuals) <- RouteNames.splitCond(cond, target, source)
          residualSql <- renderResidual(residuals, target, handler)
        } yield GraftMergeIntoCommand(name, keys, source, handler,
          residualSql,
          // the analyzer's star expansion casts source columns to the
          // TARGET's types — replicate by casting the batch to the
          // resolved target schema
          org.apache.spark.sql.types.StructType(target.output.map(a =>
            org.apache.spark.sql.types.StructField(
              a.name, a.dataType, a.nullable)))))
          .getOrElse(m)

      // the conditional shape (dbt snapshots, hand-written MERGE —
      // including full-sync `WHEN NOT MATCHED BY SOURCE` legs):
      // compile matched updates + not-matched inserts + by-source
      // updates/deletes onto the same upsert handler
      case m @ MergeIntoTable(target, source, cond,
          matchedActs, notMatchedActs, bySourceActs, false)
          if source.resolved && target.resolved && cond.resolved &&
            (matchedActs.nonEmpty || notMatchedActs.nonEmpty ||
              bySourceActs.nonEmpty) =>
        (for {
          name <- targetName(target)
          handler <- MergeRoutes.lookup(name)
          keys <- keysOf(cond, target, source)
          matched <- normalizeActions(matchedActs, target, source,
            updateSide = true)
          notMatched <- normalizeActions(notMatchedActs, target, source,
            updateSide = false)
          bySource <- normalizeBySource(bySourceActs, target, keys)
          deleteWhere <- deleteCapability(name, matched ++ bySource,
            handler)
        } yield GraftConditionalMergeCommand(name, keys, target, source,
          cond, matched, notMatched, bySource, handler, deleteWhere))
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
    residualSql: Option[String],
    targetSchema: org.apache.spark.sql.types.StructType)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "num_affected_rows", org.apache.spark.sql.types.LongType,
      nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    // validate the statement SCHEMA-ONLY first: an invalid merge must
    // refuse before the staging lineage pays its materialization job
    val raw0 = org.apache.spark.sql.GraftSqlBridge.ofRows(
      sparkSession, source)
    keys.foreach(k => require(raw0.columns.exists(_.equalsIgnoreCase(k)),
      s"MERGE INTO $relation: ON key '$k' is not a source column " +
        s"(${raw0.columns.mkString(", ")})"))
    val srcOf: Map[String, String] = targetSchema.fields.map { f =>
      f.name -> raw0.columns.find(_.equalsIgnoreCase(f.name)).getOrElse(
        throw new IllegalArgumentException(
          s"MERGE INTO $relation: target column '${f.name}' has no " +
            s"source column (INSERT * needs all of them; source has " +
            s"${raw0.columns.mkString(", ")})"))
    }.toMap
    // pin the staging lineage once, like the conditional path: the
    // handler's merge runs several jobs (touched-file probe, staged
    // write, counts) and a dbt staging view that reads {{ this }}
    // must not re-execute per job.
    // INVARIANT the lazy pin relies on (holds engine-wide): the
    // checkpoint's FIRST action — the handler's probe — runs before
    // any target mutation (the handler stages everything, then
    // commits), and superseded data files are never physically
    // deleted mid-command (deletes happen only in vacuum/dropTable/
    // restore, never inside a merge). If either ever changes, these
    // merge-source pins must become eager = true.
    val raw = raw0.localCheckpoint(eager = false)
    // `UPDATE SET * / INSERT *` semantics: the batch lands in the
    // target's column ORDER and TYPES (the analyzer's star expansion
    // is a same-name assignment list with casts — replicated here)
    val batch = raw.select(targetSchema.fields.toIndexedSeq.map { f =>
      org.apache.spark.sql.functions.col(s"`${srcOf(f.name)}`")
        .cast(f.dataType).as(f.name)
    }: _*)
    Seq(Row(residualSql match {
      case None => handler(sparkSession, batch, keys)
      case Some(r) =>
        handler.mergeWithResidual(sparkSession, batch, keys, r)
    }))
  }
}

/** A CONDITIONAL merge compiled onto the upsert handler (see
  * [[MergeIntoRoute]]'s scaladoc for the shape grammar). Evaluation
  * order is SQL MERGE's: a matched row takes the FIRST matched action
  * whose condition holds (later branches see earlier conditions
  * false), a source-only row the first insert action; a row no
  * condition accepts is untouched (matched) or dropped (not matched)
  * and never enters the upsert batch.
  *
  * The target read is the RESOLVED target plan from the statement
  * itself — the same pre-merge state the source staging view was
  * analyzed against, so a staging query that reads the target (dbt's
  * snapshot staging does) and the post-image build both see one
  * consistent snapshot.
  */
case class GraftConditionalMergeCommand(relation: String,
    keys: Seq[String], target: LogicalPlan, source: LogicalPlan,
    joinCond: Expression,
    matched: Seq[(Option[Expression], Option[Map[String, Expression]])],
    notMatched: Seq[(Option[Expression], Option[Map[String, Expression]])],
    bySource: Seq[(Option[Expression], Option[Map[String, Expression]])],
    handler: MergeRoutes.Handler,
    deleteWhere: Option[(SparkSession, String) => Long])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "num_affected_rows", org.apache.spark.sql.types.LongType,
      nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.GraftSqlBridge.{column, ofRows}
    import org.apache.spark.sql.functions.{col, lit, when}

    val t = ofRows(sparkSession, target)
    // the source feeds BOTH legs (matched inner join + not-matched
    // anti join) and then the engine merge's own probe — materialize
    // its lineage once (dbt snapshot staging is itself a join against
    // the target; re-running it per consumer triples the work).
    // Lazy pin invariant: its first action (the batch materialization
    // below) runs before the handler mutates the target, and old data
    // files are never physically deleted in-flight — see
    // GraftMergeIntoCommand.run for the full statement.
    val s = ofRows(sparkSession, source).localCheckpoint(eager = false)
    val on = column(joinCond)
    val fields = target.output.map(a =>
      org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable))
    def lc(n: String) = n.toLowerCase(java.util.Locale.ROOT)
    // a matched UPDATE may only "assign" a key column from its
    // same-named source counterpart (the star-expansion shape —
    // value-preserving under the ON equality); any other key
    // assignment would DUPLICATE the row through the upsert instead
    // of relocating it, so refuse loudly (mirrors GraftUpdateCommand)
    matched.foreach { case (_, assignsOpt) =>
      keys.foreach { k =>
        assignsOpt.flatMap(_.get(lc(k))).foreach { v =>
          require(RouteNames.nameOf(v).exists(_.equalsIgnoreCase(k)),
            s"MERGE INTO $relation: matched UPDATE assigns unique-key " +
              s"column '$k' an expression other than the same-named " +
              s"source column — the upsert could not relocate the row " +
              s"(delete + insert instead)")
        }
      }
    }
    val targetCol: Map[String, Column] =
      target.output.map(a => lc(a.name) -> column(a)).toMap

    // FIRST-MATCHING-ACTION classification over the matched join:
    // __graft_act = index of the first matched action whose condition
    // holds for the (target, source) pair; null = untouched
    val updateIdx = matched.zipWithIndex.collect {
      case ((_, Some(_)), i) => i }
    val deleteIdx = matched.zipWithIndex.collect {
      case ((_, None), i) => i }
    // When the statement has BOTH matched and not-matched actions,
    // ONE source-side LEFT OUTER join feeds every leg: matched pairs
    // carry a `__graft_m` marker, source-only rows have it NULL and
    // become the insert candidates. The former shape ran the inner
    // join for matched actions and a SECOND anti-join of the source
    // against the target's keys for inserts — two scans (and two
    // join exchanges) of the target per MERGE (guide §2.4: remove
    // duplicate joins outright).
    val fused = matched.nonEmpty && notMatched.nonEmpty
    val joined: Option[DataFrame] =
      if (matched.isEmpty) None
      else {
        val conds = matched.map(_._1.map(column).getOrElse(lit(true)))
        val act = conds.zipWithIndex.drop(1)
          .foldLeft(when(conds.head, lit(0))) {
            case (acc, (c, i)) => acc.when(c, lit(i))
          }
        if (fused) {
          // __graft_act is gated on the marker so NULL target columns
          // of source-only rows never classify a matched action
          val j = s.join(t.withColumn("__graft_m", lit(true)), on,
              "left_outer")
            .withColumn("__graft_act", when(col("__graft_m"), act))
          // consumed by the update leg, the insert leg, and (with
          // deletes) the delete-key collect — pin once
          Some(j.localCheckpoint(eager = false))
        } else {
          val j = t.join(s, on, "inner").withColumn("__graft_act", act)
          // the join feeds the update leg AND the delete-key collect —
          // pin it once when both consume it
          Some(if (deleteIdx.nonEmpty && updateIdx.nonEmpty)
            j.localCheckpoint(eager = false) else j)
        }
      }

    val updated: Option[DataFrame] =
      if (updateIdx.isEmpty) None
      else joined.map { j =>
        val projected = fields.map { f =>
          val branches = updateIdx.map { i =>
            (org.apache.spark.sql.functions.col("__graft_act") ===
              lit(i)) ->
              matched(i)._2.get.get(lc(f.name)).map(column)
                .getOrElse(targetCol(lc(f.name)))
          }
          branches.drop(1)
            .foldLeft(when(branches.head._1, branches.head._2)) {
              case (acc, (c, v)) => acc.when(c, v)
            }
            .otherwise(targetCol(lc(f.name))) // unreachable: filtered
            .cast(f.dataType).as(f.name)
        }
        j.filter(org.apache.spark.sql.functions.col("__graft_act")
            .isin(updateIdx: _*))
          .select(projected: _*)
      }

    // the anti-probe needs only the target's KEY columns — selecting
    // the key attributes keeps their exprIds so the ON condition
    // still binds, and the probe never scans non-key target columns
    val keyAttrs = target.output.filter(a =>
      keys.exists(_.equalsIgnoreCase(a.name)))

    // matched DELETE rows: their target keys, collected bounded (the
    // delete ships as a keys-in-batch predicate to the registered
    // selective-delete implementation — mass deletes should DELETE
    // FROM / rewrite instead)
    val maxDeleteKeys = 100000
    val deletedKeys: Seq[Seq[Any]] =
      if (deleteIdx.isEmpty) Nil
      else joined.map { j =>
        val rows = j.filter(org.apache.spark.sql.functions
            .col("__graft_act").isin(deleteIdx: _*))
          .select(keyAttrs.map(column): _*).distinct()
          .limit(maxDeleteKeys + 1).collect()
        require(rows.length <= maxDeleteKeys,
          s"MERGE INTO $relation: more than $maxDeleteKeys matched " +
            s"DELETE keys — the routed delete is selective; use " +
            s"DELETE FROM or a rewrite for mass deletes")
        rows.map(_.toSeq).toSeq
      }.getOrElse(Nil)
    def litSql(v: Any, dt: org.apache.spark.sql.types.DataType): String =
      org.apache.spark.sql.catalyst.expressions.Literal.create(v, dt).sql
    def q(n: String): String = "`" + n.replace("`", "``") + "`"
    // FLAT rendering — single-column IN / multi-column tuple IN; both
    // parse to ONE In node, never a right-nested OR chain that could
    // overflow the parser near the key cap
    def deletePredicate(rows: Seq[Seq[Any]]): String =
      if (keyAttrs.size == 1)
        q(keyAttrs.head.name) + " IN (" + rows.map(r =>
          litSql(r.head, keyAttrs.head.dataType)).mkString(", ") + ")"
      else
        keyAttrs.map(a => q(a.name)).mkString("(", ", ", ")") +
          " IN (" + rows.map(r => keyAttrs.zip(r).map { case (a, v) =>
            litSql(v, a.dataType) }.mkString("(", ", ", ")"))
            .mkString(", ") + ")"
    // the same predicate as an in-memory Column — the overlap check
    // below never round-trips multi-MB SQL text through the parser
    def deleteColumn(rows: Seq[Seq[Any]]): Column = {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      import org.apache.spark.sql.catalyst.expressions.{CreateStruct, In => CatalystIn, Literal => CatalystLiteral}
      val keyExprs: Seq[Expression] =
        keyAttrs.map(a => UnresolvedAttribute.quoted(a.name))
      val (value, lits) =
        if (keyAttrs.size == 1)
          (keyExprs.head, rows.map(r => CatalystLiteral.create(
            r.head, keyAttrs.head.dataType): Expression))
        else {
          val st = org.apache.spark.sql.types.StructType(keyAttrs.map(a =>
            org.apache.spark.sql.types.StructField(
              a.name, a.dataType, a.nullable)))
          (CreateStruct(keyExprs), rows.map(r => CatalystLiteral.create(
            Row.fromSeq(r), st): Expression))
        }
      column(CatalystIn(value, lits))
    }

    val inserted: Option[DataFrame] =
      if (notMatched.isEmpty) None
      else {
        val conds = notMatched.map(_._1.map(column).getOrElse(lit(true)))
        // fused shape: the insert candidates are the SAME join's
        // source-only rows — no second probe of the target
        val rows =
          if (fused) joined.get.filter(col("__graft_m").isNull)
          else s.join(t.select(keyAttrs.map(column): _*), on,
            "left_anti")
        val projected = fields.map { f =>
          val branches = notMatched.zip(conds).map {
            case ((_, assigns), c) =>
              c -> assigns.get.get(lc(f.name)).map(column)
                .getOrElse(lit(null))
          }
          branches.drop(1)
            .foldLeft(when(branches.head._1, branches.head._2)) {
              case (acc, (c, v)) => acc.when(c, v)
            }
            .otherwise(lit(null)) // unreachable: rows are pre-filtered
            .cast(f.dataType).as(f.name)
        }
        Some(rows.filter(conds.reduce(_ || _)).select(projected: _*))
      }

    // NOT MATCHED BY SOURCE legs: target rows with NO source match,
    // classified by FIRST matching action — updates build TARGET-only
    // post-images (they join the upsert batch; their keys are in the
    // target and disjoint from both matched keys and inserted keys,
    // so the cardinality invariant holds by construction), deletes
    // join the same bounded key collect as matched deletes. The
    // anti-probe scans only the source's KEY columns.
    val bsUpdateIdx = bySource.zipWithIndex.collect {
      case ((_, Some(_)), i) => i }
    val bsDeleteIdx = bySource.zipWithIndex.collect {
      case ((_, None), i) => i }
    val srcKeyAttrs = source.output.filter(a =>
      keys.exists(_.equalsIgnoreCase(a.name)))
    val bsRows: Option[DataFrame] =
      if (bySource.isEmpty) None
      else {
        val conds = bySource.map(_._1.map(column).getOrElse(lit(true)))
        val act = conds.zipWithIndex.drop(1)
          .foldLeft(when(conds.head, lit(0))) {
            case (acc, (c, i)) => acc.when(c, lit(i))
          }
        val r = t.join(s.select(srcKeyAttrs.map(column): _*), on,
          "left_anti").withColumn("__graft_act", act)
        Some(if (bsDeleteIdx.nonEmpty && bsUpdateIdx.nonEmpty)
          r.localCheckpoint(eager = false) else r)
      }
    // NULL-keyed target rows land on the by-source side (the ON
    // equality never matches NULL) but the routed execution cannot
    // handle them: a by-source DELETE ships its keys as an IN
    // predicate (NULL never matches — the row would silently
    // survive), and a by-source UPDATE's post-image rides the engine
    // merge whose key anti-join also never matches NULL (the
    // original row would be carried ALONGSIDE the updated one,
    // duplicating the key). Refuse loudly instead of either silent
    // wrong answer.
    bsRows.foreach { r =>
      val nullKeyClassified = r
        .filter(org.apache.spark.sql.functions.col("__graft_act").isNotNull)
        .filter(keyAttrs.map(a => column(a).isNull).reduce(_ || _))
        .limit(1).count() > 0
      require(!nullKeyClassified,
        s"MERGE INTO $relation: a NOT MATCHED BY SOURCE action " +
          s"classified a target row with a NULL unique-key column — " +
          s"the routed delete/upsert cannot address NULL keys " +
          s"(IN/anti-join semantics); clean NULL-keyed rows first")
    }
    val bsUpdated: Option[DataFrame] =
      if (bsUpdateIdx.isEmpty) None
      else bsRows.map { r =>
        val projected = fields.map { f =>
          val branches = bsUpdateIdx.map { i =>
            (org.apache.spark.sql.functions.col("__graft_act") ===
              lit(i)) ->
              bySource(i)._2.get.get(lc(f.name)).map(column)
                .getOrElse(targetCol(lc(f.name)))
          }
          branches.drop(1)
            .foldLeft(when(branches.head._1, branches.head._2)) {
              case (acc, (c, v)) => acc.when(c, v)
            }
            .otherwise(targetCol(lc(f.name))) // unreachable: filtered
            .cast(f.dataType).as(f.name)
        }
        r.filter(org.apache.spark.sql.functions.col("__graft_act")
            .isin(bsUpdateIdx: _*))
          .select(projected: _*)
      }
    val bsDeletedKeys: Seq[Seq[Any]] =
      if (bsDeleteIdx.isEmpty) Nil
      else bsRows.map { r =>
        val rows = r.filter(org.apache.spark.sql.functions
            .col("__graft_act").isin(bsDeleteIdx: _*))
          .select(keyAttrs.map(column): _*).distinct()
          .limit(maxDeleteKeys + 1).collect()
        require(rows.length <= maxDeleteKeys,
          s"MERGE INTO $relation: more than $maxDeleteKeys NOT " +
            s"MATCHED BY SOURCE delete keys — the routed delete is " +
            s"selective; use DELETE FROM or a rewrite for mass deletes")
        rows.map(_.toSeq).toSeq
      }.getOrElse(Nil)
    val allDeletedKeys = deletedKeys ++ bsDeletedKeys

    // materialize the post-image once — the cardinality check AND the
    // engine merge both consume it, and its lineage (the joins over
    // target+source) is not free to re-run
    val batchOpt = Seq(updated, inserted, bsUpdated).flatten
      .reduceOption(_.unionByName(_)).map(_.localCheckpoint(eager = false))
    require(batchOpt.nonEmpty || allDeletedKeys.nonEmpty ||
        deleteIdx.nonEmpty || bsDeleteIdx.nonEmpty,
      s"MERGE INTO $relation: no routable actions") // unreachable
    // SQL MERGE's multiple-match rule: a unique key may appear at
    // most once across the post-image batch AND the delete set — two
    // source rows matching one target row (or colliding insert keys,
    // or an update+delete pair on one key) would otherwise silently
    // break the target's key invariant
    batchOpt.foreach { batch =>
      val keyCols = keys.map(k =>
        batch.columns.find(_.equalsIgnoreCase(k)).getOrElse(k))
      val dup = batch
        .groupBy(keyCols.map(c =>
          org.apache.spark.sql.functions.col(s"`$c`")): _*)
        .count()
        .filter(org.apache.spark.sql.functions.col("count") > 1)
        .limit(1).count() > 0
      require(!dup,
        s"MERGE INTO $relation: multiple source rows matched one " +
          s"target key (or duplicate insert keys) — refusing a " +
          s"duplicate-key upsert")
      if (allDeletedKeys.nonEmpty) {
        val overlap = batch.filter(deleteColumn(allDeletedKeys))
          .limit(1).count() > 0
        require(!overlap,
          s"MERGE INTO $relation: a unique key is both deleted and " +
            s"updated/inserted by this statement (multiple matched " +
            s"source rows) — SQL MERGE's cardinality violation")
      }
    }
    // ---- execute. Preferred: the handler's FUSED merge — delete leg
    // + upsert batch land in ONE table version, SQL MERGE's
    // atomicity. Fallback (handler without supportsMergeDelete): the
    // registered deleteWhere runs as its OWN commit before the
    // upsert — a failure between the two leaves the statement
    // half-applied (rows deleted, updates/inserts absent) and a
    // concurrent reader can observe the intermediate version;
    // recovery = re-run the statement (the deleted keys re-match
    // nothing, the upsert is idempotent per key). dbt never emits
    // delete legs over this wire, so only hand-written MERGE against
    // a fallback-only relation crosses that window.
    if (allDeletedKeys.nonEmpty && handler.supportsMergeDelete) {
      val fusedBatch = batchOpt.getOrElse(
        // delete-only merge: an EMPTY upsert batch in the target's shape
        sparkSession.createDataFrame(
          sparkSession.sparkContext.emptyRDD[Row],
          org.apache.spark.sql.types.StructType(fields)))
      Seq(Row(handler.mergeWithDelete(sparkSession, fusedBatch, keys,
        deletePredicate(allDeletedKeys))))
    } else {
      val nDeleted =
        if (allDeletedKeys.isEmpty) 0L
        else deleteWhere.getOrElse(sys.error(
          s"MERGE INTO $relation: delete action routed without a " +
            s"delete capability")) // unreachable: deleteCapability gate
          .apply(sparkSession, deletePredicate(allDeletedKeys))
      val nMerged = batchOpt.map(handler(sparkSession, _, keys))
        .getOrElse(0L)
      Seq(Row(nDeleted + nMerged))
    }
  }
}
