package graft.gateway

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** `SELECT ... FROM <relation> VERSION AS OF <v>` routed onto the
  * engine's snapshot readers.
  *
  * Spark parses the time-travel suffix for any relation but executes
  * it only for DSv2 tables — against the engine's published
  * relations (temp views over manifest/Delta/Iceberg state) it
  * errors. The [[TimeTravelRoute]] resolution rule rewrites a
  * version-pinned read of a routed relation to the registered
  * handler's ANALYZED plan: Delta relations replay the log to
  * `versionAsOf`, Iceberg relations read the snapshot id, manifest
  * warehouse tables read generation `gen_<v>` — each the same
  * version-pinned read path the engine's own time-travel keys
  * exercise (`mat_time_travel`, `scan_delta`'s versionAsOf).
  *
  * `TIMESTAMP AS OF <literal>` routes too: the literal evaluates in
  * the session timezone and a per-backend resolver pins the version
  * at-or-before it (Delta commit-file mtimes, Iceberg snapshot
  * timestamps with a metadata-mtime fallback, manifest generation
  * mtimes) — refusing loudly for timestamps before the available
  * history (pre-creation, vacuumed/expired ranges). Unrouted
  * relations keep Spark's own loud error, never a silently-current
  * read.
  *
  * Resolution-order caveat: Spark's OWN ResolveRelations throws its
  * unsupported-time-travel error the moment the inner name resolves
  * to a LOCAL temp view — built-in rules run before injected ones,
  * so a local-view name cannot be intercepted. Published relations
  * resolve through the GLOBAL-view fallback (the Thrift production
  * path), where the name reaches this rule still unresolved and
  * routes cleanly; in the host session, read versions through the
  * engine API instead.
  *
  * Scale notes: resolution-time name matching only; the rewritten
  * plan IS the engine's bounded log/snapshot replay — version-pinned
  * reads prune to the files live at that version.
  */
object TimeTravelRoutes {

  /** (session, version literal from the SQL) → the pinned read. */
  type Handler = (SparkSession, String) => DataFrame

  private val routes = new RouteRegistry[Handler]

  def register(relation: String, handler: Handler): Unit =
    routes.register(relation, handler)

  /** Owned registration — see [[RouteRegistry]]'s ownership rules. */
  def register(relation: String, owner: AnyRef, handler: Handler): Unit =
    routes.register(relation, owner, handler)

  def unregister(relation: String): Unit = routes.unregister(relation)

  def unregister(relation: String, owner: AnyRef): Unit =
    routes.unregister(relation, owner)

  def lookup(relation: String): Option[Handler] = routes.lookup(relation)

  /** (session, UTC epoch micros from the evaluated SQL literal) →
    * the timestamp-pinned read. Registered alongside the version
    * handler; the backends resolve a timestamp to a version first
    * (Delta commit mtimes, Iceberg snapshot timestamps, manifest
    * generation mtimes) and reuse the version-pinned read path.
    */
  type TsHandler = (SparkSession, Long) => DataFrame

  private val tsRoutes = new RouteRegistry[TsHandler]

  def registerTimestamp(relation: String, handler: TsHandler): Unit =
    tsRoutes.register(relation, handler)

  def registerTimestamp(relation: String, owner: AnyRef,
      handler: TsHandler): Unit =
    tsRoutes.register(relation, owner, handler)

  def unregisterTimestamp(relation: String): Unit =
    tsRoutes.unregister(relation)

  def unregisterTimestamp(relation: String, owner: AnyRef): Unit =
    tsRoutes.unregister(relation, owner)

  def lookupTimestamp(relation: String): Option[TsHandler] =
    tsRoutes.lookup(relation)
}

/** See [[TimeTravelRoutes]]. */
case class TimeTravelRoute(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // only NUMERIC version literals route (the engine pins by
      // version/snapshot/generation number); a non-numeric version —
      // or one too long for a Long (18 digits bounds every real
      // version id and can never overflow `toLong`) — stays unrouted
      // so Spark's descriptive error surfaces instead of a bare
      // NumberFormatException from inside the analyzer
      case tt @ RelationTimeTravel(u: UnresolvedRelation, None,
          Some(version)) if version.nonEmpty && version.length <= 18 &&
            version.forall(_.isDigit) =>
        (for {
          handler <- TimeTravelRoutes.lookup(RouteNames.demangle(
            u.multipartIdentifier.mkString(".")))
        } yield handler(session, version)
          .queryExecution.analyzed).getOrElse(tt)

      // `TIMESTAMP AS OF <foldable expr>`: evaluate the literal in
      // the session timezone and hand the epoch micros to the
      // registered timestamp handler (which resolves it to a pinned
      // version driver-side and refuses loudly outside the available
      // history). Non-foldable expressions and unrouted relations
      // stay with Spark's own error.
      case tt @ RelationTimeTravel(u: UnresolvedRelation,
          Some(tsExpr), None)
          if tsExpr.resolved && tsExpr.foldable && tsExpr.deterministic =>
        (for {
          handler <- TimeTravelRoutes.lookupTimestamp(RouteNames.demangle(
            u.multipartIdentifier.mkString(".")))
          micros <- evalMicros(tsExpr)
        } yield handler(session, micros)
          .queryExecution.analyzed).getOrElse(tt)
    }

  /** Foldable expression → UTC epoch micros via a timestamp cast in
    * the session timezone; None (unrouted) when the cast fails or
    * yields null.
    */
  private def evalMicros(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[Long] = {
    val cast = org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.TimestampType,
      Some(session.sessionState.conf.sessionLocalTimeZone))
    scala.util.Try(Option(cast.eval(null))).toOption.flatten.collect {
      case micros: Long => micros
    }
  }
}
