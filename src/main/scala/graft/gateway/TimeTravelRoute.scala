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
  * `TIMESTAMP AS OF` stays unrouted for now (the engine's readers
  * pin by version/snapshot/generation, not wall-clock), as does any
  * unrouted relation — Spark's own loud error surfaces, never a
  * silently-current read.
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
    }
}
