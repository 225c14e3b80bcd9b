package graft.gateway

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Session extensions that make PUBLISHED warehouse tables resolve by
  * BARE NAME in every session of the JVM — including the fresh
  * `newSession()` each HiveServer2 Thrift connection gets (real HS2
  * semantics: per-connection temp views and conf, shared catalog).
  *
  * Mechanism: `PipelineRunner` publishes each table as a GLOBAL temp
  * view (cross-session by construction, but normally addressable only
  * as `global_temp.<name>`); the [[GlobalViewFallback]] resolution
  * rule injected here rewrites a still-unresolved single-part relation
  * `name` to `global_temp.name` when — and only when — nothing in the
  * session shadows it. Precedence mirrors the session's own lookup
  * order, so HS2 shadowing semantics hold: a connection-local temp
  * view wins, then a catalog table in the current database, then the
  * published global view.
  *
  * Install at build time on the HOST session (extensions propagate to
  * every `newSession()`, which is exactly what makes the Thrift
  * sessions see it):
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.gateway.GraftSqlExtensions")
  * }}}
  *
  * The reference's dbt-spark clients connect over PyHive/Thrift and
  * SELECT published models by bare name (`dbtoperator.py:274`); this
  * is the piece that keeps that working with per-connection session
  * isolation.
  *
  * Scale notes: the rule is pure name-resolution — three O(1) catalog
  * lookups per UNRESOLVED single-part relation, no plan duplication
  * (the rewritten relation resolves through Spark's own view
  * machinery, sharing the analyzed global view plan).
  */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(GlobalViewFallback)
    // MERGE INTO <published relation> routed into the engine's merge
    // machinery (dbt-spark's `merge` incremental strategy arrives as
    // exactly this SQL over Thrift) — see MergeInto.scala
    ext.injectResolutionRule(MergeIntoRoute)
    // UPDATE / DELETE FROM on routed relations (post-image upsert /
    // deletion-vector delete) — see DmlRoute.scala
    ext.injectResolutionRule(DmlRoute)
    // SELECT ... VERSION AS OF on routed relations (engine snapshot
    // readers) — see TimeTravelRoute.scala
    ext.injectResolutionRule(TimeTravelRoute)
    // ALTER TABLE ... ADD COLUMNS on routed relations (the engine's
    // schema evolution; dbt's on_schema_change=append_new_columns
    // wire statement) — see SchemaDdlRoute.scala
    ext.injectResolutionRule(SchemaDdlRoute)
    // CREATE OR REPLACE TABLE ... USING delta|iceberg AS — a PARSER
    // wrapper, because the session catalog's own ResolveSessionCatalog
    // throws the v2-only error before any custom RESOLUTION rule could
    // fire, and Hive sessions drop custom HINT rules — see
    // ReplaceTableRoute.scala
    ext.injectParser((session, delegate) =>
      GraftSqlParser(session, delegate))
    // CREATE TABLE ... USING delta|iceberg PARTITIONED BY (...) AS —
    // Spark's SQL CTAS path never hands a v1 source the partition
    // columns; this re-encodes them as the __partition_columns option
    // the writable sources decode — see CtasPartitioningRoute.scala
    ext.injectPostHocResolutionRule(CtasPartitioningRoute)
  }
}

/** See [[GraftSqlExtensions]]. Runs in the analyzer's resolution
  * fixed point: by the time it fires, `ResolveRelations` has already
  * declined the name (else the node would be resolved), so the
  * shadow checks only guard against resolution racing in the same
  * batch iteration.
  */
case class GlobalViewFallback(session: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val catalog = session.sessionState.catalog
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.size == 1 &&
          catalog.getGlobalTempView(u.multipartIdentifier.head).isDefined &&
          catalog.getTempView(u.multipartIdentifier.head).isEmpty &&
          !catalog.tableExists(TableIdentifier(u.multipartIdentifier.head)) =>
        u.copy(multipartIdentifier =
          Seq(catalog.globalTempDatabase, u.multipartIdentifier.head))
      // schema namespaces: a published `schema.identifier` relation is
      // a global temp view under the runner's mangled name (view names
      // cannot contain dots). A two-part name that is NOT a real
      // catalog database/table and NOT global_temp itself resolves to
      // it — so Thrift clients SELECT ... FROM sales.orders while a
      // real database of the same name still wins (HS2 precedence).
      case u: UnresolvedRelation if u.multipartIdentifier.size == 2 &&
          u.multipartIdentifier.head != catalog.globalTempDatabase && {
            val Seq(db, t) = u.multipartIdentifier
            val mangled = s"graft_ns__${db}__$t"
            catalog.getGlobalTempView(mangled).isDefined &&
              !catalog.databaseExists(db)
          } =>
        u.copy(multipartIdentifier = Seq(catalog.globalTempDatabase,
          s"graft_ns__${u.multipartIdentifier.head}__${u.multipartIdentifier(1)}"))
    }
  }
}
