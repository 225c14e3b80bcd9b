package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike,
  ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
  BroadcastNestedLoopJoinExec, CartesianProductExec,
  ShuffledHashJoinExec, SortMergeJoinExec}

/** Structured report over a physical plan — the questions every
  * 100 TB review asks of a query, as data instead of eyeballing
  * `.explain` text: how many shuffles, did a join degrade to a
  * nested loop, did the filters reach the scan, how much of the plan
  * runs inside whole-stage codegen. `PlanSpec`-style assertions and
  * ad-hoc triage both build on this.
  */
final case class PlanReport(
    shuffles: Int,
    broadcastHashJoins: Int,
    shuffledHashJoins: Int,
    sortMergeJoins: Int,
    nestedLoopJoins: Int,
    cartesianProducts: Int,
    generates: Int,
    scans: Int,
    /** Scans whose parquet/orc reader received ≥1 pushed filter. */
    scansWithPushedFilters: Int,
    /** Physical operators inside a WholeStageCodegen stage. */
    codegenOperators: Int,
    /** Physical operators total (excluding exchanges/reuse wrappers). */
    operators: Int) {

  /** No nested-loop/cartesian anywhere — the first scale gate. */
  def noNestedLoops: Boolean = nestedLoopJoins == 0 && cartesianProducts == 0

  /** Fraction of operators running inside whole-stage codegen. */
  def codegenCoverage: Double =
    if (operators == 0) 1.0 else codegenOperators.toDouble / operators

  def summary: String =
    s"shuffles=$shuffles bhj=$broadcastHashJoins shj=$shuffledHashJoins " +
      s"smj=$sortMergeJoins bnlj=$nestedLoopJoins cart=$cartesianProducts " +
      s"generates=$generates scans=$scans pushed=$scansWithPushedFilters " +
      f"codegen=${codegenCoverage * 100}%.0f%%"
}

object PlanAudit {

  /** Audit the FINAL physical plan. AQE-materialized stages (incl.
    * their WholeStageCodegen roots) are descended into; on an
    * UN-executed AQE plan the report covers the initial shape, same
    * as `.explain` — so `codegenCoverage` reads 0 until the query's
    * own QueryExecution has run (`df.queryExecution.toRdd.count()`;
    * note `df.count()` builds a different QueryExecution).
    */
  def audit(df: DataFrame): PlanReport = {
    val nodes = collectNodes(df.queryExecution.executedPlan)
    // operators genuinely inside a codegen stage: descend from each
    // WholeStageCodegen root but STOP at InputAdapter — its subtree
    // has left the generated function
    def codegenCount(p: SparkPlan): Int = p match {
      case _: InputAdapter => 0
      case other => 1 + other.children.map(codegenCount).sum
    }
    val inCodegen = nodes.collect {
      case w: WholeStageCodegenExec => codegenCount(w.child)
    }.sum
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    PlanReport(
      shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike]),
      broadcastHashJoins =
        nodes.count(_.isInstanceOf[BroadcastHashJoinExec]),
      shuffledHashJoins = nodes.count(_.isInstanceOf[ShuffledHashJoinExec]),
      sortMergeJoins = nodes.count(_.isInstanceOf[SortMergeJoinExec]),
      nestedLoopJoins =
        nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      cartesianProducts = nodes.count(_.isInstanceOf[CartesianProductExec]),
      generates = nodes.count(_.isInstanceOf[GenerateExec]),
      scans = scans.size,
      scansWithPushedFilters = scans.count(_.metadata
        .get("PushedFilters").exists(v => v.nonEmpty && v != "[]")),
      codegenOperators = inCodegen,
      operators = nodes.count {
        case _: WholeStageCodegenExec | _: InputAdapter => false
        // exchanges / reuse wrappers are plan plumbing, never inside a
        // codegen stage — counting them would deflate codegenCoverage
        // relative to its documented "fraction of operators" meaning.
        // (QueryStageExec never appears here: collectNodes unwraps it
        // into q.plan and drops the wrapper itself.)
        case _: ShuffleExchangeLike | _: BroadcastExchangeLike => false
        case _: ReusedExchangeExec => false
        case _ => true
      })
  }

  /** Every SparkPlan node, descending through AQE wrappers and
    * whole-stage codegen boundaries (which `collect` alone respects —
    * AdaptiveSparkPlanExec's current plan is a separate tree).
    */
  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
      // materialized AQE stages are LEAF wrappers — the real subtree
      // (incl. its WholeStageCodegen roots) hangs off q.plan
      case q: QueryStageExec => collectNodes(q.plan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectNodes) ++
      p.subqueries.flatMap(collectNodes)
  }
}
