package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY §5.1): the promises the scaladocs
  * make about 100 TB behavior — broadcast joins actually broadcast,
  * parquet scans actually receive pushed filters, top-k is a driver
  * merge not a global sort, theta-range stays a hash join.
  */
class PlanSpec extends AnyFunSuite with SparkTestBase {

  private def plan(key: String): String =
    SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan.toString

  test("join_broadcast plans BroadcastHashJoin for both dims") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"))
  }

  test("filter_pred pushes predicates into the parquet scan") {
    val p = plan("filter_pred")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    val pushed = p.split("PushedFilters: ").last.takeWhile(_ != ']')
    assert(pushed.trim.nonEmpty && pushed != "[",
      s"no filters pushed: $pushed")
  }

  test("scan_parquet prunes columns (ReadSchema is a subset)") {
    val p = plan("project_select")
    assert(p.contains("ReadSchema"), p.take(2000))
    // projection touches a handful of columns; the 16-col lineitem
    // schema must not be read whole
    val readSchema = p.split("ReadSchema: ").last.split("\n").head
    assert(!readSchema.contains("l_comment"),
      s"unpruned scan: $readSchema")
  }

  test("limit_topk plans TakeOrderedAndProject, not a global sort") {
    val p = plan("limit_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("join_theta_range avoids BroadcastNestedLoopJoin") {
    val p = plan("join_theta_range")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("llm_exact_dedup aggregates with a map-side partial") {
    val p = plan("llm_exact_dedup")
    // partial + final HashAggregate = two occurrences
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }
}
