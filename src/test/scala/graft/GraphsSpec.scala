package graft

import graft.operators.Graphs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank power iteration: exact-integer invariants on hand-checked
  * graphs (the llm_pagerank key's oracle replays the full run; these
  * pin the operator's semantics independently of the key's edge
  * synthesis).
  */
class GraphsSpec extends AnyFunSuite with SparkTestBase {

  private def ranks(edges: Seq[(String, String)], iters: Int) = {
    import spark.implicits._
    Graphs.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("symmetric cycle: all nodes equal at every iteration") {
    val cycle = Seq("a" -> "b", "b" -> "c", "c" -> "a")
    for (it <- 0 to 3) {
      val r = ranks(cycle, it)
      assert(r.values.toSet.size == 1, s"iter $it: $r")
      assert(r.values.head > 0)
    }
  }

  test("star graph: the sink outranks the spokes; mass never grows") {
    val star = Seq("a" -> "z", "b" -> "z", "c" -> "z", "z" -> "a")
    val r = ranks(star, 3)
    assert(r("z") > r("a") && r("z") > r("b") && r("z") > r("c"),
      s"hub must dominate: $r")
    // floors only ever drop mass: total stays <= the initial 1e9
    assert(r.values.sum <= 1000000000L, s"mass grew: ${r.values.sum}")
  }

  test("parallel edges collapse; deterministic across runs") {
    val multi = Seq("a" -> "b", "a" -> "b", "a" -> "b", "b" -> "a",
      "a" -> "c", "c" -> "a")
    val once = ranks(multi, 3)
    val dedup = ranks(multi.distinct, 3)
    assert(once == dedup, "parallel edges must not add weight")
    assert(once == ranks(multi, 3), "must be deterministic")
    // a has 2 out-neighbors and 2 in-edges; b and c are symmetric
    assert(once("b") == once("c"), s"symmetric spokes must tie: $once")
    assert(once("a") > once("b"), s"the hub collects both spokes: $once")
  }
}
