package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Link-graph centrality — the seed-quality signal web-corpus
  * pipelines compute before crawling/filtering (Common Crawl
  * publishes exactly this: host-level PageRank/harmonic centrality
  * used to rank domains for crawl priority and corpus weighting).
  *
  * Spark-first power iteration (the GraphX/Pregel shape expressed
  * relationally): each round is one (src) join to attach ranks to
  * edges + one (dst) hash-agg of contributions — a few exchanges per
  * iteration in ONE linear plan (each round executes exactly once in
  * the final action), lineage cut every few rounds purely to bound
  * planner depth on long runs.
  *
  * ALL arithmetic is exact BIGINT math — ranks live in 1e-9 units,
  * every division is an explicit floor (`div` in Spark ≡ `//` in
  * DuckDB on non-negatives) at a pinned point in the formula — so a
  * fixed-iteration run replays bit-for-bit in the oracle (unrolled
  * CTE layers) and across engines/cluster sizes. Float PageRank sums
  * in nondeterministic order; this one cannot.
  */
object Graphs {

  /** PageRank over `edges` (`src`, `dst` string columns; parallel
    * edges collapse via distinct). Returns (node, rank_q) with
    * rank_q in 1e-9 units after `iters` rounds of
    *
    *   contrib(u→v) = rank_q(u) div outdeg(u)
    *   rank_q'(v)   = (dampDen−dampNum)·1e9 div (dampDen·N)
    *                  + (dampNum · Σ contrib) div dampDen
    *
    * Dangling nodes (no out-edges) leak their damped mass — the
    * standard simplification; ordering (what seed-ranking consumes)
    * is unaffected for connected graphs, and the teleport floor
    * keeps every node strictly positive.
    *
    * 100 TB shape: `distinct` + out-degree are one-time shuffles on
    * the edge list; each iteration re-shuffles only (rank rows ⋈
    * edges) on src and contributions on dst — no global collect, no
    * driver-sized state. The rank lineage is linear, so every stage
    * runs once; `localCheckpoint` every 4 rounds bounds planner
    * depth (and codegen size) without paying a materialization job
    * per iteration.
    */
  def pageRank(edges: DataFrame, iters: Int,
               dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 0, s"iters must be non-negative: $iters")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must be in (0,1): $dampNum/$dampDen")
    val e = edges
      .select(col("src").cast(StringType), col("dst").cast(StringType))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(eager = false)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ewd = e.join(outdeg, "src").localCheckpoint(eager = false) // (src, dst, deg)
    val teleport = (dampDen - dampNum) * 1000000000L / (dampDen * n)
    var ranks = nodes.withColumn("rq", lit(1000000000L / n))
    for (i <- 0 until iters) {
      val contribs = ewd
        .join(ranks, ewd("src") === ranks("node"))
        .select(col("dst"), expr("rq div deg").as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("t"))
      ranks = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .select(nodes("node"),
          (lit(teleport) +
            expr(s"($dampNum * coalesce(t, 0)) div $dampDen")).as("rq"))
      // the rank lineage is LINEAR (each round's plan is consumed by
      // exactly one successor, so every stage executes once in the
      // final action) — checkpointing every round only adds a
      // materialization job per iteration. Cut lineage every few
      // rounds instead, purely to bound planner depth on long runs.
      if ((i + 1) % 4 == 0 && i != iters - 1)
        ranks = ranks.localCheckpoint(eager = false)
    }
    ranks
  }
}
