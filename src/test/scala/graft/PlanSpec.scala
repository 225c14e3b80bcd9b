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

  test("microbatch window filter pushes into the parquet scan") {
    // the exact predicate shape runMicrobatch puts on event-time
    // inputs: to_timestamp of a literal folds to a constant, so both
    // bounds must reach the scan as pushed filters — this is what
    // makes a window's input read O(window) on time-sorted storage
    import org.apache.spark.sql.functions._
    val p = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderdate") >=
          to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1997-02-01 00:00:00")))
      .queryExecution.executedPlan.toString
    val pushed = p.split("PushedFilters: ").last.takeWhile(_ != ']')
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate") &&
      pushed.contains("LessThan(o_orderdate"),
      s"window bounds not pushed: $pushed")
  }

  test("join_theta_range avoids BroadcastNestedLoopJoin") {
    val p = plan("join_theta_range")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("join_bucketed joins bucket-aligned scans with no exchange") {
    // AQE wraps the plan; disable it so the join subtree is
    // inspectable. Disable auto-broadcast too: at test scale the dim
    // is broadcastable (and Catalyst rightly prefers that), but the
    // point here is the bucket-aligned SMJ shape a 100 TB fact-fact
    // join would take.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("join_bucketed")(spark, sf)
      val plan = df.queryExecution.executedPlan
      val smj = plan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.isDefined, s"no SortMergeJoin in:\n${plan.toString.take(2000)}")
      val exchanges = smj.get.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join still shuffles: ${exchanges.map(_.nodeName)}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("partitioned reads prune to the filtered partitions") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/root/repo/target"),
        "prune").toString
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val df = spark.read.parquet(out).filter(col("event_type") === "click")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: ["), p.take(2000))
    val pf = p.split("PartitionFilters: ").last.takeWhile(_ != ']')
    assert(pf.contains("event_type"), s"no partition pruning: $pf")
  }

  test("dynamic partition pruning: a dim-filtered join prunes the " +
      "partitioned fact scan at runtime") {
    // The 100 TB shape: fact partitioned on the join key, selective
    // dim filter — Spark injects a dynamicpruning subquery into the
    // fact scan's partition filters so only matching partitions are
    // read. Broadcast reuse makes the pruning subquery free.
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("/root/repo/target"),
        "dpp").toString
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val fact = spark.read.parquet(out)
    val dimPath = s"$out/_dim"
    spark.createDataFrame(Seq(
      ("click", "interactive"), ("view", "interactive"),
      ("error", "ops"), ("purchase", "revenue"), ("signup", "growth")))
      .toDF("event_type", "family")
      .write.mode("overwrite").parquet(dimPath)
    // the dim filter must survive as a Filter over a scan (a folded
    // LocalRelation carries no selective predicate for DPP to use)
    val dim = spark.read.parquet(dimPath)
      .filter(col("family") === "revenue")
    val p = fact.join(dim, "event_type").groupBy("family").count()
      .queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning") ||
      p.contains("DynamicPruning"), p.take(3000))
  }

  test("AQE splits a skewed join partition at runtime (skew=true in " +
      "the final plan)") {
    // The 100 TB reality: one hot key (the empty referer, the
    // boilerplate doc) concentrates a shuffle partition; AQE's skew
    // join splits it into subpartitions at runtime. Thresholds are
    // lowered so the same decision is observable on local data.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "30KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      import spark.implicits._
      // 50k rows, 90% on one hot key vs a uniform right side
      val left = spark.range(50000)
        .select((when(col("id") % 10 =!= 0, 7L)
          .otherwise(col("id") % 100)).as("k"),
          col("id").as("payload"))
      val right = spark.range(100).select(col("id").as("k"),
        (col("id") * 2).as("attr"))
      // global agg downstream: a keyed agg on k would REUSE the join
      // partitioning and AQE would decline to split the skew (it
      // never adds an exchange unless forceOptimizeSkewedJoin)
      val joined = left.join(right, "k").agg(sum(col("payload")).as("s"))
      joined.collect() // run so AQE finalizes with real sizes
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p.take(2000))
      assert(p.contains("skew=true"), p.take(4000))
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("win_ntile_approx plans no window operator (no global sort-by-value)") {
    // the whole point of the approx form: bucketing is a broadcast
    // compare, not a single-task WindowExec over a global ORDER BY
    // (the trailing output orderBy on the unique key is verify-protocol
    // determinism, not part of the bucketing)
    val df = SparkEntry.queries("win_ntile_approx")(spark, sf)
    val win = df.queryExecution.executedPlan.collectFirst {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(win.isEmpty, "approx ntile must not plan a WindowExec")
  }

  test("llm_exact_dedup aggregates with a map-side partial") {
    val p = plan("llm_exact_dedup")
    // partial + final HashAggregate = two occurrences
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("llm_vocab_coverage takes top-100 via TakeOrdered; only the " +
      "100-row tail sees a window") {
    val p = plan("llm_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    // the global total joins back by broadcast, never a shuffle join
    assert(p.contains("Broadcast"), p.take(2000))
  }

  test("llm_knn_classify broadcasts query vectors and the top-k frame " +
      "(corpus is never shuffle-joined)") {
    val p = plan("llm_knn_classify")
    assert(p.contains("Broadcast"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("llm_domain_mix aggregates with map-side partials and joins " +
      "nothing (single corpus scan)") {
    val p = plan("llm_domain_mix")
    // partial + final HashAggregate; the global total is a window
    // over the already-aggregated #sources-row frame, not a second
    // scan or a join
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
    assert("FileScan|Scan parquet".r.findAllIn(p).size <= 1,
      p.take(2000))
  }

  test("lineDedup and dupSpans move the corpus through exactly two " +
      "exchanges (no join-back, island agg reuses the doc exchange)") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = Tables.documents(spark, sf)
      for ((name, df) <- Seq(
          "lineDedup" -> graft.operators.Dedup
            .lineDedup(docs, "doc_id", "text", sepRegex = " "),
          "dupSpans" -> graft.operators.Dedup
            .dupSpans(docs, "doc_id", "text", n = 8))) {
        val plan = df.queryExecution.executedPlan
        val exchanges = plan.collect {
          case e: org.apache.spark.sql.execution.exchange.Exchange => e
        }
        assert(exchanges.size == 2,
          s"$name: ${exchanges.size} exchanges\n${plan.toString.take(3000)}")
        assert(!plan.toString.contains("Join"),
          s"$name joins back:\n${plan.toString.take(3000)}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("llm_ngram_topk and llm_zipf_fit take their top-k via " +
      "TakeOrdered — no global sort of the vocabulary/gram frame") {
    for (key <- Seq("llm_ngram_topk", "llm_zipf_fit")) {
      val p = plan(key)
      assert(p.contains("TakeOrderedAndProject"), s"$key: ${p.take(2000)}")
    }
  }

  test("agg_hll_partial: both aggregation levels run partial-then-" +
      "final (map-side sketch partials, no raw-key reshuffle)") {
    val p = plan("agg_hll_partial")
    assert(p.contains("hll_sketch_agg"), p.take(3000))
    assert(p.contains("hll_union_agg"), p.take(3000))
    // the sketch table is months×flags rows; the union agg must
    // consume sketches, never re-scan lineitem — exactly one scan
    assert("FileScan|Scan parquet".r.findAllIn(p).size <= 1, p.take(3000))
  }

  test("llm_curation_report aggregates the corpus in a single scan " +
      "(count distinct expands inside the one hash-agg)") {
    val p = plan("llm_curation_report")
    assert("FileScan|Scan parquet".r.findAllIn(p).size <= 1, p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
  }

  test("events.ts filter pushes into the parquet scan through the " +
      "NTZ normalization cast") {
    // only the timestamp fixture variants can push — when a round
    // generates ts as raw nanosecond longs, Tables.events wraps it in
    // arithmetic no filter can push through (by design)
    val raw = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    assume(raw != org.apache.spark.sql.types.LongType,
      "ns-as-long fixture variant: pushdown through the µs arithmetic " +
        "is impossible by construction")
    val df = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("ts") >=
        org.apache.spark.sql.functions.lit("1995-06-01").cast("timestamp"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual"),
      p.take(2000))
  }

  test("llm_decontaminate_semantic broadcasts the benchmark side — " +
      "the corpus is never shuffled for the pair scoring") {
    val p = plan("llm_decontaminate_semantic")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("llm_repetition_ngram scans the corpus once (both gram sizes " +
      "ride one explode, no self-join)") {
    val p = plan("llm_repetition_ngram")
    assert(!p.contains("Join"), p.take(2000))
    assert("FileScan|Scan parquet".r.findAllIn(p).size <= 1, p.take(2000))
  }

  test("llm_bpe_pairs: map-only pair explode after the one wordFreq " +
      "shuffle; both aggs run partial-then-final, top-k via TakeOrdered") {
    val p = plan("llm_bpe_pairs")
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert("partial_count|partial_sum|HashAggregate".r.findAllIn(p)
      .nonEmpty, p.take(2000))
    // no window, no global sort anywhere
    assert(!p.contains("Window"), p.take(2000))
  }

  test("mm_shard_pack: the per-writer layout window is the only " +
      "exchange — routing stays in the scan stage, no global sort") {
    val p = plan("mm_shard_pack")
    assert(p.contains("Window"), p.take(2000))
    // one hashpartitioning exchange for the window; the trailing
    // orderBy is the oracle determinism sort, rangepartitioned
    val hashEx = "hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx\n" +
      p.take(3000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("runtime bloom-filter join pruning injects on a selective dim " +
      "join once scan thresholds reflect cluster scale") {
    // At 100 TB the lineitem side is far over the 10 GiB
    // application-side threshold and Spark injects a bloom filter
    // built from the filtered orders keys into the big-side scan —
    // the runtime row-group pruning this engine relies on for
    // selective dim joins. Local data is tiny, so lower the
    // thresholds to make the same decision observable here.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val ord = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val p = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
        .queryExecution.executedPlan.toString
      assert(p.contains("might_contain") &&
        p.contains("bloom_filter_agg"), p.take(3000))
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("join_bloom_prefilter: the membership test filters the fact " +
      "side BEFORE the join; the join itself is a broadcast hash join") {
    val p = plan("join_bloom_prefilter")
    assert(p.contains("graft_bloom_might_contain"), p.take(3000))
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      p.take(3000))
    // the prefilter must sit under the join (fact-scan side), not above
    val joinIdx = p.indexOf("BroadcastHashJoin")
    val bloomIdx = p.indexOf("graft_bloom_might_contain")
    assert(bloomIdx > joinIdx,
      "bloom membership test should be in the join's child (printed " +
        "below the join operator), filtering rows before the probe")
  }

  test("join_interval_auto_banded: the optimizer rule turns the naive " +
      "inequality join into a banded hash equi-join (no BNLJ)") {
    val p = plan("join_interval_auto_banded")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
    assert("Generate explode".r.findAllIn(p).size == 2, p.take(3000))
  }

  test("join_point_in_range: hash equi-join on bucket, never a " +
      "nested loop; the point side has no generator") {
    val p = plan("join_point_in_range")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("Join") || p.contains("HashJoin"), p.take(3000))
    // exactly ONE explode (the interval side); the point side is
    // map-only — a second generator would mean points replicated too
    assert("Generate explode".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("llm_ann_filtered: the metadata predicate pushes into the " +
      "corpus parquet scan — filtered rows are never scored") {
    val p = plan("llm_ann_filtered")
    assert(p.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)]")
      || p.contains("EqualTo(label,3)"), p.take(3000))
  }

  test("win_funnel: all three stage windows and the per-user agg share " +
      "one (user_id) exchange — no event-log self-join") {
    val p = plan("win_funnel")
    assert(!p.contains("Join"), p.take(3000))
    val hashEx = "hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx\n" +
      p.take(3000))
  }

  test("llm_perplexity_bigram: bigram derivation is map-only (no " +
      "window, no positional self-join of the corpus)") {
    val p = plan("llm_perplexity_bigram")
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // |V| rides a broadcast, never a driver collect re-plan
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(3000))
  }

  test("llm_langid_ngram: the language profiles broadcast to the " +
      "classify side (the corpus is never shuffle-joined to them)") {
    val p = plan("llm_langid_ngram")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("llm_url_filter: the blocklist broadcasts; no sort-merge join") {
    val p = plan("llm_url_filter")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("llm_hard_negatives: query side broadcasts; corpus side is " +
      "never sort-merge-joined") {
    val p = plan("llm_hard_negatives")
    assert(p.contains("Broadcast"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("llm_temperature_mix: single corpus scan, no join, " +
      "partial+final aggregation") {
    val p = plan("llm_temperature_mix")
    assert(!p.contains("Join"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
    assert("FileScan|Scan parquet".r.findAllIn(p).size <= 1, p.take(3000))
  }

  test("llm_cardinality_sketch: sketch aggregation runs " +
      "partial-then-merge (ObjectHashAggregate at both levels)") {
    val p = plan("llm_cardinality_sketch")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("win_fill_forward: the fill window and null synthesis share " +
      "one (user_id) exchange — no self-join") {
    val p = plan("win_fill_forward")
    assert(!p.contains("Join"), p.take(3000))
    val hashEx = "hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx\n" +
      p.take(3000))
  }

  test("join_interval_overlap plans a hash equi-join on bucket id — " +
      "never a nested-loop over the inequality") {
    val p = plan("join_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // the join must key on the synthesized bucket column — a real
    // equi-join, not a residual-only comparison
    assert(("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) " +
      "\\[bucket").r.findFirstIn(p).isDefined, p.take(3000))
  }

  test("q_shipping_priority: customer broadcasts, both fact filters " +
      "push to their scans, top-10 is a TakeOrderedAndProject") {
    val p = plan("q_shipping_priority")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    // the date filters must reach parquet on BOTH fact sides
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined,
      p.take(3000))
    assert("PushedFilters: \\[[^\\]]*o_orderdate".r.findFirstIn(p).isDefined,
      p.take(3000))
  }

  test("q_local_supplier_volume: region/nation ride broadcasts — " +
      "no sort-merge join against a tiny dim") {
    val p = plan("q_local_supplier_volume")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p.take(3000))
    assert("PushedFilters: \\[[^\\]]*o_orderdate".r.findFirstIn(p).isDefined,
      p.take(3000))
  }
}
