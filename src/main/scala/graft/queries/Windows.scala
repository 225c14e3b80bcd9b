package graft.queries

import graft.{QueryGroup, Tables}
import graft.Tables.{dec2, asDouble}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.5 window functions. All partitions key on user_id /
  * custkey — at 100 TB the window shuffle is one exchange on the
  * partition key; frames never buffer more than a partition.
  * Running/moving sums use DECIMAL so frame accumulation order
  * (incremental in Spark, segment-tree in DuckDB) cannot change the
  * result.
  */
object Windows extends QueryGroup {

  /** THE entry point for global quantile bucketing — callers choose the
    * tier explicitly.
    *
    * - `exact = false` (DEFAULT, the one-pass 100 TB path): bucket
    *   boundaries from `approx_percentile` (mergeable sketch), then a
    *   map-only broadcast compare — every stage fully parallel.
    *   Disagreement with the exact form is confined to rows within
    *   sketch error of a boundary; ApproxAndSampleSpec pins ≥95 %
    *   row agreement and exact bucket counts within ±accuracy.
    * - `exact = true`: EXACT global ntile, still distributed — a
    *   range-partitioned sort plus a per-partition offset pass (see
    *   [[globalRankExact]]); no single-task window anywhere.
    *
    * Ties: the approx form assigns equal values to the same bucket
    * (boundary compare), where exact ntile splits them by row
    * position — the only systematic divergence between tiers.
    *
    * Returns `df` + an integer `bucket` column in [1, n].
    */
  def globalNtile(df: DataFrame, valueCol: String, n: Int,
                  exact: Boolean = false,
                  accuracy: Int = 10000): DataFrame = {
    require(n >= 2, "n must be >= 2")
    if (exact) {
      globalRankExact(df, valueCol, Nil, n)
        .drop("pr", "cd")
    } else {
      val ps = (1 until n).map(_.toDouble / n).mkString(", ")
      val bounds = df.agg(
        expr(s"approx_percentile($valueCol, array($ps), $accuracy)").as("bs"))
      df.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          lit(1) + (0 until n - 1).map(i =>
            when(col(valueCol) > col("bs")(i), 1).otherwise(0)).reduce(_ + _))
        .drop("bs")
    }
  }

  /** EXACT global `ntile` / `percent_rank` / `cume_dist` WITHOUT the
    * single-task global window: semantically identical to
    * `ntile(n) OVER (ORDER BY value[, ties...])`,
    * `percent_rank()/cume_dist() OVER (ORDER BY value)`, but every
    * stage is distributed — the 100 TB form of an exact global rank.
    *
    * Mechanism (the classic scalable global row-number):
    *  1. range-repartition + in-partition sort on (value, ties) — a
    *     total order spread over P partitions;
    *  2. `localCheckpoint` pins the sorted data so the two passes
    *     below see identical row order (and the lineage isn't
    *     recomputed per pass);
    *  3. per-partition row COUNTS (a P-sized array on the driver) →
    *     prefix-sum offsets;
    *  4. a map-only pass attaches the exact global 0-based index.
    * `ntile` follows SQL semantics (first N%n buckets get the extra
    * row) computed arithmetically from (index, N). `percent_rank` =
    * first-index(value)/(N-1) and `cume_dist` =
    * (last-index(value)+1)/N share ranks across ties like the SQL
    * functions — computed by a per-VALUE min/max aggregation joined
    * back, one extra shuffle on value.
    *
    * Cost vs the window form: one range exchange + checkpoint write +
    * two passes + one value-shuffle — all O(rows/P) per task, where
    * the window form is O(rows) on ONE task (a non-starter past one
    * executor's memory).
    */
  /** Attach an exact 0-based global index over `sortCols` order,
    * distributed: range-repartition + in-partition sort (a total
    * order spread over P partitions), `localCheckpoint` so both
    * passes see identical row order, per-partition counts →
    * prefix-sum offsets (a P-sized driver array), then a map-only
    * index pass. Returns (df + `__gidx` long column, total rows).
    */
  private def attachGlobalIndex(df: DataFrame,
      sortCols: Seq[String]): (DataFrame, Long) = {
    import org.apache.spark.sql.Row
    val spark = df.sparkSession
    val cols = sortCols.map(col)
    // Scale-ADAPTIVE range-partition count: derived from the
    // optimizer's size estimate (bytes / target-partition-bytes), not
    // the core count. At sf0.1 the old `defaultParallelism` policy
    // built 32 near-empty sorted partitions and paid 32× the
    // per-partition fixed costs (range sampling, sort, checkpoint
    // block, one count task + one index task each) for ~150k rows —
    // the 8-core driver run beat the 32-core run on this key. Bytes
    // grow with data, so 100 TB gets the many partitions it needs
    // regardless of core count. Clamped to [1, 4×parallelism] so a
    // Catalyst default estimate (huge for un-stat'd plans) cannot
    // explode the partition count; overridable per session for real
    // clusters via graft.globalIndex.targetPartitionBytes.
    // CALIBRATION: the estimate is COMPRESSED, COLUMN-PRUNED bytes
    // (measured ~5 B/row for a 2-column parquet projection — 10-20×
    // smaller than the rows' in-memory sort footprint), so the target
    // is deliberately small: 2 MB estimated ≈ a few hundred thousand
    // rows ≈ tens of MB in a sort task. The first 64 MB default
    // collapsed the sf1 soak's 1.5 M rows into ONE sort task (0.56×).
    val targetBytes = spark.conf.getOption(
      "graft.globalIndex.targetPartitionBytes").map(_.toLong)
      .getOrElse(2L << 20)
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val byData = (estBytes + targetBytes - 1) / targetBytes
    val maxParts = math.max(spark.sparkContext.defaultParallelism * 4, 1)
    val parts = byData.min(maxParts).max(1).toInt
    val sorted = df.repartitionByRange(parts, cols: _*)
      .sortWithinPartitions(cols: _*)
      .localCheckpoint(eager = false)
    val counts = sorted.rdd
      .mapPartitions(it => Iterator(it.size.toLong), true).collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val withIdx = sorted.rdd.mapPartitionsWithIndex({ (pi, it) =>
      var i = offsets(pi)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ i); i += 1; out }
    }, true)
    (spark.createDataFrame(withIdx, sorted.schema.add("__gidx", LongType)),
      offsets.last)
  }

  /** Exact per-GROUP rank over `valueCol` order WITHOUT a per-group
    * window: the grouped analogue of [[globalRankExact]]. A per-group
    * window task buffers its whole group (a skewed group at 100 TB is
    * one giant task); here the sort is range-partitioned over
    * (group, value) so a huge group spreads across many tasks.
    * Returns df + `__w` (1-based rank in group, ties in checkpointed
    * order) + `__m` (group size) — enough for exact medians,
    * quantiles, top-k.
    */
  def groupedRankExact(df: DataFrame, by: Seq[String],
      valueCol: String): DataFrame = {
    val (idxDf, _) = attachGlobalIndex(df, by :+ valueCol)
    // null-safe group equality: a NULL group key is a group like any
    // other (groupBy semantics) — a plain === join would drop it
    val g = idxDf.groupBy(by.map(col): _*)
      .agg(min("__gidx").as("__mn"), count(lit(1)).as("__m"))
      .select(by.map(c => col(c).as(s"__g_$c")) :+
        col("__mn") :+ col("__m"): _*)
    idxDf.join(g, by.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _))
      .withColumn("__w", col("__gidx") - col("__mn") + 1)
      .drop(by.map(c => s"__g_$c") :+ "__gidx" :+ "__mn": _*)
  }

  def globalRankExact(df: DataFrame, valueCol: String,
      tieCols: Seq[String], n: Int): DataFrame = {
    val (idxDf, total) = attachGlobalIndex(df, valueCol +: tieCols)
    // SQL NTILE: base = N/n rows per bucket, the first N%n buckets
    // take one extra
    val base = lit(total / n)
    val rem = lit(total % n)
    val idx = col("__gidx")
    val bucket =
      when(idx < rem * (base + 1), (idx / (base + 1)).cast(IntegerType) + 1)
        .otherwise(
          (rem + (idx - rem * (base + 1)) / base).cast(IntegerType) + 1)
    // ties share percent_rank/cume_dist: per-VALUE first/last index.
    // Null-safe equality — NULL values sort first and rank like any
    // other tie group; a plain === join would drop them
    val byValue = idxDf.groupBy(col(valueCol).as("__v"))
      .agg(min("__gidx").as("__mn"), max("__gidx").as("__mx"))
    val pr =
      if (total <= 1L) lit(0.0)
      else col("__mn").cast(DoubleType) / lit((total - 1).toDouble)
    idxDf
      .join(byValue, idxDf(valueCol) <=> col("__v"))
      .withColumn("bucket", bucket)
      .withColumn("pr", pr)
      .withColumn("cd",
        (col("__mx") + 1).cast(DoubleType) / lit(total.toDouble))
      .drop("__v", "__mn", "__mx", "__gidx")
  }

  override def queries: Map[String, Q] = Map(
    "win_rank" -> ((s, d) => {
      val byVal = Window.partitionBy("user_id").orderBy(col("value").desc)
      val total = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, d).select(
        col("event_id"), col("user_id"), col("value"),
        row_number().over(total).as("rn"),
        rank().over(byVal).as("rnk"),
        dense_rank().over(byVal).as("drnk"))
        .orderBy("event_id")
    }),

    "win_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d).select(
        col("event_id"),
        lag(col("event_id"), 1).over(w).as("prev_id"),
        lead(col("event_id"), 1).over(w).as("next_id"),
        (col("value") - lag(col("value"), 1).over(w)).as("dv"))
        .orderBy("event_id")
    }),

    "win_running" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, 0)
      val last4 = w.rowsBetween(-3, 0)
      Tables.events(s, d).select(
        col("event_id"),
        asDouble(sum(dec2(col("value"))).over(run)).as("run_sum"),
        (asDouble(sum(dec2(col("value"))).over(last4)) /
          count(lit(1)).over(last4)).as("mov_avg"))
        .orderBy("event_id")
    }),

    // 7-day moving sum via a numeric RANGE frame on epoch seconds —
    // the batch form of a sliding event-time window.
    "win_range_frame" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("epoch_s", col("ts").cast(LongType))
      val w = Window.partitionBy("user_id").orderBy("epoch_s")
        .rangeBetween(-604800L, 0L)
      ev.select(
        col("event_id"),
        asDouble(sum(dec2(col("value"))).over(w)).as("week_sum"))
        .orderBy("event_id")
    }),

    // EXACT global ntile/percent_rank/cume_dist — DISTRIBUTED (no
    // single-task window): range-partitioned sort + per-partition
    // offset indexing, SQL semantics reproduced arithmetically; see
    // globalRankExact. The former single-task-window form survives
    // only as the semantic contract this is oracle-checked against.
    "win_ntile_percent" -> ((s, d) =>
      // project to the rank inputs BEFORE indexing: the checkpoint
      // and both shuffles then carry 2 columns, not the whole table
      globalRankExact(
        Tables.orders(s, d).select("o_totalprice", "o_orderkey"),
        "o_totalprice", Seq("o_orderkey"), 4)
        .select(col("o_orderkey"), col("bucket"), col("pr"), col("cd"))
        .orderBy("o_orderkey")),

    "win_first_last" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val full = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.events(s, d).select(
        col("event_id"),
        first(col("event_id")).over(full).as("first_id"),
        last(col("event_id")).over(full).as("last_id"),
        nth_value(col("event_id"), 2).over(full).as("second_id"))
        .orderBy("event_id")
    }),

    // Forward-fill (the IGNORE NULLS window surface): carry the most
    // recent non-null value down each user's event stream — the
    // sensor/event gap-fill op. Nulls are synthesized deterministically
    // (event_id % 3) since events.value is dense; `last(_, ignoreNulls
    // = true)` over a running frame shares the one (user_id) shuffle.
    // The filled value is SELECTED, never computed — doubles compare
    // bitwise.
    "win_fill_forward" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val nv = when(pmod(col("event_id"), lit(3)) === 0, lit(null))
        .otherwise(col("value"))
      Tables.events(s, d).select(
        col("event_id"), col("user_id"), col("ts"),
        nv.as("nv"),
        last(nv, ignoreNulls = true).over(w).as("filled"))
        .orderBy("event_id")
    }),

    // The 100-TB-safe form: quantiles within each partition key —
    // parallelism = #keys, no global sort anywhere.
    "win_ntile_partitioned" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).as("bucket"),
        percent_rank().over(w).as("pr"))
        .orderBy("o_orderkey")
    }),

    // The drop-in GLOBAL-quantile form for 100 TB — the default tier
    // of `Windows.globalNtile` (see its scaladoc for the full scale
    // argument and tie semantics). Disagreement with exact ntile is
    // confined to rows within sketch error of a boundary — bound
    // asserted in ApproxAndSampleSpec. No oracle (sketch is
    // engine-specific); rows-only check.
    "win_ntile_approx" -> ((s, d) =>
      globalNtile(
        Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
        "o_totalprice", 4)
        .orderBy("o_orderkey"))
  )

  override def oracles: Map[String, String] = Map(
    "win_rank" ->
      """SELECT event_id, user_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn,
        |  rank() OVER (PARTITION BY user_id ORDER BY value DESC) AS rnk,
        |  dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC) AS drnk
        |FROM events ORDER BY event_id""".stripMargin,

    "win_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "win_lag_lead" ->
      """SELECT event_id,
        |  lag(event_id, 1) OVER w AS prev_id,
        |  lead(event_id, 1) OVER w AS next_id,
        |  value - lag(value, 1) OVER w AS dv
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "win_running" ->
      """SELECT event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS run_sum,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) /
        |  COUNT(*) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |    AS mov_avg
        |FROM events ORDER BY event_id""".stripMargin,

    "win_range_frame" ->
      """SELECT event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
        |    (PARTITION BY user_id
        |     ORDER BY CAST(floor(date_part('epoch', ts)) AS BIGINT)
        |     RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS week_sum
        |FROM events ORDER BY event_id""".stripMargin,

    "win_ntile_percent" ->
      """SELECT o_orderkey,
        |  ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket,
        |  percent_rank() OVER (ORDER BY o_totalprice) AS pr,
        |  cume_dist() OVER (ORDER BY o_totalprice) AS cd
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "win_first_last" ->
      """SELECT event_id,
        |  first_value(event_id) OVER w AS first_id,
        |  last_value(event_id) OVER w AS last_id,
        |  nth_value(event_id, 2) OVER w AS second_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    "win_fill_forward" ->
      """SELECT event_id, user_id, ts,
        |  CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS nv,
        |  last_value(CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END
        |    IGNORE NULLS) OVER w AS filled
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "win_ntile_partitioned" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey) AS bucket,
        |  percent_rank() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey) AS pr
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}

/** SURVEY §2.6 sort / limit / sample. */
object SortLimit extends QueryGroup {
  override def queries: Map[String, Q] = Map(
    "sort_multi" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_shipdate", "l_orderkey", "l_linenumber",
          "l_quantity", "l_extendedprice")
        .orderBy(col("l_returnflag").desc_nulls_last,
          col("l_shipdate").asc_nulls_first,
          col("l_orderkey").asc, col("l_linenumber").asc,
          col("l_quantity").asc, col("l_extendedprice").asc)),

    // ORDER BY + LIMIT → TakeOrderedAndProject: per-partition top-k
    // then a k-row merge on the driver — no global sort at 100 TB.
    "limit_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // Seeded Bernoulli sample — seed semantics differ from DuckDB, so
    // rows-only check (SURVEY §2.6).
    "sample_rows" -> ((s, d) =>
      Tables.lineitem(s, d).sample(withReplacement = false, 0.1, 42)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity"))
  )

  override def oracles: Map[String, String] = Map(
    "sort_multi" ->
      """SELECT l_returnflag, l_shipdate, l_orderkey, l_linenumber,
        |  l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_returnflag DESC NULLS LAST, l_shipdate ASC NULLS FIRST,
        |  l_orderkey ASC, l_linenumber ASC, l_quantity ASC,
        |  l_extendedprice ASC""".stripMargin,

    "limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin
  )
}

/** SURVEY §2.7 set operations. */
object SetOps extends QueryGroup {
  private def urgent(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
  private def highValue(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d).filter(col("o_totalprice") > 300000.0)
      .select("o_custkey")

  override def queries: Map[String, Q] = Map(
    "set_union_all" -> ((s, d) =>
      urgent(s, d).unionAll(highValue(s, d)).orderBy("o_custkey")),

    "set_union_distinct" -> ((s, d) =>
      urgent(s, d).union(highValue(s, d)).distinct().orderBy("o_custkey")),

    "set_intersect" -> ((s, d) =>
      urgent(s, d).intersect(highValue(s, d)).orderBy("o_custkey")),

    "set_except" -> ((s, d) =>
      urgent(s, d).except(highValue(s, d)).orderBy("o_custkey")),

    // Multiset (bag) semantics — INTERSECT ALL / EXCEPT ALL keep
    // duplicate multiplicities (min / difference of counts), the
    // SQL-standard forms Spark plans as aggregated joins rather than
    // the distinct-based set ops above.
    "set_intersect_all" -> ((s, d) =>
      urgent(s, d).intersectAll(highValue(s, d)).orderBy("o_custkey")),

    "set_except_all" -> ((s, d) =>
      urgent(s, d).exceptAll(highValue(s, d)).orderBy("o_custkey"))
  )

  private val u = "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
  private val h = "SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0"

  override def oracles: Map[String, String] = Map(
    "set_union_all" -> s"SELECT * FROM ($u UNION ALL $h) t ORDER BY o_custkey",
    "set_union_distinct" -> s"SELECT * FROM ($u UNION $h) t ORDER BY o_custkey",
    "set_intersect_all" ->
      s"SELECT * FROM ($u INTERSECT ALL $h) t ORDER BY o_custkey",
    "set_except_all" ->
      s"SELECT * FROM ($u EXCEPT ALL $h) t ORDER BY o_custkey",
    "set_intersect" -> s"SELECT * FROM ($u INTERSECT $h) t ORDER BY o_custkey",
    "set_except" -> s"SELECT * FROM ($u EXCEPT $h) t ORDER BY o_custkey"
  )
}
