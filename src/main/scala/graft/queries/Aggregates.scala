package graft.queries

import graft.{QueryGroup, Tables}
import graft.Tables.{dec2, one2, asDouble}
import graft.operators.WeightedAvg
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.4 aggregations. Partial/final split, hash-vs-sort agg and
  * spill are Catalyst-internal; determinism across engines comes from
  * exact DECIMAL pre-casts (order-independent sums) with double math
  * only on the already-exact aggregates.
  */
object Aggregates extends QueryGroup {

  /** THE entry point for (grouped) percentiles — callers choose the
    * tier explicitly.
    *
    * - `exact = false` (DEFAULT, the 100 TB path): `percentile_approx`
    *   — a mergeable KLL-style sketch with map-side partials; one
    *   ordinary agg shuffle, no per-group sort, error shrinks with
    *   `accuracy`. ApproxAndSampleSpec pins the approx-vs-exact
    *   agreement this wrapper relies on.
    * - `exact = true` (small-group only): SQL `percentile` — buffers
    *   and sorts every group's values; a skewed group at 100 TB
    *   becomes one giant task. For exact rank statistics at scale:
    *   bounded value domains → a per-(group,value) histogram (how
    *   `agg_stats` computes its hash-compared exact median); unbounded
    *   domains → [[percentilesExactAtScale]] (range-partitioned rank,
    *   no per-group buffer, same interpolation as SQL `percentile` —
    *   equivalence property-tested in ApproxAndSampleSpec).
    *
    * Returns one row per `by` group (or one global row when `by` is
    * empty) with an array<double> `percentiles` column aligned with
    * `ps`.
    */
  def percentiles(df: DataFrame, valueCol: String, ps: Seq[Double],
                  by: Seq[String] = Nil, exact: Boolean = false,
                  accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      "ps must be fractions in [0, 1]")
    val arr = ps.mkString(", ")
    val agg =
      if (exact) expr(s"percentile($valueCol, array($arr))")
      else expr(s"approx_percentile($valueCol, array($arr), $accuracy)")
    val out = agg.cast(ArrayType(DoubleType)).as("percentiles")
    if (by.isEmpty) df.agg(out)
    else df.groupBy(by.map(col): _*).agg(out)
  }

  /** EXACT (grouped) percentiles WITHOUT per-group buffering — the
    * unbounded-value-domain scale path the [[percentiles]] scaladoc
    * points at. Semantics match SQL `percentile` exactly: for group
    * size m, position = p·(m−1), result = vLo + (position − ⌊position⌋)
    * ·(vHi − vLo) over the 0-based sorted values.
    *
    * Mechanism: `Windows.groupedRankExact` (range-partitioned sort +
    * offset indexing — a huge group spreads over many tasks), then ONE
    * aggregation that picks each percentile's bracketing values with
    * conditional min()s (the target ranks are row-computable from the
    * group size column). Returns one row per group with an
    * array<double> `percentiles` aligned with `ps`.
    */
  def percentilesExactAtScale(df: DataFrame, valueCol: String,
      ps: Seq[Double], by: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      "ps must be fractions in [0, 1]")
    require(by.nonEmpty, "grouped form — pass the group columns")
    val ranked = graft.queries.Windows.groupedRankExact(
      df.select((by :+ valueCol).map(col): _*).na.drop(Seq(valueCol)),
      by, valueCol)
    val v = col(valueCol).cast(DoubleType)
    def pos(p: Double): Column = lit(p) * (col("__m") - 1).cast(DoubleType)
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        min(when((col("__w") - 1).cast(DoubleType) === floor(pos(p)),
          v)).as(s"__lo_$i"),
        min(when((col("__w") - 1).cast(DoubleType) === ceil(pos(p)),
          v)).as(s"__hi_$i"))
    } :+ first(col("__m")).as("__m")
    val picked = ranked.groupBy(by.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val outs = ps.zipWithIndex.map { case (p, i) =>
      val position = lit(p) * (col("__m") - 1).cast(DoubleType)
      val lower = floor(position).cast(DoubleType)
      val higher = ceil(position).cast(DoubleType)
      // Spark Percentile's own formula, REPRODUCED BITWISE: the
      // weighted form (higher−pos)·lo + (pos−lower)·hi, with the
      // on-a-rank short-circuit — `lo + d·(hi−lo)` differs in the
      // last ulp and would fail exact compares
      when(lower === higher, col(s"__lo_$i")).otherwise(
        (higher - position) * col(s"__lo_$i") +
          (position - lower) * col(s"__hi_$i"))
    }
    picked.select(by.map(col) :+ array(outs: _*).as("percentiles"): _*)
  }

  private def dql(c: Column): Column = c.cast(DecimalType(3, 2))

  override def queries: Map[String, Q] = Map(
    // TPC-H Q1 at full width — the flagship shape (SURVEY §7 Phase 0).
    "agg_group" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          asDouble(sum(dec2(col("l_quantity")))).as("sum_qty"),
          asDouble(sum(dec2(col("l_extendedprice")))).as("sum_base_price"),
          asDouble(sum(dec2(col("l_extendedprice")) * (one2 - dec2(col("l_discount")))))
            .as("sum_disc_price"),
          asDouble(sum(dec2(col("l_extendedprice")) *
            ((lit(1).cast(DecimalType(3, 2)) - dql(col("l_discount"))) *
              (lit(1).cast(DecimalType(3, 2)) + dql(col("l_tax"))))))
            .as("sum_charge"),
          (asDouble(sum(dec2(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          (asDouble(sum(dec2(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "agg_global" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        asDouble(sum(dec2(col("l_quantity")))).as("total_qty"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))),

    "agg_count_distinct" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status"))),

    // HLL sketch — no oracle (approximate); the unit test bounds the
    // error vs the exact count. At 100 TB this is the only sane
    // distinct-count: fixed-size sketch, no shuffle of raw keys.
    "agg_approx_distinct" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))),

    // Mergeable-sketch pre-aggregation — the Druid/Snowflake rollup
    // pattern that makes distinct counts incremental at 100 TB: a
    // small persisted table of per-(flag, month) HLL sketches answers
    // ANY coarser distinct-count query by sketch UNION, never
    // rescanning the fact table (a new month appends one sketch row;
    // partials also make the distinct-count commutative across
    // late/backfilled partitions). No oracle (Datasketches binary is
    // engine-specific); ApproxAndSampleSpec proves merged ≡ direct
    // sketch estimates and bounds the error vs exact.
    "agg_hll_partial" -> ((s, d) => {
      val partials = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"),
          date_trunc("month", col("l_shipdate")).as("m"))
        .agg(hll_sketch_agg(col("l_partkey"), 12).as("sk"))
      partials
        .groupBy("l_returnflag")
        .agg(
          hll_sketch_estimate(hll_union_agg(col("sk"), false))
            .as("approx_parts"),
          count(lit(1)).as("n_partials"))
        .orderBy("l_returnflag")
    }),

    // EXACT distinct-count rollup via Spark 4 bitmap aggregates — the
    // exact counterpart of agg_hll_partial's sketch pattern: per
    // (group, batch, bucket) bitmaps are small mergeable partials
    // (bucket = id/32768 keeps each bitmap ≤4 KB regardless of id
    // range), OR-merge is exact and associative, and the final count
    // is a sum of per-bucket popcounts. At 100 TB this turns exact
    // COUNT(DISTINCT) maintenance into a bitmap-rows-only rollup —
    // no re-shuffle of raw ids when batches arrive.
    "agg_bitmap_distinct" -> ((s, d) => {
      val partials = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"),
          date_trunc("month", col("l_shipdate")).as("m"),
          bitmap_bucket_number(col("l_partkey")).as("bucket"))
        .agg(bitmap_construct_agg(bitmap_bit_position(col("l_partkey")))
          .as("bm"))
      partials
        .groupBy("l_returnflag", "bucket")
        .agg(bitmap_or_agg(col("bm")).as("bm"))
        .groupBy("l_returnflag")
        .agg(sum(bitmap_count(col("bm"))).cast("long").as("n_parts"))
        .orderBy("l_returnflag")
    }),

    "agg_having" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec2(col("l_quantity")))).as("sum_qty"))
        .filter(col("sum_qty") > 1000.0)
        .orderBy("l_suppkey")),

    "agg_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec2(col("l_quantity")))).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")),

    "agg_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("n"))
        .orderBy("rf", "ls")),

    "agg_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT coalesce(l_returnflag, '(all)') AS rf,
          |       coalesce(l_linestatus, '(all)') AS ls,
          |       count(*) AS n
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY rf, ls""".stripMargin)
    }),

    // Nested outputs are serialized to sorted CSV strings so the
    // driver's pandas comparator (which cannot sort/hash ndarray cells)
    // sees scalars; the raw array form stays covered by a unit test.
    "agg_collect" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(
          array_join(transform(array_sort(collect_list(col("o_orderkey"))),
            _.cast(StringType)), ",").as("order_keys"),
          array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
            .as("statuses"))
        .orderBy("o_custkey")),

    // Moment statistics + correlation + positional median, all derived
    // from exact decimal sums so the double formula evaluates
    // identically in Spark and DuckDB (SURVEY §2.4 agg_stats; built-in
    // stddev/corr are float-order-dependent, unusable for hash
    // compare).
    // The exact median is computed DISTRIBUTED via a per-(group,value)
    // HISTOGRAM (no per-group buffer — see the block comment below;
    // for unbounded value domains use Windows.groupedRankExact).
    // Callers wanting general percentiles go through
    // `Aggregates.percentiles` (exact=false default → the
    // percentile_approx sketch tier, with ApproxAndSampleSpec pinning
    // its error bounds).
    "agg_stats" -> ((s, d) => {
      val base = Tables.lineitem(s, d).select(
        col("l_returnflag").as("rf"),
        dec2(col("l_quantity")).as("q"),
        dec2(col("l_extendedprice")).as("p"))
      val stats = base.groupBy("rf").agg(
        count(lit(1)).as("n"),
        asDouble(sum(col("q"))).as("sq"),
        asDouble(sum(col("q") * col("q"))).as("sq2"),
        asDouble(sum(col("p"))).as("sp"),
        asDouble(sum(col("p") * col("p"))).as("sp2"),
        asDouble(sum(col("q") * col("p"))).as("spq"))
      // exact median at scale WITHOUT buffering rows: l_quantity has a
      // BOUNDED value domain, so the weighted median comes from a
      // per-(group, value) histogram — one partial-agg shuffle over
      // the data (map-side combine), then cumulative positions over
      // the TINY histogram (≤ groups × distinct values rows, window
      // cost independent of table size). The middle position(s)
      // resolve to their covering values; (qLo+qHi) is an exact
      // DECIMAL sum and /2 is exact in binary, so the result is
      // bit-identical to averaging the two middle rows. For unbounded
      // value domains use Windows.groupedRankExact instead.
      val hist = base.groupBy("rf", "q").agg(count(lit(1)).as("c"))
      val cumW = Window.partitionBy("rf").orderBy("q")
      val posed = hist
        .withColumn("cum", sum("c").over(cumW))
        .withColumn("m", sum("c").over(Window.partitionBy("rf")))
        .withColumn("lo", expr("(m+1) div 2"))
        .withColumn("hi", expr("(m+2) div 2"))
      // a value's rows cover positions (cum-c+1)..cum
      def at(p: Column) = col("cum") - col("c") < p && p <= col("cum")
      val med = posed
        .groupBy("rf")
        .agg((asDouble(
          sum(when(at(col("lo")), col("q"))) +
          sum(when(at(col("hi")), col("q"))))
          / lit(2.0)).as("median_qty"))
      stats.join(med, "rf")
        .select(
          col("rf").as("l_returnflag"),
          col("n"),
          (col("sq") / col("n")).as("mean_qty"),
          ((col("sq2") - col("sq") * col("sq") / col("n")) / (col("n") - 1))
            .as("var_qty"),
          sqrt((col("sq2") - col("sq") * col("sq") / col("n")) / (col("n") - 1))
            .as("stddev_qty"),
          // corr chains enough double ops that engines can differ in the
          // last bit (FMA/evaluation order); round(9) absorbs that while
          // keeping the value exact to any practical use
          round((col("n") * col("spq") - col("sq") * col("sp")) /
            (sqrt(col("n") * col("sq2") - col("sq") * col("sq")) *
              sqrt(col("n") * col("sp2") - col("sp") * col("sp"))), 9)
            .as("corr_qty_price"),
          col("median_qty"))
        .orderBy("l_returnflag")
    }),

    "agg_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("user_id") +: types.map(t =>
          coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_id")
    }),

    // arg-min/max per group; ties on o_totalprice are broken by a
    // lexicographic (price, orderkey) struct ordering — unlike folding
    // both into one integer, this works for ANY key range (an integer
    // rank of cents·C + key silently corrupts once orderkey ≥ C, e.g.
    // TPC-H sf≥10 where orderkey exceeds 10M)
    "agg_min_max_by" -> ((s, d) => {
      val rank = struct(dec2(col("o_totalprice")).as("p"),
        col("o_orderkey").as("k"))
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(max_by(col("o_orderkey"), rank).as("biggest_order"),
          min_by(col("o_orderkey"), rank).as("smallest_order"))
        .orderBy("o_custkey")
    }),

    // Correlation / least-squares regression per group, derived from
    // EXACT integer moments: built-in corr()/regr_slope() stream
    // double updates in engine-specific order (hash-unstable), so the
    // 2-dp inputs quantize to BIGINT (×100, exact), the five moments
    // sum in DECIMAL(38,0) (exact, overflow-safe at any SF), and the
    // statistics derive in double from bit-identical inputs with the
    // same formula both engines — deterministic end to end.
    "agg_corr_regression" -> ((s, d) => {
      val qx = round(col("l_quantity") * 100).cast("long")
      val qy = round(col("l_extendedprice") * 100).cast("long")
      val dec38 = DecimalType(38, 0)
      val g = Tables.lineitem(s, d)
        .select(col("l_returnflag"), qx.as("x"), qy.as("y"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec38)).as("sx"),
          sum(col("y").cast(dec38)).as("sy"),
          sum((col("x") * col("y")).cast(dec38)).as("sxy"),
          sum((col("x") * col("x")).cast(dec38)).as("sxx"),
          sum((col("y") * col("y")).cast(dec38)).as("syy"))
      val n = col("n").cast("double")
      val (sx, sy, sxy, sxx, syy) = (col("sx").cast("double"),
        col("sy").cast("double"), col("sxy").cast("double"),
        col("sxx").cast("double"), col("syy").cast("double"))
      val covN = n * sxy - sx * sy // n²·cov — shared numerator
      g.select(col("l_returnflag"), col("n"),
          covN.as("cov_n"),
          (covN / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
            .as("corr"),
          (covN / (n * sxx - sx * sx)).as("slope"))
        .orderBy("l_returnflag")
    }),

    // Deterministic MODE per group: the most frequent value, lowest
    // value on frequency ties (bare `mode()` is tie-nondeterministic
    // — unusable under a hash-compared oracle). Two map-side-partial
    // aggregations, no window: counts per (group, value), then a
    // struct-ranked min_by picks (max count, min value) per group.
    "agg_mode" -> ((s, d) => {
      val cnts = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity").cast("int").as("qty"))
        .groupBy("l_returnflag", "qty").agg(count(lit(1)).as("cnt"))
      cnts.groupBy("l_returnflag")
        .agg(min_by(struct(col("qty"), col("cnt")),
          struct((-col("cnt")).as("nc"), col("qty"))).as("m"))
        .select(col("l_returnflag"), col("m.qty").as("mode_qty"),
          col("m.cnt").as("mode_cnt"))
        .orderBy("l_returnflag")
    }),

    // Per-group z-score outlier screen (the data-cleaning pass a
    // curation pipeline runs before training): group moments from
    // EXACT decimal sums (order-insensitive), μ/σ derived in double
    // from bit-identical inputs with the same formula both engines,
    // then one broadcast join flags |x−μ| > 2σ rows — two passes over
    // the fact, the second map-only (the per-group stats frame is
    // O(groups) and broadcasts at any scale).
    "agg_outlier_zscore" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"), col("l_quantity").as("x"))
      val stats = li.groupBy("g").agg(
          count(lit(1)).as("n"),
          asDouble(sum(dec2(col("x")))).as("sx"),
          asDouble(sum(dec2(col("x")) * dec2(col("x")))).as("sxx"))
        .withColumn("mu", col("sx") / col("n"))
        .withColumn("sigma",
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
            (col("n") - 1)))
      li.join(broadcast(stats), "g")
        .groupBy("g")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(abs(col("x") - col("mu")) > lit(2.0) * col("sigma"),
            1L).otherwise(0L)).as("n_outliers"))
        .orderBy("g")
    }),

    // FILTER-clause conditional aggregates (count_if / bool_and /
    // bool_or / sum DISTINCT) — the SQL:2023 surface dbt models use
    // for one-pass multi-metric rollups instead of N self-joins. All
    // map-side-partial; the DISTINCT sum adds the one Expand phase.
    "agg_filtered_conditional" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(
          expr("count_if(l_quantity > 25.0)").as("n_big"),
          expr("bool_and(l_quantity > 0.0)").as("all_pos"),
          expr("bool_or(l_discount > 0.08)").as("any_deep_disc"),
          asDouble(sum_distinct(dec2(col("l_quantity"))))
            .as("sum_dist_qty"))
        .orderBy("l_linestatus")),

    "agg_custom_udaf" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          (dec2(col("l_extendedprice")) * lit(100)).cast(LongType).as("pc"),
          (dec2(col("l_quantity")) * lit(100)).cast(LongType).as("qc"))
        .groupBy("l_returnflag")
        .agg(WeightedAvg.wavg(col("pc"), col("qc")).as("wavg_price"))
        .orderBy("l_returnflag")),

    // UNPIVOT / melt (SQL `UNPIVOT`, Dataset.unpivot): wide → long is
    // a map-only Expand — no shuffle; each input row fans out to one
    // row per value column. Bounded to a key slice so the long output
    // stays comparable.
    "agg_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 10 === 0)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(asDouble(dec2(col("l_quantity"))).as("qty"),
            asDouble(dec2(col("l_extendedprice"))).as("price")),
          "metric", "val")
        .orderBy("l_orderkey", "l_linenumber", "metric", "val")),

    // SQL:2023 LISTAGG (Spark 4) — ordered string aggregation with an
    // explicit WITHIN GROUP, the deterministic form (an unordered
    // listagg would hash-mismatch by construction). Tiny groups here;
    // at scale the per-group string is bounded by the group, and
    // agg_collect's sorted-array form is the unbounded-safe variant.
    "agg_listagg" -> ((s, d) =>
      Tables.nation(s, d)
        .groupBy("n_regionkey")
        .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
          .as("names"))
        .orderBy("n_regionkey"))
  )

  private val sumQty =
    "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
  private val sumPrice =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"

  override def oracles: Map[String, String] = Map(
    "agg_outlier_zscore" ->
      """WITH s AS (
        |  SELECT l_returnflag AS g, count(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) *
        |             CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx
        |  FROM lineitem GROUP BY 1)
        |SELECT g, count(*) AS n_rows,
        |  CAST(SUM(CASE WHEN abs(l_quantity - sx / n) >
        |    CAST(2.0 AS DOUBLE) * sqrt((sxx - sx * sx / n) / (n - 1))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM lineitem JOIN s ON l_returnflag = g
        |GROUP BY g ORDER BY g""".stripMargin,

    "agg_filtered_conditional" ->
      """SELECT l_linestatus,
        |  CAST(count(*) FILTER (WHERE l_quantity > 25.0) AS BIGINT)
        |    AS n_big,
        |  bool_and(l_quantity > 0.0) AS all_pos,
        |  bool_or(l_discount > 0.08) AS any_deep_disc,
        |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_dist_qty
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "agg_group" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  $sumQty AS sum_qty,
         |  $sumPrice AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
         |    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         |    AS sum_disc_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
         |    ((CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) *
         |     (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2))))) AS DOUBLE)
         |    AS sum_charge,
         |  $sumQty / count(*) AS avg_qty,
         |  $sumPrice / count(*) AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_global" ->
      s"""SELECT count(*) AS n_rows, $sumQty AS total_qty,
         |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
         |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
         |FROM lineitem""".stripMargin,

    "agg_count_distinct" ->
      """SELECT count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
        |FROM lineitem""".stripMargin,

    "agg_having" ->
      s"""SELECT l_suppkey, count(*) AS n, $sumQty AS sum_qty
         |FROM lineitem GROUP BY l_suppkey
         |HAVING $sumQty > 1000.0
         |ORDER BY l_suppkey""".stripMargin,

    "agg_rollup" ->
      s"""SELECT coalesce(l_returnflag, '(all)') AS rf,
         |  coalesce(l_linestatus, '(all)') AS ls,
         |  count(*) AS n, $sumQty AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY rf, ls""".stripMargin,

    "agg_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |  coalesce(l_linestatus, '(all)') AS ls,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |  coalesce(l_linestatus, '(all)') AS ls,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,

    "agg_collect" ->
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "agg_stats" ->
      """WITH base AS (
        |  SELECT l_returnflag AS rf,
        |    CAST(l_quantity AS DECIMAL(12,2)) AS q,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) AS p
        |  FROM lineitem),
        |s AS (
        |  SELECT rf, count(*) AS n,
        |    CAST(SUM(q) AS DOUBLE) AS sq, CAST(SUM(q*q) AS DOUBLE) AS sq2,
        |    CAST(SUM(p) AS DOUBLE) AS sp, CAST(SUM(p*p) AS DOUBLE) AS sp2,
        |    CAST(SUM(q*p) AS DOUBLE) AS spq
        |  FROM base GROUP BY rf),
        |m AS (
        |  SELECT rf, CAST(SUM(q) AS DOUBLE)/COUNT(*) AS median_qty
        |  FROM (SELECT rf, q,
        |          row_number() OVER (PARTITION BY rf ORDER BY q) AS rn,
        |          count(*) OVER (PARTITION BY rf) AS cnt
        |        FROM base) t
        |  WHERE rn = (cnt+1)//2 OR rn = (cnt+2)//2
        |  GROUP BY rf)
        |SELECT s.rf AS l_returnflag, n,
        |  sq/n AS mean_qty,
        |  (sq2 - sq*sq/n)/(n-1) AS var_qty,
        |  sqrt((sq2 - sq*sq/n)/(n-1)) AS stddev_qty,
        |  round((n*spq - sq*sp)/(sqrt(n*sq2 - sq*sq)*sqrt(n*sp2 - sp*sp)), 9)
        |    AS corr_qty_price,
        |  median_qty
        |FROM s JOIN m ON s.rf = m.rf
        |ORDER BY l_returnflag""".stripMargin,

    "agg_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // DuckDB's arg_max can't order by a struct, so the oracle states
    // the same lexicographic (price, key) ordering as two windows
    "agg_min_max_by" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(o_totalprice AS DECIMAL(12,2)) DESC, o_orderkey DESC) AS rd,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(o_totalprice AS DECIMAL(12,2)) ASC, o_orderkey ASC) AS ra
        |  FROM orders)
        |SELECT o_custkey,
        |  max(CASE WHEN rd = 1 THEN o_orderkey END) AS biggest_order,
        |  max(CASE WHEN ra = 1 THEN o_orderkey END) AS smallest_order
        |FROM r GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // same exact-moment derivation, same formula shape — the doubles
    // agree bitwise because the inputs and expression tree do
    "agg_corr_regression" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(x AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(y AS DECIMAL(38,0))) AS sy,
        |    sum(CAST(x * y AS DECIMAL(38,0))) AS sxy,
        |    sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
        |    sum(CAST(y * y AS DECIMAL(38,0))) AS syy
        |  FROM q GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) AS cov_n,
        |  ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |   (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |    sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS corr,
        |  ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |   (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS slope
        |FROM m ORDER BY l_returnflag""".stripMargin,

    // bitmap distinct is EXACT — the oracle is plain COUNT(DISTINCT)
    "agg_bitmap_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_mode" ->
      """WITH cnt AS (
        |  SELECT l_returnflag, CAST(l_quantity AS INTEGER) AS qty,
        |    count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT l_returnflag, qty, c,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY c DESC, qty ASC) AS rn
        |  FROM cnt)
        |SELECT l_returnflag, qty AS mode_qty, CAST(c AS BIGINT) AS mode_cnt
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    "agg_listagg" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "agg_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'qty' AS metric,
        |  CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS val
        |FROM lineitem WHERE l_orderkey % 10 = 0
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'price' AS metric,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS val
        |FROM lineitem WHERE l_orderkey % 10 = 0
        |ORDER BY l_orderkey, l_linenumber, metric, val""".stripMargin,

    "agg_custom_udaf" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) /
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
