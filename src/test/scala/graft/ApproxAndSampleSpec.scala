package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Verification for the approximate / nondeterministic no-oracle keys
  * (SURVEY §5.3): HLL error bound vs exact, fixed-seed sampling
  * determinism.
  */
class ApproxAndSampleSpec extends AnyFunSuite with SparkTestBase {

  test("approx_count_distinct is within the requested rsd bound") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val r = li.agg(
      approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
      countDistinct(col("l_partkey")).as("exact")).head()
    val (approx, exact) = (r.getAs[Long]("approx"), r.getAs[Long]("exact"))
    // HLL rsd is a standard deviation — 5σ is a safe determinism bound
    assert(math.abs(approx - exact).toDouble / exact <= 0.10,
      s"approx=$approx exact=$exact")
  }

  test("hll sketch partials merge losslessly: union-of-partials ≡ " +
      "direct sketch, estimate within bound of exact") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    // partial: one sketch per (flag, month); merged: union per flag —
    // must equal sketching the flag's rows directly (register-max is
    // associative), proving a new month can append without a rescan
    val merged = li
      .groupBy(col("l_returnflag"),
        date_trunc("month", col("l_shipdate")).as("m"))
      .agg(hll_sketch_agg(col("l_partkey"), 12).as("sk"))
      .groupBy("l_returnflag")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), false)).as("est"))
    val direct = li.groupBy("l_returnflag")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), 12))
        .as("est"))
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dir = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ex = exact.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == dir, s"merged=$m direct=$dir")
    for ((k, e) <- ex)
      assert(math.abs(m(k) - e).toDouble / e <= 0.10,
        s"$k: merged=${m(k)} exact=$e")
  }

  test("Sketches.tokenCardinality: batch sketches merge ≡ one-shot, " +
      "estimate tracks exact distinct tokens") {
    import graft.operators.{Sketches, TextAnalysis}
    val docs = Tables.documents(spark, sf)
    val batches = (0 to 2).map(i =>
      Sketches.tokenCardinality(
        docs.filter(pmod(col("doc_id"), lit(3)) === i), "source", "text"))
    val merged = Sketches.estimateCardinality(batches.reduce(_.union(_)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = Sketches.estimateCardinality(
      Sketches.tokenCardinality(docs, "source", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == oneShot,
      "register-wise union over ANY batch split must equal the one-shot sketch")
    val exact = docs
      .select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("source").agg(countDistinct(col("t")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact)
      assert(math.abs(merged(k) - e).toDouble / e <= 0.10,
        s"source=$k est=${merged(k)} exact=$e")
  }

  test("sample with a fixed seed is deterministic") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val a = li.sample(withReplacement = false, 0.1, seed = 42).count()
    val b = li.sample(withReplacement = false, 0.1, seed = 42).count()
    assert(a == b)
    val rowsA = li.sample(withReplacement = false, 0.1, seed = 42)
      .agg(sum(col("l_orderkey"))).head.getLong(0)
    val rowsB = li.sample(withReplacement = false, 0.1, seed = 42)
      .agg(sum(col("l_orderkey"))).head.getLong(0)
    assert(rowsA == rowsB)
  }

  test("percentile_approx median tracks the exact median (scale path)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val r = li.agg(
      percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("approx"),
      expr("percentile(l_quantity, 0.5)").as("exact")).head()
    val (a, e) = (r.getAs[Double]("approx"), r.getAs[Double]("exact"))
    // l_quantity spans 1..50; the sketch at accuracy 10000 must land
    // within one integer step of the true median
    assert(math.abs(a - e) <= 1.0, s"approx=$a exact=$e")
  }

  test("win_ntile_approx agrees with exact global ntile off-boundary") {
    import org.apache.spark.sql.expressions.Window
    val approx = queries.Windows.queries("win_ntile_approx")(spark, sf)
      .select("o_orderkey", "bucket")
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    val exact = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), ntile(4).over(w).as("exact_bucket"))
    val joined = approx.join(exact, "o_orderkey")
    val total = joined.count()
    val agree = joined
      .filter(col("bucket") === col("exact_bucket")).count()
    // the sketch at accuracy 10000 misplaces only rows within sketch
    // error of a quartile boundary (ties at the cut also differ: exact
    // ntile splits equal values by row position, bucketing cannot)
    assert(agree.toDouble / total >= 0.95,
      s"approx ntile agreement ${agree.toDouble / total} < 0.95")
  }

  test("globalNtile: default (approx) tier agrees with exact=true tier") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val approx = queries.Windows.globalNtile(orders, "o_totalprice", 4)
      .withColumnRenamed("bucket", "ab")
    val exact = queries.Windows
      .globalNtile(orders, "o_totalprice", 4, exact = true)
      .withColumnRenamed("bucket", "eb")
    val joined = approx.select("o_orderkey", "ab")
      .join(exact.select("o_orderkey", "eb"), "o_orderkey")
    val total = joined.count()
    val agree = joined.filter(col("ab") === col("eb")).count()
    assert(agree.toDouble / total >= 0.95,
      s"tier agreement ${agree.toDouble / total} < 0.95")
    // both tiers must produce every bucket in [1, n] and nothing else
    val buckets = approx.select(col("ab").as("b"))
      .union(exact.select(col("eb").as("b"))).distinct()
      .collect().map(_.getInt(0)).sorted
    assert(buckets.sameElements(Array(1, 2, 3, 4)), buckets.mkString(","))
  }

  test("percentiles: default (approx) tier tracks exact=true per group") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ps = Seq(0.25, 0.5, 0.75)
    def byFlag(exact: Boolean) = queries.Aggregates
      .percentiles(li, "l_quantity", ps, by = Seq("l_returnflag"),
        exact = exact)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val a = byFlag(exact = false)
    val e = byFlag(exact = true)
    assert(a.keySet == e.keySet)
    for (k <- e.keySet; i <- ps.indices)
      // l_quantity spans 1..50; accuracy 10000 lands within one step
      assert(math.abs(a(k)(i) - e(k)(i)) <= 1.0,
        s"group $k p=${ps(i)}: approx=${a(k)(i)} exact=${e(k)(i)}")
    // global (no `by`) shape: one row, array aligned with ps
    val g = queries.Aggregates.percentiles(li, "l_quantity", ps)
      .head().getSeq[Double](0)
    assert(g.length == 3 && g.sorted == g, g.mkString(","))
  }

  test("stratified sample hits per-stratum fractions, deterministic seed") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fracs = Map("en" -> 0.5, "es" -> 0.25)
    val a = docs.stat.sampleBy("lang", fracs, 42L)
    val b = docs.stat.sampleBy("lang", fracs, 42L)
    assert(a.agg(sum(col("doc_id"))).head.getLong(0) ==
      b.agg(sum(col("doc_id"))).head.getLong(0), "same seed, same sample")
    val total = docs.filter(col("lang") === "en").count()
    val sampled = a.filter(col("lang") === "en").count()
    // Bernoulli at p=0.5: 5σ band around the mean
    val sd = math.sqrt(total * 0.5 * 0.5)
    assert(math.abs(sampled - total * 0.5) <= 5 * sd + 1,
      s"en stratum: $sampled of $total at p=0.5")
    assert(a.filter(!col("lang").isin("en", "es")).count() == 0,
      "strata without a declared fraction must be excluded")
  }

  test("globalRankExact matches the single-task window semantics") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // ties (30.0 ×3), N=10 not divisible by n=3 — both the ntile
    // remainder logic and tie-shared pr/cd are exercised
    val df = Seq(10.0, 20.0, 30.0, 30.0, 30.0, 40.0, 50.0, 60.0, 70.0,
      80.0).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val got = queries.Windows.globalRankExact(df, "v", Seq("id"), 3)
      .select("id", "bucket", "pr", "cd").orderBy("id").collect()
    val total = Window.orderBy(col("v"), col("id"))
    val byV = Window.orderBy(col("v"))
    val want = df.select(col("id"),
      ntile(3).over(total).as("bucket"),
      percent_rank().over(byV).as("pr"),
      cume_dist().over(byV).as("cd")).orderBy("id").collect()
    assert(got.toSeq.map(_.toSeq) == want.toSeq.map(_.toSeq))
    // and the plan really is distributed: no empty-partition-spec
    // window anywhere
    val plan = queries.Windows.globalRankExact(df, "v", Seq("id"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window ["), s"unexpected window op:\n$plan")
  }

  test("groupedRankExact matches the per-group window rank") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // includes a NULL group key and a NULL value — both rank like any
    // other group/tie (nulls first), not silently dropped
    val df = Seq(("a", 3.0), ("a", 1.0), ("a", 2.0), ("a", 2.0),
      ("b", 9.0), ("b", 5.0), ("c", 7.0))
      .map { case (g, v) => (g, Option(v)) }
      .toDF("g", "v")
      .union(Seq((null.asInstanceOf[String], Some(1.0)),
        ("a", Option.empty[Double])).toDF("g", "v"))
    val got = queries.Windows.groupedRankExact(df, Seq("g"), "v")
      .select("g", "v", "__w", "__m")
      .orderBy("g", "__w").collect().map(_.toSeq)
    val w = Window.partitionBy("g").orderBy("v")
    val want = df.select(col("g"), col("v"),
      row_number().over(w).cast("long").as("__w"),
      count(lit(1)).over(Window.partitionBy("g")).as("__m"))
      .orderBy("g", "__w").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("percentilesExactAtScale equals SQL percentile per group") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // random sizes per group, ties included (values quantized to .5)
    val rows = for {
      g <- Seq("a", "b", "c", "d")
      _ <- 1 to (rnd.nextInt(40) + 1)
    } yield (g, math.floor(rnd.nextDouble() * 20) / 2.0)
    val df = rows.toDF("g", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val got = queries.Aggregates
      .percentilesExactAtScale(df, "v", ps, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val want = df.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))")
        .cast("array<double>").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet == want.keySet)
    for (k <- want.keySet; i <- ps.indices)
      assert(got(k)(i) == want(k)(i),
        s"group $k p=${ps(i)}: got ${got(k)(i)} want ${want(k)(i)}")
  }

  test("agg_corr_regression's exact-moment corr matches built-in corr") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val builtin = li.groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val derived = SparkEntry.queries("agg_corr_regression")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("corr")).toMap
    assert(builtin.keySet == derived.keySet)
    builtin.foreach { case (k, c) =>
      assert(math.abs(c - derived(k)) < 1e-9, s"$k: $c vs ${derived(k)}")
    }
  }

  test("Misra–Gries guarantee: every token above N/(k+1) survives the " +
    "summary under adversarial partitioning; heavyHitters is exact") {
    import graft.operators.Sketches
    import spark.implicits._
    // 3 hot tokens (freqs 400/300/200 of N=1000) + 100 cold ones at ~1
    // each; k=9 → threshold N/10 = 100: all three hot tokens MUST
    // survive no matter how partitions split the stream
    val hot = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(200)("gamma")
    val cold = (0 until 100).map(i => f"cold$i%03d")
    // worst-case-ish layout: hot tokens scattered between cold runs
    val stream = new scala.util.Random(7).shuffle(hot ++ cold)
    val df = stream.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .repartition(13) // many partitions → many partial merges
    val mg = new Sketches.MisraGries(9)
    val summary = df.select(col("text")).as[String]
      .select(mg.toColumn).head()
    assert(Set("alpha", "beta", "gamma").subsetOf(summary.keySet),
      s"guarantee violated: $summary")
    // two-pass exact heavy hitters: > N/5 → alpha(400), beta(300)
    val hh = Sketches.heavyHitters(df, "text", ratio = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == Map("alpha" -> 400L, "beta" -> 300L), s"got $hh")
  }

  test("agg_collect raw (unstringified) array output stays covered") {
    import spark.implicits._
    val df = Seq((1L, 3L), (1L, 1L), (2L, 5L)).toDF("k", "v")
    val out = df.groupBy("k")
      .agg(array_sort(collect_list(col("v"))).as("vs"))
      .orderBy("k").collect()
    assert(out(0).getSeq[Long](1) == Seq(1L, 3L))
    assert(out(1).getSeq[Long](1) == Seq(5L))
  }
}
