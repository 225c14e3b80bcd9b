package graft
import org.apache.spark.sql.SparkSession
import scala.collection.mutable
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.gateway.GraftSqlExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JIT Spark's execution internals + the parquet reader
    // path once, so the first measured query doesn't absorb ~5s of
    // classloading/JIT that isn't engine cost (steady-state numbers).
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    try SparkEntry.entry(spark).queryExecution.toRdd.count()
    catch { case _: Throwable => () }
    // n=3 per key, report the MEDIAN: single-shot timings are noise-
    // dominated (GC pauses, first-touch page faults, run-order JIT),
    // which made unchanged queries swing 0.1↔1.0 s between rounds; the
    // median makes a true regression distinguishable from jitter.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // Hermetic per-key runs: (a) DETERMINISTIC sorted key order — the
    // previous hash-map order reshuffled every time a key was added,
    // so a new round's keys inherited different JIT/GC neighborhoods
    // and unchanged queries swung >2× between rounds; (b) release
    // state a key leaves behind (cached/localCheckpoint RDD blocks
    // from the dedup/cluster/kmeans keys stay pinned in the block
    // manager otherwise, inflating every later key's GC pressure).
    def resetSessionState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // optional key subset for triage runs: comma-separated names
    val keyFilter = sys.env.get("SPARK_GRAFT_BENCH_KEYS")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val keys = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => keyFilter.forall(_.contains(n)) }
    // INTERLEAVED sweeps: reps of one key are spread across full
    // passes over all keys, then the per-key MEDIAN is taken across
    // sweeps. Consecutive same-key reps (the previous shape) let one
    // transient noise window — GC storm, page-cache eviction, CPU
    // contention — poison every rep of a key at once, which is what
    // made unchanged queries (join_broadcast, fn_struct in r5) swing
    // 4-7× between rounds while isolated reruns showed no regression.
    val samples = mutable.Map.empty[String, mutable.Buffer[Double]]
    for (_ <- 1 to reps; (name, fn) <- keys) {
      resetSessionState()
      val t0 = System.nanoTime()
      // toRdd.count() materializes every output row of the *full* plan;
      // df.count() would let Catalyst prune the projections and bench
      // expression-heavy queries as near-bare scans.
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => -1L }
      samples.getOrElseUpdate(name, mutable.Buffer.empty) +=
        (System.nanoTime() - t0) / 1e9
    }
    val results = keys.map { case (name, _) =>
      val ts = samples(name).sorted
      name -> ts(ts.size / 2)
    }
    // 0.1ms grain, short lines; Locale.ROOT — a comma-decimal default
    // locale would emit invalid JSON
    def sec(v: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    // Per-key TIME budgets — the mechanical form of "zero
    // regressions" (bench_budget.tsv, the shuffle_budget pattern):
    // each key's budget is a deliberately generous ceiling (~1.5× a
    // quiet sf0.1 median, floored at 1s so sub-second keys don't
    // flap on scheduler jitter). Only meaningful at the tracked
    // sf0.1 point on an otherwise idle box — the validation is
    // REPORTED in the JSON (over_budget / unbudgeted), never an
    // exit-code failure, so ambient noise can't fail a round; a
    // non-empty over_budget list is the signal to diff per-key
    // against the tracked artifact and either fix the regression or
    // update the budget line deliberately.
    val budgetFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET",
        "/root/repo/bench_budget.tsv"))
    val budgets: Map[String, Double] =
      if (!java.nio.file.Files.isRegularFile(budgetFile)) Map.empty
      else java.nio.file.Files.readString(budgetFile).linesIterator
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l => val Array(k, v) = l.split("\t"); k -> v.toDouble }
        .toMap
    val atTrackedSf = sfDir.endsWith("sf0.1")
    val overBudget =
      if (!atTrackedSf || budgets.isEmpty) Nil
      else results.collect {
        case (k, v) if budgets.get(k).exists(v > _) =>
          s"\"" + k + "\":\"" + sec(v) + ">" + sec(budgets(k)) + "\""
      }
    val unbudgeted =
      if (!atTrackedSf || budgets.isEmpty) Nil
      else results.collect { case (k, _) if !budgets.contains(k) => k }
    val budgetJson =
      if (budgets.isEmpty || !atTrackedSf) ""
      else s""","over_budget":${overBudget.mkString("{", ",", "}")}""" +
        s""","unbudgeted":${unbudgeted.map("\"" + _ + "\"")
          .mkString("[", ",", "]")}"""
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"$budgetJson}"""
    // the stdout line gets tail-truncated by harnesses capturing long
    // output (half the per-key timings were lost in past rounds) — the
    // file is the durable, machine-parseable artifact
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line)
    println(line)
    // the full line above exceeds a 2000-char capture tail at 140+
    // keys (its head — the headline total — was lost in rounds 8/9),
    // so ALSO print a short self-contained summary LAST: it fits any
    // tail window whole, and points at the durable per-key artifact
    val slowest = results.sortBy(-_._2).take(5)
      .map { case (k, v) => s"\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${sec(total)},"unit":"sec",""" +
        s""""n_queries":${results.size},"slowest_queries":$slowest,""" +
        s""""n_over_budget":${overBudget.size},""" +
        s""""queries_file":"$outFile","sf":"$sfDir"}""")
    spark.stop()
  }
}
