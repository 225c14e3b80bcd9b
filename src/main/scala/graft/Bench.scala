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
    // ---- co-tenant-steal provenance: /proc/stat's aggregate steal
    // ticks sampled around the sweep. Past rounds' "regressions" were
    // ambient noise (0.16-0.9 cores of measured steal uniformly
    // inflating every key 10-25%) that prose had to explain away —
    // now the artifact carries its own provenance: `steal_cores` =
    // average cores stolen DURING this sweep, `quiet` = steal below
    // the 0.05-core threshold. POLICY: budget verdicts bind only on
    // quiet sweeps — `budget_verdict` is "red" only when over-budget
    // keys appear on a quiet run; an over-budget noisy run reports
    // "noisy" (re-run when the box is quiet before treating it as a
    // regression); green/untracked otherwise.
    def stealSample(): Option[(Long, Long)] = scala.util.Try {
      val cpu = java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/stat"))
        .linesIterator.next().trim.split("\\s+").drop(1).map(_.toLong)
      (cpu(7), cpu.sum) // user nice system idle iowait irq softirq STEAL
    }.toOption
    val steal0 = stealSample()
    val sweepT0 = System.nanoTime()
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
    val stealCores: Option[Double] = for {
      (s0, t0) <- steal0; (s1, t1) <- stealSample()
      if t1 > t0
    } yield (s1 - s0).toDouble / (t1 - t0) *
      Runtime.getRuntime.availableProcessors()
    val quiet = stealCores.forall(_ <= 0.05)
    val sweepSec = (System.nanoTime() - sweepT0) / 1e9
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
    // the verdict that gates: red ONLY on a quiet over-budget run
    // (see the steal-provenance policy above)
    val verdict =
      if (!atTrackedSf || budgets.isEmpty) "untracked"
      else if (overBudget.isEmpty) "green"
      else if (!quiet) "noisy"
      else "red"
    val budgetJson =
      if (budgets.isEmpty || !atTrackedSf) ""
      else s""","over_budget":${overBudget.mkString("{", ",", "}")}""" +
        s""","unbudgeted":${unbudgeted.map("\"" + _ + "\"")
          .mkString("[", ",", "]")}"""
    val provJson =
      s""","steal_cores":${stealCores.map(sec).getOrElse("null")}""" +
        s""","quiet":$quiet,"sweep_sec":${sec(sweepSec)}""" +
        s""","budget_verdict":"$verdict""""
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"$budgetJson$provJson}"""
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
        s""""steal_cores":${stealCores.map(sec).getOrElse("null")},""" +
        s""""quiet":$quiet,"budget_verdict":"$verdict",""" +
        s""""queries_file":"$outFile","sf":"$sfDir"}""")
    spark.stop()
  }
}
