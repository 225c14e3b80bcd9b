// Per-key job/stage/shuffle profiler for graft.SparkEntry.queries.
// Usage:
//   printf "key1\nkey2\n" > /tmp/graft_profile_keys.txt   # empty/missing = all
//   /opt/spark/bin/spark-shell --master "local[$SPARK_GRAFT_CPUS]" \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.extensions=graft.gateway.GraftSqlExtensions \
//     --conf spark.sql.shuffle.partitions=$SPARK_GRAFT_CPUS \
//     -I tools/profile_keys.scala
// Emits one line per key: wall sec, #jobs, #stages, #tasks, shuffle MB.
// NOTE: the whole body lives in one object because spark-shell -I
// parses top-level statements line-by-line (bare multiline if/else
// splits and dies).

object GraftKeyProfiler {
  import org.apache.spark.scheduler._
  import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

  def run(spark: org.apache.spark.sql.SparkSession): Unit = {
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleWrite = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        shuffleWrite.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val keysFile = java.nio.file.Paths.get("/tmp/graft_profile_keys.txt")
    val wanted: Set[String] = {
      if (!java.nio.file.Files.isRegularFile(keysFile)) Set.empty
      else java.nio.file.Files.readString(keysFile).linesIterator
        .map(_.trim).filter(_.nonEmpty).toSet
    }
    // JIT warmup (same as Bench)
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    try graft.SparkEntry.entry(spark).queryExecution.toRdd.count()
    catch { case _: Throwable => () }
    val keys = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.contains(n) }
    println(String.format("%-45s %8s %5s %6s %6s %10s",
      "key", "sec", "jobs", "stages", "tasks", "shufMB"))
    for ((name, fn) <- keys) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      Thread.sleep(250) // let listener counters settle
      val (j0, s0, t0, w0) = (jobs.get, stages.get, tasks.get, shuffleWrite.get)
      val t = System.nanoTime()
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable =>
        println(s"$name FAILED: ${String.valueOf(e.getMessage).take(160)}")
      }
      val sec = (System.nanoTime() - t) / 1e9
      Thread.sleep(250)
      println(String.format("%-45s %8.2f %5d %6d %6d %10.2f",
        name, Double.box(sec), Int.box(jobs.get - j0),
        Int.box(stages.get - s0), Int.box(tasks.get - t0),
        Double.box((shuffleWrite.get - w0) / 1e6)))
    }
  }
}
GraftKeyProfiler.run(spark)
System.exit(0)
