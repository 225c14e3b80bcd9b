// Per-JOB profiler for a single graft.SparkEntry query key: prints one
// line per Spark job — job id, wall ms, #tasks, shuffle MB, and the
// job's call site / description — so the job-count hot spots inside a
// key (extra checkpoints, per-round actions, redundant stats passes)
// are attributable to code.
// Usage:
//   GRAFT_PROFILE_KEY=run_sql_merge_snapshot \
//   /opt/spark/bin/spark-shell --master "local[$SPARK_GRAFT_CPUS]" \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.extensions=graft.gateway.GraftSqlExtensions \
//     --conf spark.sql.shuffle.partitions=$SPARK_GRAFT_CPUS \
//     -I tools/profile_jobs.scala
object GraftJobProfiler {
  import org.apache.spark.scheduler._
  import scala.collection.concurrent.TrieMap

  def run(spark: org.apache.spark.sql.SparkSession): Unit = {
    case class J(t0: Long, var tasks: Int = 0, var shuf: Long = 0L,
                 var site: String = "", var end: Long = 0L)
    val jobs = new TrieMap[Int, J]()
    val stageJob = new TrieMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(Option(j.properties).flatMap(p =>
            Option(p.getProperty("spark.job.description"))))
          .getOrElse("")
        jobs.put(j.jobId, J(System.nanoTime(), site = site))
        j.stageIds.foreach(s => stageJob.put(s, j.jobId))
        ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs.get(j.jobId).foreach(_.end = System.nanoTime()); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        for (jid <- stageJob.get(s.stageInfo.stageId); j <- jobs.get(jid)) {
          j.tasks += s.stageInfo.numTasks
          j.shuf += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
        ()
      }
    })
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val key = sys.env.getOrElse("GRAFT_PROFILE_KEY", "run_sql_merge_snapshot")
    // JIT warmup (same as Bench)
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    try graft.SparkEntry.entry(spark).queryExecution.toRdd.count()
    catch { case _: Throwable => () }
    val fn = graft.SparkEntry.queries(key)
    // one untimed warm pass, then the profiled pass (same discipline
    // as Bench's median-of-3: first-touch JIT is not engine cost)
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    try fn(spark, sfDir).queryExecution.toRdd.count()
    catch { case e: Throwable => println(s"WARM FAILED: $e") }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    Thread.sleep(300)
    jobs.clear(); stageJob.clear()
    val t0 = System.nanoTime()
    try fn(spark, sfDir).queryExecution.toRdd.count()
    catch { case e: Throwable => println(s"FAILED: $e") }
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"KEY $key%s total ${wall}%.2fs jobs=${jobs.size}%d")
    println(String.format("%-5s %8s %6s %8s  %s",
      "job", "ms", "tasks", "shufMB", "site"))
    jobs.toSeq.sortBy(_._1).foreach { case (id, j) =>
      val ms = if (j.end > 0) (j.end - j.t0) / 1e6 else -1.0
      println(f"$id%-5d $ms%8.1f ${j.tasks}%6d ${j.shuf / 1e6}%8.2f  ${j.site}%s")
    }
  }
}
GraftJobProfiler.run(spark)
sys.exit(0)
