// Dump `.explain("formatted")` for a list of query keys to files —
// the plans/r19/<key>_{before,after}.txt deliverables. Reads key names
// (one per line) from /tmp/graft_plan_keys.txt and the output suffix
// from GRAFT_PLAN_SUFFIX (before|after); writes to GRAFT_PLAN_DIR.
// Usage:
//   printf "llm_langid_ngram\n" > /tmp/graft_plan_keys.txt
//   GRAFT_PLAN_SUFFIX=after GRAFT_PLAN_DIR=/root/repo/plans/r19 \
//   /opt/spark/bin/spark-shell --master "local[$SPARK_GRAFT_CPUS]" \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.extensions=graft.gateway.GraftSqlExtensions \
//     --conf spark.sql.shuffle.partitions=$SPARK_GRAFT_CPUS \
//     -I tools/dump_plans.scala
object GraftPlanDumper {
  def run(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "after")
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_PLAN_DIR", "/root/repo/plans/r19"))
    java.nio.file.Files.createDirectories(outDir)
    val keys = java.nio.file.Files
      .readString(java.nio.file.Paths.get("/tmp/graft_plan_keys.txt"))
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    for (key <- keys) {
      try {
        val df = graft.SparkEntry.queries(key)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          outDir.resolve(s"${key}_$suffix.txt"), plan)
        println(s"WROTE $key")
      } catch {
        case e: Throwable => println(s"FAILED $key: $e")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
  }
}
GraftPlanDumper.run(spark)
sys.exit(0)
