package graft

import graft.pipeline.{PipelineRunner, PipelineSpec}
import org.apache.spark.sql.SparkSession

/** Cross-process warehouse stress actor (driven by
  * `WarehouseStressSpec`, which launches one `writer` and one
  * `churner` JVM against the SAME warehouse): empirically proves the
  * O_EXCL + max+1 manifest protocol's cross-JVM claims —
  *
  *  - every publish commits (the loser of a generation race re-links
  *    at the new max+1; nothing is overwritten or torn),
  *  - a concurrent reader NEVER observes a broken snapshot (each
  *    read resolves one committed manifest whose members exist),
  *  - vacuum under the cross-process grace window never deletes a
  *    member any committed-or-in-flight generation needs.
  *
  * Writer: merge-upserts a fresh key per iteration (+periodic
  * compact). Churner: full-table reads + vacuums with the default
  * grace. Any violated invariant makes the actor exit non-zero with
  * a HAMMER-FAIL line; success prints HAMMER-DONE with the final
  * row count for the spec to cross-check.
  */
object WarehouseHammer {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: WarehouseHammer <warehouse> <table> <writer|churner> <iters>")
    val Array(wh, table, actor, itersS) = args
    val iters = itersS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val r = new PipelineRunner(spark, PipelineSpec(Nil), wh)
    try {
      actor match {
        case "writer" =>
          for (i <- 0 until iters) {
            val n = r.mergeBatch(table,
              Seq((i.toLong, s"w$i")).toDF("id", "v"),
              batchId = i.toLong, uniqueKey = Seq("id"), buckets = 4)
            require(n == 1L, s"iteration $i upserted $n rows")
            if (i % 7 == 3) r.compact(table)
          }
          val rows = r.readTable(table).count()
          println(s"HAMMER-DONE writer rows=$rows")
        case "churner" =>
          var reads = 0
          var lastCount = -1L
          while (reads < iters) {
            if (r.tableExists(table)) {
              val c = r.readTable(table).count()
              require(c >= lastCount,
                s"snapshot went BACKWARDS: $lastCount -> $c")
              lastCount = c
              // default grace: another JVM's staged-but-unpublished
              // batch must survive this
              r.vacuum(table, keepGenerations = 3)
            }
            reads += 1
            Thread.sleep(50)
          }
          println(s"HAMMER-DONE churner rows=$lastCount")
        case other => sys.error(s"unknown actor $other")
      }
    } catch {
      case e: Throwable =>
        println(s"HAMMER-FAIL $actor: ${e.getClass.getSimpleName} " +
          String.valueOf(e.getMessage).linesIterator.take(2).mkString(" "))
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }
}
