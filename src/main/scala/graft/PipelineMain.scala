package graft

import graft.pipeline._
import org.apache.spark.sql.SparkSession

/** Process entry point mirroring the reference operator's contract
  * (`dbtoperator.py:25,121-178,387-434,454-461`): load a packaged
  * project (dir or zip), run the dbt-style commands FAIL-FAST in
  * order (a failing command skips the rest), always clean up, exit
  * non-zero on any failure — the shape a scheduler (Airflow task,
  * cron, CI step) invokes. The reference provisions a venv and
  * shells out to dbt; here the engine IS the process, so "init" is
  * warehouse initialization and "execute" is `PipelineRunner.run`.
  *
  * {{{
  *   graft.PipelineMain --project <dir|zip> --warehouse <dir> \
  *     [--master local[N]] [--log-level DEBUG|INFO|WARNING|ERROR] \
  *     <command> [<command> ...]
  *   # e.g.  ... seed "run --select tag:nightly" "test"
  * }}}
  *
  * Each positional arg is ONE command line (quote multi-word
  * commands), matching the reference's `commands: list[str]`.
  */
object PipelineMain {

  final case class Args(project: String, warehouse: String,
      master: String, level: LogLevel.Value, commands: Seq[String])

  private[graft] def parse(argv: Seq[String]): Args = {
    var project: Option[String] = None
    var warehouse: Option[String] = None
    var master = "local[*]"
    var level: LogLevel.Value = LogLevel.INFO
    val commands = Seq.newBuilder[String]
    var rest = argv.toList
    while (rest.nonEmpty) rest = rest match {
      case "--project" :: v :: t => project = Some(v); t
      case "--warehouse" :: v :: t => warehouse = Some(v); t
      case "--master" :: v :: t => master = v; t
      case "--log-level" :: v :: t =>
        level = LogLevel.values.find(_.toString == v.toUpperCase)
          .getOrElse(sys.error(s"unknown log level: $v"))
        t
      case flag :: _ if flag.startsWith("--") =>
        sys.error(s"unknown flag: $flag")
      case cmd :: t => commands += cmd; t
      case Nil => Nil
    }
    Args(
      project.getOrElse(sys.error("--project is required")),
      warehouse.getOrElse(sys.error("--warehouse is required")),
      master, level, commands.result())
  }

  /** Testable core: returns the process exit code. */
  private[graft] def run(argv: Seq[String],
      existing: Option[SparkSession] = None): Int =
    try {
      val a = parse(argv)
      require(a.commands.nonEmpty, "at least one command is required")
      val spec =
        if (a.project.endsWith(".zip")) {
          val scratch = java.nio.file.Files
            .createTempDirectory("graft_project").toString
          PipelineProject.loadZip(a.project, scratch)
        } else PipelineProject.load(a.project)
      val spark = existing.getOrElse(SparkSession.builder()
        .master(a.master)
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate())
      val logger = new PipelineLogger(a.level)
      // the reference's context-manager lifecycle: init on entry,
      // cleanup on exit even when a command failed
      val r = new PipelineRunner(spark, spec, a.warehouse, logger)
      val result =
        try { r.initialize(); r.run(a.commands) } finally r.cleanup()
      result.results.foreach { c =>
        val status = if (c.success) "ok" else "FAILED"
        logger.log(if (c.success) LogLevel.INFO else LogLevel.ERROR,
          s"command '${c.command}' $status " +
            s"(${c.modelsRun.size} nodes)" +
            c.error.map(e => s": $e").getOrElse(""))
      }
      if (existing.isEmpty) spark.stop()
      if (result.success) 0 else 1
    } catch {
      case e: Throwable =>
        System.err.println(s"[ERROR] ${e.getMessage}")
        2
    }

  def main(args: Array[String]): Unit = sys.exit(run(args.toIndexedSeq))
}
