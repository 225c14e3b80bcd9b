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
  *     [--serve-sql-port N [--serve-token T]] \
  *     [--serve-thrift-port N] [--serve-ms N] \
  *     <command> [<command> ...]
  *   # e.g.  ... seed "run --select tag:nightly" "test"
  * }}}
  *
  * Each positional arg is ONE command line (quote multi-word
  * commands), matching the reference's `commands: list[str]`.
  *
  * SERVE mode: after the build commands succeed, `--serve-sql-port`
  * starts the JSON [[graft.gateway.SqlGateway]] (loopback,
  * shared-secret token — supplied via `--serve-token` or generated
  * and logged) and `--serve-thrift-port` the wire-compatible
  * HiveServer2 endpoint ([[graft.gateway.ThriftGateway]]), then the
  * process blocks until SIGTERM (`--serve-ms` bounds it for tests).
  * Published warehouse tables are queryable by bare name — the
  * reference's dbt-over-Thrift client shape against a long-lived
  * engine process. With serve flags, zero commands is allowed (pure
  * serving over an existing warehouse).
  */
object PipelineMain {

  final case class Args(project: String, warehouse: String,
      master: String, level: LogLevel.Value, commands: Seq[String],
      sqlPort: Option[Int] = None, thriftPort: Option[Int] = None,
      serveToken: Option[String] = None, serveMs: Option[Long] = None)

  private[graft] def parse(argv: Seq[String]): Args = {
    var project: Option[String] = None
    var warehouse: Option[String] = None
    var master = "local[*]"
    var level: LogLevel.Value = LogLevel.INFO
    var sqlPort: Option[Int] = None
    var thriftPort: Option[Int] = None
    var serveToken: Option[String] = None
    var serveMs: Option[Long] = None
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
      case "--serve-sql-port" :: v :: t => sqlPort = Some(v.toInt); t
      case "--serve-thrift-port" :: v :: t => thriftPort = Some(v.toInt); t
      case "--serve-token" :: v :: t => serveToken = Some(v); t
      case "--serve-ms" :: v :: t => serveMs = Some(v.toLong); t
      case flag :: _ if flag.startsWith("--") =>
        sys.error(s"unknown flag: $flag")
      case cmd :: t => commands += cmd; t
      case Nil => Nil
    }
    Args(
      project.getOrElse(sys.error("--project is required")),
      warehouse.getOrElse(sys.error("--warehouse is required")),
      master, level, commands.result(),
      sqlPort, thriftPort, serveToken, serveMs)
  }

  /** Testable core: returns the process exit code. */
  private[graft] def run(argv: Seq[String],
      existing: Option[SparkSession] = None): Int =
    try {
      val a = parse(argv)
      val serving = a.sqlPort.isDefined || a.thriftPort.isDefined
      require(a.commands.nonEmpty || serving,
        "at least one command (or a --serve-* port) is required")
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
        // Thrift connections get their OWN sessions (real HS2 shape);
        // published warehouse tables resolve by bare name through the
        // global-temp-view fallback rule (ThriftGateway posture)
        .config("spark.sql.extensions", "graft.gateway.GraftSqlExtensions")
        .getOrCreate())
      val logger = new PipelineLogger(a.level)
      // the reference's context-manager lifecycle: init on entry,
      // cleanup on exit even when a command failed
      val r = new PipelineRunner(spark, spec, a.warehouse, logger)
      val result =
        try {
          r.initialize()
          val res = r.run(a.commands)
          if (res.success && serving) serve(spark, a, logger)
          res
        } finally r.cleanup()
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

  /** Start the requested gateways, block until SIGTERM (or
    * `--serve-ms`), stop them.
    */
  private def serve(spark: SparkSession, a: Args,
      logger: PipelineLogger): Unit = {
    val sql = a.sqlPort.map { p =>
      val gw = new graft.gateway.SqlGateway(spark,
        requestedPort = p, token = a.serveToken).start()
      logger.log(LogLevel.INFO,
        s"serving SQL gateway on 127.0.0.1:${gw.port}" +
          (if (a.serveToken.isEmpty) s" token=${gw.authToken}" else ""))
      gw
    }
    val thrift = a.thriftPort.map { p =>
      val h = graft.gateway.ThriftGateway.start(spark, p)
      logger.log(LogLevel.INFO,
        s"serving HiveServer2 thrift on 127.0.0.1:$p " +
          "(jdbc:hive2://127.0.0.1:" + p + ")")
      h
    }
    val done = new java.util.concurrent.CountDownLatch(1)
    val cleaned = new java.util.concurrent.CountDownLatch(1)
    // on SIGTERM the hook must WAIT for the main thread's gateway
    // stop — a bare countDown would let the JVM halt mid-cleanup
    val hook = new Thread(() => {
      done.countDown()
      cleaned.await(10, java.util.concurrent.TimeUnit.SECONDS): Unit
    })
    Runtime.getRuntime.addShutdownHook(hook)
    try {
      a.serveMs match {
        case Some(ms) => done.await(ms,
          java.util.concurrent.TimeUnit.MILLISECONDS): Unit
        case None => done.await()
      }
    } finally {
      try Runtime.getRuntime.removeShutdownHook(hook)
      catch { case _: IllegalStateException => () } // mid-shutdown
      sql.foreach(_.stop())
      thrift.foreach(_.close())
      logger.log(LogLevel.INFO, "gateways stopped")
      cleaned.countDown()
    }
  }

  def main(args: Array[String]): Unit = sys.exit(run(args.toIndexedSeq))
}
