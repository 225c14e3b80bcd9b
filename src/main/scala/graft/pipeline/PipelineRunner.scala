package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable

/** Leveled logger mirroring the reference's threshold filter
  * (`dbtoperator.py:16-22,93-119`).
  */
object LogLevel extends Enumeration {
  val DEBUG, INFO, WARNING, ERROR, SILENT = Value
}

final class PipelineLogger(threshold: LogLevel.Value = LogLevel.WARNING) {
  val lines: mutable.Buffer[(LogLevel.Value, String)] = mutable.Buffer.empty
  def log(level: LogLevel.Value, msg: String): Unit =
    if (level >= threshold && threshold != LogLevel.SILENT) {
      lines += ((level, msg))
      if (level >= LogLevel.WARNING) System.err.println(s"[$level] $msg")
    }
}

/** Result envelope per command — mirrors the reference's dict
  * {success, return_code, stdout, stderr, command}
  * (`dbtoperator.py:379-385`).
  */
final case class CommandResult(
    command: String,
    success: Boolean,
    modelsRun: Seq[String],
    rowCounts: Map[String, Long],
    error: Option[String])

final case class RunResult(success: Boolean, results: Seq[CommandResult])

/** Executes a PipelineSpec: topo-sorted model DAG with `--select`-style
  * filtering, fail-fast command loop, materializations, and generic
  * tests — the engine-native replacement for the reference's
  * venv+subprocess dbt invocation (`dbtoperator.py:314-452`).
  *
  * Lifecycle mirrors the reference: `initialize` (idempotent,
  * `dbtoperator.py:128-130`), ordered `run(commands)` stopping on
  * first failure (`dbtoperator.py:426-434`), `cleanup` always invoked
  * (`dbtoperator.py:446-451`), loan-pattern `withRunner` standing in
  * for __enter__/__exit__ (`dbtoperator.py:454-461`).
  *
  * Scale note: materialized tables are parquet directories under the
  * warehouse; a `table` rebuild is write-audit-publish (write to a
  * fresh generation dir, then atomically repoint), so readers never
  * see partial output — the same pattern works on object storage with
  * a manifest instead of a rename.
  */
final class PipelineRunner(spark: SparkSession, spec: PipelineSpec,
    warehouse: String, logger: PipelineLogger = new PipelineLogger()) {

  private val byName = spec.models.map(m => m.name -> m).toMap
  private var initialized = false
  // concurrent: models in the same dependency level may build in
  // parallel under `run --threads N`
  private val ephemeralCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Idempotent init (reference guard `dbtoperator.py:128-130`). */
  def initialize(): Unit = if (!initialized) {
    Files.createDirectories(Paths.get(warehouse))
    spec.sources.foreach { case (name, path) =>
      spark.read.parquet(path).createOrReplaceTempView(name)
    }
    initialized = true
    logger.log(LogLevel.INFO, s"initialized warehouse=$warehouse")
  }

  /** Kahn topo-sort with deterministic (name) tie order; cycles fail. */
  def topoOrder(names: Set[String]): Seq[String] = {
    val indeg = mutable.Map(names.toSeq.map(n =>
      n -> byName(n).deps.count(names)): _*)
    val out = mutable.Buffer.empty[String]
    val ready = mutable.SortedSet.empty[String] ++ indeg.filter(_._2 == 0).keys
    while (ready.nonEmpty) {
      val n = ready.head; ready -= n; out += n
      names.foreach { m =>
        if (byName(m).deps.contains(n) && indeg(m) > 0) {
          indeg(m) -= 1; if (indeg(m) == 0) ready += m
        }
      }
    }
    require(out.size == names.size,
      s"cycle among models: ${names -- out.toSet}")
    out.toSeq
  }

  /** dbt `--select` subset: "m" (exact), "m+" (m and descendants),
    * "+m" (m and ancestors), "+m+" (both). (`dbtoperator.py:35,491`
    * passes selects straight to dbt.)
    */
  def select(selector: Option[String]): Set[String] = selector match {
    case None => spec.models.map(_.name).toSet
    case Some(sel) =>
      val plusPre = sel.startsWith("+")
      val plusPost = sel.endsWith("+")
      val base = sel.stripPrefix("+").stripSuffix("+")
      require(byName.contains(base), s"unknown model: $base")
      val res = mutable.Set(base)
      if (plusPre) { // ancestors
        var grew = true
        while (grew) {
          val add = res.flatMap(n => byName(n).deps).diff(res)
          grew = add.nonEmpty; res ++= add
        }
      }
      if (plusPost) { // descendants
        var grew = true
        while (grew) {
          val add = spec.models.filter(m =>
            m.deps.exists(res) && !res(m.name)).map(_.name)
          grew = add.nonEmpty; res ++= add
        }
      }
      res.toSet
  }

  def tablePath(name: String): String = s"$warehouse/$name"

  /** Storage layout (write-audit-publish, manifest-based): immutable
    * data batches live under `<table>/data/batch_<n>`; a committed
    * generation is a manifest file `<table>/gen_<n>` listing its member
    * batches (one relative path per line); `_CURRENT` names the live
    * manifest and is flipped atomically. Readers resolve the manifest
    * once and only ever see fully-written batches — a crash between
    * batch write and pointer flip leaves the previous generation
    * intact. An append commits O(delta) bytes (new batch + manifest),
    * not O(history); the same manifest scheme works unchanged on
    * object storage where directory renames aren't atomic.
    */
  private def currentManifest(name: String): Option[Seq[String]] = {
    val marker = Paths.get(tablePath(name), "_CURRENT")
    if (!Files.exists(marker)) None
    else {
      val gen = Files.readString(marker).trim
      Some(Files.readString(Paths.get(tablePath(name), gen)).linesIterator
        .filter(_.nonEmpty).toSeq)
    }
  }

  def readTable(name: String): DataFrame =
    currentManifest(name) match {
      case Some(members) =>
        spark.read.parquet(members.map(m => s"${tablePath(name)}/$m"): _*)
      case None => sys.error(s"table $name does not exist")
    }

  def tableExists(name: String): Boolean = currentManifest(name).isDefined

  private val batchCounter = new java.util.concurrent.atomic.AtomicLong()
  private def nextId(): Long =
    System.nanoTime() + batchCounter.incrementAndGet()

  /** Write one immutable data batch; returns its manifest-relative path. */
  private def writeBatch(name: String, write: String => Unit): String = {
    val rel = s"data/batch_${nextId()}"
    Files.createDirectories(Paths.get(tablePath(name), "data"))
    write(Paths.get(tablePath(name), rel).toString)
    rel
  }

  /** Atomically commit a new generation made of `members`. */
  private def publishManifest(name: String, members: Seq[String]): Unit = {
    val dir = Paths.get(tablePath(name))
    Files.createDirectories(dir)
    val gen = s"gen_${nextId()}"
    Files.writeString(dir.resolve(gen), members.mkString("\n"))
    val tmp = dir.resolve("_CURRENT.tmp")
    Files.writeString(tmp, gen)
    Files.move(tmp, dir.resolve("_CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Full-refresh publish: one new batch becomes the whole table. */
  private def publish(name: String, write: String => Unit): Unit =
    publishManifest(name, Seq(writeBatch(name, write)))

  /** Garbage-collect batches and manifests no longer referenced by the
    * current generation (failed writes, superseded full refreshes).
    * Safe for readers of the current generation — only unreferenced
    * files go; run it like a warehouse VACUUM after retention.
    */
  def vacuum(name: String): Unit = currentManifest(name).foreach { members =>
    import scala.jdk.CollectionConverters._
    val root = Paths.get(tablePath(name))
    val keep = members.map(m => root.resolve(m).normalize).toSet
    val dataDir = root.resolve("data")
    def deleteRec(p: Path): Unit =
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    if (Files.exists(dataDir))
      Files.list(dataDir).iterator().asScala.toSeq
        .filterNot(b => keep.contains(b.normalize))
        .foreach(deleteRec)
    val cur = Files.readString(root.resolve("_CURRENT")).trim
    Files.list(root).iterator().asScala.toSeq
      .filter { p =>
        val f = p.getFileName.toString
        f.startsWith("gen_") && f != cur
      }
      .foreach(Files.deleteIfExists(_))
  }

  /** Level-parallel model execution (dbt `--threads`): models whose
    * dependencies are all satisfied run concurrently on the shared
    * SparkSession; a failure aborts before the next level starts
    * (fail-fast at level granularity).
    */
  private def runLevelled(names: Seq[String], threads: Int): Seq[(String, Long)] = {
    val selected = names.toSet
    val level = mutable.Map.empty[String, Int]
    names.foreach { n => // names are topo-ordered, deps resolved first
      val depLevels = byName(n).deps.filter(selected).map(level)
      level(n) = (if (depLevels.isEmpty) -1 else depLevels.max) + 1
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      names.groupBy(level).toSeq.sortBy(_._1).flatMap { case (_, lvl) =>
        val running = lvl.map(n =>
          n -> scala.concurrent.Future(n -> runModel(n)))
        running.map { case (_, f) =>
          scala.concurrent.Await.result(f,
            scala.concurrent.duration.Duration.Inf)
        }
      }
    } finally pool.shutdown()
  }

  /** Resolve a model's inputs: sources (temp views already registered)
    * + upstream models (ephemeral inlined, others read back).
    */
  private def inputs(m: Model): Map[String, DataFrame] =
    m.deps.map { dep =>
      byName.get(dep) match {
        case Some(d) if d.materialization == Materialization.Ephemeral =>
          dep -> ephemeralCache.getOrElseUpdate(dep, runEphemeral(d))
        case Some(d) if d.materialization == Materialization.View =>
          dep -> spark.table(dep)
        case Some(_) => dep -> readTable(dep)
        case None    => dep -> spark.table(dep) // source view
      }
    }.toMap

  private def runEphemeral(m: Model): DataFrame = m.build(spark, inputs(m))

  /** Materialize one model; returns rows written (−1 for views). */
  def runModel(name: String): Long = {
    val m = byName(name)
    val df = m.build(spark, inputs(m))
    m.materialization match {
      case Materialization.View =>
        df.createOrReplaceTempView(name); -1L

      case Materialization.Ephemeral =>
        ephemeralCache(name) = df; -1L

      case Materialization.Table =>
        publish(name, p => df.write.mode("overwrite").parquet(p))
        readTable(name).count()

      case Materialization.IncrementalAppend(tsCol) =>
        if (!tableExists(name))
          publish(name, p => df.write.mode("overwrite").parquet(p))
        else {
          // null high-water mark (empty table / all-null ts) means
          // "nothing loaded yet" → append everything, not nothing
          val hwm = readTable(name).agg(max(col(tsCol))).head().get(0)
          val delta = if (hwm == null) df else df.filter(col(tsCol) > lit(hwm))
          // stage the delta as a new batch, then commit old ∪ delta as
          // a new generation — a mid-write crash leaves the previous
          // generation live (readers never see partial delta files)
          val deltaBatch = writeBatch(name,
            p => delta.write.mode("overwrite").parquet(p))
          publishManifest(name,
            currentManifest(name).get :+ deltaBatch)
        }
        readTable(name).count()

      case Materialization.IncrementalInsertOverwrite(parts) =>
        if (!tableExists(name))
          publish(name, p =>
            df.write.mode("overwrite").partitionBy(parts: _*).parquet(p))
        else {
          // insert_overwrite semantics: replace exactly the partitions
          // present in the new batch, keep the rest. Rewritten as
          // kept-rows ∪ new-batch and committed atomically — the
          // touched-partition set is tiny, so the anti-join broadcasts.
          val touched = df.select(parts.map(col): _*).distinct()
          val kept = readTable(name)
            .join(broadcast(touched), parts, "left_anti")
          val merged = kept.unionByName(df)
          publish(name, p =>
            merged.write.mode("overwrite").partitionBy(parts: _*).parquet(p))
        }
        readTable(name).count()

      // MERGE emulation for vanilla parquet (no Delta/Iceberg in this
      // stack): anti-join out updated keys, union the batch, publish.
      // SCALE NOTE: this rewrites the whole table per merge — correct
      // but O(table). At 100 TB, partition the target on a stable key
      // range and use insert_overwrite so only touched partitions
      // rewrite, or adopt a deletion-vector format.
      case Materialization.IncrementalMerge(keys) =>
        if (!tableExists(name))
          publish(name, p => df.write.mode("overwrite").parquet(p))
        else {
          val existing = readTable(name)
          val merged = existing
            .join(df.select(keys.map(col): _*), keys, "left_anti")
            .unionByName(df)
          publish(name, p => merged.write.mode("overwrite").parquet(p))
        }
        readTable(name).count()
    }
  }

  /** Load one seed CSV (header + declared schema) and publish it. */
  private def runSeed(seed: Seed): Long = {
    import spark.implicits._
    val df = spark.read.option("header", "true").schema(seed.schema)
      .csv(spark.createDataset(seed.csvLines))
    publish(seed.name, p => df.write.mode("overwrite").parquet(p))
    readTable(seed.name).count()
  }

  /** One SCD2 snapshot step at the injected timestamp `asOf`. */
  private def runSnapshot(sn: SnapshotDef, asOf: String): Long = {
    val source =
      if (tableExists(sn.source)) readTable(sn.source)
      else spark.table(sn.source)
    val prev = if (tableExists(sn.name)) Some(readTable(sn.name)) else None
    val next = Snapshot.scd2(prev, source, sn.keyCols, sn.compareCols, asOf)
    publish(sn.name, p => next.write.mode("overwrite").parquet(p))
    readTable(sn.name).count()
  }

  /** One dbt-style command — the same argv surface the reference
    * shells out (`dbtoperator.py:35,46,324,334`): "debug",
    * "run [--select sel]", "test", "seed", "snapshot --at <ts>".
    */
  def runCommand(command: String): CommandResult = {
    val parts = command.trim.split("\\s+").toSeq
    try {
      // init failures (e.g. unreadable source) become a failed result
      // envelope, mirroring the reference's init envelope
      // (`dbtoperator.py:168-174`)
      initialize()
      parts match {
        // connectivity / environment check (the reference's default
        // command list is [['debug']], `dbtoperator.py:46`)
        case Seq("debug") =>
          val missing = spec.sources.keys
            .filterNot(spark.catalog.tableExists(_)).toSeq
          CommandResult(command, success = missing.isEmpty, Nil, Map.empty,
            if (missing.isEmpty) None
            else Some(s"unresolvable sources: ${missing.mkString(",")}"))
        case "run" +: flags if flags.grouped(2).forall {
            case Seq("--select", _) | Seq("--threads", _) => true
            case _ => false } =>
          val flagMap = flags.grouped(2)
            .collect { case Seq(k, v) => k -> v }.toMap
          val sel = flagMap.get("--select")
          val threads = flagMap.get("--threads").map(_.toInt).getOrElse(1)
          val names = topoOrder(select(sel))
          val counts =
            (if (threads <= 1) names.map(n => n -> runModel(n))
             else runLevelled(names, threads)).toMap
          logger.log(LogLevel.INFO,
            s"ran ${names.size} models (threads=$threads)")
          CommandResult(command, success = true, names,
            counts.filter(_._2 >= 0), None)
        case Seq("test") =>
          val failures = spec.tests.flatMap { t =>
            val viol = DataTests.violations(spark, this, t)
            val n = viol.limit(1).count()
            if (n > 0) Some(t.name) else None
          }
          CommandResult(command, success = failures.isEmpty,
            spec.tests.map(_.name),
            Map.empty,
            if (failures.isEmpty) None
            else Some(s"failing tests: ${failures.mkString(",")}"))
        case Seq("seed") =>
          val counts = spec.seeds.map(sd => sd.name -> runSeed(sd)).toMap
          CommandResult(command, success = true,
            spec.seeds.map(_.name), counts, None)
        case Seq("snapshot", "--at", asOf) =>
          val counts = spec.snapshots
            .map(sn => sn.name -> runSnapshot(sn, asOf)).toMap
          CommandResult(command, success = true,
            spec.snapshots.map(_.name), counts, None)
        case other =>
          CommandResult(command, success = false, Nil, Map.empty,
            Some(s"unknown command: ${other.mkString(" ")}"))
      }
    } catch {
      case e: Throwable =>
        logger.log(LogLevel.ERROR, s"$command failed: ${e.getMessage}")
        CommandResult(command, success = false, Nil, Map.empty,
          Some(e.getMessage))
    }
  }

  /** Ordered execution, stop on first failure — exactly the
    * reference's execute loop (`dbtoperator.py:426-434`); cleanup is
    * the caller's duty via withRunner (finally-semantics,
    * `dbtoperator.py:446-451`).
    */
  def run(commands: Seq[String]): RunResult = {
    val results = mutable.Buffer.empty[CommandResult]
    var ok = true
    val it = commands.iterator
    while (ok && it.hasNext) {
      val r = runCommand(it.next())
      results += r
      if (!r.success) ok = false // remaining commands are skipped
    }
    RunResult(ok, results.toSeq)
  }

  /** Drop temp views + scratch dirs (`dbtoperator.py:387-408`). */
  def cleanup(): Unit = {
    spec.models.filter(_.materialization == Materialization.View)
      .foreach(m => spark.catalog.dropTempView(m.name))
    spec.sources.keys.foreach(spark.catalog.dropTempView(_))
    ephemeralCache.clear()
  }
}

object PipelineRunner {
  /** Loan pattern mirroring the reference's context manager
    * (`dbtoperator.py:454-461`): init on entry, cleanup on exit even
    * on failure.
    */
  def withRunner[T](spark: SparkSession, spec: PipelineSpec,
      warehouse: String)(f: PipelineRunner => T): T = {
    val r = new PipelineRunner(spark, spec, warehouse)
    try { r.initialize(); f(r) } finally r.cleanup()
  }
}
