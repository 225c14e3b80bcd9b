package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Read-only Delta Lake table reader over the PUBLIC Delta
  * transaction-log protocol (delta.io PROTOCOL.md) — no Delta jar:
  * the log is newline-delimited JSON actions under `_delta_log/`
  * (`add`/`remove`/`metaData`/`protocol`), optionally snapshotted in
  * a parquet checkpoint. The dbt-spark ecosystem the reference pins
  * (`dbtoperator.py:274`) stores incremental-merge targets as Delta;
  * this reader lets the engine POINT AT such a table and scan its
  * current (or a past) snapshot.
  *
  * Supported: reader-version 1/2 tables without column mapping or
  * deletion vectors (rejected LOUDLY, never silently misread),
  * single-file checkpoints, partitioned tables (partition values come
  * from the log's `add.partitionValues`, attached per file group —
  * the spec says data files need not encode them). `versionAsOf`
  * replays the log only up to that commit — Delta time travel.
  *
  * Scale notes: log replay is driver-side over METADATA (one small
  * JSON doc per commit; the checkpoint bounds replay length exactly
  * as in delta-rs/Delta itself). The data scan is a plain
  * multi-file `spark.read.parquet` with the log-declared schema —
  * predicate pushdown and column pruning apply as usual.
  */
object DeltaRead {

  private case class AddFile(path: String,
      partitionValues: Map[String, String])

  private case class LogState(
      adds: Map[String, AddFile] = Map.empty,
      schemaJson: Option[String] = None,
      partitionCols: Seq[String] = Nil,
      minReader: Int = 1,
      configuration: Map[String, String] = Map.empty)

  private implicit val fmts: Formats = DefaultFormats

  private def strMap(v: JValue): Map[String, String] = v match {
    case JObject(fields) => fields.collect {
      case (k, JString(s)) => k -> s
      case (k, JNull) => k -> null
    }.toMap
    case _ => Map.empty
  }

  private def applyAction(st: LogState, action: JValue): LogState =
    action match {
      case JObject(fields) => fields.foldLeft(st) {
        case (s, ("add", a)) =>
          require((a \ "deletionVector") == JNothing,
            "Delta table uses deletion vectors — unsupported by this " +
              "read-only reader (compact the table or drop DVs)")
          val p = (a \ "path").extract[String]
          s.copy(adds = s.adds + (p -> AddFile(p, strMap(a \ "partitionValues"))))
        case (s, ("remove", r)) =>
          s.copy(adds = s.adds - (r \ "path").extract[String])
        case (s, ("metaData", m)) =>
          s.copy(
            schemaJson = Some((m \ "schemaString").extract[String]),
            partitionCols = (m \ "partitionColumns") match {
              case JArray(xs) => xs.map(_.extract[String])
              case _ => Nil
            },
            configuration = strMap(m \ "configuration"))
        case (s, ("protocol", p)) =>
          s.copy(minReader = (p \ "minReaderVersion").extract[Int])
        // commitInfo / txn / cdc / domainMetadata don't affect the
        // main snapshot's file set
        case (s, _) => s
      }
      case _ => st
    }

  /** Current (or `versionAsOf`) snapshot of the Delta table at `path`. */
  def readDeltaTable(spark: SparkSession, path: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val logDir = java.nio.file.Paths.get(path, "_delta_log")
    require(java.nio.file.Files.isDirectory(logDir),
      s"not a Delta table (no _delta_log): $path")
    import scala.jdk.CollectionConverters._
    val entries = {
      val s = java.nio.file.Files.list(logDir)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }
    val commitRe = """(\d{20})\.json""".r
    val commits = entries.collect { case commitRe(v) => v.toLong }.sorted
      .filter(v => versionAsOf.forall(v <= _))
    versionAsOf.foreach(v => require(commits.contains(v),
      s"version $v does not exist in $path (have: " +
        s"${commits.headOption.getOrElse("-")}..${commits.lastOption.getOrElse("-")})"))

    // single-file checkpoint bound: start replay from the newest
    // checkpoint at or below the target version
    val ckRe = """(\d{20})\.checkpoint\.parquet""".r
    val ckVersion = entries.collect { case ckRe(v) => v.toLong }
      .filter(v => versionAsOf.forall(v <= _))
      .sorted.lastOption
    require(!entries.exists(_.matches("""\d{20}\.checkpoint\.\d{10}\.\d{10}\.parquet""")),
      s"multi-part Delta checkpoints are unsupported: $path")

    val fromCheckpoint: LogState = ckVersion match {
      case None => LogState()
      case Some(v) =>
        val ck = spark.read.parquet(
          logDir.resolve(f"$v%020d.checkpoint.parquet").toString)
        val cols = ck.columns.toSet
        def rowsOf(c: String) =
          if (cols.contains(c)) ck.filter(col(c).isNotNull).select(col(c))
            .toJSON.collect().toSeq
          else Nil
        // re-use the JSON action replay for checkpoint rows: each row
        // is {"add": {...}} / {"metaData": {...}} / {"protocol": {...}}
        (rowsOf("protocol") ++ rowsOf("metaData") ++ rowsOf("add"))
          .foldLeft(LogState())((s, j) => applyAction(s, JsonMethods.parse(j)))
    }

    val replay = commits.filter(v => ckVersion.forall(v > _))
    val state = replay.foldLeft(fromCheckpoint) { (s, v) =>
      val text = java.nio.file.Files.readString(
        logDir.resolve(f"$v%020d.json"))
      text.linesIterator.filter(_.trim.nonEmpty)
        .foldLeft(s)((st, line) => applyAction(st, JsonMethods.parse(line)))
    }

    require(state.minReader <= 2,
      s"Delta reader version ${state.minReader} > 2 unsupported: $path")
    require(!state.configuration.get("delta.columnMapping.mode")
      .exists(m => m != "none"),
      s"Delta column mapping is unsupported by this reader: $path")
    val fullSchema = DataType.fromJson(state.schemaJson.getOrElse(
      sys.error(s"Delta log has no metaData action: $path")))
      .asInstanceOf[StructType]

    val dataSchema = StructType(
      fullSchema.filterNot(f => state.partitionCols.contains(f.name)))
    // the protocol stores add/remove paths RFC-2396 percent-encoded
    // (a partition value with a space writes `seg=a%20b/...`) —
    // decode relative paths before resolving; absolute URIs pass
    // through for the filesystem layer to interpret
    def abs(p: String): String =
      if (p.contains("://")) p
      else {
        val decoded =
          try new java.net.URI(p).getPath
          catch { case _: java.net.URISyntaxException => p }
        if (decoded.startsWith("/")) decoded else s"$path/$decoded"
      }

    if (state.adds.isEmpty) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], fullSchema)
    } else if (state.partitionCols.isEmpty) {
      spark.read.schema(dataSchema)
        .parquet(state.adds.keys.map(abs).toSeq.sorted: _*)
    } else {
      // partition values are authoritative in the LOG, not the file
      // paths — attach them per distinct-value file group and union;
      // group count = live partition count, same order as a
      // partitioned scan's directory listing
      val groups = state.adds.values.toSeq
        .groupBy(_.partitionValues).toSeq
        .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
      val parts = groups.map { case (pv, files) =>
        val base = spark.read.schema(dataSchema)
          .parquet(files.map(f => abs(f.path)).sorted: _*)
        state.partitionCols.foldLeft(base) { (df, pc) =>
          val f = fullSchema(pc)
          val raw = pv.getOrElse(pc, null)
          df.withColumn(pc,
            (if (raw == null) lit(null) else lit(raw)).cast(f.dataType))
        }
      }
      parts.reduce(_.unionByName(_)).select(fullSchema.map(f => col(f.name)): _*)
    }
  }
}
