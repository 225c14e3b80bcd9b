package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StringType, StructField, StructType}
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
  * Supported: reader version 1/2, and version 3 when every
  * `readerFeatures` entry is one this reader implements —
  * `deletionVectors` (default-on in modern writers; decoded via
  * [[DeletionVectors]] and applied as an anti-join on
  * `_metadata.row_index`), `columnMapping` in BOTH modes — `name`
  * (data files store per-field physical `col-<uuid>` names; the scan
  * reads the physical schema and one struct-cast per top-level
  * column restores the logical names, nested fields included) and
  * `id` (same physical-name scan, with each field's
  * `delta.columnMapping.id` additionally attached as
  * `parquet.field.id` metadata and Spark's field-id resolution
  * enabled — see [[toPhysicalWithIds]] for why both channels) —
  * `timestampNtz`, `vacuumProtocolCheck`, and `v2Checkpoint`
  * (default-on in current Delta writers). Unknown features are
  * rejected LOUDLY, never silently misread.
  * Single-file, complete multi-part AND v2 (UUID-named json/parquet
  * manifest + `_sidecars/` parquet file actions) checkpoints bound
  * the replay.
  * Partition values come from the log's `add.partitionValues`
  * (authoritative — the spec says data files need not encode them;
  * physical-keyed under mapping, logical keys tolerated).
  * `versionAsOf` replays the log only up to that commit.
  * [[readChanges]] exposes the table's Change Data Feed (row-level
  * `_change_type`/`_commit_version` history over a commit range).
  *
  * Scale notes: log replay is driver-side over METADATA (one small
  * JSON doc per commit; the checkpoint bounds replay length, as in
  * delta-rs) — the driver holds O(files) descriptors, never decoded
  * DV row indexes: sidecar bitmaps decode in EXECUTORS via a
  * `binaryFile` scan + flatMap feeding the anti-join.
  * The data scan is ALWAYS a single multi-file `spark.read.parquet`
  * node: partition values attach via a `_metadata.file_path`
  * broadcast-map join above `unionGroupMax` live partitions (a
  * per-partition union would be a driver-side plan explosion at the
  * 10³–10⁵ partition counts of real tables), and a per-group union
  * with literal columns below it (cheapest plan for small tables).
  * Predicate pushdown and column pruning apply as usual.
  */
object DeltaRead {

  private[sources] case class AddFile(path: String,
      partitionValues: Map[String, String],
      dv: Option[DeletionVectors.Descriptor],
      stats: Option[String] = None,
      // the add action as committed — checkpoints re-emit it verbatim
      raw: JValue = JNothing)

  private[sources] case class LogState(
      adds: Map[String, AddFile] = Map.empty, // keyed by (path, dvUniqueId)
      schemaJson: Option[String] = None,
      partitionCols: Seq[String] = Nil,
      minReader: Int = 1,
      readerFeatures: Set[String] = Set.empty,
      configuration: Map[String, String] = Map.empty,
      // last-wins raw actions, for checkpoint re-emission
      rawMetaData: JValue = JNothing,
      rawProtocol: JValue = JNothing,
      // remove tombstones still pending expiry, keyed like adds: the
      // protocol requires checkpoints to RETAIN unexpired tombstones
      // (another engine's VACUUM consults them after log cleanup); a
      // re-add of the same (path, dvId) clears its tombstone
      tombstones: Map[String, JValue] = Map.empty,
      // streaming-writer transaction watermarks (appId → version):
      // the protocol's exactly-once contract — a writer skips any
      // batch at or below its recorded version
      txns: Map[String, Long] = Map.empty)

  private implicit val fmts: Formats = DefaultFormats

  private def strMap(v: JValue): Map[String, String] = v match {
    case JObject(fields) => fields.collect {
      case (k, JString(s)) => k -> s
      case (k, JNull) => k -> null
    }.toMap
    case _ => Map.empty
  }

  private[sources] def dvOf(a: JValue): Option[DeletionVectors.Descriptor] =
    (a \ "deletionVector") match {
      case JNothing | JNull => None
      case d => Some(DeletionVectors.Descriptor(
        storageType = (d \ "storageType").extract[String],
        pathOrInlineDv = (d \ "pathOrInlineDv").extract[String],
        offset = (d \ "offset").extractOpt[Int],
        sizeInBytes = (d \ "sizeInBytes").extract[Int],
        cardinality = (d \ "cardinality").extract[Long]))
    }

  // file actions are keyed by (path, dvUniqueId) per the protocol: an
  // add that attaches a DV to an existing file coexists in one commit
  // with the remove of the (path, no-DV) pairing, in either order
  private def fileKey(path: String, dv: Option[DeletionVectors.Descriptor]) =
    path + "\u0000" + DeletionVectors.uniqueId(dv)

  private def applyAction(st: LogState, action: JValue): LogState =
    action match {
      case JObject(fields) => fields.foldLeft(st) {
        case (s, ("add", a)) =>
          val p = (a \ "path").extract[String]
          val dv = dvOf(a)
          val key = fileKey(p, dv)
          s.copy(adds = s.adds + (key -> AddFile(p,
            strMap(a \ "partitionValues"), dv,
            (a \ "stats").extractOpt[String].filter(_.nonEmpty),
            raw = a)),
            tombstones = s.tombstones - key)
        case (s, ("remove", r)) =>
          val p = (r \ "path").extract[String]
          val key = fileKey(p, dvOf(r))
          s.copy(adds = s.adds - key,
            tombstones = s.tombstones + (key -> r))
        case (s, ("metaData", m)) =>
          s.copy(
            schemaJson = Some((m \ "schemaString").extract[String]),
            partitionCols = (m \ "partitionColumns") match {
              case JArray(xs) => xs.map(_.extract[String])
              case _ => Nil
            },
            configuration = strMap(m \ "configuration"),
            rawMetaData = m)
        case (s, ("protocol", p)) =>
          s.copy(
            minReader = (p \ "minReaderVersion").extract[Int],
            readerFeatures = (p \ "readerFeatures") match {
              case JArray(xs) => xs.map(_.extract[String]).toSet
              case _ => Set.empty
            },
            rawProtocol = p)
        case (s, ("txn", t)) =>
          s.copy(txns = s.txns + ((t \ "appId").extract[String] ->
            (t \ "version").extract[Long]))
        // commitInfo / cdc / domainMetadata don't affect the main
        // snapshot's file set
        case (s, _) => s
      }
      case _ => st
    }

  /** Reader-version-3 features this reader implements. */
  private val SupportedReaderFeatures =
    Set("deletionVectors", "timestampNtz", "vacuumProtocolCheck",
      "columnMapping", "v2Checkpoint")

  private val PhysicalNameKey = "delta.columnMapping.physicalName"
  private val FieldIdKey = "delta.columnMapping.id"
  private val ParquetFieldId = "parquet.field.id"

  /** A parquet reader with field-id resolution enabled FOR THIS SCAN
    * ONLY when the table is id-column-mapped: reader options land in
    * the scan's per-relation Hadoop conf
    * (`newHadoopConfWithOptions`), so a user's session-level choice of
    * `spark.sql.parquet.fieldId.read.enabled` is never silently
    * overridden for later unrelated scans (it used to be flipped on
    * the shared session conf as a read side effect).
    */
  private[sources] def pqReader(spark: SparkSession, idMapped: Boolean)
      : org.apache.spark.sql.DataFrameReader =
    if (idMapped)
      spark.read.option("spark.sql.parquet.fieldId.read.enabled", "true")
    else spark.read

  /** Under column-mapping `name` mode, data files store PHYSICAL
    * column names (`col-<uuid>`), recorded per field in the schema's
    * metadata; rename the logical schema recursively to get the
    * on-disk read schema.
    */
  private def toPhysical(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map { f =>
      val phys =
        if (f.metadata.contains(PhysicalNameKey))
          f.metadata.getString(PhysicalNameKey)
        else f.name
      f.copy(name = phys, dataType = toPhysical(f.dataType))
    })
    case ArrayType(et, n) => ArrayType(toPhysical(et), n)
    case MapType(kt, vt, n) => MapType(toPhysical(kt), toPhysical(vt), n)
    case other => other
  }

  /** Under column-mapping `id` mode the read schema resolves columns
    * through BOTH protocol channels: each field's
    * `delta.columnMapping.id` attaches as `parquet.field.id` metadata
    * (Spark's row-based parquet reader resolves by field id when
    * `spark.sql.parquet.fieldId.read.enabled` is on), and the field
    * renames to its `delta.columnMapping.physicalName` (what the
    * vectorized reader — which matches by name — binds against). The
    * protocol makes the two equivalent: id mode assigns every column
    * an immutable field id AND an immutable, unique physical name,
    * and data files carry both, so keeping the name channel preserves
    * the fast vectorized scan without weakening resolution. A field
    * missing either assignment under id mapping is a protocol
    * violation — fail loudly, a logical-name fallback could silently
    * read the wrong column.
    */
  private def toPhysicalWithIds(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map { f =>
      require(f.metadata.contains(FieldIdKey),
        s"column '${f.name}' lacks $FieldIdKey under id column mapping")
      require(f.metadata.contains(PhysicalNameKey),
        s"column '${f.name}' lacks $PhysicalNameKey under id column mapping")
      val meta = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong(ParquetFieldId, f.metadata.getLong(FieldIdKey)).build()
      f.copy(name = f.metadata.getString(PhysicalNameKey),
        metadata = meta, dataType = toPhysicalWithIds(f.dataType))
    })
    case ArrayType(et, n) => ArrayType(toPhysicalWithIds(et), n)
    case MapType(kt, vt, n) =>
      MapType(toPhysicalWithIds(kt), toPhysicalWithIds(vt), n)
    case other => other
  }

  // the protocol stores add/remove paths RFC-2396 percent-encoded (a
  // partition value with a space writes `seg=a%20b/...`); decode the
  // escapes DIRECTLY — full java.net.URI parsing would treat a ':' in
  // the first segment as a scheme (null getPath) and strip '?'/'#'
  private[graft] def pctDecode(s: String): String = {
    if (!s.contains('%')) return s
    val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        bytes += Integer.parseInt(s.substring(i + 1, i + 3), 16).toByte
        i += 3
      } else {
        bytes ++= c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        i += 1
      }
    }
    new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  private[sources] final case class DeltaLogDir(path: String,
      logDir: java.nio.file.Path, commits: Seq[Long],
      singles: Set[Long], multiparts: Map[Long, Seq[String]],
      // v2 checkpoints (`v2Checkpoint` reader feature, default-on in
      // current Delta writers): `<v>.checkpoint.<uuid>.{json,parquet}`
      // whose file actions may live in `_sidecars/` parquet files
      v2: Map[Long, String] = Map.empty)

  private[sources] def openLog(path: String): DeltaLogDir = {
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
    // checkpoints: the classic single file, a multi-part set (all N
    // parts present; parts are plain parquet shards of the same
    // action rows), or a UUID-named V2 checkpoint (json or parquet)
    // whose file actions may ride `sidecar` actions
    val ckRe = """(\d{20})\.checkpoint\.parquet""".r
    val ckPartRe = """(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
    val ckV2Re = """(\d{20})\.checkpoint\.([0-9a-fA-F-]{36})\.(json|parquet)""".r
    val singles = entries.collect { case ckRe(v) => v.toLong }.toSet
    val multiparts: Map[Long, Seq[String]] = entries
      .collect { case e @ ckPartRe(v, p, n) => (v.toLong, p.toInt, n.toInt, e) }
      .groupBy(_._1)
      .collect { case (v, parts)
          if parts.map(_._2).sorted == (1 to parts.head._3) &&
            parts.map(_._3).distinct.size == 1 =>
        v -> parts.sortBy(_._2).map(_._4)
      }
    val v2 = entries.collect { case e @ ckV2Re(v, _, _) => v.toLong -> e }
      .toMap
    DeltaLogDir(path,
      logDir, entries.collect { case commitRe(v) => v.toLong }.sorted,
      singles, multiparts, v2)
  }

  /** Replay the log (checkpoint-bounded) up to `versionAsOf`
    * (or the latest commit) into the snapshot's [[LogState]].
    */
  private[sources] def stateAt(spark: SparkSession, log: DeltaLogDir,
      versionAsOf: Option[Long]): LogState = {
    val commits = log.commits.filter(v => versionAsOf.forall(v <= _))
    versionAsOf.foreach(v => require(commits.contains(v),
      s"version $v does not exist in ${log.path} (have: " +
        s"${log.commits.headOption.getOrElse("-")}..${log.commits.lastOption.getOrElse("-")})"))

    // checkpoint bound: start replay from the newest complete
    // checkpoint at or below the target version
    val ckVersion = (log.singles ++ log.multiparts.keySet ++ log.v2.keySet)
      .toSeq
      .filter(v => versionAsOf.forall(v <= _))
      .sorted.lastOption

    // parquet checkpoint shards → the JSON action replay: each row is
    // {"add": {...}} / {"metaData": {...}} / {"protocol": {...}} /
    // {"txn": {...}} / {"remove": {...}} / {"sidecar": {...}} (txn
    // watermarks and unexpired remove tombstones MUST survive the
    // checkpoint bound — the exactly-once and VACUUM-safety contracts)
    def parquetActions(files: Seq[java.nio.file.Path],
        kinds: Seq[String]): Seq[String] = {
      // shards may carry disjoint action columns (one all adds,
      // another the metaData row)
      val ck = spark.read.option("mergeSchema", "true")
        .parquet(files.map(_.toString): _*)
      val cols = ck.columns.toSet
      kinds.filter(cols.contains).flatMap(c =>
        ck.filter(col(c).isNotNull).select(col(c)).toJSON.collect().toSeq)
    }
    val ActionOrder =
      Seq("protocol", "metaData", "add", "txn", "remove")

    val fromCheckpoint: LogState = ckVersion match {
      case None => LogState()
      case Some(v) if log.singles.contains(v) || log.multiparts.contains(v) =>
        val ckFiles =
          if (log.singles.contains(v)) Seq(f"$v%020d.checkpoint.parquet")
          else log.multiparts(v)
        parquetActions(ckFiles.map(log.logDir.resolve), ActionOrder)
          .foldLeft(LogState())((s, j) => applyAction(s, JsonMethods.parse(j)))
      case Some(v) =>
        // V2 checkpoint: one UUID-named json/parquet file whose
        // add/remove actions may live in `_sidecars/` parquet files
        // referenced by `sidecar` actions; `checkpointMetadata` must
        // name this version (corruption check)
        val ckFile = log.logDir.resolve(log.v2(v))
        val topActions: Seq[JValue] =
          if (log.v2(v).endsWith(".json"))
            java.nio.file.Files.readString(ckFile).linesIterator
              .filter(_.trim.nonEmpty).map(JsonMethods.parse(_)).toSeq
          else parquetActions(Seq(ckFile),
            ActionOrder :+ "sidecar" :+ "checkpointMetadata")
            .map(JsonMethods.parse(_))
        topActions.foreach { a =>
          (a \ "checkpointMetadata" \ "version") match {
            case JInt(n) => require(n.toLong == v,
              s"v2 checkpoint ${log.v2(v)} declares version $n: ${log.path}")
            case JLong(n) => require(n == v,
              s"v2 checkpoint ${log.v2(v)} declares version $n: ${log.path}")
            case _ =>
          }
        }
        val sidecars = topActions.flatMap(a => (a \ "sidecar" \ "path") match {
          case JString(p) => Some(p)
          case _ => None
        })
        val sidecarActions: Seq[JValue] =
          if (sidecars.isEmpty) Nil
          else parquetActions(
            sidecars.map(p => log.logDir.resolve("_sidecars").resolve(p)),
            Seq("add", "remove")).map(JsonMethods.parse(_))
        // deterministic apply order: table-wide actions first, then
        // file actions (top-level and sidecar)
        def kindIdx(a: JValue): Int = a match {
          case JObject(fields) => fields.headOption.map(_._1) match {
            case Some("protocol") => 0
            case Some("metaData") => 1
            case Some("txn") => 2
            case _ => 3
          }
          case _ => 3
        }
        (topActions.sortBy(kindIdx) ++ sidecarActions)
          .foldLeft(LogState())(applyAction)
    }

    val replay = commits.filter(v => ckVersion.forall(v > _))
    replay.foldLeft(fromCheckpoint) { (s, v) =>
      val text = java.nio.file.Files.readString(
        log.logDir.resolve(f"$v%020d.json"))
      text.linesIterator.filter(_.trim.nonEmpty)
        .foldLeft(s)((st, line) => applyAction(st, JsonMethods.parse(line)))
    }
  }

  /** Gate on protocol version/features + column mapping; returns the
    * mapping mode (`none` or `name`).
    */
  private def checkReadable(state: LogState, path: String): String = {
    if (state.minReader >= 3) {
      val unknown = state.readerFeatures -- SupportedReaderFeatures
      require(unknown.isEmpty,
        s"unsupported Delta reader features ${unknown.toSeq.sorted.mkString(", ")}: $path")
    } else require(state.minReader <= 2,
      s"Delta reader version ${state.minReader} > 2 unsupported: $path")
    val mappingMode =
      state.configuration.getOrElse("delta.columnMapping.mode", "none")
    require(Set("none", "name", "id").contains(mappingMode),
      s"Delta column mapping mode '$mappingMode' is unsupported by " +
        s"this reader (only 'none'/'name'/'id'): $path")
    mappingMode
  }


  // log paths are RFC-2396 percent-encoded and relative to the table
  // root unless they carry a scheme
  private[sources] def absPath(tableDir: String, p: String): String =
    if (p.contains("://")) p
    else {
      val decoded = pctDecode(p)
      if (decoded.startsWith("/")) decoded else s"$tableDir/$decoded"
    }

  /** Current (or `versionAsOf`) snapshot of the Delta table at `path`.
    *
    * `unionGroupMax`: live-partition count up to which the partition
    * columns attach as per-group literal unions; above it (or with
    * DVs present) a single scan + broadcast file-map join is used.
    *
    * `predicate`: optional filter over the table's LOGICAL columns.
    * Beyond the usual scan-level pushdown it drives FILE PRUNING
    * during planning — each add's log-recorded `stats` (per-column
    * min/max/nullCount) and exact partition values are evaluated
    * tri-state ([[FileSkipping]]) and files that cannot match never
    * reach the scan, the Delta data-skipping contract. Conservative:
    * files without usable stats are kept, and the predicate
    * re-applies as a normal row filter, so results never depend on
    * stats quality.
    */
  def readDeltaTable(spark: SparkSession, path: String,
      versionAsOf: Option[Long] = None,
      unionGroupMax: Int = 32,
      predicate: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val state = stateAt(spark, openLog(path), versionAsOf)
    val mappingMode = checkReadable(state, path)
    val fullSchema = DataType.fromJson(state.schemaJson.getOrElse(
      sys.error(s"Delta log has no metaData action: $path")))
      .asInstanceOf[StructType]
    val nameMapped = mappingMode == "name"
    val idMapped = mappingMode == "id"
    val mapped = nameMapped || idMapped
    // read-schema names: PHYSICAL under both mapping modes (id mode
    // additionally carries parquet.field.id metadata), logical
    // otherwise
    val physFull =
      if (nameMapped) toPhysical(fullSchema).asInstanceOf[StructType]
      else if (idMapped) toPhysicalWithIds(fullSchema).asInstanceOf[StructType]
      else fullSchema
    val physTopOf: Map[String, String] =
      fullSchema.fields.zip(physFull.fields)
        .map { case (l, p) => l.name -> p.name }.toMap
    val physPartitionCols = state.partitionCols.map(physTopOf)
    // partitionValues keys are physical under BOTH mapping modes;
    // tolerate logical-keyed writers too (lookup falls through)
    def pvOf(pv: Map[String, String], pc: String): String =
      pv.getOrElse(physTopOf(pc), pv.getOrElse(pc, null))

    val dataSchema = StructType(physFull.fields
      .filterNot(f => physPartitionCols.contains(f.name)))
    def abs(p: String): String = absPath(path, p)
    // physical → logical projection: a struct cast renames nested
    // fields positionally, so one cast per top-level column restores
    // the full logical schema (and strips the field-id metadata under
    // id mapping; no-op when unmapped)
    def logicalProjection(df: DataFrame): DataFrame =
      if (mapped)
        df.select(fullSchema.fields.map(f =>
          col(s"`${physTopOf(f.name)}`").cast(f.dataType).as(f.name)): _*)
      else df.select(fullSchema.map(f => col(f.name)): _*)
    // FILE PRUNING (data skipping): evaluate the predicate against
    // each add's log-recorded stats (physical-keyed under mapping)
    // and exact partition values; files that cannot match never reach
    // the scan — O(files) driver work over metadata already replayed
    val skipExpr = predicate.map(p => FileSkipping.resolve(spark, fullSchema, p))
    // stats keys are physical-named under both mapping modes
    val logicalTopOf: Map[String, String] = physTopOf.map(_.swap)
    def fileStatsOf(f: AddFile): FileSkipping.FileStats = {
      val partStats: Map[String, FileSkipping.ColStats] =
        state.partitionCols.map { pc =>
          val raw = pvOf(f.partitionValues, pc)
          val exact: Option[Option[Any]] =
            if (raw == null) Some(None) // all-null partition value
            else FileSkipping.normStat(raw, fullSchema(pc).dataType) match {
              case Some(v) => Some(Some(v))
              case None => None // unparseable — unknown, never prune on it
            }
          pc -> FileSkipping.ColStats(exact = exact)
        }.toMap
      val parsed = f.stats.flatMap(s =>
        scala.util.Try(JsonMethods.parse(s)).toOption)
      def jAny(v: JValue): Any = v match {
        case JInt(n) => n
        case JLong(n) => n
        case JDouble(d) => d
        case JDecimal(d) => d
        case JString(s) => s
        case JBool(b) => b
        case _ => null
      }
      def valuesOf(section: String): Map[String, Any] = parsed match {
        case Some(j) => (j \ section) match {
          case JObject(fields) => fields.map { case (k, v) =>
            logicalTopOf.getOrElse(k, k) -> jAny(v) }.toMap
          case _ => Map.empty
        }
        case None => Map.empty
      }
      val mins = valuesOf("minValues")
      val maxs = valuesOf("maxValues")
      val nulls = valuesOf("nullCount")
      val dataStats = fullSchema.fields
        .filterNot(fd => state.partitionCols.contains(fd.name))
        .flatMap { fd =>
          val cs = FileSkipping.ColStats(
            min = Option(mins.getOrElse(fd.name, null))
              .flatMap(FileSkipping.normStat(_, fd.dataType)),
            max = Option(maxs.getOrElse(fd.name, null))
              .flatMap(FileSkipping.normStat(_, fd.dataType)),
            nullCount = Option(nulls.getOrElse(fd.name, null)).collect {
              case n: Number => n.longValue })
          if (cs == FileSkipping.ColStats()) None else Some(fd.name -> cs)
        }.toMap
      FileSkipping.FileStats(
        parsed.flatMap(j => (j \ "numRecords").extractOpt[Long]),
        partStats ++ dataStats)
    }
    val addList = {
      val all = state.adds.values.toSeq
      skipExpr match {
        case None => all
        case Some(e) => all.filter(f => FileSkipping.mayMatch(e, fileStatsOf(f)))
      }
    }
    val anyDv = addList.exists(_.dv.isDefined)

    val snapshot = if (addList.isEmpty) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], fullSchema)
    } else if (!anyDv && state.partitionCols.isEmpty) {
      val base = pqReader(spark, idMapped).schema(dataSchema)
        .parquet(addList.map(f => abs(f.path)).sorted: _*)
      if (mapped) logicalProjection(base) else base
    } else if (!anyDv && state.adds.values.map(_.partitionValues).toSet.size <= unionGroupMax) {
      // small live-partition count: partition values are authoritative
      // in the LOG, not the file paths — attach them per
      // distinct-value file group as literal columns and union
      val groups = addList.groupBy(_.partitionValues).toSeq
        .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
      val parts = groups.map { case (pv, files) =>
        val base = pqReader(spark, idMapped).schema(dataSchema)
          .parquet(files.map(f => abs(f.path)).sorted: _*)
        state.partitionCols.foldLeft(base) { (df, pc) =>
          val raw = pvOf(pv, pc)
          df.withColumn(physTopOf(pc),
            (if (raw == null) lit(null) else lit(raw))
              .cast(fullSchema(pc).dataType))
        }
      }
      logicalProjection(parts.reduce(_.unionByName(_)))
    } else {
      // ONE multi-file scan node regardless of partition count;
      // per-file metadata (partition values, DV masks) attaches via
      // `_metadata.file_path` against broadcast file-maps — O(files)
      // in a broadcast hashmap, not O(partitions) in the plan tree
      val hconf = spark.sessionState.newHadoopConf()
      def qualified(p: String): String = DeltaWrite.sparkPathOf(hconf, p)
      var df = pqReader(spark, idMapped).schema(dataSchema)
        .parquet(addList.map(f => abs(f.path)).sorted: _*)
        .withColumn("__graft_file", col("_metadata.file_path"))
      if (anyDv) {
        val delDf = dvDeleteFrame(spark, path,
          addList.flatMap(f => f.dv.map(d => (qualified(abs(f.path)), d))))
        df = df.withColumn("__graft_row", col("_metadata.row_index"))
          .join(delDf, Seq("__graft_file", "__graft_row"), "left_anti")
      }
      if (state.partitionCols.nonEmpty) {
        val pvRows = addList.map(f => Row.fromSeq(qualified(abs(f.path)) +:
          state.partitionCols.map(pc => pvOf(f.partitionValues, pc))))
        val pvSchema = StructType(StructField("__graft_file", StringType) +:
          state.partitionCols.map(pc => StructField(s"__graft_pv_$pc", StringType)))
        val pvDf = spark.createDataFrame(
          spark.sparkContext.parallelize(pvRows, 1), pvSchema)
        df = df.join(broadcast(pvDf), Seq("__graft_file"))
        state.partitionCols.foreach { pc =>
          df = df.withColumn(physTopOf(pc),
            col(s"`__graft_pv_$pc`").cast(fullSchema(pc).dataType))
        }
      }
      logicalProjection(df)
    }
    // the predicate re-applies as a row filter — pruning is an
    // optimization, never the correctness mechanism
    predicate.fold(snapshot)(snapshot.filter)
  }

  /** One live data file of the current snapshot: absolute path,
    * log-relative DECODED path (what sits on disk), the log path as
    * COMMITTED (percent-encoded — what a remove action must name),
    * and the add's partition values.
    */
  private[sources] case class LiveFile(abs: String, rel: String,
      logPath: String, partitionValues: Map[String, String])

  /** Decoded deletion-vector masks as ONE (__graft_file, __graft_row)
    * frame: `withDv` pairs each data file's `_metadata.file_path` key
    * (the SparkPath form — [[DeltaWrite.sparkPathOf]]) with its
    * descriptor. Sidecar bitmaps decode in EXECUTORS: the driver
    * ships only O(DV files) (data file, descriptor) pairs; a
    * `binaryFile` scan fetches each sidecar wherever its task runs
    * and flatMaps it into (file, row_index) pairs, so deleted rows
    * never materialize on the driver — and the scan's file-size
    * statistics let Catalyst pick a broadcast anti-join exactly when
    * the decoded frame is genuinely small. Inline payloads already
    * sit in the replayed log JSON — decoding them on the driver is
    * O(log bytes), not O(rows).
    */
  private[sources] def dvDeleteFrame(spark: SparkSession, path: String,
      withDv: Seq[(String, DeletionVectors.Descriptor)]): DataFrame = {
    val hconf = spark.sessionState.newHadoopConf()
    def qualified(p: String): String = DeltaWrite.sparkPathOf(hconf, p)
    val delSchema = StructType(Seq(
      StructField("__graft_file", StringType),
      StructField("__graft_row", org.apache.spark.sql.types.LongType)))
    val (inline, sidecar) = withDv.partition(_._2.storageType == "i")
    val parts = Seq.newBuilder[DataFrame]
    if (sidecar.nonEmpty) {
      val bySidecar: Map[String, Seq[(String, DeletionVectors.Descriptor)]] =
        sidecar.groupBy { case (_, d) =>
          qualified(DeletionVectors.dvFileLocation(path, d)) }
      val bc = spark.sparkContext.broadcast(bySidecar)
      import spark.implicits._
      parts += spark.read.format("binaryFile")
        .load(bySidecar.keys.toSeq.sorted: _*)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])]
        .flatMap { case (p, bytes) =>
          val ds = bc.value.getOrElse(p,
            sys.error(s"DV sidecar $p missing from the descriptor map"))
          ds.iterator.flatMap { case (file, d) =>
            DeletionVectors.decodeFileDv(bytes, d).iterator
              .map(i => (file, i)) }
        }.toDF("__graft_file", "__graft_row")
    }
    if (inline.nonEmpty) {
      import scala.jdk.CollectionConverters._
      parts += spark.createDataFrame(
        inline.flatMap { case (file, d) =>
          DeletionVectors.decodeInlineDv(d).map(i => Row(file, i))
        }.asJava, delSchema)
    }
    parts.result().reduce(_.unionByName(_))
  }

  /** Live data files of the current snapshot (with their log-recorded
    * partition values), for the rewrite paths that can only handle
    * PLAIN tables ([[DeltaWrite.replace]]/[[DeltaWrite.optimize]]).
    * Rejects column mapping and deletion vectors — loudly, never a
    * corrupting rewrite ([[DeltaWrite.merge]] supports both through
    * [[liveDataFilesAll]] + [[mergeGeometry]]). Partitioned tables
    * are supported: the caller prunes on `partitionValues`.
    */
  private[graft] def liveDataFiles(spark: SparkSession, path: String)
      : Seq[LiveFile] = {
    val state = stateAt(spark, openLog(path), None)
    require(checkReadable(state, path) == "none",
      s"rewriting a column-mapped Delta table is unsupported here: $path")
    require(state.adds.values.forall(_.dv.isEmpty),
      s"rewriting a deletion-vector-carrying Delta table is unsupported here: $path")
    state.adds.values.toSeq.map(f =>
      LiveFile(absPath(path, f.path), pctDecode(f.path), f.path,
        f.partitionValues))
      .sortBy(_.rel)
  }

  /** A live data file WITH its deletion-vector descriptor — the
    * ungated sibling of [[LiveFile]] for [[DeltaWrite.merge]], which
    * rewrites mapped and DV-carrying tables faithfully.
    */
  private[graft] case class LiveFileDv(abs: String, rel: String,
      logPath: String, partitionValues: Map[String, String],
      dv: Option[DeletionVectors.Descriptor],
      // as committed — merge-on-read re-emits the add with a fresh DV
      size: Long = 0L, stats: Option[String] = None)

  /** Every live data file of the current snapshot, including files
    * carrying deletion vectors and files of column-mapped tables
    * (protocol readability is still gated — unknown reader features
    * refuse loudly). One entry per path: a data file whose DV was
    * superseded in place re-adds under the same path and the replay
    * keeps only the live (path, dv) pair.
    */
  private[graft] def liveDataFilesAll(spark: SparkSession, path: String)
      : Seq[LiveFileDv] = {
    val state = stateAt(spark, openLog(path), None)
    checkReadable(state, path): Unit
    val files = state.adds.values.toSeq.map(f =>
      LiveFileDv(absPath(path, f.path), pctDecode(f.path), f.path,
        f.partitionValues, f.dv,
        size = (f.raw \ "size").extractOpt[Long].getOrElse(0L),
        stats = f.stats))
      .sortBy(_.rel)
    val dup = files.groupBy(_.rel).collect { case (r, fs) if fs.size > 1 => r }
    require(dup.isEmpty,
      s"live snapshot lists a path twice (conflicting DV versions?): " +
        s"${dup.mkString(", ")} in $path")
    files
  }

  /** `TIMESTAMP AS OF` resolution per Delta's own timestamp-travel
    * semantics: the latest version whose COMMIT TIMESTAMP is
    * at-or-before `micros`, where a commit's timestamp is
    * `commitInfo.inCommitTimestamp` when the commit carries one (the
    * public protocol's in-commit-timestamps feature — commitInfo is
    * REQUIRED to be the commit's first action there, and readers MUST
    * prefer it: file mtimes lie after a copy/restore/rsync) and the
    * commit file's modification time otherwise, with the protocol's
    * monotonicity rule applied (each commit's effective timestamp is
    * at least its predecessor's — mtime clock skew never makes a
    * later version resolve before an earlier one).
    *
    * Loud on BOTH out-of-range sides, mirroring Delta:
    *  - before the earliest AVAILABLE commit: the table did not exist
    *    yet, or log cleanup (vacuum) dropped that history;
    *  - after the latest commit: a future-dated request would
    *    silently pin the current version — a typo'd year reads the
    *    wrong snapshot without anyone noticing. Use the current read
    *    (no AS OF) for "latest".
    */
  private[graft] def versionAtTimestamp(path: String, micros: Long): Long = {
    val log = openLog(path)
    require(log.commits.nonEmpty, s"empty Delta log: $path")
    implicit val fmts: Formats = DefaultFormats
    def ictOf(v: Long): Option[Long] = {
      // when present, commitInfo with inCommitTimestamp is the FIRST
      // action of the commit (protocol requirement) — one line read
      val r = java.nio.file.Files.newBufferedReader(
        log.logDir.resolve(f"$v%020d.json"))
      try Option(r.readLine()).flatMap(l =>
        scala.util.Try(org.json4s.jackson.JsonMethods.parse(l)).toOption)
        .flatMap(j =>
          (j \ "commitInfo" \ "inCommitTimestamp").extractOpt[Long])
      finally r.close()
    }
    val raw = log.commits.sorted.map(v => v -> ictOf(v).getOrElse(
      java.nio.file.Files.getLastModifiedTime(
        log.logDir.resolve(f"$v%020d.json")).toMillis))
    // monotonic effective timestamps (running max)
    val withTs = raw.scanLeft((-1L, Long.MinValue)) {
      case ((_, prev), (v, t)) => (v, math.max(prev, t)) }.drop(1)
    val tsMillis = Math.floorDiv(micros, 1000L)
    val at = withTs.filter(_._2 <= tsMillis)
    require(at.nonEmpty,
      s"TIMESTAMP AS OF ${java.time.Instant.ofEpochMilli(tsMillis)} " +
        s"precedes the earliest available commit of $path (version " +
        s"${log.commits.min} at ${java.time.Instant.ofEpochMilli(
          withTs.map(_._2).min)}) — the table did not exist yet, or " +
        s"that history was vacuumed")
    val latest = withTs.last
    require(tsMillis <= latest._2,
      s"TIMESTAMP AS OF ${java.time.Instant.ofEpochMilli(tsMillis)} " +
        s"is after the latest commit of $path (version ${latest._1} " +
        s"at ${java.time.Instant.ofEpochMilli(latest._2)}) — a " +
        s"future-dated request would silently pin the current " +
        s"version; read without AS OF for the latest state")
    at.map(_._1).max
  }

  /** One live file's log-recorded `stats` JSON + exact partition
    * values in the [[FileSkipping]] domain — the same tri-state
    * pruning input [[readDeltaTable]] builds for reads, exposed for
    * the MERGE touched-file probe's residual-predicate pruning
    * (dbt `incremental_predicates`). UNMAPPED tables only: stats keys
    * of column-mapped tables are physical-named and callers there
    * skip stats pruning (conservative — pruning is an optimization,
    * never correctness).
    */
  private[graft] def fileStatsOfLive(f: LiveFileDv, schema: StructType,
      partCols: Seq[String]): FileSkipping.FileStats = {
    implicit val fmts: Formats = DefaultFormats
    val partStats: Map[String, FileSkipping.ColStats] =
      partCols.flatMap { pc =>
        schema.fields.find(_.name == pc).map { fd =>
          val raw = f.partitionValues.getOrElse(pc, null)
          val exact: Option[Option[Any]] =
            if (raw == null) Some(None)
            else FileSkipping.normStat(raw, fd.dataType) match {
              case Some(v) => Some(Some(v))
              case None => None // unparseable — unknown, never prune
            }
          pc -> FileSkipping.ColStats(exact = exact)
        }
      }.toMap
    val parsed = f.stats.flatMap(t =>
      scala.util.Try(JsonMethods.parse(t)).toOption)
    def jAny(v: JValue): Any = v match {
      case JInt(n) => n
      case JLong(n) => n
      case JDouble(d) => d
      case JDecimal(d) => d
      case JString(t) => t
      case JBool(b) => b
      case _ => null
    }
    def valuesOf(section: String): Map[String, Any] = parsed match {
      case Some(j) => (j \ section) match {
        case JObject(fields) => fields.map { case (k, v) =>
          k -> jAny(v) }.toMap
        case _ => Map.empty
      }
      case None => Map.empty
    }
    val mins = valuesOf("minValues")
    val maxs = valuesOf("maxValues")
    val nulls = valuesOf("nullCount")
    val dataStats = schema.fields
      .filterNot(fd => partCols.contains(fd.name))
      .flatMap { fd =>
        val cs = FileSkipping.ColStats(
          min = Option(mins.getOrElse(fd.name, null))
            .flatMap(FileSkipping.normStat(_, fd.dataType)),
          max = Option(maxs.getOrElse(fd.name, null))
            .flatMap(FileSkipping.normStat(_, fd.dataType)),
          nullCount = Option(nulls.getOrElse(fd.name, null)).collect {
            case n: Number => n.longValue })
        if (cs == FileSkipping.ColStats()) None else Some(fd.name -> cs)
      }.toMap
    FileSkipping.FileStats(
      parsed.flatMap(j => (j \ "numRecords").extractOpt[Long]),
      partStats ++ dataStats)
  }

  /** The schema/column-mapping geometry [[DeltaWrite.merge]] needs to
    * read and WRITE a (possibly column-mapped) table faithfully:
    * logical schema, physical read/write schema, and the top-level
    * logical → physical name map (identity when unmapped).
    */
  private[graft] case class MergeGeometry(mappingMode: String,
      fullSchema: StructType, physFull: StructType,
      physTopOf: Map[String, String]) {
    def mapped: Boolean = mappingMode != "none"
    def idMapped: Boolean = mappingMode == "id"
    def physOf(logicalTop: String): String =
      physTopOf.getOrElse(logicalTop, logicalTop)
    /** Physical partition-values → the value of LOGICAL column `c`
      * (tolerates logical-keyed writers).
      */
    def pvOf(pv: Map[String, String], c: String): String =
      pv.getOrElse(physOf(c), pv.getOrElse(c, null))
  }

  /** Does the current protocol already declare the deletionVectors
    * feature? ([[DeltaWrite.mergeOnRead]] upgrades in-commit when
    * writing the table's first DV.)
    */
  private[graft] def tableHasDvProtocol(spark: SparkSession,
      path: String): Boolean = {
    val state = stateAt(spark, openLog(path), None)
    state.minReader >= 3 && state.readerFeatures("deletionVectors")
  }

  private[graft] def mergeGeometry(spark: SparkSession, path: String)
      : MergeGeometry = {
    val state = stateAt(spark, openLog(path), None)
    val mode = checkReadable(state, path)
    val fullSchema = DataType.fromJson(state.schemaJson.getOrElse(
      sys.error(s"Delta log has no metaData action: $path")))
      .asInstanceOf[StructType]
    val physFull = mode match {
      case "name" => toPhysical(fullSchema).asInstanceOf[StructType]
      case "id" => toPhysicalWithIds(fullSchema).asInstanceOf[StructType]
      case _ => fullSchema
    }
    MergeGeometry(mode, fullSchema, physFull,
      fullSchema.fields.zip(physFull.fields)
        .map { case (l, p) => l.name -> p.name }.toMap)
  }

  /** The table's partition columns from the log's metaData action. */
  private[graft] def partitionColumns(spark: SparkSession,
      path: String): Seq[String] =
    stateAt(spark, openLog(path), None).partitionCols

  /** Highest committed version (for [[DeltaWrite.merge]]'s next-commit
    * numbering).
    */
  private[sources] def latestVersion(path: String): Long = {
    val l = openLog(path)
    require(l.commits.nonEmpty, s"empty Delta log: $path")
    l.commits.last
  }

  /** Table properties from the log's metaData action (e.g.
    * `delta.enableChangeDataFeed`, which [[DeltaWrite.merge]] honors
    * by writing cdc actions).
    */
  private[graft] def tableConfiguration(spark: SparkSession,
      path: String): Map[String, String] =
    stateAt(spark, openLog(path), None).configuration

  /** The streaming-writer transaction watermark for `appId` — the
    * highest `txn.version` committed (None for a fresh app or table).
    * The protocol's exactly-once contract: an idempotent writer skips
    * any batch at or below this.
    */
  def lastTxnVersion(spark: SparkSession, path: String,
      appId: String): Option[Long] =
    if (!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(path, "_delta_log"))) None
    else stateAt(spark, openLog(path), None).txns.get(appId)

  /** The table's logical schema from the log's metaData action. */
  private[graft] def tableSchema(spark: SparkSession, path: String): StructType = {
    val state = stateAt(spark, openLog(path), None)
    DataType.fromJson(state.schemaJson.getOrElse(
      sys.error(s"Delta log has no metaData action: $path")))
      .asInstanceOf[StructType]
  }

  /** Change Data Feed over commits `fromVersion..toVersion`
    * (inclusive; default latest): the table's row-level change
    * history as rows of the logical schema plus `_change_type`
    * (`insert` / `delete` / `update_preimage` / `update_postimage`)
    * and `_commit_version`. Follows the protocol's CDF contract:
    * when a commit carries `cdc` actions those are authoritative
    * (their `_change_data/` files store `_change_type` per row) and
    * the commit's file actions are ignored; otherwise changes derive
    * from the commit's `dataChange=true` file actions — added files
    * are inserts, removed files deletes (their rows re-read from the
    * not-yet-vacuumed data file). Requires
    * `delta.enableChangeDataFeed=true` on the table. DV-carrying
    * file actions in a derived commit are rejected loudly rather
    * than misread; column-mapping `name` mode composes (physical
    * names in data and cdc files, logical names out).
    *
    * Scale: commit metadata replays driver-side like the snapshot
    * path; data-side the whole range reads as AT MOST TWO multi-file
    * scan nodes (cdc files; derived files). Commit version, change
    * type and partition values attach via a broadcast
    * `_metadata.file_path` map join, so a 10⁴-commit range is not a
    * 10⁴-branch union — and a file inserted then deleted in-range is
    * scanned ONCE, fanning out into both change rows through the
    * (non-unique) map join.
    */
  def readChanges(spark: SparkSession, path: String, fromVersion: Long,
      toVersion: Option[Long] = None): DataFrame = {
    val log = openLog(path)
    require(log.commits.nonEmpty, s"empty Delta log: $path")
    val end = toVersion.getOrElse(log.commits.last)
    require(fromVersion <= end,
      s"readChanges range [$fromVersion, $end] is empty: $path")
    val missing = (fromVersion to end).filterNot(log.commits.contains)
    require(missing.isEmpty,
      s"Delta commits ${missing.mkString(", ")} absent from $path " +
        "(expired or never written)")
    val state = stateAt(spark, log, Some(end))
    val mappingMode = checkReadable(state, path)
    require(state.configuration.getOrElse(
        "delta.enableChangeDataFeed", "false") == "true",
      s"change data feed is not enabled on $path " +
        "(set delta.enableChangeDataFeed=true)")
    val fullSchema = DataType.fromJson(state.schemaJson.getOrElse(
      sys.error(s"Delta log has no metaData action: $path")))
      .asInstanceOf[StructType]
    val partCols = state.partitionCols
    // column mapping composes with CDF: under `name` mode data AND
    // cdc files store physical column names; under `id` mode both
    // resolve by parquet field id (the CDF metadata columns keep
    // their literal names — they are not part of the mapped table
    // schema), and the final projection restores logical names
    val nameMapped = mappingMode == "name"
    val idMapped = mappingMode == "id"
    val mapped = nameMapped || idMapped
    val physFull =
      if (nameMapped) toPhysical(fullSchema).asInstanceOf[StructType]
      else if (idMapped) toPhysicalWithIds(fullSchema).asInstanceOf[StructType]
      else fullSchema
    val physTopOf: Map[String, String] =
      fullSchema.fields.zip(physFull.fields)
        .map { case (l, p) => l.name -> p.name }.toMap
    val physPartCols = partCols.map(physTopOf)
    def pvOf(pv: Map[String, String], pc: String): Option[String] =
      pv.get(physTopOf(pc)).orElse(pv.get(pc))
    val dataSchema = StructType(
      physFull.fields.filterNot(f => physPartCols.contains(f.name)))

    // per-file change descriptor; changeType None = stored in the
    // cdc file's own _change_type column
    case class Chg(relPath: String, version: Long,
        changeType: Option[String], pv: Map[String, String])
    val cdcFiles = scala.collection.mutable.ListBuffer.empty[Chg]
    val derived = scala.collection.mutable.ListBuffer.empty[Chg]
    def isTrue(j: JValue): Boolean =
      j match { case JBool(b) => b; case _ => false }
    (fromVersion to end).foreach { v =>
      val text = java.nio.file.Files.readString(
        log.logDir.resolve(f"$v%020d.json"))
      val actions = text.linesIterator.filter(_.trim.nonEmpty)
        .map(JsonMethods.parse(_)).toSeq
      val cdc = actions.flatMap(a => (a \ "cdc") match {
        case JNothing | JNull => None
        case c => Some(Chg((c \ "path").extract[String], v, None,
          strMap(c \ "partitionValues")))
      })
      if (cdc.nonEmpty) cdcFiles ++= cdc
      else actions.foreach { a =>
        def act(kind: String): Option[JValue] = (a \ kind) match {
          case JNothing | JNull => None
          case x => Some(x)
        }
        // ANY DV-carrying file action (regardless of its dataChange
        // flag) makes the commit underivable: a DV attach deletes
        // rows at row-index granularity, which add/remove derivation
        // cannot express — refusing loudly beats silently emitting no
        // (or whole-file) changes
        (act("add") ++ act("remove")).foreach(x =>
          require(dvOf(x).isEmpty,
            s"cannot derive CDF from a deletion-vector commit " +
              s"without cdc actions (commit $v): $path"))
        act("add").filter(ad => isTrue(ad \ "dataChange")).foreach(ad =>
          derived += Chg((ad \ "path").extract[String], v,
            Some("insert"), strMap(ad \ "partitionValues")))
        act("remove").filter(rm => isTrue(rm \ "dataChange")).foreach(rm =>
          derived += Chg((rm \ "path").extract[String], v,
            Some("delete"), strMap(rm \ "partitionValues")))
      }
    }

    val outSchema = StructType(fullSchema.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version",
        org.apache.spark.sql.types.LongType)))
    if (cdcFiles.isEmpty && derived.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], outSchema)

    // derived deletes of a partitioned table need the remove action's
    // (optional per protocol) partitionValues — refuse to emit null
    // partition columns silently
    if (partCols.nonEmpty)
      derived.foreach(c => require(
        partCols.forall(pc => pvOf(c.pv, pc).isDefined),
        s"derived ${c.changeType.get} for ${c.relPath} (commit " +
          s"${c.version}) lacks partitionValues for ${partCols.mkString(", ")}: $path"))

    val hconf = spark.sessionState.newHadoopConf()
    def qualified(p: String): String = DeltaWrite.sparkPathOf(hconf, p)
    // one scan node per group; version/type/partition values ride a
    // broadcast file-map whose key is intentionally NON-unique (a
    // file with several change rows in range fans out through it)
    def group(files: Seq[Chg], storedType: Boolean): DataFrame = {
      val readSchema =
        if (storedType) StructType(dataSchema.fields :+
          StructField("_change_type", StringType))
        else dataSchema
      val scan = pqReader(spark, idMapped).schema(readSchema)
        .parquet(files.map(f => absPath(path, f.relPath)).distinct.sorted: _*)
        .withColumn("__graft_file", col("_metadata.file_path"))
      val mapRows = files.map { f =>
        Row.fromSeq(Seq(qualified(absPath(path, f.relPath)), f.version) ++
          f.changeType.toSeq ++ partCols.map(pc => pvOf(f.pv, pc).orNull))
      }
      val mapSchema = StructType(
        Seq(StructField("__graft_file", StringType),
          StructField("_commit_version",
            org.apache.spark.sql.types.LongType)) ++
        (if (storedType) Nil
         else Seq(StructField("_change_type", StringType))) ++
        partCols.map(pc => StructField(s"__graft_pv_$pc", StringType)))
      var df = scan.join(broadcast(spark.createDataFrame(
        spark.sparkContext.parallelize(mapRows, 1), mapSchema)),
        Seq("__graft_file"))
      partCols.foreach { pc =>
        df = df.withColumn(physTopOf(pc),
          col(s"`__graft_pv_$pc`").cast(fullSchema(pc).dataType))
      }
      // physical → logical projection (same struct-cast trick as the
      // snapshot path; no-op when unmapped), change columns appended
      df.select(fullSchema.fields.map(f =>
          (if (mapped) col(s"`${physTopOf(f.name)}`").cast(f.dataType)
           else col(f.name)).as(f.name)).toSeq ++
        Seq(col("_change_type"), col("_commit_version")): _*)
    }
    Seq(
      if (cdcFiles.nonEmpty) Some(group(cdcFiles.toSeq, storedType = true))
      else None,
      if (derived.nonEmpty) Some(group(derived.toSeq, storedType = false))
      else None)
      .flatten.reduce(_.unionByName(_))
  }
}
