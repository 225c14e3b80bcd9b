package graft.sources

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.JsonMethods.{compact, pretty, render}

/** Minimal spec-correct Apache Iceberg COMMIT writer
  * (iceberg.apache.org/spec/, format-version 2, Hadoop-catalog
  * layout): enough of the write path to export a table other Iceberg
  * readers (and [[IcebergRead]]) can scan — `vN.metadata.json` +
  * `version-hint.text`, avro manifest lists and manifests, parquet
  * data files, v2 POSITION and EQUALITY delete files, IDENTITY
  * partition specs (real `partition` records in the manifests,
  * hive-style file layout, partition-pruned merges), schema evolution
  * on merge (appended columns, fresh field ids past `last-column-id`),
  * and snapshot retention GC ([[expireSnapshots]]). Single-writer;
  * each commit writes one fresh data manifest carrying the full live
  * file set (added entries status=1, carried-forward status=0; files
  * dropped by `removes` are simply not carried — the
  * rewritten-manifest form the spec allows) plus one delete manifest
  * when position/equality deletes exist. The multi-file write paths
  * ([[merge]] / [[replace]] / [[optimize]]) stage every output file in
  * ONE Spark job + ONE grouped stats job ([[DeltaWrite.stageWrite]] /
  * [[DeltaWrite.statsRawFor]]) — job count never scales with file
  * count. Two consumers: `PipelineRunner` routes `file_format=iceberg`
  * models here ([[replace]] / [[merge]] / [[mergeOnRead]]), and it is
  * the boundary adapter for exporting tables to tools that only speak
  * Iceberg.
  */
object IcebergWrite {

  private implicit val fmts: Formats = DefaultFormats

  /** Fixture mode (`-Dgraft.iceberg.zeroTimestamps=true`): keep the
    * historical 0-stamped snapshot `timestamp-ms` so fixtures stay
    * byte-deterministic; readers then fall back to metadata-file
    * mtimes for timestamp travel. Default (off) stamps the REAL
    * commit wall-clock, the spec's channel.
    */
  private def zeroTimestamps: Boolean =
    sys.props.get("graft.iceberg.zeroTimestamps").contains("true")

  /** Manifest-entry avro schema with the partition record (r102)
    * built for the table's identity partition columns — field ids
    * 1000+ per the spec's partition-field numbering.
    */
  private def entrySchema(
      partFields: Seq[(String, DataType)]): org.apache.avro.Schema = {
    val partJson = partFields.zipWithIndex.map { case ((n, dt), i) =>
      require(n.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"partition column '$n' is not a valid avro field name")
      val t = dt match {
        case StringType => "\"string\""
        case IntegerType | ShortType | ByteType => "\"int\""
        case LongType => "\"long\""
        case DateType => "{\"type\":\"int\",\"logicalType\":\"date\"}"
        case other => sys.error(
          s"unsupported Iceberg partition type $other " +
            "(string/int/long/date only)")
      }
      s"""{"name":"$n","type":["null",$t],"default":null,"field-id":${1000 + i}}"""
    }.mkString(",")
    new org.apache.avro.Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int","field-id":0},
        |  {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
        |  {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
        |  {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
        |    {"name":"content","type":"int","field-id":134},
        |    {"name":"file_path","type":"string","field-id":100},
        |    {"name":"file_format","type":"string","field-id":101},
        |    {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[$partJson]}},
        |    {"name":"record_count","type":"long","field-id":103},
        |    {"name":"file_size_in_bytes","type":"long","field-id":104},
        |    {"name":"null_value_counts","type":["null",{"type":"array","logicalType":"map","items":{"type":"record","name":"k121_v122","fields":[{"name":"key","type":"int","field-id":121},{"name":"value","type":"long","field-id":122}]}}],"default":null,"field-id":110},
        |    {"name":"lower_bounds","type":["null",{"type":"array","logicalType":"map","items":{"type":"record","name":"k126_v127","fields":[{"name":"key","type":"int","field-id":126},{"name":"value","type":"bytes","field-id":127}]}}],"default":null,"field-id":125},
        |    {"name":"upper_bounds","type":["null",{"type":"array","logicalType":"map","items":{"type":"record","name":"k129_v130","fields":[{"name":"key","type":"int","field-id":129},{"name":"value","type":"bytes","field-id":130}]}}],"default":null,"field-id":128},
        |    {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null,"field-id":135},
        |    {"name":"referenced_data_file","type":["null","string"],"default":null,"field-id":143},
        |    {"name":"content_offset","type":["null","long"],"default":null,"field-id":144},
        |    {"name":"content_size_in_bytes","type":["null","long"],"default":null,"field-id":145}
        |  ]}}
        |]}""".stripMargin)
  }

  private val ListSchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string","field-id":500},
      |  {"name":"manifest_length","type":"long","field-id":501},
      |  {"name":"partition_spec_id","type":"int","field-id":502},
      |  {"name":"content","type":"int","field-id":517},
      |  {"name":"sequence_number","type":"long","field-id":515},
      |  {"name":"min_sequence_number","type":"long","field-id":516},
      |  {"name":"added_snapshot_id","type":"long","field-id":503},
      |  {"name":"added_files_count","type":"int","field-id":504},
      |  {"name":"existing_files_count","type":"int","field-id":505},
      |  {"name":"deleted_files_count","type":"int","field-id":506},
      |  {"name":"added_rows_count","type":"long","field-id":512},
      |  {"name":"existing_rows_count","type":"long","field-id":513},
      |  {"name":"deleted_rows_count","type":"long","field-id":514}
      |]}""".stripMargin)

  private def writeAvro(path: java.nio.file.Path,
      schema: org.apache.avro.Schema,
      records: Seq[GenericRecord],
      meta: Map[String, String]): Long = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    try {
      meta.foreach { case (k, v) => w.setMeta(k, v) }
      w.create(schema, path.toFile): Unit
      records.foreach(w.append)
    } finally w.close()
    java.nio.file.Files.size(path)
  }

  // ---- Spark → Iceberg schema JSON (unique field ids via counter) ----

  private def icebergType(dt: DataType, nextId: () => Int): JValue = dt match {
    case st: StructType =>
      // ids must be assigned to THIS level's fields before recursing
      // (Iceberg assigns parent ids first)
      val withIds = st.fields.map(f => (f, nextId()))
      ("type" -> "struct") ~ ("fields" -> withIds.toList.map { case (f, id) =>
        ("id" -> id) ~ ("name" -> f.name) ~ ("required" -> !f.nullable) ~
          ("type" -> icebergType(f.dataType, nextId))
      })
    case ArrayType(et, containsNull) =>
      val id = nextId()
      ("type" -> "list") ~ ("element-id" -> id) ~
        ("element-required" -> !containsNull) ~
        ("element" -> icebergType(et, nextId))
    case MapType(kt, vt, valueContainsNull) =>
      val kid = nextId(); val vid = nextId()
      ("type" -> "map") ~ ("key-id" -> kid) ~ ("value-id" -> vid) ~
        ("value-required" -> !valueContainsNull) ~
        ("key" -> icebergType(kt, nextId)) ~
        ("value" -> icebergType(vt, nextId))
    case BooleanType => JString("boolean")
    case IntegerType | ShortType | ByteType => JString("int")
    case LongType => JString("long")
    case FloatType => JString("float")
    case DoubleType => JString("double")
    case DateType => JString("date")
    case StringType => JString("string")
    case BinaryType => JString("binary")
    case TimestampType => JString("timestamptz")
    case _: TimestampNTZType => JString("timestamp")
    case d: DecimalType => JString(s"decimal(${d.precision},${d.scale})")
    case other => sys.error(s"cannot export Spark type $other to Iceberg")
  }

  private def fileUri(p: java.nio.file.Path): String =
    "file://" + p.toAbsolutePath.toString

  private def localOf(uri: String): java.nio.file.Path = java.nio.file.Paths
    .get("/" + uri.stripPrefix("file:").dropWhile(_ == '/'))

  // a data file's table-relative path under data/ (removes and staged
  // adds are matched on THIS, never on bare file names — partitioned
  // tables repeat names like upsert-00002.parquet across partitions)
  private def relOf(uri: String, dataDir: java.nio.file.Path): String =
    dataDir.toAbsolutePath.relativize(
      localOf(uri).toAbsolutePath).toString

  /** A pre-written (staged) data file for [[commit]]'s internal
    * callers: rows + raw column stats from ONE grouped job, plus the
    * file's identity-partition record values (avro-ready:
    * String/Int/Long/null; dates as epochDay Int).
    */
  private[sources] case class Staged(rel: String, rows: Long,
      colStats: Seq[(StructField, Any, Any, Long)],
      partition: Map[String, Any], size: Long,
      // the FULL batch schema — colStats covers only primitive
      // stat-able columns, so creation-from-staged must not
      // reconstruct the table schema from it (binary/array/map/
      // struct/timestamp_ntz columns would be silently dropped)
      schema: StructType)

  /** Spark partition value → avro partition-record value. */
  private def avroPv(v: Any): Any = v match {
    case null => null
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case b: java.lang.Byte => b.intValue
    case s: java.lang.Short => s.intValue
    case other => other // Int / Long / String
  }

  /** Canonical comparison string for partition pruning: manifest
    * record values and Spark row values meet in one domain (dates are
    * epochDay on both sides).
    */
  private def canonicalPv(v: Any): String = avroPv(v) match {
    case null => null
    case other => other.toString
  }

  /** Append commit: write each `(fileName, rows)` under `<dir>/data/`
    * as a live data file, drop previously-live files named in
    * `removes` (matched on the data-relative path), mask
    * `(dataFileName -> physical row positions)` via v2 position-delete
    * files, and/or write a v2 EQUALITY delete
    * (`equalityDelete = Some(columns -> valueRows)`) deleting every
    * earlier-sequence data row matching a value row on those
    * top-level columns. `stagedAdds` registers files [[merge]] /
    * [[replace]] / [[optimize]] already staged (with their stats and
    * partition records) without re-writing them. `partitionBy` (first
    * commit only) records an identity partition spec; `schemaEvolution`
    * appends the new columns of the given schema with fresh field ids.
    * Returns the new snapshot id. Timestamps are fixed at 0 so
    * fixtures are byte-deterministic.
    */
  /** `ALTER TABLE ... ADD COLUMNS`: one schema-only snapshot
    * appending nullable top-level columns with FRESH field ids (the
    * same evolution path merge's allowEvolution uses); carried data
    * files surface NULL for them via schema-on-read. dbt-spark's
    * `on_schema_change: append_new_columns` emits exactly this
    * statement before the incremental insert.
    */
  def addColumns(spark: org.apache.spark.sql.SparkSession, dir: String,
      fields: Seq[StructField]): Unit = {
    require(fields.nonEmpty, "ADD COLUMNS needs at least one column")
    val state = IcebergRead.snapshotState(dir, None)
    fields.foreach(f => require(
      !state.schema.fieldNames.exists(_.equalsIgnoreCase(f.name)),
      s"ADD COLUMNS: column ${f.name} already exists: $dir"))
    commit(dir, Nil, schemaEvolution = Some(StructType(
      state.schema.fields ++ fields.map(_.copy(nullable = true))))): Unit
  }

  /** `ALTER TABLE ... DROP COLUMNS` (dbt-spark
    * `on_schema_change: sync_all_columns`\' remove leg): one
    * schema-only snapshot narrowing the schema — kept fields retain
    * their ids (Iceberg\'s id-based evolution contract), carried data
    * files\' extra columns stop being projected. Partition columns,
    * unknown columns, the last column refuse loudly; so does a table
    * with LIVE delete files (an equality delete may reference the
    * dropped column\'s field id — compact first).
    */
  def dropColumns(spark: org.apache.spark.sql.SparkSession, dir: String,
      names: Seq[String]): Unit = {
    require(names.nonEmpty, "DROP COLUMNS needs at least one column")
    val state = IcebergRead.snapshotState(dir, None)
    names.foreach(n => require(
      state.schema.fieldNames.exists(_.equalsIgnoreCase(n)),
      s"DROP COLUMNS: column $n does not exist: $dir"))
    val pcs = IcebergRead.tablePartitionCols(dir)
    names.foreach(n => require(!pcs.exists(_.equalsIgnoreCase(n)),
      s"DROP COLUMNS: $n is a partition column: $dir"))
    require(state.schema.fields.exists(f =>
      !names.exists(_.equalsIgnoreCase(f.name))),
      s"DROP COLUMNS would leave an empty schema: $dir")
    require(state.positionDeleteFiles.isEmpty &&
        state.equalityDeleteFiles.isEmpty &&
        state.deletionVectors.isEmpty,
      s"DROP COLUMNS with live delete files or deletion vectors is " +
        s"unsupported (an equality delete may reference the dropped " +
        s"field id; v3 DVs cannot be carried by this v2 writer) — " +
        s"compact/rewrite first: $dir")
    commit(dir, Nil, schemaDrop = Some(names)): Unit
  }

  /** A format-v3 deletion-vector blob to register in this commit:
    * `puffinRel` is the Puffin file's data-relative path (already
    * written by the caller — see [[writePuffin]]), the offset/size
    * address ONE `deletion-vector-v1` blob inside it, and
    * `referencedDataFile` is the masked data file's manifest URI
    * VERBATIM. A DV for a file that already carries one SUPERSEDES
    * it (the spec's at-most-one-DV-per-file invariant).
    */
  private[sources] case class DvAdd(puffinRel: String, offset: Long,
      size: Long, cardinality: Long, referencedDataFile: String)

  def commit(dir: String,
      adds: Seq[(String, DataFrame)],
      removes: Seq[String] = Nil,
      positionDeletes: Map[String, Seq[Long]] = Map.empty,
      equalityDelete: Option[(Seq[String], DataFrame)] = None,
      // snapshot summary operation: "replace" marks a COMPACTION
      // (same logical rows, new files) — changelog readers skip it
      operation: String = "append",
      // true = do NOT carry prior delete files (compaction applied
      // them into the rewritten data)
      dropDeletes: Boolean = false,
      stagedAdds: Seq[Staged] = Nil,
      partitionBy: Seq[String] = Nil,
      schemaEvolution: Option[StructType] = None,
      // schema-only commit DROPPING top-level columns (validated by
      // [[dropColumns]] — ids of the kept fields are retained)
      schemaDrop: Option[Seq[String]] = None,
      // format-v3 deletion vectors to register (the DV-aware commit
      // path: prior live DVs are CARRIED except where superseded)
      dvAdds: Seq[DvAdd] = Nil,
      // append-only caller certifies it read/rewrote NO data file, so
      // live DVs carry forward verbatim ([[mergeOnRead]]'s v3 shape)
      carryDvs: Boolean = false,
      // creation-only: 2 (default) or 3 — later commits inherit the
      // table's own format version
      formatVersion: Int = 2): Long = {
    require(adds.nonEmpty || removes.nonEmpty || stagedAdds.nonEmpty ||
      positionDeletes.nonEmpty || equalityDelete.nonEmpty ||
      schemaEvolution.nonEmpty || schemaDrop.nonEmpty ||
      dvAdds.nonEmpty, // schema-only / DV-only commits
      "empty Iceberg commit")
    require(Set(2, 3).contains(formatVersion),
      s"unsupported Iceberg format-version $formatVersion")
    require(schemaEvolution.isEmpty || schemaDrop.isEmpty,
      "one schema change per commit")
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    val dataDir = java.nio.file.Paths.get(dir, "data")
    java.nio.file.Files.createDirectories(metaDir)
    java.nio.file.Files.createDirectories(dataDir)

    val hintFile = metaDir.resolve("version-hint.text")
    val priorVersion =
      if (java.nio.file.Files.isRegularFile(hintFile))
        java.nio.file.Files.readString(hintFile).trim.toInt
      else 0
    val creationSchema: Option[StructType] =
      if (priorVersion > 0) None
      else Some(adds.headOption.map(_._2.schema)
        .orElse(stagedAdds.headOption.map(_.schema))
        .getOrElse(sys.error(
          "first Iceberg commit must add at least one file")))
    val prior =
      if (priorVersion == 0)
        IcebergRead.SnapshotState(creationSchema.get, Nil, Nil)
      else IcebergRead.snapshotState(dir, None)
    // v3 deletion-vector backstop: a NON-DV-aware commit onto a table
    // with live Puffin DVs would silently drop the DV entries
    // (resurrecting their deleted rows); only the DV-aware path
    // (dvAdds — [[deleteWhere]]'s v3 branch, which carries prior DVs
    // except where superseded) may touch such a table.
    // DV-aware commits: the DV delete path (dvAdds — carries prior
    // DVs except where superseded), compaction (dropDeletes — the
    // caller read the RECONCILED state and rewrote it, so dropping
    // the applied DVs is exact), and append-only merge-on-read
    // commits (carryDvs — no data file is read or rewritten, so the
    // carried DVs stay valid verbatim)
    require(prior.deletionVectors.isEmpty || dvAdds.nonEmpty ||
        dropDeletes || carryDvs,
      s"cannot commit to an Iceberg table with live v3 deletion " +
        s"vectors through a non-DV-aware write path: the commit " +
        s"would drop the DV entries, resurrecting deleted rows — " +
        s"only the DV delete / compaction / merge-on-read paths " +
        s"compose here: $dir")
    val tableFv: Int =
      if (priorVersion == 0) formatVersion
      else (JsonMethods.parse(java.nio.file.Files.readString(
        metaDir.resolve(s"v$priorVersion.metadata.json")))
        \ "format-version").extractOpt[Int].getOrElse(2)
    require(tableFv <= 3,
      s"cannot commit to an Iceberg format-version $tableFv table: " +
        s"unknown future semantics — the table is read-only here: $dir")
    // v3 tables take DV commits and data commits from this writer
    // (which then re-emits format-version 3 + row-id lineage);
    // conversely DV adds require a v3 table
    require(dvAdds.isEmpty || tableFv == 3,
      s"deletion vectors need a format-version 3 table (this one is " +
        s"v$tableFv): $dir")
    // the v3 spec forbids ADDING position-delete files (deletion
    // vectors replace them); equality deletes remain legal
    require(positionDeletes.isEmpty || tableFv <= 2,
      s"format-version 3 forbids new position-delete files — use " +
        s"deletion vectors: $dir")
    val snapshotId = priorVersion + 1L
    val seq = snapshotId

    // ---- canonical schema JSON: derived once at creation, REUSED
    // (and possibly extended) from the prior metadata afterwards —
    // field ids are immutable, never re-derived
    val priorMetaJson: Option[JValue] =
      if (priorVersion == 0) None
      else Some(JsonMethods.parse(java.nio.file.Files.readString(
        metaDir.resolve(s"v$priorVersion.metadata.json"))))
    val (baseSchemaJson: JValue, baseLastColumnId: Int) =
      priorMetaJson match {
        case None =>
          var id = 0
          val next = () => { id += 1; id }
          (icebergType(creationSchema.get, next), id)
        case Some(pm) =>
          val cur = (pm \ "current-schema-id").extractOpt[Int].getOrElse(0)
          val schemas = (pm \ "schemas").children
          val s = schemas.find(x =>
            (x \ "schema-id").extractOpt[Int].contains(cur))
            .getOrElse(schemas.last)
          (s, (pm \ "last-column-id").extractOpt[Int].getOrElse {
            // fallback: max id present in the schema JSON
            def maxId(j: JValue): Int = j match {
              case JObject(fs) => fs.map {
                case (k, JInt(n)) if Set("id", "element-id", "key-id",
                  "value-id").contains(k) => n.toInt
                case (_, v) => maxId(v)
              }.foldLeft(0)(math.max)
              case JArray(xs) => xs.map(maxId).foldLeft(0)(math.max)
              case _ => 0
            }
            maxId(s)
          })
      }
    val (schemaJson: JValue, lastColumnId: Int, schemaId: Int,
        priorSchemaJsons: List[JValue]) =
      (schemaEvolution, schemaDrop) match {
        case (None, Some(drop)) =>
          // DROP: keep every remaining field VERBATIM (ids immutable),
          // bump the schema id, retain prior schemas for time travel
          val kept = (baseSchemaJson \ "fields").children.filterNot(f =>
            drop.exists(_.equalsIgnoreCase((f \ "name").extract[String])))
          require(kept.nonEmpty, "DROP COLUMNS would empty the schema")
          val newSid = (baseSchemaJson \ "schema-id").extractOpt[Int]
            .getOrElse(0) + 1
          val narrowed = baseSchemaJson match {
            case o: JObject =>
              JObject(o.obj.map {
                case ("fields", JArray(_)) => "fields" -> JArray(kept.toList)
                case ("schema-id", _) => "schema-id" -> JInt(newSid)
                case other => other
              })
            case other => sys.error(s"struct schema expected, got $other")
          }
          (narrowed, baseLastColumnId, newSid,
            priorMetaJson.map(pm => (pm \ "schemas").children).getOrElse(Nil))
        case (None, None) =>
          val sid = (baseSchemaJson \ "schema-id").extractOpt[Int]
            .getOrElse(0)
          (baseSchemaJson, baseLastColumnId, sid, Nil)
        case (Some(newSchema), _) =>
          val existing = (baseSchemaJson \ "fields").children
            .map(f => (f \ "name").extract[String]).toSet
          val added = newSchema.fields.filterNot(f => existing(f.name))
          require(added.nonEmpty, "schemaEvolution without new columns")
          var id = baseLastColumnId
          val next = () => { id += 1; id }
          val addedJson = added.toList.map { f =>
            val fid = next()
            ("id" -> fid) ~ ("name" -> f.name) ~
              ("required" -> !f.nullable) ~
              ("type" -> icebergType(f.dataType, next))
          }
          val newSid = (baseSchemaJson \ "schema-id").extractOpt[Int]
            .getOrElse(0) + 1
          val evolved = baseSchemaJson match {
            case o: JObject =>
              JObject(o.obj.map {
                case ("fields", JArray(fs)) => "fields" -> JArray(fs ++ addedJson)
                case ("schema-id", _) => "schema-id" -> JInt(newSid)
                case other => other
              })
            case other => sys.error(s"struct schema expected, got $other")
          }
          (evolved, id, newSid,
            priorMetaJson.map(pm => (pm \ "schemas").children).getOrElse(Nil))
      }
    val tableSchema: StructType = schemaEvolution.getOrElse(
      schemaDrop match {
        case None => prior.schema
        case Some(drop) => StructType(prior.schema.fields.filterNot(f =>
          drop.exists(_.equalsIgnoreCase(f.name))))
      })

    // top-level field name → Iceberg field id (the metadata schema's
    // numbering; bounds, equality ids and partition source ids resolve
    // through it)
    val topIds: Map[String, Int] =
      (schemaJson \ "fields").children.map(f =>
        (f \ "name").extract[String] -> (f \ "id").extract[Int]).toMap

    // ---- identity partition spec: recorded at creation, reused from
    // the prior metadata afterwards
    val (specFields: List[JValue], partCols: Seq[String]) =
      priorMetaJson match {
        case None =>
          (partitionBy.zipWithIndex.toList.map { case (c, i) =>
            (("name" -> c) ~ ("transform" -> "identity") ~
              ("source-id" -> topIds.getOrElse(c, sys.error(
                s"partition column '$c' is not a top-level column"))) ~
              ("field-id" -> (1000 + i))): JValue
          }, partitionBy)
        case Some(pm) =>
          require(partitionBy.isEmpty,
            s"partitionBy is creation-only; the table at $dir already " +
              "has a partition spec")
          val specId = (pm \ "default-spec-id").extractOpt[Int].getOrElse(0)
          val spec = (pm \ "partition-specs").children.find(s =>
            (s \ "spec-id").extractOpt[Int].contains(specId))
          val fields = spec.toList.flatMap(s => (s \ "fields").children)
          (fields, fields.map(f => (f \ "name").extract[String]))
      }
    val partFieldTypes: Seq[(String, DataType)] = partCols.map { c =>
      c -> tableSchema.fields.find(_.name == c).map(_.dataType)
        .getOrElse(sys.error(s"partition column '$c' missing from schema"))
    }
    val EntrySchema = entrySchema(partFieldTypes)

    // carried-forward live data files minus removes (matched on the
    // data-relative path, parallel to DeltaWrite's remove contract)
    val removedSet = removes.toSet
    val carried = prior.dataFiles.filterNot(f =>
      removedSet.contains(relOf(f.path, dataDir)))
    removes.foreach(r => require(
      prior.dataFiles.exists(f => relOf(f.path, dataDir) == r),
      s"remove of unknown Iceberg data file: $r"))

    // an add whose path collides with ANY existing file under data/
    // would silently overwrite parquet that older snapshots (or the
    // live set) still reference — duplicated rows now, corrupted time
    // travel and changelogs later. Reject both the live and the
    // previously-removed case. (Staged adds were just written by
    // stageWrite and collide only if a name-allocation bug exists —
    // checked against the carried set.)
    (adds.map(_._1) ++ stagedAdds.map(_.rel)).foreach { name =>
      require(!carried.exists(f => relOf(f.path, dataDir) == name),
        s"add of '$name' collides with a live data file — use a fresh name")
    }
    adds.foreach { case (name, _) =>
      require(!java.nio.file.Files.exists(dataDir.resolve(name)),
        s"add of '$name' would overwrite an existing file under data/ " +
          "that retained snapshots may still reference — use a fresh name")
    }
    def boundsOf(colStats: Seq[(StructField, Any, Any, Long)])
        : (Map[Int, Array[Byte]], Map[Int, Array[Byte]], Map[Int, Long]) = {
      val lower = colStats.flatMap { case (f, mn, _, _) =>
        topIds.get(f.name).flatMap(id =>
          IcebergRead.encodeBound(mn, f.dataType).map(id -> _)) }.toMap
      val upper = colStats.flatMap { case (f, _, mx, _) =>
        topIds.get(f.name).flatMap(id =>
          IcebergRead.encodeBound(mx, f.dataType).map(id -> _)) }.toMap
      val nulls = colStats.flatMap { case (f, _, _, nc) =>
        topIds.get(f.name).map(_ -> nc) }.toMap
      (lower, upper, nulls)
    }
    val added = adds.map { case (name, df) =>
      // write first, then take the stats from the written file's own
      // parquet footer (zero jobs; DeltaWrite.statsRawFor falls back
      // to the one-agg-job path when a footer stat is unusable) — the
      // former shape ran a separate aggregation job per added file
      // BEFORE an identical write pass
      val size = DeltaWrite.writeOne(df, dataDir.toString, name)
      val (rows, colStats) = DeltaWrite.statsRawFor(df.sparkSession,
        dataDir.toString, Seq(name), df.schema)(name)
      val (lower, upper, nulls) = boundsOf(colStats)
      // fixture adds of a partitioned table derive their partition
      // record from the (constant-within-file) column stats
      val partition = partCols.map { c =>
        c -> colStats.find(_._1.name == c).map(s => avroPv(s._2))
          .getOrElse(null) }.toMap
      IcebergRead.DataFileEntry(fileUri(dataDir.resolve(name)), "PARQUET",
        rows, seq = snapshotId, lowerBounds = lower, upperBounds = upper,
        nullCounts = nulls, partition = partition, sizeBytes = size)
    } ++ stagedAdds.map { s =>
      val (lower, upper, nulls) = boundsOf(s.colStats)
      IcebergRead.DataFileEntry(fileUri(dataDir.resolve(s.rel)), "PARQUET",
        s.rows, seq = snapshotId, lowerBounds = lower, upperBounds = upper,
        nullCounts = nulls, partition = s.partition, sizeBytes = s.size)
    }

    // position-delete files: parquet of (file_path, pos), paths as
    // recorded in the manifests
    val liveByRel = (carried ++ added)
      .map(f => relOf(f.path, dataDir) -> f).toMap
    val newDeletes = if (positionDeletes.isEmpty) Nil else {
      val spark = adds.headOption.map(_._2.sparkSession).getOrElse(
        org.apache.spark.sql.SparkSession.active)
      import spark.implicits._
      val rows = positionDeletes.toSeq.sortBy(_._1).flatMap { case (name, ps) =>
        val target = liveByRel.getOrElse(name, sys.error(
          s"position delete for unknown data file: $name"))
        ps.sorted.map(p => (target.path, p))
      }
      val delName = f"delete-$snapshotId%05d.parquet"
      DeltaWrite.writeOne(rows.toDF("file_path", "pos"),
        dataDir.toString, delName)
      Seq(IcebergRead.DataFileEntry(
        fileUri(dataDir.resolve(delName)), "PARQUET", rows.length.toLong,
        seq = snapshotId))
    }

    // equality-delete file: parquet of value rows over the named
    // TOP-LEVEL columns; field ids resolve through the same numbering
    // the metadata schema uses
    val newEqDeletes = equalityDelete.toSeq.map { case (cols, valueRows) =>
      val ids = cols.map(c => topIds.getOrElse(c, sys.error(
        s"equality delete column '$c' is not a top-level column")))
      require(valueRows.columns.toSeq == cols,
        s"equality delete rows must carry exactly $cols")
      val delName = f"eq-delete-$snapshotId%05d.parquet"
      DeltaWrite.writeOne(valueRows, dataDir.toString, delName)
      // record count from the just-written footer — no count job
      val n = DeltaWrite.footerRowCount(valueRows.sparkSession,
        dataDir.resolve(delName).toString).getOrElse(valueRows.count())
      IcebergRead.DataFileEntry(
        fileUri(dataDir.resolve(delName)), "PARQUET", n,
        seq = snapshotId, equalityIds = ids)
    }
    // v3 deletion vectors: new DVs register as (1,1) PUFFIN entries
    // with the addressing triplet; a prior DV for the same data file
    // is SUPERSEDED (not carried — the at-most-one invariant), and a
    // DV whose referenced data file was removed drops with it
    val supersededRefs = dvAdds.map(_.referencedDataFile).toSet
    val liveDataPaths = (carried ++ added).map(_.path).toSet
    val carriedDvs =
      if (dropDeletes) Nil
      else prior.deletionVectors.filter(dv =>
        dv.referencedDataFile.exists(r =>
          !supersededRefs.contains(r) && liveDataPaths.contains(r)))
    val newDvEntries = dvAdds.map { a =>
      require(liveDataPaths.contains(a.referencedDataFile),
        s"deletion vector references a non-live data file: " +
          s"${a.referencedDataFile}")
      IcebergRead.DataFileEntry(fileUri(dataDir.resolve(a.puffinRel)),
        "PUFFIN", a.cardinality, seq = snapshotId,
        referencedDataFile = Some(a.referencedDataFile),
        contentOffset = Some(a.offset), contentSize = Some(a.size))
    }
    val anyDeletes =
      (!dropDeletes && (prior.positionDeleteFiles.nonEmpty ||
        prior.equalityDeleteFiles.nonEmpty)) ||
      newDeletes.nonEmpty || newEqDeletes.nonEmpty ||
      carriedDvs.nonEmpty || newDvEntries.nonEmpty

    def entryRec(f: IcebergRead.DataFileEntry, status: Int,
        content: Int): GenericRecord = {
      val df = new GenericData.Record(
        EntrySchema.getField("data_file").schema())
      df.put("content", content)
      df.put("file_path", f.path)
      df.put("file_format", f.format)
      val pr = new GenericData.Record(
        df.getSchema.getField("partition").schema())
      // delete files carry an empty partition tuple in this writer
      // (they apply table-wide); data files carry their identity
      // values (carried entries re-emit what they were read with)
      if (content == 0) partCols.foreach { c =>
        pr.put(c, f.partition.getOrElse(c, null))
      }
      df.put("partition", pr)
      df.put("record_count", f.recordCount)
      // carried entries re-emit the size they were read with — a
      // commit never stats O(files) on the filesystem
      df.put("file_size_in_bytes",
        if (f.sizeBytes > 0L) f.sizeBytes
        else java.nio.file.Files.size(localOf(f.path)))
      // int-keyed manifest maps in the spec's array-of-{key,value}
      // form (avro maps cannot key by int); carried entries re-emit
      // the bounds they were read with, so stats survive rewrites
      def kvArray(field: String, entries: Seq[(Int, AnyRef)]): Unit =
        if (entries.nonEmpty) {
          val arrSchema = df.getSchema.getField(field).schema().getTypes.get(1)
          val itemSchema = arrSchema.getElementType
          val arr = new GenericData.Array[GenericRecord](entries.size, arrSchema)
          entries.sortBy(_._1).foreach { case (k, v) =>
            val kv = new GenericData.Record(itemSchema)
            kv.put("key", k)
            kv.put("value", v)
            arr.add(kv)
          }
          df.put(field, arr)
        }
      kvArray("null_value_counts", f.nullCounts.toSeq
        .map { case (k, v) => k -> (java.lang.Long.valueOf(v): AnyRef) })
      kvArray("lower_bounds", f.lowerBounds.toSeq
        .map { case (k, v) => k -> (java.nio.ByteBuffer.wrap(v): AnyRef) })
      kvArray("upper_bounds", f.upperBounds.toSeq
        .map { case (k, v) => k -> (java.nio.ByteBuffer.wrap(v): AnyRef) })
      if (content == 2) {
        import scala.jdk.CollectionConverters._
        df.put("equality_ids",
          f.equalityIds.map(Integer.valueOf).asJava)
      }
      // v3 deletion-vector addressing (a (1,1) entry with these set
      // is a DV, not a pos-delete parquet — the reader's contract)
      f.referencedDataFile.foreach(df.put("referenced_data_file", _))
      f.contentOffset.foreach(v =>
        df.put("content_offset", java.lang.Long.valueOf(v)))
      f.contentSize.foreach(v =>
        df.put("content_size_in_bytes", java.lang.Long.valueOf(v)))
      val e = new GenericData.Record(EntrySchema)
      e.put("status", status)
      e.put("snapshot_id", snapshotId)
      // explicit sequence numbers everywhere: carried entries keep
      // the sequence they were ADDED at (required for EXISTING rows;
      // equality-delete strictness depends on it)
      e.put("sequence_number", f.seq)
      e.put("data_file", df)
      e
    }

    val manifestMeta = Map(
      "format-version" -> tableFv.toString,
      "partition-spec" -> compact(render(JArray(specFields))))
    // one rewritten DATA manifest with the full live set
    val dataManifest = metaDir.resolve(f"manifest-$snapshotId%05d-data.avro")
    val dataLen = writeAvro(dataManifest, EntrySchema,
      carried.map(entryRec(_, 0, 0)) ++ added.map(entryRec(_, 1, 0)),
      manifestMeta + ("content" -> "data"))
    // one DELETE manifest when any position/equality deletes are live
    val deleteManifest =
      if (!anyDeletes) None
      else {
        val p = metaDir.resolve(f"manifest-$snapshotId%05d-deletes.avro")
        val carriedDel =
          if (dropDeletes) Nil
          else prior.positionDeleteFiles.map(entryRec(_, 0, 1)) ++
            prior.equalityDeleteFiles.map(entryRec(_, 0, 2)) ++
            carriedDvs.map(entryRec(_, 0, 1))
        val addedDel = newDeletes.map(entryRec(_, 1, 1)) ++
          newEqDeletes.map(entryRec(_, 1, 2)) ++
          newDvEntries.map(entryRec(_, 1, 1))
        Some(p -> writeAvro(p, EntrySchema, carriedDel ++ addedDel,
          manifestMeta + ("content" -> "deletes")))
      }

    def listRec(path: java.nio.file.Path, len: Long, content: Int,
        addedFiles: Int, existingFiles: Int, addedRows: Long,
        existingRows: Long, minSeq: Long): GenericRecord = {
      val r = new GenericData.Record(ListSchema)
      r.put("manifest_path", fileUri(path))
      r.put("manifest_length", len)
      r.put("partition_spec_id", 0)
      r.put("content", content)
      r.put("sequence_number", seq)
      // the spec's min over the manifest's LIVE entries — carried
      // entries keep older sequences, and an external reader prunes
      // delete application against this bound
      r.put("min_sequence_number", minSeq)
      r.put("added_snapshot_id", snapshotId)
      r.put("added_files_count", addedFiles)
      r.put("existing_files_count", existingFiles)
      r.put("deleted_files_count", 0)
      r.put("added_rows_count", addedRows)
      r.put("existing_rows_count", existingRows)
      r.put("deleted_rows_count", 0L)
      r
    }
    val manifestList = metaDir.resolve(
      f"snap-$snapshotId%05d-manifest-list.avro")
    writeAvro(manifestList, ListSchema,
      Seq(listRec(dataManifest, dataLen, 0, added.size, carried.size,
        added.map(_.recordCount).sum, carried.map(_.recordCount).sum,
        minSeq = ((carried ++ added).map(_.seq) :+ seq).min)) ++
        deleteManifest.map { case (p, len) =>
          val carriedDel =
            if (dropDeletes) Nil
            else prior.positionDeleteFiles ++
              prior.equalityDeleteFiles ++ carriedDvs
          val addedDel = newDeletes ++ newEqDeletes ++ newDvEntries
          listRec(p, len, 1, addedDel.size, carriedDel.size,
            addedDel.map(_.recordCount).sum,
            carriedDel.map(_.recordCount).sum,
            minSeq = ((carriedDel ++ addedDel).map(_.seq) :+ seq).min)
        },
      Map("format-version" -> tableFv.toString)): Unit

    // metadata JSON: the schema JSON is canonical (reused, ids
    // immutable); snapshots accumulate so every retained snapshot
    // stays time-travelable; evolution appends a new schema entry and
    // bumps current-schema-id
    val schemaJsonFinal = schemaJson match {
      case o: JObject =>
        if ((o \ "schema-id") == JNothing)
          o ~ ("schema-id" -> schemaId) ~
            ("identifier-field-ids" -> JArray(Nil))
        else o
      case other => sys.error(s"struct schema expected, got $other")
    }
    val schemasArr: List[JValue] = (schemaEvolution, schemaDrop) match {
      case (None, None) => priorMetaJson match {
        case None => List(schemaJsonFinal)
        case Some(pm) => (pm \ "schemas").children match {
          case Nil => List(schemaJsonFinal)
          case ss => ss
        }
      }
      // evolution AND drop: prior schemas stay listed (time travel
      // reads them), the new schema id becomes current
      case _ => priorSchemaJsons :+ schemaJsonFinal
    }
    val priorSnapshots =
      if (priorVersion == 0) Nil
      else (priorMetaJson.get \ "snapshots").children
    // REAL commit wall-clock in snapshot metadata (the spec's channel
    // for TIMESTAMP AS OF — metadata-file mtimes shift silently under
    // copy/restore/rsync); fixture mode keeps the historical 0-stamp
    // for byte-deterministic fixtures
    val commitMs = if (zeroTimestamps) 0L else System.currentTimeMillis()
    // v3 row lineage: each snapshot records the first row id it may
    // assign; the table metadata tracks the next unassigned id
    val priorNextRowId: Long = priorMetaJson.flatMap(pm =>
      (pm \ "next-row-id").extractOpt[Long]).getOrElse(0L)
    val nextRowId: Long = priorNextRowId + added.map(_.recordCount).sum
    val newSnapshot0: JValue =
      ("snapshot-id" -> snapshotId) ~
        ("sequence-number" -> seq) ~
        ("timestamp-ms" -> commitMs) ~
        ("summary" -> (("operation" -> operation): JObject)) ~
        ("manifest-list" -> fileUri(manifestList)) ~
        ("schema-id" -> schemaId)
    val newSnapshot: JValue =
      if (tableFv < 3) newSnapshot0
      else newSnapshot0.asInstanceOf[JObject] ~
        ("first-row-id" -> priorNextRowId)
    val meta0: JValue =
      ("format-version" -> tableFv) ~
        ("table-uuid" -> "00000000-0000-0000-0000-000000000000") ~
        ("location" -> ("file://" +
          java.nio.file.Paths.get(dir).toAbsolutePath.toString)) ~
        ("last-sequence-number" -> seq) ~
        ("last-updated-ms" -> commitMs) ~
        ("last-column-id" -> lastColumnId) ~
        ("current-schema-id" -> schemaId) ~
        ("schemas" -> JArray(schemasArr)) ~
        ("default-spec-id" -> 0) ~
        ("partition-specs" -> JArray(List(
          ("spec-id" -> 0) ~ ("fields" -> JArray(specFields))))) ~
        ("last-partition-id" -> (999 + specFields.size)) ~
        ("default-sort-order-id" -> 0) ~
        ("sort-orders" -> JArray(List(
          ("order-id" -> 0) ~ ("fields" -> JArray(Nil))))) ~
        ("current-snapshot-id" -> snapshotId) ~
        ("snapshots" -> JArray(priorSnapshots :+ newSnapshot))
    val meta: JValue =
      if (tableFv < 3) meta0
      else meta0.asInstanceOf[JObject] ~ ("next-row-id" -> nextRowId)
    java.nio.file.Files.writeString(
      metaDir.resolve(s"v$snapshotId.metadata.json"),
      pretty(render(meta)))
    java.nio.file.Files.writeString(hintFile, snapshotId.toString)
    snapshotId
  }

  // ---------------------------------------------------------------
  // Staged multi-file write paths
  // ---------------------------------------------------------------

  /** Stage-write `tagged` (full table columns + `__graft_target`)
    * under `<dir>/data/` in ONE Spark job, compute every file's stats
    * in ONE grouped job, and return [[Staged]] entries (partition
    * records from the per-file stats — identity values are constant
    * within a file). Iceberg data files KEEP their partition columns
    * (the spec stores them in the files as well as the manifests).
    */
  private def stageTagged(spark: org.apache.spark.sql.SparkSession,
      dir: String, tagged: DataFrame, schema: StructType,
      partCols: Seq[String]): Seq[Staged] = {
    val dataDir = java.nio.file.Paths.get(dir, "data")
    java.nio.file.Files.createDirectories(dataDir)
    val staged = DeltaWrite.stageWrite(dataDir.toString, tagged)
    val stats = DeltaWrite.statsRawFor(
      spark, dataDir.toString, staged.map(_._1), schema)
    staged.map { case (rel, size) =>
      val (rows, colStats) = stats.getOrElse(rel,
        sys.error(s"stats job missed staged file $rel"))
      val partition = partCols.map { c =>
        c -> colStats.find(_._1.name == c).map(s => avroPv(s._2))
          .getOrElse(null) }.toMap
      Staged(rel, rows, colStats, partition, size, schema)
    }
  }

  /** Copy-on-write `MERGE WHEN MATCHED UPDATE / NOT MATCHED INSERT`
    * into a REAL Iceberg table — the Iceberg side of the dbt-spark
    * `merge` strategy (`dbtoperator.py:274`; mirror of
    * [[DeltaWrite.merge]]): the final state reads back through
    * [[IcebergRead]] or any Iceberg reader, with every prior snapshot
    * time-travelable.
    *
    * First call creates the table: snapshot 1 buckets the batch into
    * up to `buckets` files by key hash (per partition when
    * `partitionBy` is set — a REAL identity partition spec with
    * manifest partition records), bounding later rewrite units. Each
    * subsequent merge, in ONE atomic snapshot:
    *  - prunes the live set to the batch's PARTITIONS (manifest
    *    partition records compared canonically; files without a
    *    record are kept — conservative);
    *  - finds the FILES holding matched keys with a semi-join on
    *    `_metadata.file_path` (collected distinct paths are O(files)
    *    on the driver, never rows);
    *  - stage-writes every rewrite (matched keys anti-joined out) AND
    *    the upsert files in ONE Spark job (an all-rows-matched file
    *    stages zero rows and becomes a bare remove — no per-file
    *    probes), plus ONE grouped stats job.
    * I/O is O(touched files + batch), never a table rewrite; job count
    * is O(1) per merge, never O(files); untouched files are
    * byte-identical across snapshots.
    *
    * CONTRACT: `batch` is unique per key; on partitioned tables a
    * key's partition values are STABLE across versions (same
    * stable-partition-per-key contract as [[DeltaWrite.merge]]).
    * Schema evolution happens only with `allowEvolution` and only for
    * APPENDED columns (fresh field ids past `last-column-id`; carried
    * files surface NULL for the new columns). Tables carrying live
    * position/equality deletes are rejected loudly (a rewrite that
    * ignored them would resurrect deleted rows) — use [[mergeOnRead]]
    * for the delete-file form.
    */
  def merge(spark: org.apache.spark.sql.SparkSession, dir: String,
      batch0: DataFrame, uniqueKey: Seq[String], buckets: Int = 8,
      maxLiveFiles: Int = 32,
      partitionBy: Seq[String] = Nil,
      allowEvolution: Boolean = false,
      // SQL predicate over the table's columns narrowing the MATCHED
      // set (dbt `incremental_predicates`): out-of-window rows are
      // not matched (they stay; their batch keys insert — SQL MERGE
      // semantics), and the touched-file probe prunes through the
      // manifests' column bounds so out-of-window files never open
      residualPredicate: Option[String] = None,
      // SQL predicate over the table's columns: matching rows are
      // DELETED in the SAME snapshot the batch upserts (`MERGE ...
      // WHEN MATCHED/NOT MATCHED BY SOURCE ... THEN DELETE` routed
      // single-commit). Full copy-on-write — Iceberg's native CoW
      // delete shape: files holding deleted rows join the rewrite
      // set (probe pruned through manifest bounds, so partitioned
      // retention deletes open only their partitions' files), no
      // delete file is written. CONTRACT (the MERGE route enforces
      // it): no deleted row's key is also in `batch`. Cannot combine
      // with residualPredicate; cannot CREATE a table.
      deletePredicate: Option[String] = None): Long = {
    import org.apache.spark.sql.functions.{col, concat, element_at, format_string, lit, pmod, typedlit, xxhash64}
    require(uniqueKey.nonEmpty, "merge needs at least one key column")
    uniqueKey.foreach(k => require(batch0.columns.contains(k),
      s"merge key '$k' is not a batch column (${batch0.columns.mkString(",")})"))
    partitionBy.foreach(p => require(batch0.columns.contains(p),
      s"partition column '$p' is not a batch column (${batch0.columns.mkString(",")})"))
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    // the batch feeds several jobs (touched-file probe, the staged
    // rewrite+upsert write) — pin it once
    val batch = batch0.localCheckpoint(eager = false)
    if (!java.nio.file.Files.isDirectory(metaDir)) {
      require(deletePredicate.isEmpty,
        s"merge with a delete leg cannot CREATE a table: $dir")
      val tagged =
        if (partitionBy.isEmpty) {
          val b = pmod(xxhash64(uniqueKey.map(col): _*), lit(buckets))
          batch.withColumn("__graft_target",
            format_string("part-%05d-v1.parquet", b))
        } else {
          val (bp, pdirPv) = DeltaWrite.withPdir(batch, partitionBy)
          val keysData = uniqueKey.filterNot(partitionBy.contains)
          val perPart = math.max(1, buckets / math.max(1, pdirPv.size))
          val b = if (keysData.isEmpty) lit(0L)
            else pmod(xxhash64(keysData.map(col): _*), lit(perPart))
          bp.withColumn("__graft_target",
            concat(col("__graft_pdir"), lit("/"),
              format_string("part-%05d-v1.parquet", b)))
            .drop("__graft_pdir")
        }
      val staged = stageTagged(spark, dir, tagged, batch.schema, partitionBy)
      if (staged.isEmpty) {
        // keep the legacy empty-creation shape: one empty data file
        // anchors the schema. The emptiness test is the staged write
        // itself (zero-row targets never materialize) — no count job.
        commit(dir, Seq("part-00000-v1.parquet" -> batch),
          partitionBy = partitionBy): Unit
        return 0L
      }
      commit(dir, Nil, stagedAdds = staged, partitionBy = partitionBy): Unit
      // merged-row count from the staged footers (Staged.rows) — the
      // dedicated batch.count() job this replaces re-ran the lineage
      staged.map(_.rows).sum
    } else {
      val state = IcebergRead.snapshotState(dir, None)
      require(state.positionDeleteFiles.isEmpty &&
        state.equalityDeleteFiles.isEmpty,
        s"copy-on-write merge into an Iceberg table with live delete " +
          s"files is unsupported (rewrites would resurrect deleted " +
          s"rows) — compact first: $dir")
      // v3 DVs: the CoW rewrite reads raw parquet (no DV anti-join)
      // and the commit would drop the DV entries — refuse before any
      // staging work (commit's backstop would catch it too late)
      require(state.deletionVectors.isEmpty,
        s"copy-on-write merge into an Iceberg table with live v3 " +
          s"deletion vectors is unsupported (the rewrite would " +
          s"resurrect DV-deleted rows and the v2 commit would drop " +
          s"the DV entries) — the table is read-only here: $dir")
      val partCols = IcebergRead.tablePartitionCols(dir)
      require(partitionBy.isEmpty || partitionBy == partCols,
        s"merge partitionBy ${partitionBy.mkString(",")} != table " +
          s"partitioning ${partCols.mkString(",")}: $dir")
      val tf = state.schema.fields.map(f => (f.name, f.dataType)).toSeq
      val bf = batch.schema.fields.map(f => (f.name, f.dataType)).toSeq
      val evolves = bf != tf
      if (evolves) require(allowEvolution && bf.startsWith(tf),
        s"merge batch schema ${batch.schema.simpleString} != table " +
          s"schema ${state.schema.simpleString} (schema evolution " +
          (if (allowEvolution) "supports appended columns only"
           else "disabled — pass allowEvolution to append new columns") +
          s"): $dir")
      require(residualPredicate.isEmpty || deletePredicate.isEmpty,
        s"merge cannot combine a delete leg with a residual ON " +
          s"predicate: $dir")
      val fullSchema = if (evolves) batch.schema else state.schema
      val version = java.nio.file.Files
        .readString(metaDir.resolve("version-hint.text")).trim.toInt + 1
      val dataDir = java.nio.file.Paths.get(dir, "data")

      // PARTITION PRUNING for the touched-file probe: manifest
      // partition records vs the batch's distinct partition values,
      // compared canonically; record-less files are kept
      val (batchP, pdirPv, pdirRow) =
        if (partCols.isEmpty)
          (batch.withColumn("__graft_pdir", lit("")),
            Map("" -> Map.empty[String, String]),
            Map.empty[String, org.apache.spark.sql.Row])
        else DeltaWrite.withPdirTyped(batch, partCols)
      val batchPvCanon: Set[Seq[String]] = pdirRow.values.map(r =>
        partCols.indices.map(i => canonicalPv(r.get(i)))).toSet
      val pruned0 =
        if (partCols.isEmpty) state.dataFiles
        else state.dataFiles.filter { f =>
          if (f.partition.isEmpty) true // pre-spec file: conservative
          else batchPvCanon.contains(
            partCols.map(c => canonicalPv(f.partition.getOrElse(c, null))))
        }
      // RESIDUAL-PREDICATE pruning (dbt incremental_predicates):
      // manifest column bounds prove some files hold no in-window
      // row — the probe never opens them (tri-state conservative)
      val resSkip = residualPredicate.map(rp =>
        FileSkipping.resolve(spark, state.schema,
          org.apache.spark.sql.functions.expr(rp)))
      val pruned = resSkip match {
        case None => pruned0
        case Some(e) => pruned0.filter(f =>
          FileSkipping.mayMatch(e, IcebergRead.fileStatsOf(state, f)))
      }

      val hconf = spark.sessionState.newHadoopConf()
      def qualified(p: String): String = DeltaWrite.sparkPathOf(hconf, p)
      val byQualified: Map[String, IcebergRead.DataFileEntry] =
        state.dataFiles.map(f =>
          qualified(localOf(f.path).toString) -> f).toMap
      // Iceberg data files store ALL columns (including identity
      // partition columns) — read with the evolved schema so old
      // files surface NULL for appended columns
      val cur =
        if (pruned.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(fullSchema.fields :+
              StructField("__graft_file", StringType)))
        else spark.read.schema(fullSchema)
          .parquet(pruned.map(f => localOf(f.path).toString).sorted: _*)
          .withColumn("__graft_file", col("_metadata.file_path"))
      // residual narrows the MATCHED set: only in-window rows count
      val curMatch = residualPredicate.map(rp =>
        cur.filter(org.apache.spark.sql.functions.expr(rp)))
        .getOrElse(cur)
      val touched0 = curMatch.join(batch, uniqueKey, "left_semi")
        .select("__graft_file").distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      // fused delete leg: files whose manifest bounds MAY hold a
      // matching row (partition columns are data columns with bounds
      // in Iceberg, so partitioned retention deletes prune here),
      // scanned ONCE for per-file match counts — matching files join
      // the rewrite set, their matching rows drop out of the carry
      val delExpr = deletePredicate.map(
        org.apache.spark.sql.functions.expr)
      val delPruned = deletePredicate.map { dp =>
        val e = FileSkipping.resolve(spark, state.schema,
          org.apache.spark.sql.functions.expr(dp))
        state.dataFiles.filter(f =>
          FileSkipping.mayMatch(e, IcebergRead.fileStatsOf(state, f)))
      }.getOrElse(Nil)
      val delByFile: Map[String, Long] =
        if (delPruned.isEmpty) Map.empty
        else spark.read.schema(state.schema)
          .parquet(delPruned.map(f => localOf(f.path).toString).sorted: _*)
          .withColumn("__graft_file", col("_metadata.file_path"))
          .filter(delExpr.get)
          .groupBy("__graft_file")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val nDeleted = delByFile.values.sum
      val touched = (touched0 ++ delByFile.keys).distinct.sorted
      val touchedFiles = touched.map(f => byQualified.getOrElse(f,
        sys.error(s"touched file $f missing from the live map: $dir")))
      val rwRelOf: Map[String, String] =
        touched.zipWithIndex.map { case (f, i) =>
          val srcRel = relOf(byQualified(f).path, dataDir)
          val pdir = srcRel.split('/').dropRight(1).mkString("/")
          f -> (if (pdir.isEmpty) f"rw-$version%05d-$i%03d.parquet"
                else f"$pdir/rw-$version%05d-$i%03d.parquet")
        }.toMap
      val rwPartition: Map[String, Map[String, Any]] =
        touchedFiles.map(lf =>
          rwRelOf(qualified(localOf(lf.path).toString)) -> lf.partition).toMap

      // ONE staged job: every rewrite + every upsert file
      val rwTagged =
        if (touched.isEmpty) None
        else {
          // the rewrite reads the UNIFIED touched set (key-matched ∪
          // delete-matched files — the latter may sit outside the
          // key probe's partition pruning)
          val rwBase = spark.read.schema(fullSchema)
            .parquet(touched.map(f =>
              localOf(byQualified(f).path).toString): _*)
            .withColumn("__graft_file", col("_metadata.file_path"))
          val batchKeys = batch.select(uniqueKey.map(col): _*)
          // carried = not replaced: key absent from the batch, or an
          // out-of-window row whose key matched (SQL MERGE leaves it)
          val carried = residualPredicate match {
            case None => rwBase.join(batchKeys, uniqueKey, "left_anti")
            case Some(rp) =>
              rwBase.join(batchKeys, uniqueKey, "left_anti")
                .unionByName(rwBase.filter(
                  !org.apache.spark.sql.functions.coalesce(
                    org.apache.spark.sql.functions.expr(rp),
                    org.apache.spark.sql.functions.lit(false)))
                  .join(batchKeys, uniqueKey, "left_semi"))
          }
          // fused delete leg: deleted rows drop out of the carry
          // (predicate-null rows survive — SQL WHERE semantics)
          val carriedKept = delExpr match {
            case None => carried
            case Some(e) => carried.filter(
              !org.apache.spark.sql.functions.coalesce(e,
                org.apache.spark.sql.functions.lit(false)))
          }
          Some(carriedKept
            .withColumn("__graft_target",
              element_at(typedlit(rwRelOf), col("__graft_file")))
            .drop("__graft_file"))
        }
      val upTagged = batchP
        .withColumn("__graft_target",
          if (partCols.isEmpty) lit(f"upsert-$version%05d.parquet")
          else concat(col("__graft_pdir"),
            lit(f"/upsert-$version%05d.parquet")))
        .drop("__graft_pdir")
      val tagged = rwTagged.fold(upTagged)(
        _.unionByName(upTagged, allowMissingColumns = true))
      val staged0 = stageTagged(spark, dir, tagged, fullSchema, partCols)
      // an EMPTY batch with nothing touched and no delete leg commits
      // nothing — otherwise every no-op schedule grows the table by
      // one empty snapshot forever. The emptiness test is the staged
      // write itself (zero-row targets never materialize), replacing
      // the dedicated batch.count() job (guide §1.2).
      if (staged0.isEmpty && touched.isEmpty && nDeleted == 0) return 0L
      // merged-row count from the staged footers: the upsert files'
      // rows ARE the batch's rows, each staged exactly once
      val upsertName = f"upsert-$version%05d.parquet"
      val n = staged0.iterator.filter(
        _.rel.split('/').last == upsertName).map(_.rows).sum
      // carried rewrites keep their source file's partition record
      // verbatim (stats-derived values are equal; verbatim is exact)
      val staged = staged0.map(s =>
        rwPartition.get(s.rel).fold(s)(p => s.copy(partition = p)))
      commit(dir, Nil, stagedAdds = staged,
        removes = touchedFiles.map(f => relOf(f.path, dataDir)),
        schemaEvolution = if (evolves) Some(fullSchema) else None): Unit
      // bound the file count: each merge adds upsert files — one
      // replace-snapshot compaction restores O(buckets)
      if (maxLiveFiles > 0 && IcebergRead.snapshotState(dir, None)
          .dataFiles.size > maxLiveFiles)
        optimize(spark, dir, uniqueKey, buckets)
      n + nDeleted
    }
  }

  /** OPTIMIZE (compaction): rewrite the CURRENT reconciled state —
    * live data files with every position/equality delete APPLIED —
    * into up to `buckets` key-hash-bucketed data files (per partition
    * when partitioned), in one snapshot whose summary operation is
    * `replace` (changelog readers skip replace snapshots: same logical
    * rows, new files). Prior delete files are dropped from the live
    * set, so this is also the merge-on-read compaction. ONE staged
    * write job + ONE stats job — no per-bucket probes. [[merge]] and
    * [[mergeOnRead]] auto-optimize when the live set exceeds their
    * `maxLiveFiles`.
    */
  def optimize(spark: org.apache.spark.sql.SparkSession, dir: String,
      uniqueKey: Seq[String], buckets: Int = 8): Unit = {
    import org.apache.spark.sql.functions.{col, concat, format_string, lit, pmod, xxhash64}
    require(uniqueKey.nonEmpty, "optimize needs the table's key columns")
    val state = IcebergRead.snapshotState(dir, None)
    if (state.dataFiles.size <= buckets &&
      state.positionDeleteFiles.isEmpty &&
      state.equalityDeleteFiles.isEmpty &&
      state.deletionVectors.isEmpty) return
    // v3 DVs compact exactly like v2 delete files: the rewrite below
    // reads the RECONCILED state ([[IcebergRead.readIcebergTable]]
    // applies DVs), and the dropDeletes commit drops the applied
    // masks with the rewritten files — the table keeps its own
    // format version
    val partCols = IcebergRead.tablePartitionCols(dir)
    val dataDir = java.nio.file.Paths.get(dir, "data")
    val version = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "metadata", "version-hint.text"))
      .trim.toInt + 1
    val cur = IcebergRead.readIcebergTable(spark, dir)
    val keysData = uniqueKey.filterNot(partCols.contains)
    val tagged =
      if (partCols.isEmpty) {
        val b = pmod(xxhash64(uniqueKey.map(col): _*), lit(buckets))
        cur.withColumn("__graft_target",
          format_string(f"opt-$version%05d-%%03d.parquet", b))
      } else {
        val (curP, pdirPv) = DeltaWrite.withPdir(cur, partCols)
        val perPart = math.max(1, buckets / math.max(1, pdirPv.size))
        val b = if (keysData.isEmpty) lit(0L)
          else pmod(xxhash64(keysData.map(col): _*), lit(perPart))
        curP.withColumn("__graft_target",
          concat(col("__graft_pdir"), lit("/"),
            format_string(f"opt-$version%05d-%%03d.parquet", b)))
          .drop("__graft_pdir")
      }
    val staged = stageTagged(spark, dir, tagged, state.schema, partCols)
    commit(dir, Nil, stagedAdds = staged,
      removes = state.dataFiles.map(f => relOf(f.path, dataDir)),
      operation = "replace", dropDeletes = true): Unit
  }

  /** Full-refresh CTAS into an Iceberg table: ONE atomic snapshot
    * makes `df` the whole table — the first snapshot creates it
    * (recording an identity partition spec when `partitionBy` is
    * set), later ones drop every live data file and add the new rows,
    * so prior snapshots stay time-travelable (Iceberg
    * `CREATE OR REPLACE` semantics). Live delete files stay carried
    * but become INERT: position deletes reference only the removed
    * files, and equality deletes apply strictly to lower-sequence
    * rows while the replacement file carries the new highest
    * sequence. Returns the rows written.
    */
  def replace(spark: org.apache.spark.sql.SparkSession, dir: String,
      df0: DataFrame, partitionBy: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val df = df0.localCheckpoint(eager = false)
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    val exists = java.nio.file.Files.isDirectory(metaDir)
    val partCols =
      if (!exists) partitionBy
      else {
        val pcs = IcebergRead.tablePartitionCols(dir)
        require(partitionBy.isEmpty || partitionBy == pcs,
          s"replace partitionBy ${partitionBy.mkString(",")} != table " +
            s"partitioning ${pcs.mkString(",")} (Iceberg partition " +
            s"specs are creation-time in this writer): $dir")
        pcs
      }
    val version =
      if (!exists) 1
      else java.nio.file.Files
        .readString(metaDir.resolve("version-hint.text")).trim.toInt + 1
    val tagged =
      if (partCols.isEmpty)
        df.withColumn("__graft_target",
          lit(f"replace-$version%05d.parquet"))
      else {
        val (dfP, _) = DeltaWrite.withPdir(df, partCols)
        dfP.withColumn("__graft_target",
          concat(col("__graft_pdir"), lit(f"/replace-$version%05d.parquet")))
          .drop("__graft_pdir")
      }
    val staged = stageTagged(spark, dir, tagged, df.schema, partCols)
    // row count from the staged footers — the emptiness test is the
    // staged write itself (zero-row targets never materialize), no
    // dedicated df.count() job
    val n = staged.map(_.rows).sum
    if (staged.isEmpty && !exists) {
      commit(dir, Seq(f"replace-$version%05d.parquet" -> df),
        partitionBy = partitionBy): Unit
      return 0L
    }
    val dataDir = java.nio.file.Paths.get(dir, "data")
    val removes =
      if (!exists) Nil
      else IcebergRead.snapshotState(dir, None).dataFiles
        .map(f => relOf(f.path, dataDir))
    if (staged.isEmpty && removes.isEmpty) return n
    commit(dir, Nil, stagedAdds = staged, removes = removes,
      partitionBy = if (exists) Nil else partitionBy): Unit
    n
  }

  /** DYNAMIC partition overwrite — Spark's
    * `spark.sql.sources.partitionOverwriteMode=dynamic`
    * `INSERT OVERWRITE` semantics on a partitioned Iceberg table
    * (Iceberg's own `overwrite` snapshot shape): ONE snapshot drops
    * the live data files of exactly the partitions PRESENT in `df`
    * (matched on manifest partition records, canonical comparison)
    * and adds the new rows in one staged job. Untouched partitions'
    * files are never read or referenced beyond the metadata carry.
    * A data file WITHOUT a partition record on a partitioned table
    * refuses loudly — keeping it could silently duplicate rows of an
    * overwritten partition. An empty batch commits nothing. Carried
    * equality deletes stay correct: the replacement files take the
    * new highest sequence, so earlier deletes never apply to them.
    */
  def overwritePartitions(spark: org.apache.spark.sql.SparkSession,
      dir: String, df0: DataFrame): Long = {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val partCols = IcebergRead.tablePartitionCols(dir)
    require(partCols.nonEmpty,
      s"dynamic partition overwrite needs a partitioned table " +
        s"(use replace for unpartitioned): $dir")
    val state = IcebergRead.snapshotState(dir, None)
    require(df0.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        state.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"INSERT OVERWRITE batch schema ${df0.schema.simpleString} != " +
        s"table schema ${state.schema.simpleString}: $dir")
    val df = df0.localCheckpoint(eager = false)
    val noRecord = state.dataFiles.filter(_.partition.isEmpty)
    require(noRecord.isEmpty,
      s"dynamic partition overwrite with record-less data files is " +
        s"unsupported (cannot prove they are outside the overwritten " +
        s"partitions): ${noRecord.map(_.path).mkString(", ")} in $dir")
    val version = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "metadata", "version-hint.text"))
      .trim.toInt + 1
    val (dfP, _, pdirRow) = DeltaWrite.withPdirTyped(df, partCols)
    val batchPvCanon: Set[Seq[String]] = pdirRow.values.map(r =>
      partCols.indices.map(i => canonicalPv(r.get(i)))).toSet
    val dataDir = java.nio.file.Paths.get(dir, "data")
    val removes = state.dataFiles.filter(f => batchPvCanon.contains(
      partCols.map(c => canonicalPv(f.partition.getOrElse(c, null)))))
      .map(f => relOf(f.path, dataDir))
    val tagged = dfP
      .withColumn("__graft_target", concat(col("__graft_pdir"),
        lit(f"/overwrite-$version%05d.parquet")))
      .drop("__graft_pdir")
    val staged = stageTagged(spark, dir, tagged, state.schema, partCols)
    // an empty batch touches no partition and commits nothing —
    // detected from the staged write itself, no dedicated count job
    if (staged.isEmpty) return 0L
    commit(dir, Nil, stagedAdds = staged, removes = removes): Unit
    staged.map(_.rows).sum
  }

  /** Merge-on-read upsert into a REAL Iceberg table — the
    * Flink/CDC streaming-upsert shape: each call writes ONE equality
    * delete file over `uniqueKey` (masking every earlier-sequence row
    * whose key appears in the batch) plus the batch as a fresh data
    * file, in one snapshot. No existing data file is read or
    * rewritten — commit cost is O(batch) regardless of table size,
    * the v2 MoR contract; readers reconcile via sequence-numbered
    * equality-delete application ([[IcebergRead]] does, hash-join,
    * never nested-loop). Partitioned tables are rejected loudly (the
    * upsert file would need per-partition splitting — use [[merge]]).
    */
  def mergeOnRead(spark: org.apache.spark.sql.SparkSession, dir: String,
      batch0: DataFrame, uniqueKey: Seq[String],
      maxLiveFiles: Int = 32): Long = {
    require(uniqueKey.nonEmpty, "merge needs at least one key column")
    uniqueKey.foreach(k => require(batch0.columns.contains(k),
      s"merge key '$k' is not a batch column (${batch0.columns.mkString(",")})"))
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    val batch = batch0.localCheckpoint(eager = false)
    if (!java.nio.file.Files.isDirectory(metaDir)) {
      commit(dir, Seq("part-00000-v1.parquet" -> batch)): Unit
      // row count from the committed file's footer — no count job
      DeltaWrite.footerRowCount(spark, java.nio.file.Paths
        .get(dir, "data", "part-00000-v1.parquet").toString)
        .getOrElse(batch.count())
    } else {
      require(IcebergRead.tablePartitionCols(dir).isEmpty,
        s"merge_on_read into a partitioned Iceberg table is " +
          s"unsupported (use the copy-on-write merge): $dir")
      val state = IcebergRead.snapshotState(dir, None)
      require(batch.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        state.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"merge batch schema ${batch.schema.simpleString} != table " +
          s"schema ${state.schema.simpleString} (schema evolution " +
          s"unsupported): $dir")
      if (batch.isEmpty) return 0L
      val version = java.nio.file.Files
        .readString(metaDir.resolve("version-hint.text")).trim.toInt + 1
      import org.apache.spark.sql.functions.col
      // append-only: no data file is read or rewritten, so a v3
      // table's live deletion vectors carry forward verbatim
      commit(dir,
        adds = Seq(f"upsert-$version%05d.parquet" -> batch),
        equalityDelete =
          Some(uniqueKey -> batch.select(uniqueKey.map(col): _*)),
        carryDvs = true): Unit
      // MoR accretes one data AND one delete file per upsert, and
      // every read pays one reconciliation join per delete file —
      // compaction applies the deletes and restores join-free scans
      val st = IcebergRead.snapshotState(dir, None)
      if (maxLiveFiles > 0 && st.dataFiles.size +
          st.positionDeleteFiles.size + st.equalityDeleteFiles.size >
          maxLiveFiles)
        optimize(spark, dir, uniqueKey)
      // row count from the committed upsert file's footer — no job
      DeltaWrite.footerRowCount(spark, java.nio.file.Paths
        .get(dir, "data", f"upsert-$version%05d.parquet").toString)
        .getOrElse(batch.count())
    }
  }

  /** `DELETE FROM <table> WHERE <predicate>` as an Iceberg v2
    * MERGE-ON-READ delete: ONE equality-delete file carrying the
    * unique keys of the matching rows, NO data file touched —
    * O(matching rows) commit cost, the delete file is written
    * distributed (no driver collect, unlike the Delta DV path's
    * position list). Readers reconcile by sequence number exactly as
    * for [[mergeOnRead]] upserts; the same `maxLiveFiles` compaction
    * valve bounds read-side join count. `predicateSql` is SQL text
    * over the table's columns (the routed statement's WHERE clause,
    * re-rendered); `uniqueKey` is the table's declared key — on a
    * merge table keys are unique, so key-equality deletion is exactly
    * row deletion. An empty match writes NO commit.
    *
    * Partitioned tables work the same way: the matched-key PROBE
    * prunes through the manifests' column bounds
    * ([[IcebergRead.readIcebergTable]]'s predicate file pruning —
    * identity partition columns are data columns with bounds in
    * Iceberg, so a date-partitioned retention delete opens only its
    * partitions' files), and the equality-delete file applies by key
    * VALUES, partition-independent, exactly as on unpartitioned
    * tables. O(touched partitions), never O(table).
    */
  /** The table's current metadata format-version (2 when absent). */
  private[graft] def formatVersionOf(dir: String): Int = {
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    val v = java.nio.file.Files.readString(
      metaDir.resolve("version-hint.text")).trim.toInt
    (JsonMethods.parse(java.nio.file.Files.readString(
      metaDir.resolve(s"v$v.metadata.json")))
      \ "format-version").extractOpt[Int].getOrElse(2)
  }

  /** Write ONE spec-shaped Puffin file holding one
    * `deletion-vector-v1` blob per `(referencedDataFile, positions)`
    * pair — the Delta-harmonized blob framing
    * ([[DeletionVectors.decodePuffinDv]] decodes it): 4-byte BE
    * length of [magic+bitmap], the magic bytes + portable
    * RoaringBitmapArray ([[DeletionVectors.serialize]]), 4-byte BE
    * CRC-32 of magic+bitmap. File layout per the Puffin spec: "PFA1"
    * header magic, the blobs, then a FOOTER ("PFA1", uncompressed
    * JSON FooterPayload listing each blob with its offset/length and
    * the v3 `referenced-data-file`/`cardinality` properties, 4-byte
    * LE payload size, 4 flag bytes (0 = uncompressed), "PFA1") — so
    * both manifest-addressed readers (Iceberg's contract: the
    * triplet rides the delete manifest entry) and footer-walking
    * Puffin tooling see the blobs. Returns each blob's [[DvAdd]].
    */
  private[sources] def writePuffin(target: java.nio.file.Path,
      rel: String, snapshotId: Long,
      blobs: Seq[(String, Seq[Long])]): Seq[DvAdd] = {
    require(blobs.nonEmpty, "empty Puffin file")
    val magic = Array[Byte]('P', 'F', 'A', '1')
    val bos = new java.io.ByteArrayOutputStream()
    def beInt(v: Int): Unit = bos.write(
      java.nio.ByteBuffer.allocate(4).putInt(v).array())
    bos.write(magic)
    val adds = blobs.map { case (ref, rows) =>
      val bitmap = DeletionVectors.serialize(rows.distinct.sorted)
      val crc = new java.util.zip.CRC32(); crc.update(bitmap)
      val offset = bos.size().toLong
      beInt(bitmap.length)
      bos.write(bitmap)
      beInt(crc.getValue.toInt)
      DvAdd(rel, offset, 4L + bitmap.length + 4L,
        rows.distinct.length.toLong, ref)
    }
    // footer payload: the spec's BlobMetadata list + file properties
    val payload: JValue =
      ("blobs" -> adds.map(a =>
        ("type" -> "deletion-vector-v1") ~
          ("fields" -> JArray(Nil)) ~
          ("snapshot-id" -> snapshotId) ~
          ("sequence-number" -> snapshotId) ~
          ("offset" -> a.offset) ~
          ("length" -> a.size) ~
          ("properties" ->
            (("referenced-data-file" -> a.referencedDataFile) ~
              ("cardinality" -> a.cardinality.toString))))) ~
        ("properties" -> (("created-by" -> "graft-iceberg-writer")
          : JObject))
    val payloadBytes = compact(render(payload))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    bos.write(magic)
    bos.write(payloadBytes)
    bos.write(java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(payloadBytes.length).array())
    bos.write(Array[Byte](0, 0, 0, 0)) // flags: uncompressed payload
    bos.write(magic)
    java.nio.file.Files.write(target, bos.toByteArray): Unit
    adds
  }

  /** [[deleteWhere]]'s format-v3 branch: `DELETE FROM ... WHERE p`
    * as PUFFIN DELETION VECTORS — ONE snapshot registers one
    * `deletion-vector-v1` blob per touched data file masking the
    * matching physical row positions; no data file is read beyond
    * the pruned probe, none is rewritten. A file that already
    * carries a DV gets a MERGED bitmap (old ∪ new — its new DV
    * supersedes the old entry, the spec's at-most-one invariant);
    * untouched files' DVs carry forward. The probe prunes through
    * manifest column bounds exactly like the v2 path. Returns the
    * NEWLY deleted row count (re-deleting a masked row is a no-op,
    * SQL DELETE semantics); an empty match writes NO commit.
    *
    * Scale notes: probe I/O is O(pruned files); per-file bitmaps
    * decode/encode driver-side at O(deleted rows per touched file)
    * with the same match cap as the Delta DV path.
    */
  private def deleteWhereDv(spark: org.apache.spark.sql.SparkSession,
      dir: String, predicateSql: String): Long = {
    import org.apache.spark.sql.functions.{col, expr}
    val state = IcebergRead.snapshotState(dir, None)
    require(state.positionDeleteFiles.isEmpty &&
      state.equalityDeleteFiles.isEmpty,
      s"v3 DV delete on a table with live v2 delete files is " +
        s"unsupported — compact first: $dir")
    val skip = FileSkipping.resolve(spark, state.schema,
      expr(predicateSql))
    val pruned = state.dataFiles.filter(f =>
      FileSkipping.mayMatch(skip, IcebergRead.fileStatsOf(state, f)))
    if (pruned.isEmpty) return 0L
    val hconf = spark.sessionState.newHadoopConf()
    val byQualified: Map[String, String] = state.dataFiles.map(f =>
      DeltaWrite.sparkPathOf(hconf, localOf(f.path).toString) -> f.path)
      .toMap
    val maxMatches = 2000000
    val matched = spark.read.schema(state.schema)
      .parquet(pruned.map(f => localOf(f.path).toString).sorted: _*)
      .withColumn("__graft_file", col("_metadata.file_path"))
      .withColumn("__graft_row", col("_metadata.row_index"))
      .filter(expr(predicateSql))
      .select("__graft_file", "__graft_row")
      .limit(maxMatches + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(matched.length <= maxMatches,
      s"DV delete matches more than $maxMatches rows — rewrite the " +
        s"table instead: $dir")
    if (matched.isEmpty) return 0L
    // old DV positions per referenced file (decode is O(deleted rows))
    val oldByRef: Map[String, Set[Long]] = state.deletionVectors.map {
      dv =>
        dv.referencedDataFile.get -> DeletionVectors.decodePuffinDv(
          java.nio.file.Files.readAllBytes(localOf(dv.path)),
          dv.contentOffset.get, dv.contentSize.get,
          Some(dv.recordCount)).toSet
    }.toMap
    val newByRef: Map[String, Seq[Long]] = matched
      .groupBy(m => byQualified.getOrElse(m._1, sys.error(
        s"matched file ${m._1} missing from the live map: $dir")))
      .map { case (ref, ms) => ref -> ms.map(_._2).toSeq }
    val n = newByRef.map { case (ref, ps) =>
      (ps.toSet -- oldByRef.getOrElse(ref, Set.empty)).size.toLong }.sum
    if (n == 0) return 0L
    val merged: Seq[(String, Seq[Long])] = newByRef.toSeq
      .map { case (ref, ps) =>
        ref -> (ps.toSet ++ oldByRef.getOrElse(ref, Set.empty))
          .toSeq.sorted }
      .sortBy(_._1)
    val version = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "metadata", "version-hint.text"))
      .trim.toInt + 1
    val dataDir = java.nio.file.Paths.get(dir, "data")
    val rel = f"dv-$version%05d.puffin"
    val adds = writePuffin(dataDir.resolve(rel), rel, version.toLong,
      merged)
    commit(dir, Nil, operation = "delete", dvAdds = adds): Unit
    n
  }

  def deleteWhere(spark: org.apache.spark.sql.SparkSession, dir: String,
      predicateSql: String, uniqueKey: Seq[String],
      maxLiveFiles: Int = 32): Long = {
    import org.apache.spark.sql.functions.{col, expr}
    require(uniqueKey.nonEmpty, "deleteWhere needs at least one key column")
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    require(java.nio.file.Files.isDirectory(metaDir),
      s"not an Iceberg table: $dir")
    // format-v3 tables take the deletion-vector form (v3 forbids new
    // position-delete files and this writer's eq-delete path would
    // refuse at commit) — same statement, same result, DV masks
    if (formatVersionOf(dir) >= 3)
      return deleteWhereDv(spark, dir, predicateSql)
    val cur = IcebergRead.readIcebergTable(spark, dir,
      predicate = Some(expr(predicateSql)))
    val matchedKeys = cur.filter(expr(predicateSql))
      .select(uniqueKey.map(col): _*).distinct().localCheckpoint(eager = false)
    val n = matchedKeys.count()
    if (n == 0) return 0L
    commit(dir, adds = Nil,
      equalityDelete = Some(uniqueKey -> matchedKeys)): Unit
    val st = IcebergRead.snapshotState(dir, None)
    if (maxLiveFiles > 0 && st.dataFiles.size +
        st.positionDeleteFiles.size + st.equalityDeleteFiles.size >
        maxLiveFiles)
      optimize(spark, dir, uniqueKey)
    n
  }

  final case class ExpireResult(filesDeleted: Long, bytesDeleted: Long)

  /** Snapshot retention GC (Iceberg `expire_snapshots`): keep the
    * newest `keepLast` snapshots (always including the current one),
    * write a fresh metadata version listing ONLY the retained
    * snapshots, and delete every file no retained snapshot references
    * — expired manifest lists, manifests, data/delete files, and
    * superseded `vN.metadata.json`. Time travel to an expired
    * snapshot id then REFUSES LOUDLY ("snapshot X does not exist"),
    * and the current snapshot reads back byte-identical
    * (test-asserted).
    */
  def expireSnapshots(spark: org.apache.spark.sql.SparkSession,
      dir: String, keepLast: Int = 1): ExpireResult = {
    require(keepLast >= 1, "expireSnapshots must keep at least 1 snapshot")
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    val hintFile = metaDir.resolve("version-hint.text")
    val priorVersion = java.nio.file.Files.readString(hintFile).trim.toInt
    val pm = JsonMethods.parse(java.nio.file.Files.readString(
      metaDir.resolve(s"v$priorVersion.metadata.json")))
    val snaps = (pm \ "snapshots").children
    val ordered = snaps.sortBy(s =>
      (s \ "sequence-number").extractOpt[Long].getOrElse(0L))
    val retained = ordered.takeRight(keepLast)
    val currentId = (pm \ "current-snapshot-id").extract[Long]
    require(retained.exists(s =>
      (s \ "snapshot-id").extractOpt[Long].contains(currentId)),
      s"retention window would expire the CURRENT snapshot: $dir")
    if (retained.size == ordered.size) return ExpireResult(0L, 0L)

    // everything any retained snapshot references stays
    val referenced = scala.collection.mutable.Set.empty[java.nio.file.Path]
    retained.foreach { s =>
      val mlUri = (s \ "manifest-list").extract[String]
      val ml = localOf(mlUri).toAbsolutePath.normalize()
      referenced += ml
      val rdr = new org.apache.avro.file.DataFileReader[GenericRecord](
        ml.toFile,
        new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try while (rdr.hasNext) {
        val mf = rdr.next()
        val man = localOf(mf.get("manifest_path").toString)
          .toAbsolutePath.normalize()
        referenced += man
        val mr = new org.apache.avro.file.DataFileReader[GenericRecord](
          man.toFile,
          new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
        try while (mr.hasNext) {
          val e = mr.next()
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          referenced += localOf(df.get("file_path").toString)
            .toAbsolutePath.normalize()
        } finally mr.close()
      } finally rdr.close()
    }

    // fresh metadata version with only the retained snapshots (same
    // current snapshot, schema, spec — nothing else changes)
    val newVersion = priorVersion + 1
    val newMeta = pm match {
      case o: JObject => JObject(o.obj.map {
        case ("snapshots", _) => "snapshots" -> JArray(retained)
        case other => other
      })
      case other => sys.error(s"malformed metadata JSON: $other")
    }
    java.nio.file.Files.writeString(
      metaDir.resolve(s"v$newVersion.metadata.json"),
      pretty(render(newMeta)))
    java.nio.file.Files.writeString(hintFile, newVersion.toString)
    referenced += metaDir.resolve(s"v$newVersion.metadata.json")
      .toAbsolutePath.normalize()
    referenced += hintFile.toAbsolutePath.normalize()

    // delete everything unreferenced under metadata/ and data/
    import scala.jdk.CollectionConverters._
    var files = 0L
    var bytes = 0L
    Seq(metaDir, java.nio.file.Paths.get(dir, "data")).foreach { root =>
      if (java.nio.file.Files.isDirectory(root)) {
        val w = java.nio.file.Files.walk(root)
        val all = try w.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_)).toSeq
        finally w.close()
        all.filterNot(p =>
          referenced.contains(p.toAbsolutePath.normalize())).foreach { p =>
          bytes += java.nio.file.Files.size(p)
          java.nio.file.Files.delete(p)
          files += 1
        }
      }
    }
    ExpireResult(files, bytes)
  }
}
