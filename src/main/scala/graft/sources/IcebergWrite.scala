package graft.sources

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.JsonMethods.{pretty, render}

/** Minimal spec-correct Apache Iceberg COMMIT writer
  * (iceberg.apache.org/spec/, format-version 2, Hadoop-catalog
  * layout): enough of the write path to export a table other Iceberg
  * readers (and [[IcebergRead]]) can scan — `vN.metadata.json` +
  * `version-hint.text`, avro manifest lists and manifests, parquet
  * data files, and v2 POSITION delete files. Unpartitioned,
  * single-writer, each commit writes one fresh data manifest carrying
  * the full live file set (added entries status=1, carried-forward
  * status=0; files dropped by `removes` are simply not carried — the
  * rewritten-manifest form the spec allows) plus one delete manifest
  * when position/equality deletes exist. Two consumers:
  * `PipelineRunner` routes `file_format=iceberg` models here
  * ([[replace]] / [[merge]] / [[mergeOnRead]]), and it is the
  * boundary adapter for exporting tables to tools that only speak
  * Iceberg.
  */
object IcebergWrite {

  private val EntrySchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int","field-id":0},
      |  {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |  {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |  {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |    {"name":"content","type":"int","field-id":134},
      |    {"name":"file_path","type":"string","field-id":100},
      |    {"name":"file_format","type":"string","field-id":101},
      |    {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[]}},
      |    {"name":"record_count","type":"long","field-id":103},
      |    {"name":"file_size_in_bytes","type":"long","field-id":104},
      |    {"name":"null_value_counts","type":["null",{"type":"array","logicalType":"map","items":{"type":"record","name":"k121_v122","fields":[{"name":"key","type":"int","field-id":121},{"name":"value","type":"long","field-id":122}]}}],"default":null,"field-id":110},
      |    {"name":"lower_bounds","type":["null",{"type":"array","logicalType":"map","items":{"type":"record","name":"k126_v127","fields":[{"name":"key","type":"int","field-id":126},{"name":"value","type":"bytes","field-id":127}]}}],"default":null,"field-id":125},
      |    {"name":"upper_bounds","type":["null",{"type":"array","logicalType":"map","items":{"type":"record","name":"k129_v130","fields":[{"name":"key","type":"int","field-id":129},{"name":"value","type":"bytes","field-id":130}]}}],"default":null,"field-id":128},
      |    {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null,"field-id":135}
      |  ]}}
      |]}""".stripMargin)

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

  /** Append commit: write each `(fileName, rows)` under `<dir>/data/`
    * as a live data file, drop previously-live files named in
    * `removes`, mask `(dataFileName -> physical row positions)` via
    * v2 position-delete files, and/or write a v2 EQUALITY delete
    * (`equalityDelete = Some(columns -> valueRows)`) deleting every
    * earlier-sequence data row matching a value row on those
    * top-level columns. Returns the new snapshot id. Timestamps are
    * fixed at 0 so fixtures are byte-deterministic.
    */
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
      dropDeletes: Boolean = false): Long = {
    require(adds.nonEmpty || removes.nonEmpty ||
      positionDeletes.nonEmpty || equalityDelete.nonEmpty,
      "empty Iceberg commit")
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    val dataDir = java.nio.file.Paths.get(dir, "data")
    java.nio.file.Files.createDirectories(metaDir)
    java.nio.file.Files.createDirectories(dataDir)

    val hintFile = metaDir.resolve("version-hint.text")
    val priorVersion =
      if (java.nio.file.Files.isRegularFile(hintFile))
        java.nio.file.Files.readString(hintFile).trim.toInt
      else 0
    val prior =
      if (priorVersion == 0) IcebergRead.SnapshotState(
        adds.headOption.map(_._2.schema).getOrElse(
          sys.error("first Iceberg commit must add at least one file")),
        Nil, Nil)
      else IcebergRead.snapshotState(dir, None)
    val snapshotId = priorVersion + 1L
    val seq = snapshotId

    def localOf(uri: String): java.nio.file.Path = java.nio.file.Paths.get(
      "/" + uri.stripPrefix("file:").dropWhile(_ == '/'))

    // top-level field name → Iceberg field id (the metadata schema's
    // numbering; bounds and equality ids resolve through it)
    val topIds: Map[String, Int] = {
      implicit val fmts: Formats = DefaultFormats
      var id = 0
      val next = () => { id += 1; id }
      val rendered = icebergType(prior.schema, next)
      (rendered \ "fields").children.map(f =>
        (f \ "name").extract[String] -> (f \ "id").extract[Int]).toMap
    }

    // carried-forward live data files minus removes (matched on the
    // data-file NAME, parallel to DeltaWrite's remove contract)
    val removedSet = removes.toSet
    val carried = prior.dataFiles.filterNot(f =>
      removedSet.contains(localOf(f.path).getFileName.toString))
    removes.foreach(r => require(
      prior.dataFiles.exists(f => localOf(f.path).getFileName.toString == r),
      s"remove of unknown Iceberg data file: $r"))

    // an add whose file name collides with ANY existing file under
    // data/ would silently overwrite parquet that older snapshots (or
    // the live set) still reference — duplicated rows now, corrupted
    // time travel and changelogs later. Reject both the live and the
    // previously-removed case.
    adds.foreach { case (name, _) =>
      require(!carried.exists(f => localOf(f.path).getFileName.toString == name),
        s"add of '$name' collides with a live data file — use a fresh name")
      require(!java.nio.file.Files.exists(dataDir.resolve(name)),
        s"add of '$name' would overwrite an existing file under data/ " +
          "that retained snapshots may still reference — use a fresh name")
    }
    val added = adds.map { case (name, df) =>
      val (rows, colStats) = DeltaWrite.columnStats(df)
      DeltaWrite.writeOne(df, dataDir.toString, name)
      // manifest column bounds + null counts: the data-skipping stats
      // IcebergRead's file pruning consumes
      val lower = colStats.flatMap { case (f, mn, _, _) =>
        topIds.get(f.name).flatMap(id =>
          IcebergRead.encodeBound(mn, f.dataType).map(id -> _)) }.toMap
      val upper = colStats.flatMap { case (f, _, mx, _) =>
        topIds.get(f.name).flatMap(id =>
          IcebergRead.encodeBound(mx, f.dataType).map(id -> _)) }.toMap
      val nulls = colStats.flatMap { case (f, _, _, nc) =>
        topIds.get(f.name).map(_ -> nc) }.toMap
      IcebergRead.DataFileEntry(fileUri(dataDir.resolve(name)), "PARQUET",
        rows, seq = snapshotId, lowerBounds = lower, upperBounds = upper,
        nullCounts = nulls)
    }

    // position-delete files: parquet of (file_path, pos), paths as
    // recorded in the manifests
    val liveByName = (carried ++ added)
      .map(f => localOf(f.path).getFileName.toString -> f).toMap
    val newDeletes = if (positionDeletes.isEmpty) Nil else {
      val spark = adds.headOption.map(_._2.sparkSession).getOrElse(
        org.apache.spark.sql.SparkSession.active)
      import spark.implicits._
      val rows = positionDeletes.toSeq.sortBy(_._1).flatMap { case (name, ps) =>
        val target = liveByName.getOrElse(name, sys.error(
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
      val n = valueRows.count()
      DeltaWrite.writeOne(valueRows, dataDir.toString, delName)
      IcebergRead.DataFileEntry(
        fileUri(dataDir.resolve(delName)), "PARQUET", n,
        seq = snapshotId, equalityIds = ids)
    }
    val anyDeletes =
      (!dropDeletes && (prior.positionDeleteFiles.nonEmpty ||
        prior.equalityDeleteFiles.nonEmpty)) ||
      newDeletes.nonEmpty || newEqDeletes.nonEmpty

    def entryRec(f: IcebergRead.DataFileEntry, status: Int,
        content: Int): GenericRecord = {
      val df = new GenericData.Record(
        EntrySchema.getField("data_file").schema())
      df.put("content", content)
      df.put("file_path", f.path)
      df.put("file_format", f.format)
      df.put("partition", new GenericData.Record(
        df.getSchema.getField("partition").schema()))
      df.put("record_count", f.recordCount)
      df.put("file_size_in_bytes", java.nio.file.Files.size(localOf(f.path)))
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

    // one rewritten DATA manifest with the full live set
    val dataManifest = metaDir.resolve(f"manifest-$snapshotId%05d-data.avro")
    val dataLen = writeAvro(dataManifest, EntrySchema,
      carried.map(entryRec(_, 0, 0)) ++ added.map(entryRec(_, 1, 0)),
      Map("content" -> "data", "format-version" -> "2"))
    // one DELETE manifest when any position/equality deletes are live
    val deleteManifest =
      if (!anyDeletes) None
      else {
        val p = metaDir.resolve(f"manifest-$snapshotId%05d-deletes.avro")
        val carriedDel =
          if (dropDeletes) Nil
          else prior.positionDeleteFiles.map(entryRec(_, 0, 1)) ++
            prior.equalityDeleteFiles.map(entryRec(_, 0, 2))
        val addedDel = newDeletes.map(entryRec(_, 1, 1)) ++
          newEqDeletes.map(entryRec(_, 1, 2))
        Some(p -> writeAvro(p, EntrySchema, carriedDel ++ addedDel,
          Map("content" -> "deletes", "format-version" -> "2")))
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
            prior.positionDeleteFiles ++ prior.equalityDeleteFiles
          val addedDel = newDeletes ++ newEqDeletes
          listRec(p, len, 1, addedDel.size, carriedDel.size,
            addedDel.map(_.recordCount).sum,
            carriedDel.map(_.recordCount).sum,
            minSeq = ((carriedDel ++ addedDel).map(_.seq) :+ seq).min)
        },
      Map("format-version" -> "2")): Unit

    // metadata JSON: schema is fixed at the first commit's (this
    // writer does not evolve schemas), snapshots accumulate so every
    // retained snapshot stays time-travelable
    val schemaJson = {
      var id = 0
      val next = () => { id += 1; id }
      icebergType(prior.schema, next) match {
        case o: JObject =>
          o ~ ("schema-id" -> 0) ~ ("identifier-field-ids" -> JArray(Nil))
        case other => sys.error(s"struct schema expected, got $other")
      }
    }
    val priorSnapshots =
      if (priorVersion == 0) Nil
      else (JsonMethods.parse(java.nio.file.Files.readString(
        metaDir.resolve(s"v$priorVersion.metadata.json"))) \ "snapshots")
        .children
    val newSnapshot: JValue =
      ("snapshot-id" -> snapshotId) ~
        ("sequence-number" -> seq) ~
        ("timestamp-ms" -> 0L) ~
        ("summary" -> (("operation" -> operation): JObject)) ~
        ("manifest-list" -> fileUri(manifestList)) ~
        ("schema-id" -> 0)
    val lastColumnId = {
      var id = 0
      val next = () => { id += 1; id }
      icebergType(prior.schema, next)
      id
    }
    val meta: JValue =
      ("format-version" -> 2) ~
        ("table-uuid" -> "00000000-0000-0000-0000-000000000000") ~
        ("location" -> ("file://" +
          java.nio.file.Paths.get(dir).toAbsolutePath.toString)) ~
        ("last-sequence-number" -> seq) ~
        ("last-updated-ms" -> 0L) ~
        ("last-column-id" -> lastColumnId) ~
        ("current-schema-id" -> 0) ~
        ("schemas" -> JArray(List(schemaJson))) ~
        ("default-spec-id" -> 0) ~
        ("partition-specs" -> JArray(List(
          ("spec-id" -> 0) ~ ("fields" -> JArray(Nil))))) ~
        ("last-partition-id" -> 999) ~
        ("default-sort-order-id" -> 0) ~
        ("sort-orders" -> JArray(List(
          ("order-id" -> 0) ~ ("fields" -> JArray(Nil))))) ~
        ("current-snapshot-id" -> snapshotId) ~
        ("snapshots" -> JArray(priorSnapshots :+ newSnapshot))
    java.nio.file.Files.writeString(
      metaDir.resolve(s"v$snapshotId.metadata.json"),
      pretty(render(meta)))
    java.nio.file.Files.writeString(hintFile, snapshotId.toString)
    snapshotId
  }

  /** Copy-on-write `MERGE WHEN MATCHED UPDATE / NOT MATCHED INSERT`
    * into a REAL Iceberg table — the Iceberg side of the dbt-spark
    * `merge` strategy (`dbtoperator.py:274`; mirror of
    * [[DeltaWrite.merge]]): the final state reads back through
    * [[IcebergRead]] or any Iceberg reader, with every prior snapshot
    * time-travelable.
    *
    * First call creates the table: snapshot 1 buckets the batch into
    * up to `buckets` files by key hash, bounding later rewrite units.
    * Each subsequent merge, in ONE atomic snapshot:
    *  - finds the FILES holding matched keys with a semi-join on
    *    `_metadata.file_path` (collected distinct paths are O(files)
    *    on the driver, never rows);
    *  - rewrites exactly those files with their matched keys
    *    anti-joined out (an all-rows-matched file becomes a bare
    *    remove);
    *  - adds the whole batch as one fresh file (updates + new keys).
    * I/O is O(touched files + batch), never a table rewrite; untouched
    * files are byte-identical across snapshots.
    *
    * CONTRACT: `batch` is unique per key; schema evolution is not
    * performed. Tables carrying live position/equality deletes are
    * rejected loudly (a rewrite that ignored them would resurrect
    * deleted rows) — use [[mergeOnRead]] for the delete-file form.
    */
  def merge(spark: org.apache.spark.sql.SparkSession, dir: String,
      batch0: DataFrame, uniqueKey: Seq[String], buckets: Int = 8,
      maxLiveFiles: Int = 32): Long = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    require(uniqueKey.nonEmpty, "merge needs at least one key column")
    uniqueKey.foreach(k => require(batch0.columns.contains(k),
      s"merge key '$k' is not a batch column (${batch0.columns.mkString(",")})"))
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    // the batch feeds several jobs (touched-file probe, per-file
    // rewrites, the upsert file) — pin it once
    val batch = batch0.localCheckpoint()
    if (!java.nio.file.Files.isDirectory(metaDir)) {
      val withB = batch.withColumn("__graft_b",
        pmod(xxhash64(uniqueKey.map(col): _*), lit(buckets)))
      val parts = (0 until buckets).map(b =>
        f"part-$b%05d-v1.parquet" ->
          withB.filter(col("__graft_b") === b).drop("__graft_b"))
        .filter(_._2.limit(1).count() > 0)
      commit(dir,
        if (parts.nonEmpty) parts else Seq("part-00000-v1.parquet" -> batch))
        : Unit
      batch.count()
    } else {
      val state = IcebergRead.snapshotState(dir, None)
      require(state.positionDeleteFiles.isEmpty &&
        state.equalityDeleteFiles.isEmpty,
        s"copy-on-write merge into an Iceberg table with live delete " +
          s"files is unsupported (rewrites would resurrect deleted " +
          s"rows) — compact first: $dir")
      require(batch.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        state.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"merge batch schema ${batch.schema.simpleString} != table " +
          s"schema ${state.schema.simpleString} (schema evolution " +
          s"unsupported): $dir")
      // an empty batch commits nothing — otherwise every no-op
      // schedule grows the table by one empty snapshot forever
      if (batch.isEmpty) return 0L
      val version = java.nio.file.Files
        .readString(metaDir.resolve("version-hint.text")).trim.toInt + 1
      val hconf = spark.sessionState.newHadoopConf()
      def qualified(p: String): String = {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(hconf).makeQualified(hp).toString
      }
      def nameOf(uri: String): String = java.nio.file.Paths.get(
        "/" + uri.stripPrefix("file:").dropWhile(_ == '/'))
        .getFileName.toString
      val nameByQualified: Map[String, String] =
        state.dataFiles.map(f => qualified(f.path) -> nameOf(f.path)).toMap
      val cur = spark.read.schema(state.schema)
        .parquet(state.dataFiles.map(_.path).sorted: _*)
        .withColumn("__graft_file", col("_metadata.file_path"))
      val touched = cur.join(batch, uniqueKey, "left_semi")
        .select("__graft_file").distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      val rewrites = touched.zipWithIndex.map { case (f, i) =>
        f"rw-$version%05d-$i%03d.parquet" ->
          cur.filter(col("__graft_file") === f)
            .join(batch, uniqueKey, "left_anti").drop("__graft_file")
      }.filter(_._2.limit(1).count() > 0)
      commit(dir,
        adds = rewrites :+ (f"upsert-$version%05d.parquet" -> batch),
        removes = touched.map(f => nameByQualified.getOrElse(f,
          sys.error(s"touched file $f missing from the live map: $dir"))))
        : Unit
      // bound the file count: each merge adds an upsert file — one
      // replace-snapshot compaction restores O(buckets)
      if (maxLiveFiles > 0 && IcebergRead.snapshotState(dir, None)
          .dataFiles.size > maxLiveFiles)
        optimize(spark, dir, uniqueKey, buckets)
      batch.count()
    }
  }

  /** OPTIMIZE (compaction): rewrite the CURRENT reconciled state —
    * live data files with every position/equality delete APPLIED —
    * into up to `buckets` key-hash-bucketed data files, in one
    * snapshot whose summary operation is `replace` (changelog readers
    * skip replace snapshots: same logical rows, new files). Prior
    * delete files are dropped from the live set, so this is also the
    * merge-on-read compaction: a MoR table accretes one data + one
    * delete file per upsert, and reads pay one reconciliation join
    * per delete file — compaction restores O(buckets) files and
    * join-free scans. [[merge]] and [[mergeOnRead]] auto-optimize
    * when the live set exceeds their `maxLiveFiles`.
    */
  def optimize(spark: org.apache.spark.sql.SparkSession, dir: String,
      uniqueKey: Seq[String], buckets: Int = 8): Unit = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    require(uniqueKey.nonEmpty, "optimize needs the table's key columns")
    val state = IcebergRead.snapshotState(dir, None)
    if (state.dataFiles.size <= buckets &&
      state.positionDeleteFiles.isEmpty &&
      state.equalityDeleteFiles.isEmpty) return
    val version = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "metadata", "version-hint.text"))
      .trim.toInt + 1
    // the reconciled read feeds every bucket write — pin it once
    val cur = IcebergRead.readIcebergTable(spark, dir).localCheckpoint()
    val withB = cur.withColumn("__graft_b",
      pmod(xxhash64(uniqueKey.map(col): _*), lit(buckets)))
    val parts = (0 until buckets).map(b =>
      f"opt-$version%05d-$b%03d.parquet" ->
        withB.filter(col("__graft_b") === b).drop("__graft_b"))
      .filter(_._2.limit(1).count() > 0)
    def nameOf(uri: String): String = java.nio.file.Paths.get(
      "/" + uri.stripPrefix("file:").dropWhile(_ == '/'))
      .getFileName.toString
    commit(dir, adds = parts,
      removes = state.dataFiles.map(f => nameOf(f.path)),
      operation = "replace", dropDeletes = true): Unit
  }

  /** Full-refresh CTAS into an Iceberg table: ONE atomic snapshot
    * makes `df` the whole table — the first snapshot creates it,
    * later ones drop every live data file and add the new rows, so
    * prior snapshots stay time-travelable (Iceberg
    * `CREATE OR REPLACE` semantics). Live delete files stay carried
    * but become INERT: position deletes reference only the removed
    * files, and equality deletes apply strictly to lower-sequence
    * rows while the replacement file carries the new highest
    * sequence. Returns the rows written.
    */
  def replace(spark: org.apache.spark.sql.SparkSession, dir: String,
      df0: DataFrame): Long = {
    val df = df0.localCheckpoint()
    val n = df.count()
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    if (!java.nio.file.Files.isDirectory(metaDir))
      commit(dir, Seq("part-00000-v1.parquet" -> df)): Unit
    else {
      val state = IcebergRead.snapshotState(dir, None)
      val version = java.nio.file.Files
        .readString(metaDir.resolve("version-hint.text")).trim.toInt + 1
      def nameOf(uri: String): String = java.nio.file.Paths.get(
        "/" + uri.stripPrefix("file:").dropWhile(_ == '/'))
        .getFileName.toString
      commit(dir,
        adds = Seq(f"replace-$version%05d.parquet" -> df),
        removes = state.dataFiles.map(f => nameOf(f.path))): Unit
    }
    n
  }

  /** Merge-on-read upsert into a REAL Iceberg table — the
    * Flink/CDC streaming-upsert shape: each call writes ONE equality
    * delete file over `uniqueKey` (masking every earlier-sequence row
    * whose key appears in the batch) plus the batch as a fresh data
    * file, in one snapshot. No existing data file is read or
    * rewritten — commit cost is O(batch) regardless of table size,
    * the v2 MoR contract; readers reconcile via sequence-numbered
    * equality-delete application ([[IcebergRead]] does, hash-join,
    * never nested-loop).
    */
  def mergeOnRead(spark: org.apache.spark.sql.SparkSession, dir: String,
      batch0: DataFrame, uniqueKey: Seq[String],
      maxLiveFiles: Int = 32): Long = {
    require(uniqueKey.nonEmpty, "merge needs at least one key column")
    uniqueKey.foreach(k => require(batch0.columns.contains(k),
      s"merge key '$k' is not a batch column (${batch0.columns.mkString(",")})"))
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    val batch = batch0.localCheckpoint()
    if (!java.nio.file.Files.isDirectory(metaDir)) {
      commit(dir, Seq("part-00000-v1.parquet" -> batch)): Unit
      batch.count()
    } else {
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
      commit(dir,
        adds = Seq(f"upsert-$version%05d.parquet" -> batch),
        equalityDelete =
          Some(uniqueKey -> batch.select(uniqueKey.map(col): _*)))
        : Unit
      // MoR accretes one data AND one delete file per upsert, and
      // every read pays one reconciliation join per delete file —
      // compaction applies the deletes and restores join-free scans
      val st = IcebergRead.snapshotState(dir, None)
      if (maxLiveFiles > 0 && st.dataFiles.size +
          st.positionDeleteFiles.size + st.equalityDeleteFiles.size >
          maxLiveFiles)
        optimize(spark, dir, uniqueKey)
      batch.count()
    }
  }
}
