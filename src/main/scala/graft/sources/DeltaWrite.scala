package graft.sources

import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods.{compact, render}

/** Minimal protocol-correct Delta Lake COMMIT writer (delta.io
  * PROTOCOL.md): enough of the write path to export a table other
  * Delta readers (and [[DeltaRead]]) can scan — protocol (1, 2),
  * `metaData` with the Spark-JSON schema, per-file `add` actions
  * with data-skipping `stats`, `remove` tombstones, `cdc` Change-
  * Data-Feed files, single-file checkpoints + `_last_checkpoint`
  * ([[writeCheckpoint]], auto-written by [[merge]] every
  * `checkpointInterval` commits). Unpartitioned, single-writer.
  * Two consumers: `PipelineRunner` routes `file_format=delta` models
  * here ([[replace]] / [[merge]] — the dbt-spark Delta contract), and
  * it is the boundary adapter for exporting tables to tools that only
  * speak Delta.
  */
object DeltaWrite {

  /** Write one parquet file with `df`'s rows as `<dir>/<name>`
    * (shared with [[IcebergWrite]]'s fixture data-file writer).
    */
  private[sources] def writeOne(df: DataFrame, dir: String, name: String): Long = {
    val dest = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.createDirectories(dest.getParent)
    val tmp = java.nio.file.Files.createTempDirectory(
      dest.getParent, ".delta_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(tmp)
    val part = try s.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error(s"no parquet part written under $tmp"))
    finally s.close()
    java.nio.file.Files.move(part, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val walk = java.nio.file.Files.walk(tmp)
    val all = try walk.iterator().asScala.toSeq finally walk.close()
    all.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    java.nio.file.Files.size(dest)
  }

  /** One aggregate job over `df` (the driver gets back a single row):
    * (numRecords, per primitive top-level column (field, min, max,
    * nullCount)) — the data-skipping stats both lakehouse writers
    * record and both readers' file pruning consumes.
    */
  private[sources] def columnStats(df: DataFrame)
      : (Long, Seq[(org.apache.spark.sql.types.StructField, Any, Any, Long)]) = {
    import org.apache.spark.sql.functions.{col, count, lit, max, min, sum, when}
    import org.apache.spark.sql.types._
    val fields = df.schema.fields.filter(f => f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | _: DecimalType | StringType | DateType |
           TimestampType | BooleanType => true
      case _ => false
    })
    val aggs = Seq(count(lit(1)).as("n")) ++ fields.flatMap(f => Seq(
      min(col(f.name)), max(col(f.name)),
      sum(when(col(f.name).isNull, 1L).otherwise(0L))))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getLong(0)
    (n, fields.zipWithIndex.toSeq.map { case (f, i) =>
      (f, row.get(1 + i * 3), row.get(2 + i * 3),
        if (n == 0) 0L else row.getLong(3 + i * 3))
    })
  }

  /** Delta `add.stats` JSON for one data file's rows
    * ([[columnStats]] serialized the way [[DeltaRead]] reads it).
    */
  private[sources] def statsJson(df: DataFrame): String = {
    val (numRecords, cols0) = columnStats(df)
    def jVal(v: Any): JValue = v match {
      case null => JNull
      case b: Boolean => JBool(b)
      case s: String => JString(s)
      case d: java.sql.Date => JString(d.toLocalDate.toString)
      case d: java.time.LocalDate => JString(d.toString)
      case t: java.sql.Timestamp => JString(t.toInstant.toString)
      case t: java.time.Instant => JString(t.toString)
      case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
      // shortest-repr text round-trips the binary value exactly —
      // the same domain FileSkipping compares in
      case f: Float =>
        if (f.isNaN || f.isInfinite) JNull else JDecimal(BigDecimal(f.toString))
      case d: Double =>
        if (d.isNaN || d.isInfinite) JNull else JDecimal(BigDecimal(d.toString))
      case n: Number => JInt(BigInt(n.longValue))
      case other => sys.error(s"unexpected stats value: $other")
    }
    val cols = cols0.map { case (f, mn, mx, nulls) =>
      (f.name -> jVal(mn), f.name -> jVal(mx),
        f.name -> (JInt(BigInt(nulls)): JValue))
    }
    val (mins, maxs, nulls) = cols.unzip3
    compact(render(
      ("numRecords" -> numRecords) ~
        ("minValues" -> JObject(mins.filter(_._2 != JNull).toList)) ~
        ("maxValues" -> JObject(maxs.filter(_._2 != JNull).toList)) ~
        ("nullCount" -> JObject(nulls.toList))))
  }

  /** Append commit `version`: write each `(fileName, rows)` as a data
    * file + `add` action, tombstone each `removes` path. Commit 0
    * additionally carries `protocol` + `metaData` (from the first
    * add's schema, with `configuration` as the table properties —
    * e.g. `delta.enableChangeDataFeed`). Timestamps are fixed at 0 so
    * fixtures are byte-deterministic; Delta readers treat them as
    * metadata only.
    */
  def commit(dir: String, version: Long,
      adds: Seq[(String, DataFrame)],
      removes: Seq[String] = Nil,
      configuration: Map[String, String] = Map.empty,
      cdc: Seq[(String, DataFrame)] = Nil,
      // false = a pure REARRANGEMENT commit (OPTIMIZE/compaction):
      // the same rows move between files; CDF and incremental
      // consumers correctly see no row changes
      dataChange: Boolean = true,
      // streaming-writer transaction stamp (appId -> version): rides
      // the SAME atomic commit as the data, the protocol's
      // exactly-once contract for idempotent writers
      txn: Option[(String, Long)] = None): Unit = {
    require(adds.nonEmpty || removes.nonEmpty || cdc.nonEmpty,
      "empty Delta commit")
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    java.nio.file.Files.createDirectories(logDir)
    val commitFile = logDir.resolve(f"$version%020d.json")
    require(!java.nio.file.Files.exists(commitFile),
      s"Delta commit $version already exists in $dir")
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    if (version == 0L) {
      val schema = adds.headOption.map(_._2.schema).getOrElse(
        sys.error("commit 0 must add at least one file (for metaData)"))
      lines += compact(render(
        ("protocol" -> (("minReaderVersion" -> 1) ~
          ("minWriterVersion" -> 2)))))
      lines += compact(render(
        ("metaData" -> (("id" -> "graft-delta-export") ~
          ("format" -> (("provider" -> "parquet") ~
            ("options" -> Map.empty[String, String]))) ~
          ("schemaString" -> schema.json) ~
          ("partitionColumns" -> Seq.empty[String]) ~
          ("configuration" -> configuration) ~
          ("createdTime" -> 0L)))))
    }
    adds.foreach { case (name, df) =>
      val size = writeOne(df, dir, name)
      lines += compact(render(
        ("add" -> (("path" -> name) ~
          ("partitionValues" -> Map.empty[String, String]) ~
          ("size" -> size) ~
          ("modificationTime" -> 0L) ~
          ("dataChange" -> dataChange) ~
          ("stats" -> statsJson(df))))))
    }
    removes.foreach { p =>
      lines += compact(render(
        ("remove" -> (("path" -> p) ~
          ("deletionTimestamp" -> 0L) ~
          ("dataChange" -> dataChange)))))
    }
    txn.foreach { case (appId, v) =>
      lines += compact(render(
        ("txn" -> (("appId" -> appId) ~
          ("version" -> v) ~
          ("lastUpdated" -> 0L)))))
    }
    // Change-Data-Feed files: each row carries its _change_type; the
    // cdc action makes this commit's CDF authoritative (readers then
    // IGNORE the add/remove actions for change derivation — the
    // protocol's contract for commits whose file-level actions would
    // misstate row-level changes, e.g. a MERGE's rewrites)
    cdc.foreach { case (name, df) =>
      val size = writeOne(df, dir, name)
      lines += compact(render(
        ("cdc" -> (("path" -> name) ~
          ("partitionValues" -> Map.empty[String, String]) ~
          ("size" -> size) ~
          ("dataChange" -> false)))))
    }
    java.nio.file.Files.writeString(commitFile,
      lines.mkString("", "\n", "\n"))
  }

  /** Copy-on-write MERGE (upsert) of `batch` into the Delta table at
    * `dir` on `uniqueKey` — the dbt-spark `merge` strategy
    * materializing INTO a real `_delta_log` table any Delta reader
    * (including [[DeltaRead]]) can scan; this round-trip is why the
    * reference pins dbt-spark's Delta stack (`dbtoperator.py:274`).
    *
    * First call creates the table: commit 0 buckets the batch into up
    * to `buckets` files by key hash, bounding later rewrite units.
    * Each subsequent merge, in ONE atomic commit:
    *  - finds the FILES holding matched keys with a semi-join on
    *    `_metadata.file_path` (the collected distinct paths are
    *    O(files) on the driver, never rows);
    *  - rewrites exactly those files with their matched keys
    *    anti-joined out (an all-rows-matched file becomes a bare
    *    remove);
    *  - adds the whole batch as one fresh file (updates + new keys);
    *  - writes remove+add actions (with data-skipping stats) under
    *    the next version — readers flip atomically, time travel keeps
    *    every prior state.
    * I/O is O(touched files + batch), never a table rewrite.
    *
    * CONTRACT (same as Delta `MERGE WHEN MATCHED UPDATE / NOT MATCHED
    * INSERT`): `batch` is unique per key; schema evolution is not
    * performed (batch columns must equal the table's). Tables with
    * column mapping, partitions or deletion vectors are rejected
    * loudly by [[DeltaRead.liveDataFiles]].
    *
    * Change Data Feed: `enableCdf = true` stamps
    * `delta.enableChangeDataFeed=true` at CREATION; on any table so
    * configured (regardless of who created it), each merge commit
    * writes a `_change_data/` cdc file with the true row-level
    * changes (update_preimage / update_postimage / insert) — required
    * by the protocol, since a merge's whole-file rewrites would make
    * derived CDF misreport carried rows.
    */
  /** OPTIMIZE (compaction): rewrite the live file set into up to
    * `buckets` key-hash-bucketed files in ONE commit whose actions
    * carry `dataChange=false` — a pure rearrangement, so CDF readers
    * and incremental consumers correctly see NO row changes. This is
    * what bounds a long-lived merge target's file count: every merge
    * adds one upsert file (plus rewrites), so after N merges the
    * table holds O(N) files and every reader pays O(N) footer opens;
    * [[merge]] auto-optimizes once the live set exceeds
    * `maxLiveFiles`, restoring O(buckets). No-op when already at or
    * under `buckets` files.
    */
  def optimize(spark: org.apache.spark.sql.SparkSession, dir: String,
      uniqueKey: Seq[String], buckets: Int = 8): Unit = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    require(uniqueKey.nonEmpty, "optimize needs the table's key columns")
    val live = DeltaRead.liveDataFiles(spark, dir)
    if (live.size <= buckets) return
    val schema = DeltaRead.tableSchema(spark, dir)
    val version = DeltaRead.latestVersion(dir) + 1
    // one read of the whole live set feeds every bucket write — pin it
    val cur = spark.read.schema(schema).parquet(live.map(_._1): _*)
      .localCheckpoint()
    val withB = cur.withColumn("__graft_b",
      pmod(xxhash64(uniqueKey.map(col): _*), lit(buckets)))
    val parts = (0 until buckets).map(b =>
      f"opt-$version%05d-$b%03d.parquet" ->
        withB.filter(col("__graft_b") === b).drop("__graft_b"))
      .filter(_._2.limit(1).count() > 0)
    commit(dir, version, adds = parts, removes = live.map(_._2),
      dataChange = false)
  }

  /** Full-refresh CTAS into a Delta table: ONE atomic commit makes
    * `df` the whole table — the first commit creates it, later ones
    * remove every live file and add the new rows, so prior states
    * stay time-travelable (Delta `CREATE OR REPLACE` semantics).
    * Returns the rows written.
    */
  def replace(spark: org.apache.spark.sql.SparkSession, dir: String,
      df0: DataFrame,
      configuration: Map[String, String] = Map.empty): Long = {
    val df = df0.localCheckpoint()
    val n = df.count()
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    if (!java.nio.file.Files.isDirectory(logDir))
      commit(dir, 0L, Seq("part-00000-v0.parquet" -> df),
        configuration = configuration)
    else {
      val version = DeltaRead.latestVersion(dir) + 1
      val live = DeltaRead.liveDataFiles(spark, dir)
      commit(dir, version,
        adds = Seq(f"replace-$version%05d.parquet" -> df),
        removes = live.map(_._2))
    }
    n
  }

  def merge(spark: org.apache.spark.sql.SparkSession, dir: String,
      batch0: DataFrame, uniqueKey: Seq[String], buckets: Int = 8,
      enableCdf: Boolean = false,
      checkpointInterval: Int = 10,
      maxLiveFiles: Int = 32,
      txn: Option[(String, Long)] = None): Long = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    require(uniqueKey.nonEmpty, "merge needs at least one key column")
    uniqueKey.foreach(k => require(batch0.columns.contains(k),
      s"merge key '$k' is not a batch column (${batch0.columns.mkString(",")})"))
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    // the batch feeds several jobs (touched-file probe, per-file
    // rewrites, the upsert file) — pin it once
    val batch = batch0.localCheckpoint()
    if (!java.nio.file.Files.isDirectory(logDir)) {
      val withB = batch.withColumn("__graft_b",
        pmod(xxhash64(uniqueKey.map(col): _*), lit(buckets)))
      val parts = (0 until buckets).map(b =>
        f"part-$b%05d-v0.parquet" ->
          withB.filter(col("__graft_b") === b).drop("__graft_b"))
        .filter(_._2.limit(1).count() > 0)
      // a creation commit is add-only — derived CDF reads it as pure
      // inserts, which is exact, so no cdc action is needed here
      commit(dir, 0L,
        if (parts.nonEmpty) parts else Seq("part-00000-v0.parquet" -> batch),
        configuration =
          if (enableCdf) Map("delta.enableChangeDataFeed" -> "true")
          else Map.empty,
        txn = txn)
      batch.count()
    } else {
      val tableSchema = DeltaRead.tableSchema(spark, dir)
      require(batch.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        tableSchema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"merge batch schema ${batch.schema.simpleString} != table " +
          s"schema ${tableSchema.simpleString} (schema evolution " +
          s"unsupported): $dir")
      // an empty batch commits nothing — otherwise every no-op
      // schedule grows the log by one empty file forever
      if (batch.isEmpty) return 0L
      val version = DeltaRead.latestVersion(dir) + 1
      val live = DeltaRead.liveDataFiles(spark, dir)
      val hconf = spark.sessionState.newHadoopConf()
      def qualified(p: String): String = {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(hconf).makeQualified(hp).toString
      }
      val relOf: Map[String, String] =
        live.map { case (abs, rel) => qualified(abs) -> rel }.toMap
      val cur = spark.read.schema(tableSchema)
        .parquet(live.map(_._1): _*)
        .withColumn("__graft_file", col("_metadata.file_path"))
      val touched = cur.join(batch, uniqueKey, "left_semi")
        .select("__graft_file").distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      val rewrites = touched.zipWithIndex.map { case (f, i) =>
        f"rw-$version%05d-$i%03d.parquet" ->
          cur.filter(col("__graft_file") === f)
            .join(batch, uniqueKey, "left_anti").drop("__graft_file")
      }.filter(_._2.limit(1).count() > 0)
      // A MERGE commit on a CDF-enabled table MUST carry cdc actions:
      // its add/remove actions rewrite whole files, so the derived
      // fallback would misreport every carried row of a touched file
      // as deleted+inserted. The cdc file holds the TRUE row-level
      // changes: old values of matched keys (update_preimage), their
      // new values (update_postimage), and unmatched batch rows
      // (insert) — O(touched + batch), like the merge itself.
      val cdfOn = DeltaRead.tableConfiguration(spark, dir)
        .getOrElse("delta.enableChangeDataFeed", "false") == "true"
      val cdc = if (!cdfOn) Nil else {
        val ct = "_change_type"
        val cols = tableSchema.fieldNames.toSeq
        val curRows = cur.drop("__graft_file")
        val pre = curRows.join(batch, uniqueKey, "left_semi")
          .withColumn(ct, lit("update_preimage"))
        val post = batch.join(curRows.select(uniqueKey.map(col): _*),
            uniqueKey, "left_semi")
          .withColumn(ct, lit("update_postimage"))
        val ins = batch.join(curRows.select(uniqueKey.map(col): _*),
            uniqueKey, "left_anti")
          .withColumn(ct, lit("insert"))
        Seq(f"_change_data/cdc-$version%05d.parquet" ->
          pre.unionByName(post).unionByName(ins)
            .select((cols :+ ct).map(col): _*))
      }
      commit(dir, version,
        adds = rewrites :+ (f"upsert-$version%05d.parquet" -> batch),
        removes = touched.map(f => relOf.getOrElse(f,
          sys.error(s"touched file $f missing from the live map: $dir"))),
        cdc = cdc, txn = txn)
      // bound the FILE count too: each merge adds an upsert file, so
      // an un-compacted table accretes O(merges) files — once the
      // live set exceeds maxLiveFiles, one dataChange=false OPTIMIZE
      // commit re-buckets it back to O(buckets)
      if (maxLiveFiles > 0 &&
          DeltaRead.liveDataFiles(spark, dir).size > maxLiveFiles)
        optimize(spark, dir, uniqueKey, buckets)
      // bound future replays: a long merge history reads as ONE
      // checkpoint + O(checkpointInterval) JSON commits, not O(history)
      if (checkpointInterval > 0 && version % checkpointInterval == 0)
        writeCheckpoint(spark, dir): Unit
      batch.count()
    }
  }

  /** Checkpoint parquet schema (delta.io PROTOCOL.md checkpoint
    * format): one column per action type, exactly the fields this
    * writer commits. Remove tombstones are intentionally absent —
    * this writer stamps deletionTimestamp=0, so every tombstone is
    * already expired under any retention clock.
    */
  private val CheckpointSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)),
        StructField("writerFeatures", ArrayType(StringType))))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("name", StringType),
        StructField("description", StringType),
        StructField("format", StructType(Seq(
          StructField("provider", StringType),
          StructField("options", MapType(StringType, StringType))))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType)),
        StructField("createdTime", LongType)))),
      StructField("txn", StructType(Seq(
        StructField("appId", StringType),
        StructField("version", LongType),
        StructField("lastUpdated", LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("stats", StringType),
        StructField("deletionVector", StructType(Seq(
          StructField("storageType", StringType),
          StructField("pathOrInlineDv", StringType),
          StructField("offset", IntegerType),
          StructField("sizeInBytes", IntegerType),
          StructField("cardinality", LongType)))))))))
  }

  /** Write a single-file checkpoint of the CURRENT snapshot —
    * `<v>.checkpoint.parquet` + `_last_checkpoint` — so readers bound
    * their log replay at O(commits since checkpoint) instead of
    * O(table history). The action rows re-emit the live adds (and the
    * last metaData/protocol) VERBATIM from the replayed log, so
    * stats, partition values and deletion vectors survive; the
    * `dataChange` flag flips to false per the checkpoint convention.
    * Returns the checkpointed version.
    */
  def writeCheckpoint(spark: org.apache.spark.sql.SparkSession,
      dir: String): Long = {
    val log = DeltaRead.openLog(dir)
    require(log.commits.nonEmpty, s"empty Delta log: $dir")
    val version = log.commits.last
    val ckFile = f"$version%020d.checkpoint.parquet"
    require(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_delta_log", ckFile)),
      s"checkpoint $version already exists: $dir")
    val state = DeltaRead.stateAt(spark, log, None)
    require(state.rawMetaData != JNothing,
      s"Delta log has no metaData action to checkpoint: $dir")
    val protocol: JValue =
      if (state.rawProtocol != JNothing) state.rawProtocol
      else ("minReaderVersion" -> 1) ~ ("minWriterVersion" -> 2)
    val lines =
      Seq(compact(render(JObject(List("protocol" -> protocol)))),
        compact(render(JObject(List("metaData" -> state.rawMetaData))))) ++
      // txn watermarks MUST ride the checkpoint (protocol: checkpoints
      // contain the latest txn per appId) or a log-cleaned table would
      // forget its exactly-once high-water marks
      state.txns.toSeq.sortBy(_._1).map { case (appId, v) =>
        compact(render(JObject(List("txn" -> (("appId" -> appId) ~
          ("version" -> v) ~ ("lastUpdated" -> 0L): JValue)))))
      } ++
      state.adds.values.toSeq.sortBy(_.path).map { a =>
        val ck = a.raw merge JObject(List(
          "dataChange" -> (JBool(false): JValue)))
        compact(render(JObject(List("add" -> (ck: JValue)))))
      }
    import spark.implicits._
    val df = spark.read.schema(CheckpointSchema).json(lines.toDS())
    writeOne(df, dir, s"_delta_log/$ckFile"): Unit
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_delta_log", "_last_checkpoint"),
      compact(render(
        ("version" -> version) ~ ("size" -> lines.size))) + "\n")
    version
  }

  /** EXACTLY-ONCE streaming upsert (the `foreachBatch` sink shape):
    * merge micro-batch `batchId` of writer `appId` into the Delta
    * table, stamping a `txn` action in the SAME atomic commit — the
    * protocol's idempotent-writer contract. A batch at or below the
    * recorded watermark is SKIPPED (returns -1), so a restarted query
    * that replays its last micro-batch cannot double-apply it; the
    * watermark survives checkpoints ([[writeCheckpoint]] re-emits txn
    * actions) and log cleanup. Returns rows merged, 0 for an empty
    * batch, -1 for a replay skip.
    */
  def mergeBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
      appId: String, batchId: Long, batch: DataFrame,
      uniqueKey: Seq[String], buckets: Int = 8): Long = {
    val last = DeltaRead.lastTxnVersion(spark, dir, appId)
    if (last.exists(_ >= batchId)) -1L
    else merge(spark, dir, batch, uniqueKey, buckets,
      txn = Some(appId -> batchId))
  }

  /** Commit `version`: attach a deletion vector masking `rowIndexes`
    * (0-based physical row positions) to the existing data file
    * `fileName`. Per the protocol this upgrades to reader 3/writer 7
    * with the `deletionVectors` feature, writes the bitmap as a
    * UUID-named sidecar ([[DeletionVectors.writeDvFile]]), re-adds
    * the file WITH the DV and removes the DV-less pairing — file
    * actions are keyed by (path, dvUniqueId), so both live in one
    * commit.
    */
  def commitDeletionVector(dir: String, version: Long, fileName: String,
      rowIndexes: Seq[Long]): Unit = {
    require(rowIndexes.nonEmpty, "empty deletion vector commit")
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    val commitFile = logDir.resolve(f"$version%020d.json")
    require(java.nio.file.Files.isDirectory(logDir) &&
      !java.nio.file.Files.exists(commitFile),
      s"Delta commit $version not writable in $dir")
    val dataFile = java.nio.file.Paths.get(dir, fileName)
    require(java.nio.file.Files.isRegularFile(dataFile),
      s"no such data file to mask: $dataFile")
    val uuid = java.util.UUID.randomUUID()
    val (off, size) = DeletionVectors.writeDvFile(
      java.nio.file.Paths.get(dir, s"deletion_vector_$uuid.bin"),
      rowIndexes)
    val lines = Seq(
      compact(render(
        ("protocol" -> (("minReaderVersion" -> 3) ~
          ("minWriterVersion" -> 7) ~
          ("readerFeatures" -> Seq("deletionVectors")) ~
          ("writerFeatures" -> Seq("deletionVectors")))))),
      compact(render(
        ("add" -> (("path" -> fileName) ~
          ("partitionValues" -> Map.empty[String, String]) ~
          ("size" -> java.nio.file.Files.size(dataFile)) ~
          ("modificationTime" -> 0L) ~
          // attaching a DV DELETES rows — a data change per the
          // protocol; dataChange=false would make incremental/CDF
          // consumers skip the deletion as a no-op rearrangement
          ("dataChange" -> true) ~
          ("deletionVector" -> (("storageType" -> "u") ~
            ("pathOrInlineDv" -> DeletionVectors.encodeUuid(uuid)) ~
            ("offset" -> off) ~
            ("sizeInBytes" -> size) ~
            ("cardinality" -> rowIndexes.distinct.length))))))),
      compact(render(
        ("remove" -> (("path" -> fileName) ~
          ("deletionTimestamp" -> 0L) ~
          ("dataChange" -> true))))))
    java.nio.file.Files.writeString(commitFile,
      lines.mkString("", "\n", "\n"))
  }

  /** Commit `version` as an UPDATE-style change-data commit: the
    * usual rewrite actions (`adds`/`removes`, dataChange=true) plus
    * `cdc` actions pointing at `_change_data/` files that carry the
    * row-level images with a per-row `_change_type` column
    * (`update_preimage`/`update_postimage`/...). Per the protocol,
    * when a commit contains `cdc` actions a Change Data Feed reader
    * uses ONLY those and ignores the commit's file actions.
    */
  def commitCdc(dir: String, version: Long,
      cdcFiles: Seq[(String, DataFrame)],
      adds: Seq[(String, DataFrame)] = Nil,
      removes: Seq[String] = Nil): Unit = {
    require(cdcFiles.nonEmpty, "commitCdc without cdc files")
    cdcFiles.foreach { case (_, df) =>
      require(df.columns.contains("_change_type"),
        "cdc files must carry a _change_type column") }
    require(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(dir, "_delta_log")),
      s"Delta commit $version not writable in $dir")
    commit(dir, version, adds = adds, removes = removes,
      cdc = cdcFiles.map { case (n, df) => s"_change_data/$n" -> df })
  }
}
