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
  * `checkpointInterval` commits), identity-partitioned tables
  * (per-add `partitionValues`, hive-style file layout, partition-
  * pruned merges), schema evolution on merge (appended columns), and
  * retention GC ([[vacuum]]). Single-writer. Every multi-file write
  * is ONE staged Spark job + ONE grouped stats job ([[stageWrite]] /
  * [[statsFor]]) — job count never scales with file count.
  * Two consumers: `PipelineRunner` routes `file_format=delta` models
  * here ([[replace]] / [[merge]] — the dbt-spark Delta contract), and
  * it is the boundary adapter for exporting tables to tools that only
  * speak Delta.
  */
object DeltaWrite {

  /** Run `body` with parquet timestamps written as INT64 micros
    * (Spark's session default is legacy INT96): the micro encoding is
    * what the Delta protocol prescribes for timestamp columns, and —
    * unlike INT96 — its footers carry ordered chunk statistics, which
    * [[footerStatsRaw]] reads in place of a stats re-read job.
    * Save/restore keeps caller sessions untouched.
    */
  private def withMicrosTimestamps[A](
      spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try body finally spark.conf.set(key, prev)
  }

  /** Write one parquet file with `df`'s rows as `<dir>/<name>`
    * (shared with [[IcebergWrite]]'s fixture data-file writer).
    */
  private[graft] def writeOne(df: DataFrame, dir: String, name: String): Long = {
    val dest = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.createDirectories(dest.getParent)
    val tmp = java.nio.file.Files.createTempDirectory(
      dest.getParent, ".delta_stage")
    withMicrosTimestamps(df.sparkSession) {
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    }
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

  /** [[statsJson]] from already-computed per-file values — the shape
    * [[statsFor]]'s single grouped stats job returns.
    */
  private[graft] def statsJsonOf(numRecords: Long,
      cols0: Seq[(org.apache.spark.sql.types.StructField, Any, Any, Long)])
      : String = {
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

  // ---------------------------------------------------------------
  // Path / partition-value encoding
  // ---------------------------------------------------------------

  /** RFC-2396 percent-encoding of a table-relative path for the LOG
    * (the protocol stores `add`/`remove` paths URI-encoded; DeltaRead
    * decodes with [[DeltaRead.pctDecode]] — this is its inverse over
    * the on-disk name). '/', '=' and unreserved chars stay literal so
    * the common safe names are identity-encoded.
    */
  private[sources] def pctEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val u = b & 0xff
      val c = u.toChar
      val keep = u < 0x80 && (c.isLetterOrDigit ||
        "-_.~/=".contains(c))
      if (keep) sb.append(c) else sb.append(f"%%$u%02X")
    }
    sb.toString
  }

  /** A partition VALUE as one on-disk path segment: '/' and '%' (and
    * control chars) escape %XX so two distinct partition-value combos
    * can never collide into one directory string; everything else
    * stays raw (the log's partitionValues map is authoritative — the
    * path is never parsed back).
    */
  private def escapeSeg(s: String): String = {
    val sb = new StringBuilder
    s.foreach { c =>
      if (c < 0x20 || c == '%' || c == '/' || c == 0x7f)
        sb.append(f"%%${c.toInt}%02X")
      else sb.append(c)
    }
    sb.toString
  }

  /** Delta partition-value serialization (PROTOCOL.md "Partition value
    * serialization"): strings raw, numbers/booleans canonical text,
    * dates ISO-8601, timestamps `yyyy-MM-dd HH:mm:ss[.SSSSSS]` in UTC
    * (this engine pins the session timezone to UTC), null stays null
    * (JSON null in the partitionValues map).
    */
  private[sources] def serializePv(v: Any): String = v match {
    case null => null
    case s: String => s
    case d: java.sql.Date => d.toLocalDate.toString
    case d: java.time.LocalDate => d.toString
    case t: java.sql.Timestamp => serializePv(t.toInstant)
    case i: java.time.Instant =>
      val ldt = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
      val base = ldt.format(
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      if (ldt.getNano == 0) base else f"$base.${ldt.getNano / 1000}%06d"
    case d: java.math.BigDecimal => d.toPlainString
    case other => other.toString // Int/Long/Short/Byte/Boolean/Float/Double
  }

  /** Hive-style partition directory for one partition-value combo
    * (`a=x/b=y`, nulls as `__HIVE_DEFAULT_PARTITION__`); "" when
    * unpartitioned.
    */
  private def pvDirOf(partCols: Seq[String],
      pv: Map[String, String]): String =
    partCols.map { c =>
      val v = pv.getOrElse(c, null)
      // A REAL string value equal to the null sentinel gets its first
      // underscore percent-encoded (as Hive's escapePathName
      // effectively does) so null and the literal string
      // "__HIVE_DEFAULT_PARTITION__" never collide into one pdir key
      // — pdirPv keys staged targets on this string.
      val seg =
        if (v == null) "__HIVE_DEFAULT_PARTITION__"
        else if (v == "__HIVE_DEFAULT_PARTITION__")
          "%5F" + escapeSeg(v.tail)
        else escapeSeg(v)
      s"${escapeSeg(c)}=$seg"
    }.mkString("/")

  // ---------------------------------------------------------------
  // Staged one-job file writer
  // ---------------------------------------------------------------

  /** The exact `_metadata.file_path` string Spark will report for a
    * local path — the SparkPath form: URL-encoded URI (a literal `%`
    * or space in a file name is `%XX`-escaped) with a null authority
    * (`file:/...`, never `file:///...`). Every broadcast file-map
    * joined against `_metadata.file_path` MUST key on this form;
    * Hadoop `Path.toString` is the DECODED form and silently
    * mismatches any file whose name needs escaping.
    */
  private[sources] def sparkPathOf(
      hconf: org.apache.hadoop.conf.Configuration, p: String): String = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val u = hp.getFileSystem(hconf).makeQualified(hp).toUri
    val auth =
      if (u.getAuthority != null && u.getAuthority.isEmpty) null
      else u.getAuthority
    new org.apache.hadoop.fs.Path(u.getScheme, auth, u.getPath)
      .toUri.toString
  }

  /** Write EVERY pending data file of a commit in ONE Spark job:
    * `tagged` carries the file contents plus a `__graft_target`
    * column naming each row's table-relative destination file. A
    * `repartition(__graft_target)` puts each target's rows in one
    * task, a `partitionBy(__graft_target)` staging write emits one
    * parquet file per target (targets with zero rows simply never
    * materialize — no per-file emptiness probes), and the driver
    * moves each staged file to its destination. Returns
    * (relative path, size) per materialized file.
    */
  private[graft] def stageWrite(dir: String,
      tagged: DataFrame): Seq[(String, Long)] = {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(root)
    val tmp = java.nio.file.Files.createTempDirectory(root, ".delta_stage")
    import scala.jdk.CollectionConverters._
    try {
      withMicrosTimestamps(tagged.sparkSession) {
        tagged.repartition(col("__graft_target"))
          .write.mode("overwrite").partitionBy("__graft_target")
          .parquet(tmp.toString)
      }
      val dirs = {
        val s = java.nio.file.Files.list(tmp)
        try s.iterator().asScala.filter(p =>
          java.nio.file.Files.isDirectory(p) &&
            p.getFileName.toString.startsWith("__graft_target=")).toSeq
        finally s.close()
      }
      dirs.map { d =>
        // Spark escapes partition-dir values %XX (hive escapePathName);
        // decoding restores the intended relative path
        val rel = DeltaRead.pctDecode(
          d.getFileName.toString.stripPrefix("__graft_target="))
        require(!rel.split('/').contains("..") && !rel.startsWith("/"),
          s"staged target escapes the table root: $rel")
        val parts = {
          val s = java.nio.file.Files.list(d)
          try s.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
          finally s.close()
        }
        require(parts.size == 1,
          s"staged target $rel produced ${parts.size} files (expected 1)")
        val dest = root.resolve(rel)
        java.nio.file.Files.createDirectories(dest.getParent)
        java.nio.file.Files.move(parts.head, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        rel -> java.nio.file.Files.size(dest)
      }.sortBy(_._1)
    } finally {
      val walk = java.nio.file.Files.walk(tmp)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** Row count of one just-written parquet file from its footer
    * blocks alone (exact by the format; zero Spark jobs). Unlike
    * [[statsRawFor]] it never falls back to an aggregation job over
    * stat-undecodable columns — block row counts decode regardless of
    * column types. None only when the footer is unreadable.
    */
  private[graft] def footerRowCount(
      spark: org.apache.spark.sql.SparkSession,
      absPath: String): Option[Long] = scala.util.Try {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(absPath),
      spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally r.close()
  }.toOption

  /** [[writeOne]] + that file's `add.stats` JSON, taken from the
    * freshly written parquet footer (zero extra jobs; [[statsRawFor]]
    * falls back to the one grouped job when a footer stat is
    * unusable). Replaces the write-then-re-aggregate shape that ran a
    * separate [[columnStats]] job per file.
    */
  private[sources] def writeOneWithStats(df: DataFrame, dir: String,
      name: String): (Long, String) = {
    val size = writeOne(df, dir, name)
    val (rows, cols) =
      statsRawFor(df.sparkSession, dir, Seq(name), df.schema)(name)
    (size, statsJsonOf(rows, cols))
  }

  /** Per-file data-skipping stats for every staged file in ONE grouped
    * aggregation job (the per-file [[statsJson]] loop this replaces
    * ran one job per file): relative path → stats JSON.
    */
  private[sources] def statsFor(spark: org.apache.spark.sql.SparkSession,
      dir: String, rels: Seq[String],
      dataSchema: org.apache.spark.sql.types.StructType)
      : Map[String, String] =
    statsRawFor(spark, dir, rels, dataSchema).map { case (rel, (n, cols)) =>
      rel -> statsJsonOf(n, cols) }

  /** [[statsFor]]'s raw form: relative path → (rows, per primitive
    * column (field, min, max, nullCount)) — the shape [[IcebergWrite]]
    * encodes into manifest bounds.
    *
    * Fast path: the staged files were JUST written by Spark's parquet
    * writer, whose footers already carry exact per-column min/max/
    * null-count chunk statistics — [[footerStatsRaw]] reads them
    * driver-side with ZERO Spark jobs (guide §1.2 step 1: don't
    * recompute what a prior pass already produced; the grouped stats
    * job this replaces re-read every staged byte). Falls back to the
    * one grouped aggregation job whenever any needed footer stat is
    * unusable (INT96 timestamps, NaN-dropped float bounds, truncated
    * binary stats…), so recorded stats are never weaker than before.
    */
  private[sources] def statsRawFor(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, rels: Seq[String],
      dataSchema: org.apache.spark.sql.types.StructType)
      : Map[String, (Long,
        Seq[(org.apache.spark.sql.types.StructField, Any, Any, Long)])] =
    footerStatsRaw(spark, dir, rels, dataSchema)
      .getOrElse(statsJobFor(spark, dir, rels, dataSchema))

  /** The one-grouped-job form of [[statsRawFor]] — the fallback when
    * a footer lacks a usable stat.
    */
  private[graft] def statsJobFor(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, rels: Seq[String],
      dataSchema: org.apache.spark.sql.types.StructType)
      : Map[String, (Long,
        Seq[(org.apache.spark.sql.types.StructField, Any, Any, Long)])] = {
    import org.apache.spark.sql.functions.{col, count, lit, max, min, sum, when}
    import org.apache.spark.sql.types._
    if (rels.isEmpty) return Map.empty
    val hconf = spark.sessionState.newHadoopConf()
    def qualified(p: String): String = DeltaWrite.sparkPathOf(hconf, p)
    val relOfAbs = rels.map(r => qualified(s"$dir/$r") -> r).toMap
    val fields = dataSchema.fields.filter(f => f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | _: DecimalType | StringType | DateType |
           TimestampType | BooleanType => true
      case _ => false
    })
    val aggs = Seq(count(lit(1)).as("n")) ++ fields.flatMap(f => Seq(
      min(col(f.name)), max(col(f.name)),
      sum(when(col(f.name).isNull, 1L).otherwise(0L))))
    val rows = spark.read.schema(dataSchema)
      .parquet(rels.map(r => s"$dir/$r"): _*)
      .groupBy(col("_metadata.file_path").as("__graft_file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val got = rows.map { row =>
      val rel = relOfAbs.getOrElse(row.getString(0),
        sys.error(s"stats job returned an unstaged file: ${row.getString(0)}"))
      val n = row.getLong(1)
      val cols = fields.zipWithIndex.toSeq.map { case (f, i) =>
        (f, row.get(2 + i * 3), row.get(3 + i * 3),
          if (n == 0) 0L else row.getLong(4 + i * 3))
      }
      rel -> (n, cols)
    }.toMap
    // a ZERO-ROW file produces no group in the agg — report it the
    // way an empty aggregate would: 0 rows, null bounds, 0 nulls
    got ++ rels.filterNot(got.contains).map(rel =>
      rel -> (0L, fields.toSeq.map(f => (f, null: Any, null: Any, 0L))))
  }

  /** Driver-side parquet-footer stats for freshly staged files: the
    * SAME (rows, (field, min, max, nullCount)) values the grouped
    * stats job computes, decoded from the chunk statistics Spark's
    * own parquet writer embedded — no Spark job, no data re-read.
    * Returns None (→ caller runs the job) unless EVERY needed stat of
    * every file decodes: all-or-nothing keeps recorded stats exactly
    * as strong as the job's, so file-pruning behavior never silently
    * degrades. Decoded runtime classes mirror `Row.get` on the agg
    * row (java.sql.Date/Timestamp, java.math.BigDecimal, boxed
    * primitives) so [[statsJsonOf]] and [[IcebergRead.encodeBound]]
    * serialize identically.
    */
  private[graft] def footerStatsRaw(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, rels: Seq[String],
      dataSchema: org.apache.spark.sql.types.StructType)
      : Option[Map[String, (Long,
        Seq[(org.apache.spark.sql.types.StructField, Any, Any, Long)])]] = {
    import org.apache.parquet.column.statistics.Statistics
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    if (rels.isEmpty) return Some(Map.empty)
    val hconf = spark.sessionState.newHadoopConf()
    val fields = dataSchema.fields.filter(f => f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | _: DecimalType | StringType | DateType |
           TimestampType | BooleanType => true
      case _ => false
    })
    // (sparkType, parquet column) → Row.get-shaped value, or None =
    // undecodable (unexpected physical/logical pairing)
    def decode(dt: DataType, pt: PrimitiveType, v: Comparable[_])
        : Option[Any] = (dt, pt.getPrimitiveTypeName) match {
      case (BooleanType, BOOLEAN) => Some(v.asInstanceOf[java.lang.Boolean])
      case (ByteType, INT32) =>
        Some(Byte.box(v.asInstanceOf[java.lang.Integer].byteValue))
      case (ShortType, INT32) =>
        Some(Short.box(v.asInstanceOf[java.lang.Integer].shortValue))
      case (IntegerType, INT32) => Some(v.asInstanceOf[java.lang.Integer])
      case (LongType, INT64) => Some(v.asInstanceOf[java.lang.Long])
      case (FloatType, FLOAT) => Some(v.asInstanceOf[java.lang.Float])
      case (DoubleType, DOUBLE) => Some(v.asInstanceOf[java.lang.Double])
      case (d: DecimalType, tn) =>
        val unscaled: Option[java.math.BigInteger] = tn match {
          case INT32 => Some(java.math.BigInteger.valueOf(
            v.asInstanceOf[java.lang.Integer].longValue))
          case INT64 => Some(java.math.BigInteger.valueOf(
            v.asInstanceOf[java.lang.Long].longValue))
          case BINARY | FIXED_LEN_BYTE_ARRAY => Some(new java.math.BigInteger(
            v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes))
          case _ => None
        }
        unscaled.map(u => new java.math.BigDecimal(u, d.scale))
      case (StringType, BINARY) =>
        Some(v.asInstanceOf[org.apache.parquet.io.api.Binary]
          .toStringUsingUTF8)
      case (DateType, INT32) => Some(java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[java.lang.Integer].longValue)))
      case (TimestampType, INT64) =>
        pt.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            val n = v.asInstanceOf[java.lang.Long].longValue
            val micros = ts.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MICROS => Some(n)
              case LogicalTypeAnnotation.TimeUnit.MILLIS => Some(n * 1000L)
              case _ => None // NANOS never written by this engine
            }
            micros.map { us =>
              val sec = Math.floorDiv(us, 1000000L)
              val frac = Math.floorMod(us, 1000000L)
              java.sql.Timestamp.from(
                java.time.Instant.ofEpochSecond(sec, frac * 1000L))
            }
          case _ => None // INT96 / untyped int64: no usable ordering
        }
      case _ => None
    }
    try {
      val perFile = rels.map { rel =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(s"$dir/$rel"), hconf)
        val footer = {
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter finally r.close()
        }
        val blocks = footer.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        val byName: Map[String, Seq[
          org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]] =
          blocks.flatMap(_.getColumns.asScala)
            .filter(_.getPath.size == 1)
            .groupBy(_.getPath.toDotString)
        val cols = fields.toSeq.map { f =>
          // zero-row parquet has no row groups at all — the agg path
          // reported (0, null mins/maxs, 0 nulls) for such a file
          if (rows == 0L) (f, null: Any, null: Any, 0L)
          else {
          val chunks = byName.getOrElse(f.name, return None)
          if (chunks.size != blocks.size) return None
          val ss = chunks.map(_.getStatistics)
          if (ss.exists(s => s == null || s.isEmpty || !s.isNumNullsSet))
            return None
          val nulls = ss.map(_.getNumNulls).sum
          val withValues = ss.filter(_.hasNonNullValue)
          if (rows == 0L || withValues.isEmpty) {
            // all-null (or empty) file: the agg row's min/max are null
            if (nulls != rows && rows != 0L) return None
            (f, null: Any, null: Any, if (rows == 0) 0L else nulls)
          } else {
            val pt = chunks.head.getPrimitiveType
            // merge across row groups in the DECODED domain: every
            // decoded type is naturally ordered, and for strings the
            // [a-zA-Z0-9...] ↔ UTF-8 orderings agree only on ASCII —
            // so refuse non-ASCII bounds rather than risk a
            // comparator mismatch with parquet's unsigned-byte order
            def dec(v: Comparable[_]): Any =
              decode(f.dataType, pt, v).getOrElse(return None)
            val mins = withValues.map(s => dec(s.genericGetMin))
            val maxs = withValues.map(s => dec(s.genericGetMax))
            if (f.dataType == StringType &&
              (mins ++ maxs).exists(v =>
                v.asInstanceOf[String].exists(_ > 0x7f.toChar))) return None
            // every decoded class above is Comparable with itself
            def lt(a: Any, b: Any): Boolean =
              a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
            (f, mins.reduce((a, b) => if (lt(b, a)) b else a),
              maxs.reduce((a, b) => if (lt(a, b)) b else a), nulls)
          }
          }
        }
        rel -> (rows, cols)
      }.toMap
      Some(perFile)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---------------------------------------------------------------
  // Log-line builders (shared by commit / stageCommit)
  // ---------------------------------------------------------------

  private def jPv(pv: Map[String, String]): JValue =
    JObject(pv.toList.sortBy(_._1).map { case (k, v) =>
      k -> (if (v == null) JNull else JString(v): JValue) })

  private def protocolLine: String = compact(render(
    ("protocol" -> (("minReaderVersion" -> 1) ~
      ("minWriterVersion" -> 2)))))

  private def metaDataLine(schema: org.apache.spark.sql.types.StructType,
      partitionCols: Seq[String],
      configuration: Map[String, String]): String = compact(render(
    ("metaData" -> (("id" -> "graft-delta-export") ~
      ("format" -> (("provider" -> "parquet") ~
        ("options" -> Map.empty[String, String]))) ~
      ("schemaString" -> schema.json) ~
      ("partitionColumns" -> partitionCols) ~
      ("configuration" -> configuration) ~
      ("createdTime" -> 0L)))))

  private def addLine(rel: String, pv: Map[String, String], size: Long,
      stats: Option[String], dataChange: Boolean,
      // merge-on-read re-adds a data file with a fresh DV attached
      dv: Option[DeletionVectors.Descriptor] = None): String = {
    val base: JValue = ("path" -> pctEncode(rel)) ~
      ("partitionValues" -> jPv(pv)) ~
      ("size" -> size) ~
      ("modificationTime" -> 0L) ~
      ("dataChange" -> dataChange)
    val withStats = stats.fold(base)(s => base merge (
      ("stats" -> s): JValue))
    val withDv = dv.fold(withStats)(d => withStats merge ((
      "deletionVector" -> (("storageType" -> d.storageType) ~
        ("pathOrInlineDv" -> d.pathOrInlineDv) ~
        ("offset" -> d.offset) ~
        ("sizeInBytes" -> d.sizeInBytes) ~
        ("cardinality" -> d.cardinality))): JValue))
    compact(render(JObject(List("add" -> withDv))))
  }

  private def removeLine(logPath: String, pv: Map[String, String],
      dataChange: Boolean,
      // file actions are keyed (path, dvUniqueId) per the protocol:
      // removing a DV-carrying add MUST name the same descriptor or
      // the replay never drops it
      dv: Option[DeletionVectors.Descriptor] = None): String = {
    val base = ("path" -> logPath) ~
      ("partitionValues" -> jPv(pv)) ~
      ("deletionTimestamp" -> 0L) ~
      ("dataChange" -> dataChange)
    val withDv = dv.fold(base)(d => base ~ ("deletionVector" ->
      (("storageType" -> d.storageType) ~
        ("pathOrInlineDv" -> d.pathOrInlineDv) ~
        ("offset" -> d.offset) ~
        ("sizeInBytes" -> d.sizeInBytes) ~
        ("cardinality" -> d.cardinality))))
    compact(render("remove" -> withDv))
  }

  private def txnLine(t: (String, Long)): String = compact(render(
    ("txn" -> (("appId" -> t._1) ~
      ("version" -> t._2) ~
      ("lastUpdated" -> 0L)))))

  private def cdcLine(rel: String, pv: Map[String, String],
      size: Long): String = compact(render(
    ("cdc" -> (("path" -> pctEncode(rel)) ~
      ("partitionValues" -> jPv(pv)) ~
      ("size" -> size) ~
      ("dataChange" -> false)))))

  private def requireNextVersion(dir: String, version: Long): Unit = {
    val commitFile = java.nio.file.Paths.get(dir, "_delta_log")
      .resolve(f"$version%020d.json")
    require(!java.nio.file.Files.exists(commitFile),
      s"Delta commit $version already exists in $dir")
  }

  private def writeCommitFile(dir: String, version: Long,
      lines: Seq[String]): Unit = {
    require(lines.nonEmpty, s"empty Delta commit $version: $dir")
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    java.nio.file.Files.createDirectories(logDir)
    val commitFile = logDir.resolve(f"$version%020d.json")
    require(!java.nio.file.Files.exists(commitFile),
      s"Delta commit $version already exists in $dir")
    java.nio.file.Files.writeString(commitFile,
      lines.mkString("", "\n", "\n")): Unit
  }

  // ---------------------------------------------------------------
  // Partition-value tagging (driver knows O(partitions) combos only)
  // ---------------------------------------------------------------

  /** Attach `__graft_pdir` (the row's hive-style partition directory)
    * via ONE bounded distinct job + a broadcast null-safe join, and
    * return the pdir → serialized-partition-values map. The collect
    * is O(distinct partition combos) — the same driver-side
    * cardinality every lakehouse writer's planning holds.
    */
  private[sources] def withPdir(df: DataFrame, partCols: Seq[String])
      : (DataFrame, Map[String, Map[String, String]]) = {
    val (tagged, pdirPv, _) = withPdirTyped(df, partCols)
    (tagged, pdirPv)
  }

  /** [[withPdir]] plus the TYPED distinct partition rows per pdir
    * (IcebergWrite compares partition values in their native domain,
    * not Delta's string serialization).
    */
  private[sources] def withPdirTyped(df: DataFrame, partCols: Seq[String])
      : (DataFrame, Map[String, Map[String, String]],
        Map[String, org.apache.spark.sql.Row]) = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val spark = df.sparkSession
    // Bounded driver collect: O(distinct partition combos) is the
    // planning contract, and `limit(cap+1)` keeps a user who
    // partitions by a high-cardinality column (ids, timestamps) from
    // an unbounded collect — they get this message instead. Same
    // fence class as Dedup's maxBucket guards.
    val maxCombos = 10000
    val pvRows = df.select(partCols.map(col): _*).distinct()
      .limit(maxCombos + 1).collect()
    require(pvRows.length <= maxCombos,
      s"batch spans more than $maxCombos distinct partition-value " +
        s"combos on (${partCols.mkString(", ")}) — partition by a " +
        "coarser column (dates, tenants), not a high-cardinality key")
    val pdirPv: Map[String, Map[String, String]] = pvRows.map { r =>
      val pv = partCols.zipWithIndex.map { case (c, i) =>
        c -> serializePv(r.get(i)) }.toMap
      pvDirOf(partCols, pv) -> pv
    }.toMap
    val pdirRow: Map[String, org.apache.spark.sql.Row] = pvRows.map { r =>
      val pv = partCols.zipWithIndex.map { case (c, i) =>
        c -> serializePv(r.get(i)) }.toMap
      pvDirOf(partCols, pv) -> r
    }.toMap
    val mapSchema = StructType(partCols.map(c =>
      df.schema(c).copy(name = s"__graft_pj_$c")) :+
      StructField("__graft_pdir", StringType, nullable = false))
    val mapRows = pvRows.map { r =>
      val pv = partCols.zipWithIndex.map { case (c, i) =>
        c -> serializePv(r.get(i)) }.toMap
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pvDirOf(partCols, pv))
    }
    val mapDf = spark.createDataFrame(
      spark.sparkContext.parallelize(mapRows.toSeq, 1), mapSchema)
    val cond = partCols.map(c =>
      col(s"`$c`") <=> col(s"`__graft_pj_$c`")).reduce(_ && _)
    val joined = df.join(broadcast(mapDf), cond)
      .drop(partCols.map(c => s"__graft_pj_$c"): _*)
    (joined, pdirPv, pdirRow)
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
      txn: Option[(String, Long)] = None,
      // re-emit metaData mid-history: (full schema, partition columns,
      // configuration) — how CREATE OR REPLACE changes table
      // properties/schema/partitioning on an EXISTING table
      metaDataUpdate: Option[(org.apache.spark.sql.types.StructType,
        Seq[String], Map[String, String])] = None): Unit = {
    require(adds.nonEmpty || removes.nonEmpty || cdc.nonEmpty,
      "empty Delta commit")
    requireNextVersion(dir, version)
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    if (version == 0L) {
      val schema = adds.headOption.map(_._2.schema).getOrElse(
        sys.error("commit 0 must add at least one file (for metaData)"))
      lines += protocolLine
      lines += metaDataLine(schema, Nil, configuration)
    } else metaDataUpdate.foreach { case (schema, pcs, cfg) =>
      lines += metaDataLine(schema, pcs, cfg)
    }
    adds.foreach { case (name, df) =>
      val (size, stats) = writeOneWithStats(df, dir, name)
      lines += addLine(name, Map.empty, size, Some(stats), dataChange)
    }
    removes.foreach(p => lines += removeLine(p, Map.empty, dataChange))
    txn.foreach(t => lines += txnLine(t))
    // Change-Data-Feed files: each row carries its _change_type; the
    // cdc action makes this commit's CDF authoritative (readers then
    // IGNORE the add/remove actions for change derivation — the
    // protocol's contract for commits whose file-level actions would
    // misstate row-level changes, e.g. a MERGE's rewrites)
    cdc.foreach { case (name, df) =>
      val size = writeOne(df, dir, name)
      lines += cdcLine(name, Map.empty, size)
    }
    writeCommitFile(dir, version, lines.toSeq)
  }

  /** Copy-on-write MERGE (upsert) of `batch` into the Delta table at
    * `dir` on `uniqueKey` — the dbt-spark `merge` strategy
    * materializing INTO a real `_delta_log` table any Delta reader
    * (including [[DeltaRead]]) can scan; this round-trip is why the
    * reference pins dbt-spark's Delta stack (`dbtoperator.py:274`).
    *
    * First call creates the table: commit 0 buckets the batch into up
    * to `buckets` files by key hash (per partition when `partitionBy`
    * is set), bounding later rewrite units. Each subsequent merge, in
    * ONE atomic commit:
    *  - prunes the live set to the batch's PARTITIONS (partitioned
    *    tables; values compare normalized, unparseable values keep
    *    the file — conservative);
    *  - finds the FILES holding matched keys with a semi-join on
    *    `_metadata.file_path` (the collected distinct paths are
    *    O(files) on the driver, never rows);
    *  - stage-writes every rewrite (matched keys anti-joined out) AND
    *    the upsert files in ONE Spark job ([[stageWrite]]; an
    *    all-rows-matched file stages zero rows and becomes a bare
    *    remove — no per-file probes), plus ONE grouped job for all
    *    per-file data-skipping stats;
    *  - writes remove+add actions under the next version — readers
    *    flip atomically, time travel keeps every prior state.
    * I/O is O(touched files + batch), never a table rewrite; job
    * count is O(1) per merge, never O(files).
    *
    * CONTRACT (same as Delta `MERGE WHEN MATCHED UPDATE / NOT MATCHED
    * INSERT`): `batch` is unique per key; on partitioned tables a
    * key's partition values are STABLE across versions (the pruned
    * probe would miss a row whose key moved partitions — the same
    * stable-partition-per-key contract as the dbt-layer merge).
    * Schema evolution happens only with `allowEvolution` and only for
    * APPENDED columns (dbt `on_schema_change=append_new_columns`):
    * the merge commit re-emits metaData with the extended schema and
    * carried files surface NULL for the new columns. Tables with
    * column mapping or deletion vectors are rejected loudly by
    * [[DeltaRead.liveDataFiles]].
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
    import org.apache.spark.sql.functions.{col, concat, format_string, lit, pmod, xxhash64}
    require(uniqueKey.nonEmpty, "optimize needs the table's key columns")
    val live = DeltaRead.liveDataFiles(spark, dir)
    if (live.size <= buckets) return
    val fullSchema = DeltaRead.tableSchema(spark, dir)
    val partCols = DeltaRead.partitionColumns(spark, dir)
    val dataSchema = org.apache.spark.sql.types.StructType(
      fullSchema.filterNot(f => partCols.contains(f.name)))
    val version = DeltaRead.latestVersion(dir) + 1
    requireNextVersion(dir, version)
    // partition dirs + values come from the LIVE set's log metadata —
    // no distinct job needed; rows route to their file's pdir via a
    // broadcast file→pdir map
    val pdirOfFile: Map[String, String] = live.map(f =>
      f.rel -> pvDirOf(partCols, f.partitionValues)).toMap
    val pdirPv: Map[String, Map[String, String]] = live.map(f =>
      pvDirOf(partCols, f.partitionValues) -> f.partitionValues).toMap
    val perPart = math.max(1, buckets / math.max(1, pdirPv.size))
    val keysData = uniqueKey.filterNot(partCols.contains)
    val bucketCol =
      if (keysData.isEmpty) lit(0L)
      else pmod(xxhash64(keysData.map(col): _*), lit(perPart))
    val cur = spark.read.schema(dataSchema).parquet(live.map(_.abs): _*)
      .withColumn("__graft_file", col("_metadata.file_path"))
    val hconf = spark.sessionState.newHadoopConf()
    def qualified(p: String): String = DeltaWrite.sparkPathOf(hconf, p)
    val pdirOfQualified: Map[String, String] = live.map(f =>
      qualified(f.abs) -> pdirOfFile(f.rel)).toMap
    import org.apache.spark.sql.functions.{element_at, typedlit}
    val name = format_string(f"opt-$version%05d-%%03d.parquet", bucketCol)
    val target =
      if (partCols.isEmpty) name
      else concat(
        element_at(typedlit(pdirOfQualified), col("__graft_file")),
        lit("/"), name)
    // ONE staged write materializes every bucket of every partition —
    // empty buckets never probe, never materialize
    val tagged = cur.withColumn("__graft_target", target).drop("__graft_file")
    val staged = stageWrite(dir, tagged)
    val stats = statsFor(spark, dir, staged.map(_._1), dataSchema)
    def pvOfRel(rel: String): Map[String, String] =
      if (partCols.isEmpty) Map.empty
      else pdirPv(rel.split('/').dropRight(1).mkString("/"))
    val lines =
      staged.map { case (rel, size) =>
        addLine(rel, pvOfRel(rel), size, stats.get(rel), dataChange = false) } ++
      live.map(f => removeLine(f.logPath, f.partitionValues,
        dataChange = false))
    writeCommitFile(dir, version, lines)
  }

  /** Full-refresh CTAS into a Delta table: ONE atomic commit makes
    * `df` the whole table — the first commit creates it, later ones
    * remove every live file and add the new rows, so prior states
    * stay time-travelable (Delta `CREATE OR REPLACE` semantics).
    * `partitionBy` names identity partition columns: one data file per
    * partition-value combo (partition columns live in the log's
    * `partitionValues`, not the data files), written in ONE staged
    * job. Schema, partitioning and `configuration` changes against an
    * existing table re-emit a `metaData` action in the same commit
    * (CREATE OR REPLACE changes table properties — they are never
    * silently dropped). Returns the rows written.
    */
  def replace(spark: org.apache.spark.sql.SparkSession, dir: String,
      df0: DataFrame,
      configuration: Map[String, String] = Map.empty,
      partitionBy: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.{col, concat, lit}
    partitionBy.foreach(p => require(df0.columns.contains(p),
      s"partition column '$p' is not a df column (${df0.columns.mkString(",")})"))
    val df = df0.localCheckpoint(eager = false)
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    val exists = java.nio.file.Files.isDirectory(logDir)
    val version = if (!exists) 0L else DeltaRead.latestVersion(dir) + 1
    requireNextVersion(dir, version)
    val dataSchema = org.apache.spark.sql.types.StructType(
      df.schema.filterNot(f => partitionBy.contains(f.name)))
    // metaData rides the commit at creation, and again whenever
    // schema/partitioning/properties change (the replace contract)
    val metaNeeded: Option[(org.apache.spark.sql.types.StructType,
        Seq[String], Map[String, String])] =
      if (!exists) Some((df.schema, partitionBy, configuration))
      else {
        val state = DeltaRead.tableSchema(spark, dir)
        val curPcs = DeltaRead.partitionColumns(spark, dir)
        val curCfg = DeltaRead.tableConfiguration(spark, dir)
        // Delta CREATE OR REPLACE resets table properties to exactly
        // the new set — a property the replacing model no longer
        // requests (e.g. delta.enableChangeDataFeed) is DROPPED, not
        // accreted forever. Engine-internal column-mapping keys are
        // the exception: physical names are burned into the data
        // files, so those survive the replace.
        val internal = curCfg.filter { case (k, _) =>
          k.startsWith("delta.columnMapping") }
        val newCfg = internal ++ configuration
        if (state.fields.map(f => (f.name, f.dataType)).toSeq !=
            df.schema.fields.map(f => (f.name, f.dataType)).toSeq ||
            curPcs != partitionBy || newCfg != curCfg)
          Some((df.schema, partitionBy, newCfg))
        else None
      }
    // explicit column-mapping guard (liveDataFiles below refuses too,
    // but only after the schema/config diff): a replace would write
    // LOGICAL-named parquet while the retained metaData declares
    // physical col-<uuid> names — readers would silently surface NULL
    if (exists) require(!DeltaRead.mergeGeometry(spark, dir).mapped,
      s"CREATE OR REPLACE of a column-mapped Delta table is " +
        s"unsupported (data files need physical column names): $dir")
    val removes: Seq[String] =
      if (!exists) Nil
      else DeltaRead.liveDataFiles(spark, dir).map(f =>
        removeLine(f.logPath, f.partitionValues, dataChange = true))
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    if (version == 0L) lines += protocolLine
    metaNeeded.foreach { case (s, p, c) => lines += metaDataLine(s, p, c) }
    // row count from the written parquet footers (same decode as the
    // stats) — no dedicated df.count() job; an empty df adds no file
    // (its zero-row write is discarded), preserving the old n==0
    // metadata-only commit shape
    val n: Long =
      if (partitionBy.isEmpty) {
        val name = f"replace-$version%05d.parquet"
        val size = writeOne(df, dir, name)
        val (rows, cols) = statsRawFor(spark, dir, Seq(name), dataSchema)(name)
        if (rows > 0)
          lines += addLine(name, Map.empty, size,
            Some(statsJsonOf(rows, cols)), dataChange = true)
        else
          java.nio.file.Files.deleteIfExists(
            java.nio.file.Paths.get(dir, name))
        rows
      } else {
        val (tagged0, pdirPv) = withPdir(df, partitionBy)
        val tagged = tagged0
          .withColumn("__graft_target", concat(col("__graft_pdir"),
            lit(f"/replace-$version%05d.parquet")))
          .drop("__graft_pdir").drop(partitionBy: _*)
        val staged = stageWrite(dir, tagged)
        val statsRaw = statsRawFor(spark, dir, staged.map(_._1), dataSchema)
        staged.foreach { case (rel, size) =>
          val pdir = rel.split('/').dropRight(1).mkString("/")
          val (rows, cols) = statsRaw(rel)
          lines += addLine(rel, pdirPv(pdir), size,
            Some(statsJsonOf(rows, cols)), dataChange = true)
        }
        statsRaw.valuesIterator.map(_._1).sum
      }
    lines ++= removes
    if (lines.nonEmpty) writeCommitFile(dir, version, lines.toSeq)
    n
  }

  /** DYNAMIC partition overwrite — Spark's
    * `spark.sql.sources.partitionOverwriteMode=dynamic`
    * `INSERT OVERWRITE` semantics on a partitioned Delta table: ONE
    * atomic commit replaces exactly the partitions PRESENT in `df`
    * (their live files remove, the new rows add in one staged job);
    * untouched partitions' files are never referenced, read, or
    * rewritten — byte-identical across the commit. An empty batch
    * touches no partition and commits nothing (Spark's dynamic
    * semantics). Derived CDF stays exact: every removed row IS
    * deleted and every added row IS inserted, so no cdc action is
    * needed. Column-mapped and DV-carrying tables refuse loudly via
    * [[DeltaRead.liveDataFiles]]. Returns the rows written.
    *
    * Scale notes: O(touched partitions + batch) — the commit lists
    * removes only for the batch's partition dirs, and the staged
    * write is one job regardless of partition count.
    */
  def overwritePartitions(spark: org.apache.spark.sql.SparkSession,
      dir: String, df0: DataFrame): Long = {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val partCols = DeltaRead.partitionColumns(spark, dir)
    require(partCols.nonEmpty,
      s"dynamic partition overwrite needs a partitioned table " +
        s"(use replace for unpartitioned): $dir")
    val tableSchema = DeltaRead.tableSchema(spark, dir)
    require(df0.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        tableSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"INSERT OVERWRITE batch schema ${df0.schema.simpleString} != " +
        s"table schema ${tableSchema.simpleString}: $dir")
    val df = df0.localCheckpoint(eager = false)
    val version = DeltaRead.latestVersion(dir) + 1
    requireNextVersion(dir, version)
    val live = DeltaRead.liveDataFiles(spark, dir) // refuses mapped/DV
    val dataSchema = org.apache.spark.sql.types.StructType(
      tableSchema.filterNot(f => partCols.contains(f.name)))
    val (tagged0, pdirPv) = withPdir(df, partCols)
    val tagged = tagged0
      .withColumn("__graft_target", concat(col("__graft_pdir"),
        lit(f"/overwrite-$version%05d.parquet")))
      .drop("__graft_pdir").drop(partCols: _*)
    val staged = stageWrite(dir, tagged)
    // an empty batch touches no partition and commits nothing
    // (Spark's dynamic semantics) — detected from the staged write
    // itself instead of a dedicated count job
    if (staged.isEmpty) return 0L
    val statsRaw = statsRawFor(spark, dir, staged.map(_._1), dataSchema)
    val touchedPdirs = pdirPv.keySet
    val removes = live.filter(f =>
      touchedPdirs.contains(pvDirOf(partCols, f.partitionValues)))
    val lines =
      staged.map { case (rel, size) =>
        val pdir = rel.split('/').dropRight(1).mkString("/")
        val (rows, cols) = statsRaw(rel)
        addLine(rel, pdirPv(pdir), size,
          Some(statsJsonOf(rows, cols)), dataChange = true)
      } ++
      removes.map(f => removeLine(f.logPath, f.partitionValues,
        dataChange = true))
    writeCommitFile(dir, version, lines)
    statsRaw.valuesIterator.map(_._1).sum
  }

  /** `ALTER TABLE ... ADD COLUMNS`: one metaData-only commit
    * appending nullable top-level columns; carried data files surface
    * NULL for them via parquet schema-on-read — the same evolution
    * contract as merge's allowEvolution. Column-mapped tables refuse
    * (new columns need fresh field ids). dbt-spark's
    * `on_schema_change: append_new_columns` emits exactly this
    * statement before the incremental insert.
    */
  /** Key under which [[dropColumns]] records the dropped names in the
    * table configuration (engine-owned property; external readers
    * ignore unknown keys). Why: this writer's DROP COLUMN is
    * schema-on-read — carried data files still PHYSICALLY hold the
    * dropped column's values, so re-adding the same name would
    * silently resurrect stale values into the "new" column (the
    * reason the Delta protocol gates DROP COLUMN behind column
    * mapping). [[addColumns]] and merge evolution refuse those names
    * until a full refresh ([[replace]]) rewrites the data and clears
    * the marker.
    */
  private val DroppedColumnsKey = "graft.droppedColumns"

  private[sources] def droppedColumnsOf(cfg: Map[String, String])
      : Set[String] =
    cfg.get(DroppedColumnsKey).toSet[String].flatMap { j =>
      org.json4s.jackson.JsonMethods.parse(j) match {
        case org.json4s.JArray(vs) => vs.collect {
          case org.json4s.JString(s) => s }
        case _ => Nil
      }
    }

  private def requireNotDropped(cfg: Map[String, String],
      names: Seq[String], dir: String, what: String): Unit = {
    val dropped = droppedColumnsOf(cfg)
    val hit = names.filter(n => dropped.exists(_.equalsIgnoreCase(n)))
    require(hit.isEmpty,
      s"$what would re-add previously DROPPED column(s) " +
        s"${hit.mkString(", ")}: carried data files still hold the " +
        s"old values (schema-on-read drop) and would silently " +
        s"resurrect them — full-refresh the table first: $dir")
  }

  def addColumns(spark: org.apache.spark.sql.SparkSession, dir: String,
      fields: Seq[org.apache.spark.sql.types.StructField]): Unit = {
    require(fields.nonEmpty, "ADD COLUMNS needs at least one column")
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    require(java.nio.file.Files.isDirectory(logDir),
      s"not a Delta table: $dir")
    val geom = DeltaRead.mergeGeometry(spark, dir)
    require(!geom.mapped,
      s"ADD COLUMNS on a column-mapped table is unsupported (new " +
        s"columns need fresh field ids): $dir")
    val schema = DeltaRead.tableSchema(spark, dir)
    fields.foreach(f => require(
      !schema.fieldNames.exists(_.equalsIgnoreCase(f.name)),
      s"ADD COLUMNS: column ${f.name} already exists: $dir"))
    val cfg = DeltaRead.tableConfiguration(spark, dir)
    requireNotDropped(cfg, fields.map(_.name), dir, "ADD COLUMNS")
    val version = DeltaRead.latestVersion(dir) + 1
    requireNextVersion(dir, version)
    writeCommitFile(dir, version, Seq(metaDataLine(
      org.apache.spark.sql.types.StructType(
        schema.fields ++ fields.map(_.copy(nullable = true))),
      DeltaRead.partitionColumns(spark, dir), cfg)))
  }

  /** `ALTER TABLE ... DROP COLUMNS` (dbt-spark
    * `on_schema_change: sync_all_columns`' remove leg): one
    * metaData-only commit NARROWING the schema — the schemaString is
    * what readers project, so carried data files' extra columns
    * simply stop being read (schema-on-read, the exact inverse of
    * [[addColumns]]). Partition columns, unknown columns, the last
    * column, and column-mapped tables refuse loudly.
    */
  def dropColumns(spark: org.apache.spark.sql.SparkSession, dir: String,
      names: Seq[String]): Unit = {
    require(names.nonEmpty, "DROP COLUMNS needs at least one column")
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    require(java.nio.file.Files.isDirectory(logDir),
      s"not a Delta table: $dir")
    val geom = DeltaRead.mergeGeometry(spark, dir)
    require(!geom.mapped,
      s"DROP COLUMNS on a column-mapped table is unsupported here: $dir")
    val schema = DeltaRead.tableSchema(spark, dir)
    val partCols = DeltaRead.partitionColumns(spark, dir)
    names.foreach { n =>
      require(schema.fieldNames.exists(_.equalsIgnoreCase(n)),
        s"DROP COLUMNS: column $n does not exist: $dir")
      require(!partCols.exists(_.equalsIgnoreCase(n)),
        s"DROP COLUMNS: $n is a partition column: $dir")
    }
    val kept = schema.fields.filterNot(f =>
      names.exists(_.equalsIgnoreCase(f.name)))
    require(kept.nonEmpty,
      s"DROP COLUMNS would leave an empty schema: $dir")
    val version = DeltaRead.latestVersion(dir) + 1
    requireNextVersion(dir, version)
    // record the dropped names so ADD COLUMNS / merge evolution can
    // refuse resurrecting them from carried files (see
    // [[DroppedColumnsKey]]); a later full refresh clears the marker
    val cfg = DeltaRead.tableConfiguration(spark, dir)
    val dropped = droppedColumnsOf(cfg) ++ names
    val cfg2 = cfg + (DroppedColumnsKey ->
      org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(
          org.json4s.JArray(dropped.toList.sorted.map(
            org.json4s.JString(_))))))
    writeCommitFile(dir, version, Seq(metaDataLine(
      org.apache.spark.sql.types.StructType(kept), partCols, cfg2)))
  }

  def merge(spark: org.apache.spark.sql.SparkSession, dir: String,
      batch0: DataFrame, uniqueKey: Seq[String], buckets: Int = 8,
      enableCdf: Boolean = false,
      checkpointInterval: Int = 10,
      maxLiveFiles: Int = 32,
      txn: Option[(String, Long)] = None,
      // identity partition columns (creation only — later merges read
      // the table's own partitionColumns; non-empty must match)
      partitionBy: Seq[String] = Nil,
      // true = a batch whose schema EXTENDS the table's (new columns
      // appended) evolves the table schema in the merge commit
      // (dbt's on_schema_change=append_new_columns); carried files
      // surface NULL for the new columns via parquet schema-on-read
      allowEvolution: Boolean = false,
      // SQL predicate over the TABLE's columns narrowing the MATCHED
      // set (dbt `incremental_predicates`, the extra ON conjuncts):
      // target rows failing it are NOT matched — they stay untouched
      // and a batch row with their key inserts (SQL MERGE/Delta
      // semantics; the predicate's contract is that real matches are
      // inside the window). It PRUNES the touched-file probe through
      // the log's per-file stats (FileSkipping, conservative) so
      // out-of-window files are never opened. Unsupported on
      // CDF-enabled tables (cdc classification would need it too) —
      // loud.
      residualPredicate: Option[String] = None,
      // SQL predicate over the TABLE's columns: rows matching it are
      // DELETED in the SAME commit the batch upserts (`MERGE ... WHEN
      // MATCHED THEN DELETE` routed single-commit — SQL MERGE's
      // atomicity). Files whose only change is a delete are
      // DV-MASKED (byte-identical, like [[deleteWhere]]); files the
      // batch also touches drop the deleted rows in their CoW
      // rewrite. The delete probe prunes through log stats +
      // partition values, so a partitioned retention delete opens
      // only its partitions' files. Existing unmapped, CDF-off
      // tables, no residual — loud otherwise. CONTRACT (the MERGE
      // route enforces it): no deleted row's key is also in `batch`.
      deletePredicate: Option[String] = None): Long = {
    import org.apache.spark.sql.functions.{broadcast, col, concat, element_at, format_string, lit, pmod, typedlit, xxhash64}
    require(uniqueKey.nonEmpty, "merge needs at least one key column")
    uniqueKey.foreach(k => require(batch0.columns.contains(k),
      s"merge key '$k' is not a batch column (${batch0.columns.mkString(",")})"))
    partitionBy.foreach(p => require(batch0.columns.contains(p),
      s"partition column '$p' is not a batch column (${batch0.columns.mkString(",")})"))
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    // the batch feeds several jobs (touched-file probe, the staged
    // rewrite+upsert write, CDF frames) — pin it once
    val batch = batch0.localCheckpoint(eager = false)

    if (!java.nio.file.Files.isDirectory(logDir)) {
      require(deletePredicate.isEmpty,
        s"merge with a delete leg cannot CREATE a table: $dir")
      // ---- creation: ONE staged job hash-buckets the batch into up
      // to `buckets` files (per partition when partitioned), bounding
      // later rewrite units. A creation commit is add-only — derived
      // CDF reads it as pure inserts, which is exact.
      val config =
        if (enableCdf) Map("delta.enableChangeDataFeed" -> "true")
        else Map.empty[String, String]
      val dataSchema = org.apache.spark.sql.types.StructType(
        batch.schema.filterNot(f => partitionBy.contains(f.name)))
      val (tagged, pdirPv) =
        if (partitionBy.isEmpty) {
          val b = pmod(xxhash64(uniqueKey.map(col): _*), lit(buckets))
          (batch.withColumn("__graft_target",
            format_string("part-%05d-v0.parquet", b)),
            Map("" -> Map.empty[String, String]))
        } else {
          val (bp, pdirPv0) = withPdir(batch, partitionBy)
          val keysData = uniqueKey.filterNot(partitionBy.contains)
          val perPart = math.max(1, buckets / math.max(1, pdirPv0.size))
          val b = if (keysData.isEmpty) lit(0L)
            else pmod(xxhash64(keysData.map(col): _*), lit(perPart))
          (bp.withColumn("__graft_target",
            concat(col("__graft_pdir"), lit("/"),
              format_string("part-%05d-v0.parquet", b)))
            .drop("__graft_pdir").drop(partitionBy: _*), pdirPv0)
        }
      val staged = stageWrite(dir, tagged)
      if (staged.isEmpty) {
        // legal empty-table creation: protocol + metaData only. The
        // emptiness test is the staged write itself (zero-row targets
        // never materialize) — no dedicated count job.
        writeCommitFile(dir, 0L, Seq(protocolLine,
          metaDataLine(batch.schema, partitionBy, config)) ++
          txn.map(txnLine))
        return 0L
      }
      requireNextVersion(dir, 0L)
      // row count straight from the staged parquet footers (same
      // decode as the stats below) — the dedicated batch.count() job
      // this replaces re-ran the batch lineage once per merge
      val statsRaw = statsRawFor(spark, dir, staged.map(_._1), dataSchema)
      val stats = statsRaw.map { case (rel, (rows, cols)) =>
        rel -> statsJsonOf(rows, cols) }
      val n = statsRaw.valuesIterator.map(_._1).sum
      val lines = Seq(protocolLine,
        metaDataLine(batch.schema, partitionBy, config)) ++
        staged.map { case (rel, size) =>
          val pdir = rel.split('/').dropRight(1).mkString("/")
          addLine(rel, pdirPv(pdir), size, stats.get(rel),
            dataChange = true)
        } ++ txn.map(txnLine)
      writeCommitFile(dir, 0L, lines)
      n
    } else {
      // ---- existing table: rewrite exactly the touched files +
      // append the batch, in ONE staged job and ONE atomic commit
      val tableSchema = DeltaRead.tableSchema(spark, dir)
      val partCols = DeltaRead.partitionColumns(spark, dir)
      require(partitionBy.isEmpty || partitionBy == partCols,
        s"merge partitionBy ${partitionBy.mkString(",")} != table " +
          s"partitioning ${partCols.mkString(",")}: $dir")
      // column-mapping geometry: data files of mapped tables store
      // PHYSICAL col-<uuid> names, the log's partitionValues and
      // stats are physical-keyed — the merge reads physically,
      // operates logically, and writes physically again
      val geom = DeltaRead.mergeGeometry(spark, dir)
      val mapped = geom.mapped
      require(residualPredicate.isEmpty ||
          !boolConf(DeltaRead.tableConfiguration(spark, dir),
            "delta.enableChangeDataFeed"),
        s"residual-predicate merge on a CDF-enabled table is " +
          s"unsupported (cdc rows would need the same matched-set " +
          s"narrowing): $dir")
      // CDF-enabled tables compose with the delete leg: the same
      // pruned scan that finds the masked positions also yields the
      // deleted rows' pre-images, written as `delete` cdc rows in the
      // SAME commit (the protocol's requirement — DV masks and CoW
      // rewrites alone would make derived CDF misreport)
      val cdfOn = boolConf(DeltaRead.tableConfiguration(spark, dir),
        "delta.enableChangeDataFeed")
      deletePredicate.foreach { _ =>
        require(!mapped,
          s"merge with a delete leg on a column-mapped table is " +
            s"unsupported: $dir")
        require(residualPredicate.isEmpty,
          s"merge cannot combine a delete leg with a residual ON " +
            s"predicate: $dir")
      }
      // compare shapes with nested METADATA stripped: mapped tables
      // carry columnMapping metadata on every (nested) field that a
      // caller's batch legitimately lacks
      def stripMeta(dt: org.apache.spark.sql.types.DataType)
          : org.apache.spark.sql.types.DataType = dt match {
        case st: org.apache.spark.sql.types.StructType =>
          org.apache.spark.sql.types.StructType(st.fields.map(f =>
            org.apache.spark.sql.types.StructField(
              f.name, stripMeta(f.dataType), f.nullable)))
        case org.apache.spark.sql.types.ArrayType(et, n) =>
          org.apache.spark.sql.types.ArrayType(stripMeta(et), n)
        case org.apache.spark.sql.types.MapType(kt, vt, n) =>
          org.apache.spark.sql.types.MapType(
            stripMeta(kt), stripMeta(vt), n)
        case other => other
      }
      val tf = tableSchema.fields.map(f => (f.name, stripMeta(f.dataType))).toSeq
      val bf = batch.schema.fields.map(f => (f.name, stripMeta(f.dataType))).toSeq
      val evolves = bf != tf
      if (evolves) {
        require(!mapped,
          s"merge schema evolution on a column-mapped table is " +
            s"unsupported (new columns need fresh field ids): $dir")
        require(allowEvolution && bf.startsWith(tf),
          s"merge batch schema ${batch.schema.simpleString} != table " +
            s"schema ${tableSchema.simpleString} (schema evolution " +
            (if (allowEvolution) "supports appended columns only"
             else "disabled — pass allowEvolution to append new columns") +
            s"): $dir")
        requireNotDropped(DeltaRead.tableConfiguration(spark, dir),
          batch.schema.fields.drop(tableSchema.fields.length)
            .map(_.name).toSeq, dir, "merge schema evolution")
      }
      val fullSchema = if (evolves) batch.schema else tableSchema
      val version = DeltaRead.latestVersion(dir) + 1
      requireNextVersion(dir, version)
      val live = DeltaRead.liveDataFilesAll(spark, dir)
      val hconf = spark.sessionState.newHadoopConf()
      def qualified(p: String): String = DeltaWrite.sparkPathOf(hconf, p)
      // fused delete leg: bounded (file, row) positions of the live
      // rows matching the predicate — the same stats/partition-pruned
      // scan + pv-attach + DV anti-join shape as the standalone
      // [[deleteWhere]], so a partitioned retention delete opens only
      // its partitions' files
      val maxDelMatches = 2000000
      // (matched (file,row) positions, deleted rows' pre-images for
      // cdc — the SAME lazily-planned scan, materialized only on
      // CDF-enabled tables)
      val (delMatched: Array[(String, Long)],
          delCdcRows: Option[DataFrame]) = deletePredicate match {
        case None => (Array.empty[(String, Long)], None)
        case Some(dp) =>
          val skip = FileSkipping.resolve(spark, tableSchema,
            org.apache.spark.sql.functions.expr(dp))
          val delPruned = live.filter(f => FileSkipping.mayMatch(skip,
            DeltaRead.fileStatsOfLive(f, tableSchema, partCols)))
          if (delPruned.isEmpty) (Array.empty[(String, Long)], None)
          else {
            val delDataSchema = org.apache.spark.sql.types.StructType(
              tableSchema.filterNot(f2 => partCols.contains(f2.name)))
            val r0 = spark.read.schema(delDataSchema)
              .parquet(delPruned.map(_.abs): _*)
              .withColumn("__graft_file", col("_metadata.file_path"))
              .withColumn("__graft_row", col("_metadata.row_index"))
            val withPv =
              if (partCols.isEmpty) r0
              else {
                val pvSchema = org.apache.spark.sql.types.StructType(
                  org.apache.spark.sql.types.StructField("__graft_file",
                    org.apache.spark.sql.types.StringType) +:
                  partCols.map(c2 => org.apache.spark.sql.types
                    .StructField(s"__graft_dpv_$c2",
                      org.apache.spark.sql.types.StringType)))
                val pvRows = delPruned.map(f2 =>
                  org.apache.spark.sql.Row.fromSeq(qualified(f2.abs) +:
                    partCols.map(c2 =>
                      geom.pvOf(f2.partitionValues, c2))))
                val pvDf = spark.createDataFrame(
                  spark.sparkContext.parallelize(pvRows, 1), pvSchema)
                partCols.foldLeft(r0.join(broadcast(pvDf),
                    Seq("__graft_file")))((df2, c2) =>
                  df2.withColumn(c2, col(s"`__graft_dpv_$c2`")
                    .cast(fullSchema(c2).dataType)))
                  .drop(partCols.map(c2 => s"__graft_dpv_$c2"): _*)
              }
            val withDv0 = delPruned.flatMap(f2 =>
              f2.dv.map(d2 => (qualified(f2.abs), d2)))
            val c0 =
              if (withDv0.isEmpty) withPv
              else withPv.join(DeltaRead.dvDeleteFrame(spark, dir, withDv0),
                Seq("__graft_file", "__graft_row"), "left_anti")
            val matchedRows = c0
              .filter(org.apache.spark.sql.functions.expr(dp))
            val m = matchedRows
              .select("__graft_file", "__graft_row")
              .limit(maxDelMatches + 1)
              .collect().map(r => (r.getString(0), r.getLong(1)))
            require(m.length <= maxDelMatches,
              s"merge delete leg matches more than $maxDelMatches rows " +
                s"— use DELETE FROM / a rewrite for mass deletes: $dir")
            // cdc delete pre-images: the matched rows with their
            // partition DIR attached (a broadcast file→pdir literal,
            // same shape as optimize's routing map) — consumed by the
            // cdc staged write below only when CDF is on
            val cdc =
              if (!cdfOn || m.isEmpty) None
              else {
                val pdirOfQ: Map[String, String] = delPruned.map(f2 =>
                  qualified(f2.abs) -> pvDirOf(partCols,
                    partCols.map(c2 =>
                      c2 -> geom.pvOf(f2.partitionValues, c2)).toMap)).toMap
                Some(matchedRows.withColumn("__graft_pdir",
                  if (partCols.isEmpty) lit("")
                  else element_at(typedlit(pdirOfQ), col("__graft_file")))
                  .drop("__graft_file", "__graft_row"))
              }
            (m, cdc)
          }
      }
      val dataSchema = org.apache.spark.sql.types.StructType(
        fullSchema.filterNot(f => partCols.contains(f.name)))
      // the PHYSICAL on-disk shape of the data columns (== dataSchema
      // when unmapped; schema evolution is rejected for mapped tables
      // above, so geom.physFull is current)
      val physPartCols = partCols.map(geom.physOf)
      val physDataSchema: org.apache.spark.sql.types.StructType =
        if (!mapped) dataSchema
        else org.apache.spark.sql.types.StructType(
          geom.physFull.fields.filterNot(f => physPartCols.contains(f.name)))
      // per-logical-column physical field (for the write-side rename)
      val physFieldOf: Map[String, org.apache.spark.sql.types.StructField] =
        if (!mapped) Map.empty
        else fullSchema.fields.map(f =>
          f.name -> geom.physFull(geom.physOf(f.name))).toMap
      // a LiveFileDv's partition values normalized to LOGICAL keys
      def lpv(pv: Map[String, String]): Map[String, String] =
        partCols.map(c => c -> geom.pvOf(pv, c)).toMap
      // and a batch-side (logical-keyed) pv map to the PHYSICAL keys
      // the commit's actions must carry
      def physPv(pv: Map[String, String]): Map[String, String] =
        pv.map { case (k, v) => geom.physOf(k) -> v }

      // PARTITION PRUNING for the touched-file probe: only live files
      // whose partition values can equal a batch partition combo can
      // hold a matched key. Values compare in FileSkipping's
      // normalized domain (serialization-format differences between
      // writers never mis-prune); unparseable values keep the file —
      // conservative, correctness never depends on pruning.
      val (batchP, pdirPvBatch) =
        if (partCols.isEmpty)
          (batch.withColumn("__graft_pdir", lit("")),
            Map("" -> Map.empty[String, String]))
        else withPdir(batch, partCols)
      def normPv(pv: Map[String, String], c: String): Option[Option[Any]] = {
        val raw = pv.getOrElse(c, null)
        if (raw == null) Some(None)
        else FileSkipping.normStat(raw, fullSchema(c).dataType) match {
          case Some(v) => Some(Some(v))
          case None => None // unparseable → unknown
        }
      }
      val batchPvNorm: Set[Seq[Option[Option[Any]]]] =
        pdirPvBatch.values.map(pv => partCols.map(c => normPv(pv, c))).toSet
      val pruned0 =
        if (partCols.isEmpty) live
        else live.filter { f =>
          val key = partCols.map(c => normPv(lpv(f.partitionValues), c))
          key.exists(_.isEmpty) || batchPvNorm.contains(key)
        }
      // RESIDUAL-PREDICATE pruning (dbt incremental_predicates): a
      // file whose log stats prove NO row can satisfy the residual
      // holds no matched row, so the probe never opens it. Tri-state
      // conservative; skipped on mapped tables (physical stats keys).
      val resSkip = residualPredicate.filter(_ => !mapped).map(rp =>
        FileSkipping.resolve(spark, fullSchema,
          org.apache.spark.sql.functions.expr(rp)))
      val pruned = resSkip match {
        case None => pruned0
        case Some(e) => pruned0.filter(f => FileSkipping.mayMatch(e,
          DeltaRead.fileStatsOfLive(f, fullSchema, partCols)))
      }

      val liveByQualified: Map[String, DeltaRead.LiveFileDv] =
        pruned.map(f => qualified(f.abs) -> f).toMap
      // cur: the pruned live rows with their source file, partition
      // dir, and (for partitioned tables) the partition columns
      // re-attached from the log's authoritative values via a
      // broadcast file-map — data files do not store partition columns
      val cur: DataFrame =
        if (pruned.isEmpty) {
          val schema = org.apache.spark.sql.types.StructType(
            dataSchema.fields ++
              partCols.map(c => fullSchema(c)) ++ Seq(
              org.apache.spark.sql.types.StructField("__graft_file",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("__graft_pdir",
                org.apache.spark.sql.types.StringType)))
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        } else {
          // physical scan; DV masks anti-joined out BEFORE the
          // logical rename (row_index is a scan-time column); then
          // one cast per top-level column restores logical names
          // (nested fields rename positionally) — same machinery as
          // DeltaRead's mapped scan
          val raw0 = DeltaRead.pqReader(spark, geom.idMapped)
            .schema(physDataSchema)
            .parquet(pruned.map(_.abs): _*)
            .withColumn("__graft_file", col("_metadata.file_path"))
          val withDv = pruned.flatMap(f =>
            f.dv.map(d => (qualified(f.abs), d)))
          val masked =
            if (withDv.isEmpty) raw0
            else raw0.withColumn("__graft_row", col("_metadata.row_index"))
              .join(DeltaRead.dvDeleteFrame(spark, dir, withDv),
                Seq("__graft_file", "__graft_row"), "left_anti")
              .drop("__graft_row")
          val cur0 =
            if (!mapped) masked
            else masked.select(dataSchema.fields.toIndexedSeq.map(f =>
              col(s"`${geom.physOf(f.name)}`")
                .cast(f.dataType).as(f.name)) :+ col("__graft_file"): _*)
          if (partCols.isEmpty) cur0.withColumn("__graft_pdir", lit(""))
          else {
            val pvSchema = org.apache.spark.sql.types.StructType(
              org.apache.spark.sql.types.StructField("__graft_file",
                org.apache.spark.sql.types.StringType) +:
              org.apache.spark.sql.types.StructField("__graft_pdir",
                org.apache.spark.sql.types.StringType) +:
              partCols.map(c => org.apache.spark.sql.types.StructField(
                s"__graft_pv_$c", org.apache.spark.sql.types.StringType)))
            val pvRows = pruned.map(f => org.apache.spark.sql.Row.fromSeq(
              qualified(f.abs) +: pvDirOf(partCols, lpv(f.partitionValues)) +:
                partCols.map(c => geom.pvOf(f.partitionValues, c))))
            val pvDf = spark.createDataFrame(
              spark.sparkContext.parallelize(pvRows, 1), pvSchema)
            partCols.foldLeft(
                cur0.join(broadcast(pvDf), Seq("__graft_file")))((df, c) =>
              df.withColumn(c, col(s"`__graft_pv_$c`")
                .cast(fullSchema(c).dataType)))
              .drop(partCols.map(c => s"__graft_pv_$c"): _*)
          }
        }

      // residual narrows the MATCHED set: only in-window rows count
      // as matches, so only their files are touched/rewritten
      val curMatch = residualPredicate.map(rp =>
        cur.filter(org.apache.spark.sql.functions.expr(rp)))
        .getOrElse(cur)
      val touched = curMatch.join(batch, uniqueKey, "left_semi")
        .select("__graft_file").distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      val touchedFiles = touched.map(f => liveByQualified.getOrElse(f,
        sys.error(s"touched file $f missing from the live map: $dir")))
      // rewrite target per touched file: same partition dir, fresh name
      val rwRelOf: Map[String, String] =
        touched.zipWithIndex.map { case (f, i) =>
          val lf = liveByQualified(f)
          val pdir = pvDirOf(partCols, lpv(lf.partitionValues))
          f -> (if (pdir.isEmpty) f"rw-$version%05d-$i%03d.parquet"
                else f"$pdir/rw-$version%05d-$i%03d.parquet")
        }.toMap
      // rewrite adds carry the partitionValues AS COMMITTED (physical
      // keys on mapped tables — the protocol's form)
      val rwPv: Map[String, Map[String, String]] =
        touchedFiles.map(lf =>
          rwRelOf(qualified(lf.abs)) -> lf.partitionValues).toMap

      // ---- ONE staged job: every rewrite file + every upsert file.
      // All-rows-matched rewrites stage zero rows and become bare
      // removes — no per-file emptiness probes.
      val rwTagged =
        if (touched.isEmpty) None
        else {
          val rwBase = cur.filter(col("__graft_file").isin(touched: _*))
          val batchKeys = batch.select(uniqueKey.map(col): _*)
          // carried = rows NOT replaced by the batch: key not in the
          // batch, or (residual merges) key matched but the row is
          // OUTSIDE the predicate window — SQL MERGE leaves it
          val carried = residualPredicate match {
            case None => rwBase.join(batchKeys, uniqueKey, "left_anti")
            case Some(rp) =>
              rwBase.join(batchKeys, uniqueKey, "left_anti")
                .unionByName(rwBase.filter(
                  !org.apache.spark.sql.functions.coalesce(
                    org.apache.spark.sql.functions.expr(rp), lit(false)))
                  .join(batchKeys, uniqueKey, "left_semi"))
          }
          // fused delete leg: deleted rows of REWRITTEN files drop out
          // of the carry (predicate-null rows survive — SQL WHERE
          // semantics); delete-only files are DV-masked below instead
          val carriedKept = deletePredicate match {
            case None => carried
            case Some(dp) => carried.filter(
              !org.apache.spark.sql.functions.coalesce(
                org.apache.spark.sql.functions.expr(dp), lit(false)))
          }
          Some(carriedKept
            .withColumn("__graft_target",
              element_at(typedlit(rwRelOf), col("__graft_file")))
            .drop("__graft_file").drop("__graft_pdir")
            .drop(partCols: _*))
        }
      val upTagged = batchP
        .withColumn("__graft_target",
          if (partCols.isEmpty) lit(f"upsert-$version%05d.parquet")
          else concat(col("__graft_pdir"),
            lit(f"/upsert-$version%05d.parquet")))
        .drop("__graft_pdir").drop(partCols: _*)
      // evolution: rewrites read with the NEW data schema (old files
      // surface NULL for appended columns), so both sides align
      // mapped tables write PHYSICAL column names back into data
      // files (one cast per top-level column renames nested fields
      // positionally — the exact inverse of the read-side rename);
      // id-mode fields keep their parquet.field.id metadata so
      // Spark's writer stamps field ids
      def physicalTagged(df: DataFrame): DataFrame =
        if (!mapped) df
        else df.select(dataSchema.fields.toIndexedSeq.map { f =>
          val pf = physFieldOf(f.name)
          col(s"`${f.name}`").cast(pf.dataType).as(pf.name, pf.metadata)
        } :+ col("__graft_target"): _*)
      val tagged = rwTagged.fold(upTagged)(_.unionByName(upTagged))
      val staged = stageWrite(dir, physicalTagged(tagged))
      // an EMPTY batch with nothing touched and no delete leg commits
      // nothing — otherwise every no-op schedule grows the log by one
      // empty file forever. The emptiness test is the staged write
      // itself (zero-row targets never materialize), replacing the
      // dedicated batch.count() job that re-ran the batch lineage
      // once per merge (guide §1.2 — don't compute things twice).
      if (staged.isEmpty && touched.isEmpty && delMatched.isEmpty)
        return 0L
      // stats read back the staged files in their on-disk (physical)
      // shape — stats JSON keys are physical-named under mapping, the
      // protocol's form. The merged-row count `n` (the return value)
      // comes from the SAME footer decode: the upsert files' rows ARE
      // the batch's rows, each staged exactly once.
      val statsRaw = statsRawFor(spark, dir, staged.map(_._1),
        physDataSchema)
      val stats = statsRaw.map { case (rel, (rows, cols)) =>
        rel -> statsJsonOf(rows, cols) }
      val upsertName = f"upsert-$version%05d.parquet"
      val n = statsRaw.iterator.collect {
        case (rel, (rows, _)) if rel.split('/').last == upsertName => rows
      }.sum
      // a delete-leg cdc file can land in a partition the batch never
      // touches — the live set's own partition map is the fallback
      lazy val livePdirPv: Map[String, Map[String, String]] = live.map(f =>
        pvDirOf(partCols, lpv(f.partitionValues)) ->
          lpv(f.partitionValues)).toMap
      def pvOfRel(rel: String): Map[String, String] =
        rwPv.getOrElse(rel, {
          val pdir = rel.stripPrefix("_change_data/")
            .split('/').dropRight(1).mkString("/")
          physPv(pdirPvBatch.getOrElse(pdir,
            livePdirPv.getOrElse(pdir, sys.error(
              s"staged file $rel maps to no known partition: $dir"))))
        })

      // A MERGE commit on a CDF-enabled table MUST carry cdc actions:
      // its add/remove actions rewrite whole files, so the derived
      // fallback would misreport every carried row of a touched file
      // as deleted+inserted. The cdc files hold the TRUE row-level
      // changes: old values of matched keys (update_preimage), their
      // new values (update_postimage), and unmatched batch rows
      // (insert) — O(touched + batch), like the merge itself, written
      // in ONE staged job (partitioned tables get one cdc file per
      // touched partition, with partitionValues on the cdc action).
      val cdcStaged: Seq[(String, Long)] = if (!cdfOn) Nil else {
        val ct = "_change_type"
        val keyCols = uniqueKey.map(col)
        val curRows = cur.drop("__graft_file")
        val pre = curRows
          .join(batch.select(keyCols: _*), uniqueKey, "left_semi")
          .withColumn(ct, lit("update_preimage"))
        val post = batchP
          .join(curRows.select(keyCols: _*), uniqueKey, "left_semi")
          .withColumn(ct, lit("update_postimage"))
        val ins = batchP
          .join(curRows.select(keyCols: _*), uniqueKey, "left_anti")
          .withColumn(ct, lit("insert"))
        // fused delete leg: the deleted rows' pre-images, from the
        // same pruned scan that computed the masked positions
        val del = delCdcRows.map(_.withColumn(ct, lit("delete")))
        val all = (Seq(pre.unionByName(post, allowMissingColumns = true)
          .unionByName(ins, allowMissingColumns = true)) ++ del)
          .reduce(_.unionByName(_, allowMissingColumns = true))
        val cdcTagged = all
          .withColumn("__graft_target",
            if (partCols.isEmpty)
              lit(f"_change_data/cdc-$version%05d.parquet")
            else concat(lit("_change_data/"), col("__graft_pdir"),
              lit(f"/cdc-$version%05d.parquet")))
          .drop("__graft_pdir").drop(partCols: _*)
          .select((dataSchema.fieldNames.toSeq :+ ct :+ "__graft_target")
            .map(col): _*)
        // cdc files are read through the same mapped scan as data
        // files — physical names there too
        val cdcPhysical =
          if (!mapped) cdcTagged
          else cdcTagged.select(dataSchema.fields.toIndexedSeq.map { f =>
            val pf = physFieldOf(f.name)
            col(s"`${f.name}`").cast(pf.dataType).as(pf.name, pf.metadata)
          } ++ Seq(col(ct), col("__graft_target")): _*)
        stageWrite(dir, cdcPhysical)
      }

      // fused delete leg: files holding deleted rows that the batch
      // does NOT touch are DV-masked in this same commit (looked up
      // over ALL live files — on partitioned tables a delete-matched
      // file can sit outside the key probe's partition pruning)
      val touchedSet = touched.toSet
      val dvByFile: Map[String, Seq[Long]] = delMatched
        .filter { case (f, _) => !touchedSet.contains(f) }
        .groupBy(_._1).map { case (f, rs) => f -> rs.map(_._2).toSeq }
      val dvLines = dvMaskLines(spark, dir, dvByFile,
        live.map(f => qualified(f.abs) -> f).toMap, hconf)
      val lines =
        (if (evolves)
          Seq(metaDataLine(fullSchema, partCols,
            DeltaRead.tableConfiguration(spark, dir)))
         else Nil) ++
        staged.map { case (rel, size) =>
          addLine(rel, pvOfRel(rel), size, stats.get(rel),
            dataChange = true) } ++
        touchedFiles.map(lf => removeLine(lf.logPath, lf.partitionValues,
          dataChange = true, dv = lf.dv)) ++
        dvLines ++
        txn.map(txnLine) ++
        cdcStaged.map { case (rel, size) =>
          cdcLine(rel, pvOfRel(rel), size) }
      writeCommitFile(dir, version, lines)
      // bound the FILE count too: each merge adds upsert files, so an
      // un-compacted table accretes O(merges) files — once the live
      // set exceeds maxLiveFiles, one dataChange=false OPTIMIZE
      // commit re-buckets it back to O(buckets)
      // auto-OPTIMIZE stays gated to plain tables: optimize's rewrite
      // path does not (yet) speak physical names or DV carry-over —
      // mapped/DV tables (including a DV this commit just wrote) keep
      // their file count until a full refresh
      if (maxLiveFiles > 0 && !mapped && dvByFile.isEmpty &&
          live.forall(_.dv.isEmpty) &&
          DeltaRead.liveDataFiles(spark, dir).size > maxLiveFiles)
        optimize(spark, dir, uniqueKey, buckets)
      // bound future replays: a long merge history reads as ONE
      // checkpoint + O(checkpointInterval) JSON commits, not O(history)
      if (checkpointInterval > 0 && version % checkpointInterval == 0)
        writeCheckpoint(spark, dir): Unit
      n + delMatched.length
    }
  }

  /** Checkpoint parquet schema (delta.io PROTOCOL.md checkpoint
    * format): one column per action type, exactly the fields this
    * writer commits. Remove tombstones with a NON-ZERO
    * deletionTimestamp re-emit into the checkpoint (the protocol
    * requires retaining unexpired tombstones — another engine's
    * VACUUM consults them after log cleanup); this writer's own
    * tombstones stamp deletionTimestamp=0 and are always expired, so
    * graft-written tables checkpoint without them (byte-deterministic
    * fixtures preserved).
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
          StructField("cardinality", LongType))))))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("deletionTimestamp", LongType),
        StructField("dataChange", BooleanType))))))
  }

  /** MERGE-ON-READ upsert — the deletion-vector WRITING half of the
    * protocol (`DeletionVectors` already decodes): instead of
    * copy-on-write rewriting every touched file, ONE commit masks the
    * matched rows via a fresh DV per touched file (packed into one
    * `deletion_vector_<uuid>.bin`, real-writer layout) and adds the
    * batch as one data file. Commit cost is O(batch + touched files'
    * DV bitmaps), never a data rewrite — the same O(batch) contract
    * as [[IcebergWrite.mergeOnRead]], in Delta form. Any Delta reader
    * that speaks DVs (including [[DeltaRead.readDeltaTable]]) sees
    * the merged state; untouched AND touched data files stay
    * byte-identical.
    *
    * A touched file that already carries a DV gets a MERGED bitmap
    * (old deletes ∪ new matches) — the re-add names the new
    * descriptor and the remove names the old one, per the protocol's
    * (path, dvUniqueId) action keying. First call creates the table
    * exactly like [[merge]] (hash-bucketed files).
    *
    * Scope (loud, never silent): unpartitioned, unmapped, CDF-off
    * tables, no schema evolution — the CoW [[merge]] covers those
    * shapes. CONTRACT: `batch` unique per key, like every engine
    * merge.
    *
    * Scale notes: the matched-position collect is O(batch) rows (one
    * live row per key under the merge contract); DV bitmaps decode/
    * re-encode on the driver at O(deleted rows per touched file) —
    * bounded by file row count, and OPTIMIZE folds masks back into
    * data when they accumulate.
    */
  def mergeOnRead(spark: org.apache.spark.sql.SparkSession, dir: String,
      batch0: DataFrame, uniqueKey: Seq[String],
      buckets: Int = 8): Long = {
    import org.apache.spark.sql.functions.col
    require(uniqueKey.nonEmpty, "mergeOnRead needs at least one key column")
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    if (!java.nio.file.Files.isDirectory(logDir))
      return merge(spark, dir, batch0, uniqueKey, buckets)
    val geom = DeltaRead.mergeGeometry(spark, dir)
    require(!geom.mapped,
      s"mergeOnRead into a column-mapped table is unsupported " +
        s"(use the CoW merge): $dir")
    require(DeltaRead.partitionColumns(spark, dir).isEmpty,
      s"mergeOnRead into a partitioned table is unsupported " +
        s"(use the CoW merge): $dir")
    require(!boolConf(DeltaRead.tableConfiguration(spark, dir),
        "delta.enableChangeDataFeed"),
      s"mergeOnRead into a CDF-enabled table is unsupported — DV " +
        s"masking writes no cdc actions (use the CoW merge): $dir")
    val tableSchema = DeltaRead.tableSchema(spark, dir)
    val batch = batch0.localCheckpoint(eager = false)
    require(batch.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      tableSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"mergeOnRead batch schema ${batch.schema.simpleString} != table " +
        s"schema ${tableSchema.simpleString}: $dir")
    val version = DeltaRead.latestVersion(dir) + 1
    requireNextVersion(dir, version)
    // write the batch's data file FIRST and take the row count (the
    // return value and the emptiness test) from its footer — replaces
    // the dedicated batch.count() job; an empty batch's file is
    // discarded and nothing commits
    val name = f"mor-$version%05d.parquet"
    val size = writeOne(batch, dir, name)
    val (n, batchStats) = statsRawFor(spark, dir, Seq(name),
      batch.schema)(name)
    if (n == 0) {
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(dir, name))
      return 0L
    }
    val live = DeltaRead.liveDataFilesAll(spark, dir)
    val hconf = spark.sessionState.newHadoopConf()
    val liveByQualified = live.map(f => sparkPathOf(hconf, f.abs) -> f).toMap

    // matched LIVE positions: existing DV masks apply first, so a
    // row already deleted can never be "matched" twice
    val raw0 = spark.read.schema(tableSchema)
      .parquet(live.map(_.abs): _*)
      .withColumn("__graft_file", col("_metadata.file_path"))
      .withColumn("__graft_row", col("_metadata.row_index"))
    val withDv = live.flatMap(f =>
      f.dv.map(d => (sparkPathOf(hconf, f.abs), d)))
    val cur =
      if (withDv.isEmpty) raw0
      else raw0.join(DeltaRead.dvDeleteFrame(spark, dir, withDv),
        Seq("__graft_file", "__graft_row"), "left_anti")
    val matched = cur.join(batch, uniqueKey, "left_semi")
      .select("__graft_file", "__graft_row")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byFile: Map[String, Seq[Long]] =
      matched.groupBy(_._1).map { case (f, rs) => f -> rs.map(_._2).toSeq }

    val dvLines: Seq[String] =
      dvMaskLines(spark, dir, byFile, liveByQualified, hconf)
    val lines = dvLines :+
      addLine(name, Map.empty, size, Some(statsJsonOf(n, batchStats)),
        dataChange = true)
    writeCommitFile(dir, version, lines)
    n
  }

  /** `DELETE FROM <table> WHERE <predicate>` as a MERGE-ON-READ
    * commit: matching live rows are masked by deletion vectors — ONE
    * packed DV file plus per-touched-file add/remove log actions, NO
    * data file rewritten (the protocol's selective-delete shape;
    * commit cost is O(matching files + matches), like
    * [[mergeOnRead]]). Existing DV masks compose (a row already
    * deleted never re-matches), the first DV upgrades the protocol in
    * the same commit, and an empty match writes NO commit.
    *
    * `predicateSql` is SQL text over the table's columns (the routed
    * `DELETE FROM` statement's own WHERE clause, re-rendered — text,
    * not a bound Column, so it binds to this function's fresh scan).
    * Same geometry contract as [[mergeOnRead]]: column-mapped,
    * partitioned, and CDF-enabled tables refuse loudly (use a CoW
    * path); the matched-position collect is capped — DV deletes are
    * for SELECTIVE deletes, a delete of most of a table should
    * rewrite it instead.
    */
  /** Delta booleans are case-insensitive ("true"/"TRUE"/"True" all
    * enable a feature) — compare in Delta's own domain, never by
    * exact string match.
    */
  private def boolConf(cfg: Map[String, String], key: String): Boolean =
    cfg.getOrElse(key, "false").trim.equalsIgnoreCase("true")

  def deleteWhere(spark: org.apache.spark.sql.SparkSession, dir: String,
      predicateSql: String, maxMatches: Int = 2000000): Long = {
    import org.apache.spark.sql.functions.{broadcast, col, concat, element_at, expr, lit, typedlit}
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    require(java.nio.file.Files.isDirectory(logDir),
      s"not a Delta table: $dir")
    val geom = DeltaRead.mergeGeometry(spark, dir)
    require(!geom.mapped,
      s"deleteWhere on a column-mapped table is unsupported: $dir")
    // CDF composes: the same pruned scan that finds the masked
    // positions yields the deleted rows' pre-images, staged as a
    // `delete` cdc file in the SAME commit (the protocol's
    // requirement — DV-only actions would make derived CDF misreport)
    val cdfOn = boolConf(DeltaRead.tableConfiguration(spark, dir),
      "delta.enableChangeDataFeed")
    val tableSchema = DeltaRead.tableSchema(spark, dir)
    val partCols = DeltaRead.partitionColumns(spark, dir)
    val version = DeltaRead.latestVersion(dir) + 1
    requireNextVersion(dir, version)
    val live = DeltaRead.liveDataFilesAll(spark, dir)
    if (live.isEmpty) return 0L
    val hconf = spark.sessionState.newHadoopConf()
    val liveByQualified = live.map(f => sparkPathOf(hconf, f.abs) -> f).toMap

    // PRUNE the probe through log stats + partition values (the same
    // tri-state FileSkipping domain the merge probe uses): a file
    // whose stats prove no row can match — in particular every file
    // of an untouched partition on the date-partitioned retention
    // delete — is never opened. Conservative: unknown keeps the file.
    val skipExpr = FileSkipping.resolve(spark, tableSchema,
      expr(predicateSql))
    val pruned = live.filter(f => FileSkipping.mayMatch(skipExpr,
      DeltaRead.fileStatsOfLive(f, tableSchema, partCols)))
    if (pruned.isEmpty) return 0L

    // data files do not store partition columns — re-attach them from
    // the log's authoritative partitionValues via a broadcast
    // file-map (keyed on SparkPath form), exactly like the merge scan
    val dataSchema = org.apache.spark.sql.types.StructType(
      tableSchema.filterNot(f => partCols.contains(f.name)))
    val raw0 = spark.read.schema(dataSchema)
      .parquet(pruned.map(_.abs): _*)
      .withColumn("__graft_file", col("_metadata.file_path"))
      .withColumn("__graft_row", col("_metadata.row_index"))
    val withPv =
      if (partCols.isEmpty) raw0
      else {
        val pvSchema = org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("__graft_file",
            org.apache.spark.sql.types.StringType) +:
          partCols.map(c => org.apache.spark.sql.types.StructField(
            s"__graft_pv_$c", org.apache.spark.sql.types.StringType)))
        val pvRows = pruned.map(f => org.apache.spark.sql.Row.fromSeq(
          sparkPathOf(hconf, f.abs) +:
            partCols.map(c => f.partitionValues.getOrElse(c, null))))
        val pvDf = spark.createDataFrame(
          spark.sparkContext.parallelize(pvRows, 1), pvSchema)
        partCols.foldLeft(raw0.join(broadcast(pvDf), Seq("__graft_file")))(
          (df, c) => df.withColumn(c, col(s"`__graft_pv_$c`")
            .cast(tableSchema(c).dataType)))
          .drop(partCols.map(c => s"__graft_pv_$c"): _*)
      }
    val withDv = pruned.flatMap(f =>
      f.dv.map(d => (sparkPathOf(hconf, f.abs), d)))
    val cur =
      if (withDv.isEmpty) withPv
      else withPv.join(DeltaRead.dvDeleteFrame(spark, dir, withDv),
        Seq("__graft_file", "__graft_row"), "left_anti")
    val matched = cur.filter(expr(predicateSql))
      .select("__graft_file", "__graft_row")
      .limit(maxMatches + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(matched.length <= maxMatches,
      s"DELETE matches more than $maxMatches rows — DV masking is " +
        s"for selective deletes; rewrite the table (or delete in " +
        s"bounded predicate ranges) instead: $dir")
    if (matched.isEmpty) return 0L
    val byFile: Map[String, Seq[Long]] =
      matched.groupBy(_._1).map { case (f, rs) => f -> rs.map(_._2).toSeq }

    // cdc delete pre-images from the same pruned scan (one cdc file,
    // or one per touched partition), landing in the same commit
    val cdcStaged: Seq[(String, Long)] =
      if (!cdfOn) Nil
      else {
        val pdirOfQ: Map[String, String] = pruned.map(f =>
          sparkPathOf(hconf, f.abs) ->
            pvDirOf(partCols, f.partitionValues)).toMap
        val ct = "_change_type"
        val tagged = cur.filter(expr(predicateSql))
          .withColumn("__graft_pdir",
            if (partCols.isEmpty) lit("")
            else element_at(typedlit(pdirOfQ), col("__graft_file")))
          .withColumn(ct, lit("delete"))
          .withColumn("__graft_target",
            if (partCols.isEmpty)
              lit(f"_change_data/cdc-$version%05d.parquet")
            else concat(lit("_change_data/"), col("__graft_pdir"),
              lit(f"/cdc-$version%05d.parquet")))
          .select((dataSchema.fieldNames.toSeq :+ ct :+ "__graft_target")
            .map(col): _*)
        stageWrite(dir, tagged)
      }
    val pdirPv: Map[String, Map[String, String]] = pruned.map(f =>
      pvDirOf(partCols, f.partitionValues) -> f.partitionValues).toMap
    writeCommitFile(dir, version,
      dvMaskLines(spark, dir, byFile, liveByQualified, hconf) ++
        cdcStaged.map { case (rel, size) =>
          val pdir = rel.stripPrefix("_change_data/")
            .split('/').dropRight(1).mkString("/")
          cdcLine(rel,
            if (partCols.isEmpty) Map.empty else pdirPv(pdir), size)
        })
    matched.length.toLong
  }

  /** The DV-commit core shared by [[mergeOnRead]] and [[deleteWhere]]:
    * compose each touched file's EXISTING mask with its newly-masked
    * row positions (`byFile`, keyed by SparkPath-qualified name),
    * write ONE packed DV file for the whole commit, and return the
    * log lines — a protocol upgrade when this is the table's first DV
    * (readers must be told to look for deletionVector actions; the
    * feature flag IS the contract), then an add/remove pair per
    * touched file re-adding it with the fresh descriptor.
    */
  private def dvMaskLines(spark: org.apache.spark.sql.SparkSession,
      dir: String, byFile: Map[String, Seq[Long]],
      liveByQualified: Map[String, DeltaRead.LiveFileDv],
      hconf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    if (byFile.isEmpty) return Nil
    val touched = byFile.keys.toSeq.sorted.map(f =>
      liveByQualified.getOrElse(f,
        sys.error(s"matched file $f missing from the live map: $dir")))
    val dvEntries: Seq[(DeltaRead.LiveFileDv, Seq[Long])] = touched.map { lf =>
      val old = lf.dv.map(d =>
        DeletionVectors.deletedRows(dir, d)).getOrElse(Nil)
      lf -> (old ++ byFile(sparkPathOf(hconf, lf.abs))).distinct.sorted
    }
    val upgrade: Seq[String] =
      if (DeltaRead.tableHasDvProtocol(spark, dir)) Nil
      else Seq(compact(render(
        ("protocol" -> (("minReaderVersion" -> 3) ~
          ("minWriterVersion" -> 7) ~
          ("readerFeatures" -> List("deletionVectors")) ~
          ("writerFeatures" -> List("deletionVectors")))): JValue)))
    val uuid = java.util.UUID.randomUUID()
    val offsets = DeletionVectors.writeDvFileMulti(
      java.nio.file.Paths.get(dir, s"deletion_vector_$uuid.bin"),
      dvEntries.map(_._2))
    upgrade ++ dvEntries.zip(offsets).flatMap {
      case ((lf, rows), (off, size)) =>
        val d = DeletionVectors.Descriptor("u",
          DeletionVectors.encodeUuid(uuid), Some(off), size, rows.size)
        Seq(
          addLine(lf.rel, lf.partitionValues, lf.size, lf.stats,
            dataChange = true, dv = Some(d)),
          removeLine(lf.logPath, lf.partitionValues,
            dataChange = true, dv = lf.dv))
    }
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
      } ++
      // UNEXPIRED remove tombstones (deletionTimestamp ≠ 0) must ride
      // the checkpoint — the protocol's VACUUM-safety contract for
      // externally-written tables; this writer's own tombstones stamp
      // 0 (= always expired) and re-emit nothing
      state.tombstones.toSeq
        .filter { case (_, r) => (r \ "deletionTimestamp") match {
          case JInt(n) => n != 0
          case JLong(n) => n != 0L
          case _ => false
        } }
        .sortBy(_._1)
        .map { case (_, r) =>
          compact(render(JObject(List("remove" -> r)))) }
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

  final case class VacuumResult(dataFilesDeleted: Long,
      bytesDeleted: Long, logFilesDeleted: Long)

  /** Retention GC for an exported Delta table (Delta `VACUUM` +
    * log cleanup, retention = the newest checkpoint): deletes every
    * file under the table root that no RETAINED log action references
    * — superseded data files, orphaned DV sidecars, and `_change_data`
    * files of pre-checkpoint commits — plus the pre-checkpoint commit
    * JSON and older checkpoints. A checkpoint at the latest version is
    * written first when absent, so the retained window is exactly
    * [newest checkpoint, latest]. Kept (conservative): the live set
    * and its DV sidecars, every file any retained commit's
    * add/remove/cdc action names (CDF over the retained range stays
    * readable — derived deletes re-read removed files), and UNEXPIRED
    * remove tombstones' files (deletionTimestamp ≠ 0: another engine
    * may still read them).
    *
    * After vacuum, time travel to a pre-checkpoint version REFUSES
    * LOUDLY (its commit JSON is gone → "version does not exist"), and
    * `readChanges` over a vacuumed range refuses with "commits
    * absent" — never a silent empty scan. The current snapshot is
    * byte-identical (test-asserted).
    *
    * Race guard (mirrors the warehouse `vacuum`): the log is re-read
    * after candidate collection and the vacuum aborts if another
    * writer committed in between — single-writer tables never hit it.
    */
  def vacuum(spark: org.apache.spark.sql.SparkSession,
      dir: String): VacuumResult = {
    val log0 = DeltaRead.openLog(dir)
    require(log0.commits.nonEmpty, s"empty Delta log: $dir")
    val latest = log0.commits.last
    if (!(log0.singles.contains(latest) || log0.multiparts.contains(latest)
        || log0.v2.contains(latest)))
      writeCheckpoint(spark, dir): Unit
    val boundary = latest
    val log = DeltaRead.openLog(dir)
    val state = DeltaRead.stateAt(spark, log, None)
    def norm(p: String): java.nio.file.Path =
      java.nio.file.Paths.get(p).toAbsolutePath.normalize()
    val referenced = scala.collection.mutable.Set.empty[java.nio.file.Path]
    def refDv(dv: Option[DeletionVectors.Descriptor]): Unit =
      dv.filter(_.storageType == "u").foreach(d =>
        referenced += norm(DeletionVectors.dvFileLocation(dir, d)))
    state.adds.values.foreach { f =>
      referenced += norm(DeltaRead.absPath(dir, f.path))
      refDv(f.dv)
    }
    // unexpired tombstones (external writers): their files survive
    state.tombstones.values.foreach { r =>
      val unexpired = (r \ "deletionTimestamp") match {
        case JInt(n) => n != 0
        case JLong(n) => n != 0L
        case _ => false
      }
      if (unexpired) (r \ "path") match {
        case JString(p) => referenced += norm(DeltaRead.absPath(dir, p))
        case _ =>
      }
    }
    // every path a RETAINED commit's actions name stays readable:
    // cdc actions name their _change_data files, and — only when CDF
    // is enabled, since readChanges refuses otherwise — derived CDF
    // re-reads REMOVED files for delete rows
    val cdfOn = boolConf(state.configuration,
      "delta.enableChangeDataFeed")
    val kinds = if (cdfOn) Seq("add", "remove", "cdc") else Seq("add", "cdc")
    log.commits.filter(_ >= boundary).foreach { v =>
      val text = java.nio.file.Files.readString(
        log.logDir.resolve(f"$v%020d.json"))
      text.linesIterator.filter(_.trim.nonEmpty).foreach { line =>
        val j = org.json4s.jackson.JsonMethods.parse(line)
        kinds.foreach { kind =>
          (j \ kind \ "path") match {
            case JString(p) =>
              referenced += norm(DeltaRead.absPath(dir, p))
              refDv(DeltaRead.dvOf(j \ kind))
            case _ =>
          }
        }
      }
    }
    val root = java.nio.file.Paths.get(dir).toAbsolutePath.normalize()
    val logRoot = root.resolve("_delta_log")
    import scala.jdk.CollectionConverters._
    def listFiles(): Seq[java.nio.file.Path] = {
      val w = java.nio.file.Files.walk(root)
      try w.iterator().asScala.filter(p =>
        java.nio.file.Files.isRegularFile(p) && !p.startsWith(logRoot))
        .toSeq
      finally w.close()
    }
    val candidates = listFiles().filterNot(p =>
      referenced.contains(p.toAbsolutePath.normalize()))
    // race guard: abort if another writer committed since we planned
    require(DeltaRead.openLog(dir).commits.last == latest,
      s"concurrent commit during vacuum — aborting without deleting: $dir")
    var bytes = 0L
    candidates.foreach { p =>
      bytes += java.nio.file.Files.size(p)
      java.nio.file.Files.delete(p)
    }
    // drop now-empty directories (deepest first), never the root/log
    locally {
      val w = java.nio.file.Files.walk(root)
      val dirs = try w.iterator().asScala.filter(p =>
        java.nio.file.Files.isDirectory(p) && p != root &&
          !p.startsWith(logRoot)).toSeq
      finally w.close()
      dirs.sortBy(_.getNameCount)(Ordering[Int].reverse).foreach { d =>
        val s = java.nio.file.Files.list(d)
        val empty = try !s.iterator().hasNext finally s.close()
        if (empty) java.nio.file.Files.delete(d)
      }
    }
    // log cleanup: pre-checkpoint commit JSON and older checkpoints
    var logDeleted = 0L
    log.commits.filter(_ < boundary).foreach { v =>
      java.nio.file.Files.delete(log.logDir.resolve(f"$v%020d.json"))
      logDeleted += 1
    }
    log.singles.filter(_ < boundary).foreach { v =>
      java.nio.file.Files.delete(
        log.logDir.resolve(f"$v%020d.checkpoint.parquet"))
      logDeleted += 1
    }
    log.multiparts.filter(_._1 < boundary).foreach { case (_, parts) =>
      parts.foreach { p =>
        java.nio.file.Files.delete(log.logDir.resolve(p))
        logDeleted += 1
      }
    }
    // superseded v2 checkpoint manifests (their _sidecars parquet may
    // be shared across checkpoints and is deliberately left alone)
    log.v2.filter(_._1 < boundary).foreach { case (_, f) =>
      java.nio.file.Files.delete(log.logDir.resolve(f))
      logDeleted += 1
    }
    VacuumResult(candidates.size.toLong, bytes, logDeleted)
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
