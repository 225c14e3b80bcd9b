package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, InsertableRelation}
import org.apache.spark.sql.types.StructType

/** WRITABLE `USING delta` / `USING iceberg` — the engine's lakehouse
  * writers registered under the short names dbt-spark renders into
  * its SQL, so `CREATE TABLE t USING delta AS SELECT ...` (the dbt
  * snapshot/table-materialization first run — the one statement of
  * the dbt transcript that previously needed an engine-side writer
  * replay) executes NATIVELY in the Spark session and over the
  * Thrift wire, routed INTO the engine's atomic commit protocols
  * ([[DeltaWrite.replace]] / [[IcebergWrite.replace]]) — never
  * around them. Reference: the dbt-spark lakehouse stack the
  * production loop pins (`dbtoperator.py:274`).
  *
  * The v1 write surface covers the wire statements dbt emits:
  *  - CTAS → `SaveMode.ErrorIfExists` → creation commit (version 0 /
  *    first snapshot; an existing table refuses loudly);
  *  - `CREATE OR REPLACE` / `mode("overwrite")` → full replace in ONE
  *    commit — prior versions stay time-travelable;
  *  - `INSERT INTO` (the relation is [[InsertableRelation]]) → an
  *    append commit: one data file + add action, schema checked
  *    loudly, unpartitioned unmapped tables only (partitioned appends
  *    carry partition values in the log — route those through the
  *    engine merge); a small-file VALVE compacts the live set once it
  *    exceeds `maxLiveFiles` (each append adds exactly one file, so a
  *    scheduled append-only model would otherwise grow the set — and
  *    every reader's footer-open count — without bound);
  *  - `INSERT OVERWRITE` → partitioning-PRESERVING: under
  *    `spark.sql.sources.partitionOverwriteMode=dynamic` on a
  *    partitioned table only the batch's partitions are swapped
  *    ([[DeltaWrite.overwritePartitions]] /
  *    [[IcebergWrite.overwritePartitions]] — untouched partitions'
  *    files stay byte-identical); otherwise the full replace protocol
  *    runs WITH the table's existing partition columns re-read from
  *    its own metadata (a write-path `__partition_columns` option is
  *    absent from read-path relation parameters — deriving from
  *    `canon` would silently re-create the table unpartitioned).
  *
  * Partition columns arrive via Spark's DSv1 convention for
  * `CreatableRelationProvider` writes (the JSON-encoded
  * `__partition_columns` option) and land as the writers' identity
  * partitioning. Reads of the created catalog table resolve through
  * the inherited [[RelationProvider]] — the same pushed-filter file
  * pruning as the read-only `graft-delta`/`graft-iceberg` names.
  *
  * Scale notes: creation/replace stage the query result in ONE job
  * (hash-partition-bucketed when partitioned); append is one staged
  * file + one log/metadata commit; dynamic overwrite is O(touched
  * partitions + batch); the compaction valve amortizes to O(1)
  * rewrites per `maxLiveFiles` appends.
  */
private[sources] trait GraftLakeWritableSource
    extends CreatableRelationProvider { self: GraftLakeSourceBase =>

  protected def tableExists(path: String): Boolean

  /** Create-or-replace through the engine's atomic commit protocol. */
  protected def createOrReplace(sqlContext: SQLContext, path: String,
      data: DataFrame, partitionBy: Seq[String]): Unit

  /** Append commit (unpartitioned, schema-checked — loud otherwise). */
  protected def append(sqlContext: SQLContext, path: String,
      data: DataFrame): Unit

  /** The EXISTING table's identity partition columns, read from its
    * own metadata (log metaData / default partition spec).
    */
  protected def tablePartitionCols(sqlContext: SQLContext,
      path: String): Seq[String]

  /** Swap exactly the batch's partitions in one commit (dynamic
    * partition overwrite); untouched partitions stay byte-identical.
    */
  protected def overwritePartitions(sqlContext: SQLContext,
      path: String, data: DataFrame): Unit

  /** Compact the live file set when it exceeds `maxLiveFiles` (the
    * append valve); a no-op otherwise or when the table's state is
    * out of compaction scope (live DVs).
    */
  protected def compactIfNeeded(sqlContext: SQLContext,
      path: String): Unit

  /** Live-set bound for the append valve — same default as the
    * engine merges' `maxLiveFiles`.
    */
  protected def maxLiveFiles: Int = 32

  /** Spark's DSv1 partition-column convention for
    * CreatableRelationProvider writes: a JSON string array under
    * `__partition_columns`.
    */
  protected def partitionColumnsOf(
      parameters: Map[String, String]): Seq[String] =
    parameters.get("__partition_columns").map { j =>
      org.json4s.jackson.JsonMethods.parse(j) match {
        case org.json4s.JArray(vs) => vs.map {
          case org.json4s.JString(s) => s
          case other => sys.error(
            s"unparseable __partition_columns entry: $other")
        }
        case other => sys.error(s"unparseable __partition_columns: $other")
      }
    }.getOrElse(Nil)

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val path = localPath(parameters.getOrElse("path", sys.error(
      s"${shortName()} write needs a path (managed-table location or " +
        s".option(\"path\"))")))
    val partitionBy = partitionColumnsOf(parameters)
    val exists = tableExists(path)
    mode match {
      case SaveMode.ErrorIfExists if exists => sys.error(
        s"${shortName()} table already exists at $path — use CREATE " +
          s"OR REPLACE / mode(\"overwrite\") to replace it")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Append if exists =>
        require(partitionBy.isEmpty,
          s"partitioned ${shortName()} append is unsupported here — " +
            s"route it through the engine merge: $path")
        append(sqlContext, path, data)
        compactIfNeeded(sqlContext, path)
      case _ => createOrReplace(sqlContext, path, data, partitionBy)
    }
    createRelation(sqlContext, parameters)
  }

  override protected def mkRelation(sqlContext: SQLContext, path: String,
      canon: Map[String, String], schema: StructType,
      readFn: Option[Column] => DataFrame): BaseRelation =
    new GraftLakeRelation(sqlContext, path, canon, schema, readFn)
        with InsertableRelation {
      override def insert(data: DataFrame, overwrite: Boolean): Unit =
        if (overwrite) {
          // the EXISTING table's partitioning, from its own metadata
          // — never from the read-path options (which cannot carry
          // the write-path `__partition_columns` convention)
          val pcs = tablePartitionCols(sqlContext, path)
          val dynamic = sqlContext
            .getConf("spark.sql.sources.partitionOverwriteMode", "STATIC")
            .equalsIgnoreCase("dynamic")
          if (pcs.nonEmpty && dynamic)
            overwritePartitions(sqlContext, path,
              alignTo(schema, data, path))
          else
            createOrReplace(sqlContext, path,
              alignTo(schema, data, path), pcs)
        } else {
          append(sqlContext, path, data)
          compactIfNeeded(sqlContext, path)
        }
    }

  /** `data` aligned to the table's columns by (case-insensitive)
    * name with casts — the star-expansion shape every engine writer
    * expects; a missing column refuses loudly.
    */
  protected def alignTo(table: StructType, data: DataFrame,
      path: String): DataFrame =
    data.select(table.fields.toIndexedSeq.map { f =>
      val src = data.columns.find(_.equalsIgnoreCase(f.name)).getOrElse(
        sys.error(s"${shortName()} append into $path: table column " +
          s"'${f.name}' has no counterpart in the written columns " +
          s"(${data.columns.mkString(", ")})"))
      col("`" + src.replace("`", "``") + "`").cast(f.dataType).as(f.name)
    }: _*)
}

class GraftDeltaCatalogSource extends GraftDeltaSource
    with GraftLakeWritableSource {
  override def shortName(): String = "delta"

  override protected def tableExists(path: String): Boolean =
    java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(path, "_delta_log"))

  override protected def createOrReplace(sqlContext: SQLContext,
      path: String, data: DataFrame, partitionBy: Seq[String]): Unit =
    DeltaWrite.replace(sqlContext.sparkSession, path, data,
      partitionBy = partitionBy): Unit

  override protected def tablePartitionCols(sqlContext: SQLContext,
      path: String): Seq[String] =
    DeltaRead.partitionColumns(sqlContext.sparkSession, path)

  override protected def overwritePartitions(sqlContext: SQLContext,
      path: String, data: DataFrame): Unit =
    DeltaWrite.overwritePartitions(sqlContext.sparkSession, path,
      data): Unit

  override protected def append(sqlContext: SQLContext, path: String,
      data: DataFrame): Unit = {
    val spark = sqlContext.sparkSession
    require(DeltaRead.partitionColumns(spark, path).isEmpty,
      s"append into a partitioned Delta table is unsupported here — " +
        s"route it through the engine merge: $path")
    // a mapped table's data files carry PHYSICAL col-<uuid> names; an
    // append in logical names would silently surface NULL to readers
    require(!DeltaRead.mergeGeometry(spark, path).mapped,
      s"INSERT INTO a column-mapped Delta table is unsupported here " +
        s"(data files need physical column names): $path")
    val table = DeltaRead.tableSchema(spark, path)
    val version = DeltaRead.latestVersion(path) + 1
    DeltaWrite.commit(path, version,
      Seq(f"append-$version%05d.parquet" ->
        alignTo(table, data, path)))
  }

  override protected def compactIfNeeded(sqlContext: SQLContext,
      path: String): Unit = {
    val spark = sqlContext.sparkSession
    val live = DeltaRead.liveDataFilesAll(spark, path)
    // the bucketing key is irrelevant for a pure compaction (the
    // rewrite is dataChange=false rearrangement) — hash over every
    // column distributes appended rows evenly; DV-carrying live sets
    // stay as they are (optimize would refuse; DELETE FROM owns them)
    if (live.size > maxLiveFiles && live.forall(_.dv.isEmpty))
      DeltaWrite.optimize(spark, path, uniqueKey =
        DeltaRead.tableSchema(spark, path).fieldNames.toSeq)
  }
}

class GraftIcebergCatalogSource extends GraftIcebergSource
    with GraftLakeWritableSource {
  override def shortName(): String = "iceberg"

  override protected def tableExists(path: String): Boolean =
    java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(path, "metadata"))

  override protected def createOrReplace(sqlContext: SQLContext,
      path: String, data: DataFrame, partitionBy: Seq[String]): Unit =
    IcebergWrite.replace(sqlContext.sparkSession, path, data,
      partitionBy = partitionBy): Unit

  override protected def tablePartitionCols(sqlContext: SQLContext,
      path: String): Seq[String] =
    IcebergRead.tablePartitionCols(path)

  override protected def overwritePartitions(sqlContext: SQLContext,
      path: String, data: DataFrame): Unit =
    IcebergWrite.overwritePartitions(sqlContext.sparkSession, path,
      data): Unit

  override protected def append(sqlContext: SQLContext, path: String,
      data: DataFrame): Unit = {
    require(IcebergRead.tablePartitionCols(path).isEmpty,
      s"append into a partitioned Iceberg table is unsupported here " +
        s"— route it through the engine merge: $path")
    val table = IcebergRead.snapshotState(path, None).schema
    val version = java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "metadata", "version-hint.text"))
      .trim.toInt + 1
    IcebergWrite.commit(path,
      Seq(f"append-$version%05d.parquet" ->
        alignTo(table, data, path))): Unit
  }

  override protected def compactIfNeeded(sqlContext: SQLContext,
      path: String): Unit = {
    val st = IcebergRead.snapshotState(path, None)
    // readers pay one footer open per data file plus one
    // reconciliation join per delete file — compaction applies the
    // deletes and restores O(buckets); v3 DV tables are out of scope
    // (commit refuses writes to them before this valve can run)
    if (st.dataFiles.size + st.positionDeleteFiles.size +
        st.equalityDeleteFiles.size > maxLiveFiles &&
        st.deletionVectors.isEmpty)
      IcebergWrite.optimize(sqlContext.sparkSession, path,
        uniqueKey = st.schema.fieldNames.toSeq)
  }
}
