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
  *    loudly, unpartitioned tables only (partitioned appends carry
  *    partition values in the log — route those through the engine
  *    merge instead);
  *  - `INSERT OVERWRITE` → the same replace protocol.
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
  * file + one log/metadata commit; nothing here reads existing data
  * files.
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
        if (overwrite)
          createOrReplace(sqlContext, path, data,
            partitionColumnsOf(canon))
        else append(sqlContext, path, data)
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

  override protected def append(sqlContext: SQLContext, path: String,
      data: DataFrame): Unit = {
    val spark = sqlContext.sparkSession
    require(DeltaRead.partitionColumns(spark, path).isEmpty,
      s"append into a partitioned Delta table is unsupported here — " +
        s"route it through the engine merge: $path")
    val table = DeltaRead.tableSchema(spark, path)
    val version = DeltaRead.latestVersion(path) + 1
    DeltaWrite.commit(path, version,
      Seq(f"append-$version%05d.parquet" ->
        alignTo(table, data, path)))
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
}
