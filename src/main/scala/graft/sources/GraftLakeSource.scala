package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft-delta" | "graft-iceberg")` — the
  * engine's lakehouse readers exposed as registered Spark data
  * sources, so third-party tools (and the snapshot CTAS wire path)
  * address them with stock DataFrame API instead of calling
  * `DeltaRead`/`IcebergRead` directly:
  *
  * {{{
  *   spark.read.format("graft-delta")
  *     .option("versionAsOf", 3)        // or timestampAsOf
  *     .load("/warehouse/orders")
  * }}}
  *
  * Read-only on purpose (writes go through the engine's transactional
  * writers — `DeltaWrite.merge` et al.; the WRITABLE catalog path is
  * [[GraftDeltaCatalogSource]]/[[GraftIcebergCatalogSource]], which
  * route `CREATE TABLE ... USING delta AS SELECT` INTO those commit
  * protocols rather than around them). Registered via
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`
  * so the short names resolve without class-name plumbing.
  *
  * Scale notes: [[PrunedFilteredScan]] hands Spark's pushed filters to
  * the engine read as a predicate, which drives FILE PRUNING through
  * log stats / manifest bounds (the same skipping path `scan_delta`
  * uses) and column pruning through a projection before the scan;
  * Spark re-applies every filter row-wise above (the v1 source
  * contract), so unconvertible filters lose only pruning, never
  * correctness. Time-travel options are CANONICALIZED once per load
  * (`timestampAsOf` → the resolved `versionAsOf`), so the relation's
  * schema lookup and every scan rebuild share ONE driver-side
  * resolution instead of re-walking the log per consumer.
  */
abstract class GraftLakeSourceBase extends RelationProvider
    with DataSourceRegister {

  /** The engine read: (path, options, optional pruning predicate). */
  protected def read(sqlContext: SQLContext, path: String,
      parameters: Map[String, String],
      predicate: Option[Column]): DataFrame

  /** The pinned snapshot's schema from METADATA ONLY — no scan plan
    * is built at relation-resolution time (a scan would eagerly list
    * every live file; schema must not).
    */
  protected def schemaOf(sqlContext: SQLContext, path: String,
      parameters: Map[String, String]): StructType

  /** Resolve load-time options to their immutable form ONCE per
    * relation (e.g. `timestampAsOf` → the pinned `versionAsOf`);
    * [[schemaOf]] and every [[read]] rebuild see the canonical form.
    */
  protected def canonicalize(sqlContext: SQLContext, path: String,
      parameters: Map[String, String]): Map[String, String] = parameters

  /** Relation factory — the writable catalog sources override it to
    * attach `InsertableRelation` (INSERT INTO / INSERT OVERWRITE).
    */
  protected def mkRelation(sqlContext: SQLContext, path: String,
      canon: Map[String, String], schema: StructType,
      readFn: Option[Column] => DataFrame): BaseRelation =
    new GraftLakeRelation(sqlContext, path, canon, schema, readFn)

  /** Catalog-table locations arrive as `file:` URIs; the engine
    * readers/writers address java.nio paths — normalize once. Other
    * schemes refuse loudly (this engine's log/metadata protocols
    * address a filesystem path).
    */
  protected def localPath(p: String): String =
    if (!p.startsWith("file:")) p
    else scala.util.Try(
      java.nio.file.Paths.get(new java.net.URI(p)).toString)
      .getOrElse(p.stripPrefix("file:"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = localPath(parameters.getOrElse("path", sys.error(
      s"${shortName()} needs a path (.load(path) or option(\"path\"))")))
    val canon = canonicalize(sqlContext, path, parameters)
    mkRelation(sqlContext, path, canon,
      schemaOf(sqlContext, path, canon),
      (pred: Option[Column]) => read(sqlContext, path, canon, pred))
  }
}

class GraftDeltaSource extends GraftLakeSourceBase {
  override def shortName(): String = "graft-delta"
  override protected def canonicalize(sqlContext: SQLContext,
      path: String, parameters: Map[String, String])
      : Map[String, String] =
    if (parameters.contains("versionAsOf"))
      parameters - "timestampAsOf" // explicit version pin wins
    else parameters.get("timestampAsOf") match {
      case None => parameters
      case Some(t) =>
        val v = DeltaRead.versionAtTimestamp(path,
          microsOf(sqlContext, t))
        (parameters - "timestampAsOf") + ("versionAsOf" -> v.toString)
    }
  override protected def read(sqlContext: SQLContext, path: String,
      parameters: Map[String, String],
      predicate: Option[Column]): DataFrame =
    DeltaRead.readDeltaTable(sqlContext.sparkSession, path,
      versionAsOf = parameters.get("versionAsOf").map(_.trim.toLong),
      predicate = predicate)
  override protected def schemaOf(sqlContext: SQLContext, path: String,
      parameters: Map[String, String]): StructType = {
    val state = DeltaRead.stateAt(sqlContext.sparkSession,
      DeltaRead.openLog(path),
      parameters.get("versionAsOf").map(_.trim.toLong))
    org.apache.spark.sql.types.DataType.fromJson(
      state.schemaJson.getOrElse(sys.error(
        s"Delta log has no metaData action: $path")))
      .asInstanceOf[StructType]
  }
  private def microsOf(sqlContext: SQLContext, literal: String): Long =
    sqlContext.sparkSession.sql(
      s"SELECT CAST(${org.apache.spark.sql.catalyst.expressions.Literal(
        literal).sql} AS TIMESTAMP)")
      .collect().headOption.map(_.getTimestamp(0)).map(ts =>
        ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L)
      .getOrElse(sys.error(s"unparseable timestampAsOf: $literal"))
}

class GraftIcebergSource extends GraftLakeSourceBase {
  override def shortName(): String = "graft-iceberg"
  override protected def read(sqlContext: SQLContext, path: String,
      parameters: Map[String, String],
      predicate: Option[Column]): DataFrame =
    IcebergRead.readIcebergTable(sqlContext.sparkSession, path,
      snapshotId = parameters.get("snapshotId").map(_.trim.toLong),
      predicate = predicate)
  override protected def schemaOf(sqlContext: SQLContext, path: String,
      parameters: Map[String, String]): StructType =
    IcebergRead.snapshotState(path,
      parameters.get("snapshotId").map(_.trim.toLong)).schema
}

/** See [[GraftLakeSourceBase]]. The relation resolves its schema once
  * (plan construction only — no job) and rebuilds the engine read per
  * scan with the pushed filters as the pruning predicate.
  */
private[sources] class GraftLakeRelation(override val sqlContext: SQLContext,
    path: String, parameters: Map[String, String],
    override val schema: StructType,
    readFn: Option[Column] => DataFrame)
    extends BaseRelation with PrunedFilteredScan {

  // attribute references never round-trip through the column-name
  // PARSER: backtick-quote with doubling, so a column whose name
  // carries a backtick (or dots) still binds
  private def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val predicate = filters.flatMap(columnOf).reduceOption(_ && _)
    val df = readFn(predicate)
    val projected =
      if (requiredColumns.isEmpty)
        // COUNT(*)-style scans: project one cheap column; Spark
        // counts rows, values are ignored
        df.select(org.apache.spark.sql.functions.lit(1).as("__one"))
      else df.select(requiredColumns.toIndexedSeq.map(qcol): _*)
    projected.rdd
  }

  /** Source filter → Column, best-effort: None loses pruning only
    * (Spark re-applies all filters above the scan).
    */
  private def columnOf(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(qcol(a) === v)
    case EqualNullSafe(a, v) => Some(qcol(a) <=> v)
    case GreaterThan(a, v) => Some(qcol(a) > v)
    case GreaterThanOrEqual(a, v) => Some(qcol(a) >= v)
    case LessThan(a, v) => Some(qcol(a) < v)
    case LessThanOrEqual(a, v) => Some(qcol(a) <= v)
    case In(a, vs) => Some(qcol(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(qcol(a).isNull)
    case IsNotNull(a) => Some(qcol(a).isNotNull)
    case StringStartsWith(a, v) => Some(qcol(a).startsWith(v))
    case StringEndsWith(a, v) => Some(qcol(a).endsWith(v))
    case StringContains(a, v) => Some(qcol(a).contains(v))
    case And(l, r) => for { lc <- columnOf(l); rc <- columnOf(r) }
      yield lc && rc
    case Or(l, r) => for { lc <- columnOf(l); rc <- columnOf(r) }
      yield lc || rc
    case Not(c) => columnOf(c).map(!_)
    case _ => None
  }
}
