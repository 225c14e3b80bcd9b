package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-provided parquet tables (TESTDATA.md /
  * FIXTURES.md). One parquet file per table under the scale-factor dir.
  *
  * Scale notes (100 TB design): these are plain `spark.read.parquet`
  * scans — Catalyst pushes filters/column pruning into the parquet
  * reader, and on a real cluster the same code picks up file-level
  * parallelism from `spark.sql.files.maxPartitionBytes`. Nothing here
  * collects to the driver.
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** `events.ts` has been generated as parquet timestamp[ns] in some
    * rounds and timestamp[us] (no UTC flag → TIMESTAMP_NTZ in Spark 4)
    * in others; DuckDB (the oracle) reads both as its naive µs
    * TIMESTAMP. Normalize every variant to Spark's TimestampType so
    * downstream epoch arithmetic (`cast(LongType)`, range frames,
    * watermarks) works identically: ns longs floor-divide to µs
    * exactly like DuckDB's truncation, and NTZ casts to TimestampType
    * instant-preservingly under the UTC session timezone every entry
    * point sets.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    // Spark 4 rejects TIMESTAMP(NANOS) at scan time (PARQUET_TYPE_ILLEGAL)
    // unless nanos are surfaced as raw longs, so set the conf up front.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(path)
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _        => df
    }
  }

  /** Exact-arithmetic casts for oracle determinism (SURVEY §2 preamble):
    * source doubles carry 2-decimal business values; casting each value
    * to DECIMAL(12,2) before any SUM makes aggregation order-independent
    * and bit-identical across Spark and DuckDB. Final results are cast
    * back to DOUBLE so output schemas are plain float64 on both sides.
    */
  def dec2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(DecimalType(12, 2))
  val one2: org.apache.spark.sql.Column = lit(1).cast(DecimalType(12, 2))
  def asDouble(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(DoubleType)
}
