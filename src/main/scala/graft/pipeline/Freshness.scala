package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** dbt `source freshness` (reference surface: the operator shells out
  * arbitrary dbt commands, `dbtoperator.py:35,334`): compare
  * max(loaded_at) of a source against warn/error thresholds. The "now"
  * is injected (`asOf`) so runs are deterministic and oracle-checkable
  * — dbt itself uses wall-clock, which would never hash-match.
  *
  * Scale: a single `agg(max)` with map-side partials — one row out,
  * no shuffle of raw data; on a partitioned source the scan prunes to
  * the latest partitions if the caller pre-filters.
  */
object Freshness {

  /** One-row freshness report: (source, max_loaded_at, age_sec, status).
    * status = error | warn | pass by age against the thresholds.
    */
  def check(df: DataFrame, sourceName: String, tsCol: String, asOf: String,
            warnAfterSec: Long, errorAfterSec: Long): DataFrame = {
    val asOfSec = lit(asOf).cast(TimestampType).cast(LongType)
    df.agg(max(col(tsCol)).as("max_loaded_at"))
      .select(
        lit(sourceName).as("source"),
        col("max_loaded_at"),
        (asOfSec - col("max_loaded_at").cast(LongType)).as("age_sec"))
      .withColumn("status",
        when(col("max_loaded_at").isNull || col("age_sec") > errorAfterSec,
          lit("error"))
          .when(col("age_sec") > warnAfterSec, lit("warn"))
          .otherwise(lit("pass")))
  }
}
