package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named batch of driver-checkable queries. `queries` maps a SURVEY
  * §2 key to a DataFrame program; `oracles` maps the same key to the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Keys without an oracle get a rows-only check (SURVEY §2).
  */
trait QueryGroup {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}
