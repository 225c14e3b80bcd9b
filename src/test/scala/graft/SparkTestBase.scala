package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole suite (SURVEY §5) —
  * per-suite sessions would pay JVM+context startup per file.
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.spark
  /** Smallest driver-generated scale factor (read-only). */
  val sf: String = "/root/testdata/sf0.001"
}
