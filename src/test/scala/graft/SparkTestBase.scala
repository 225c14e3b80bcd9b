package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole suite (SURVEY §5) —
  * per-suite sessions would pay JVM+context startup per file.
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    // HiveServer2's embedded session state uses a derby metastore in
    // derby.system.home — point it at scratch so `sbt test` never
    // litters the repo root with metastore_db/derby.log
    val derbyHome = java.nio.file.Paths.get(
      "/root/repo/target/scratch-test/derby")
    java.nio.file.Files.createDirectories(derbyHome)
    System.setProperty("derby.system.home", derbyHome.toString)
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static conf: Thrift connections share this session's state so
      // temp views / published warehouse tables resolve (ThriftGateway)
      .config("spark.sql.hive.thriftServer.singleSession", "true")
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
