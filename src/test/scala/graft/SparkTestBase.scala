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
      // Thrift connections get their OWN sessions (real HS2 shape);
      // published warehouse tables resolve by bare name through the
      // global-temp-view fallback rule (ThriftGateway posture)
      .config("spark.sql.extensions", "graft.gateway.GraftSqlExtensions")
      // HS2's embedded metastore (Spark's auto-generated in-memory
      // derby URL) fails create-retries on every per-connection
      // SessionState teardown; the default 10×2s handler retries turn
      // that into a 20s+ stall per close and starve later server
      // starts. The failure is harmless (scratch metastore) — fail
      // FAST instead of retrying.
      .config("spark.hadoop.hive.hmshandler.retry.attempts", "1")
      .config("spark.hadoop.hive.hmshandler.retry.interval", "0s")
      .config("spark.hadoop.hive.metastore.connect.retries", "1")
      // catalog tables (CTAS through the gateways, join_bucketed)
      // land in scratch, never the repo root
      .config("spark.sql.warehouse.dir",
        "/root/repo/target/scratch-test/spark-warehouse")
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
