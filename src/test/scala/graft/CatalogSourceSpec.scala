package graft

import graft.sources.{DeltaRead, DeltaWrite, IcebergRead}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The writable `USING delta`/`USING iceberg` catalog sources'
  * INSERT/OVERWRITE surface: SQL `PARTITIONED BY` CTAS carries the
  * partition spec (Spark's v1 CTAS path drops it without
  * `CtasPartitioningRoute`), dynamic partition overwrite swaps ONLY
  * the batch's partitions (untouched files byte-identical), static
  * overwrite preserves partitioning, the append valve compacts past
  * `maxLiveFiles`, and column-mapped Delta tables refuse INSERT
  * INTO / replace loudly.
  */
class CatalogSourceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def dir(prefix: String): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    java.nio.file.Files.createTempDirectory(base, prefix).toString
  }

  private def db(d: String): String = {
    val name = "g" + d.split('/').last
      .replaceAll("[^a-zA-Z0-9_]", "_").toLowerCase
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $name LOCATION '$d'")
    name
  }

  private def filesOf(tableDir: String): Map[String, Array[Byte]] = {
    val root = java.nio.file.Paths.get(tableDir)
    val w = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      w.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString ->
          java.nio.file.Files.readAllBytes(p))
        .toMap
    } finally w.close()
  }

  test("SQL PARTITIONED BY CTAS records the partition spec, and " +
      "dynamic INSERT OVERWRITE swaps ONLY the batch's partitions — " +
      "untouched partitions' files byte-identical (delta + iceberg)") {
    val d = dir("cat_dynover")
    val g = db(d)
    try {
      spark.sql(s"CREATE TABLE $g.t USING delta PARTITIONED BY (seg) " +
        "AS SELECT id, seg FROM VALUES (1L,'a'),(2L,'b'),(3L,'b') " +
        "AS t(id, seg)")
      assert(DeltaRead.partitionColumns(spark, s"$d/t") == Seq("seg"),
        "SQL PARTITIONED BY was dropped on the delta CTAS")
      val before = filesOf(s"$d/t")
      val bFiles = before.filter(_._1.contains("seg=b"))
      assert(bFiles.nonEmpty, "fixture needs a seg=b file")
      spark.sql("SET spark.sql.sources.partitionOverwriteMode=dynamic")
      try spark.sql(s"INSERT OVERWRITE TABLE $g.t " +
        "SELECT id, seg FROM VALUES (9L,'a') AS t(id, seg)")
      finally spark.sql(
        "SET spark.sql.sources.partitionOverwriteMode=static")
      val got = spark.sql(s"SELECT id, seg FROM $g.t ORDER BY id")
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((2L, "b"), (3L, "b"), (9L, "a")), got.toString)
      val after = filesOf(s"$d/t")
      bFiles.foreach { case (rel, bytes) =>
        assert(after.contains(rel), s"untouched partition file $rel gone")
        assert(java.util.Arrays.equals(after(rel), bytes),
          s"untouched partition file $rel rewritten")
      }
      // ---- iceberg side: spec recorded, dynamic swap, snapshot kept
      spark.sql(s"CREATE TABLE $g.ti USING iceberg PARTITIONED BY (seg)" +
        " AS SELECT id, seg FROM VALUES (1L,'a'),(2L,'b') AS t(id, seg)")
      assert(IcebergRead.tablePartitionCols(s"$d/ti") == Seq("seg"),
        "SQL PARTITIONED BY was dropped on the iceberg CTAS")
      val beforeIce = filesOf(s"$d/ti")
      spark.sql("SET spark.sql.sources.partitionOverwriteMode=dynamic")
      try spark.sql(s"INSERT OVERWRITE TABLE $g.ti " +
        "SELECT id, seg FROM VALUES (9L,'a') AS t(id, seg)")
      finally spark.sql(
        "SET spark.sql.sources.partitionOverwriteMode=static")
      val gotIce = spark.sql(s"SELECT id, seg FROM $g.ti ORDER BY id")
        .as[(Long, String)].collect().toSeq
      assert(gotIce == Seq((2L, "b"), (9L, "a")), gotIce.toString)
      beforeIce.filter(_._1.contains("seg=b")).foreach { case (rel, bytes) =>
        assert(filesOf(s"$d/ti").get(rel).exists(
          java.util.Arrays.equals(_, bytes)),
          s"untouched iceberg partition file $rel changed")
      }
    } finally spark.sql(s"DROP DATABASE IF EXISTS $g CASCADE")
  }

  test("static INSERT OVERWRITE on a partitioned catalog table " +
      "replaces the WHOLE table but PRESERVES its partitioning " +
      "(read from the table's own metadata, not write options)") {
    val d = dir("cat_statover")
    val g = db(d)
    try {
      spark.sql(s"CREATE TABLE $g.t USING delta PARTITIONED BY (seg) " +
        "AS SELECT id, seg FROM VALUES (1L,'a'),(2L,'b') AS t(id, seg)")
      spark.sql(s"INSERT OVERWRITE TABLE $g.t " +
        "SELECT id, seg FROM VALUES (7L,'c') AS t(id, seg)")
      val got = spark.sql(s"SELECT id, seg FROM $g.t ORDER BY id")
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((7L, "c")), got.toString)
      assert(DeltaRead.partitionColumns(spark, s"$d/t") == Seq("seg"),
        "static INSERT OVERWRITE re-created the table unpartitioned")
      // prior state stays time-travelable (replace, not truncate)
      assert(DeltaRead.readDeltaTable(spark, s"$d/t",
        versionAsOf = Some(0L)).count() == 2L)
    } finally spark.sql(s"DROP DATABASE IF EXISTS $g CASCADE")
  }

  test("append small-file valve: N INSERT INTOs leave at most " +
      "maxLiveFiles live files, contents intact (delta + iceberg)") {
    val d = dir("cat_valve")
    val g = db(d)
    try {
      spark.sql(s"CREATE TABLE $g.t USING delta AS " +
        "SELECT CAST(0 AS BIGINT) AS id")
      (1 to 40).foreach(i =>
        spark.sql(s"INSERT INTO $g.t SELECT CAST($i AS BIGINT)"))
      val live = DeltaRead.liveDataFilesAll(spark, s"$d/t")
      assert(live.size <= 32,
        s"append valve never compacted: ${live.size} live files")
      assert(spark.sql(s"SELECT id FROM $g.t ORDER BY id")
        .as[Long].collect().toSeq == (0L to 40L),
        "compaction changed the table contents")

      spark.sql(s"CREATE TABLE $g.ti USING iceberg AS " +
        "SELECT CAST(0 AS BIGINT) AS id")
      (1 to 40).foreach(i =>
        spark.sql(s"INSERT INTO $g.ti SELECT CAST($i AS BIGINT)"))
      val st = graft.sources.IcebergRead.snapshotState(s"$d/ti", None)
      assert(st.dataFiles.size <= 32,
        s"iceberg append valve never compacted: ${st.dataFiles.size}")
      assert(spark.sql(s"SELECT id FROM $g.ti ORDER BY id")
        .as[Long].collect().toSeq == (0L to 40L),
        "iceberg compaction changed the table contents")
    } finally spark.sql(s"DROP DATABASE IF EXISTS $g CASCADE")
  }

  test("column-mapped Delta tables refuse INSERT INTO and CREATE OR " +
      "REPLACE loudly (logical-named writes would surface NULLs to " +
      "physical-name readers)") {
    import org.apache.spark.sql.types._
    val d = dir("cat_mapped")
    def meta(phys: String, id: Int) = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id.toLong).build()
    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true, meta("col-aaa", 1)),
      StructField("v", StringType, nullable = true, meta("col-bbb", 2))))
    val data = Seq((1L, "x")).toDF("a", "b")
      .select(col("a").as("col-aaa"), col("b").as("col-bbb"))
    DeltaWrite.commit(s"$d-stage", 0L, Seq("f0.parquet" -> data))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$d-stage", "f0.parquet"),
      java.nio.file.Paths.get(d, "f0.parquet"))
    val log = java.nio.file.Paths.get(d, "_delta_log")
    java.nio.file.Files.createDirectories(log)
    val schemaJson = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        org.json4s.JString(logical.json)))
    java.nio.file.Files.writeString(log.resolve(f"${0L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
         |{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":$schemaJson,"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}
         |{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    // the fixture reads fine (mapped scan)
    assert(DeltaRead.readDeltaTable(spark, d).count() == 1L)
    // INSERT INTO through the catalog source's append path refuses
    val e1 = intercept[Exception](
      Seq((2L, "y")).toDF("id", "v").write.format("delta")
        .mode("append").save(d))
    assert(e1.getMessage.contains("column-mapped"), e1.getMessage)
    // CREATE OR REPLACE through the engine replace refuses
    val e2 = intercept[IllegalArgumentException](
      DeltaWrite.replace(spark, d, Seq((2L, "y")).toDF("id", "v")))
    assert(e2.getMessage.contains("column-mapped"), e2.getMessage)
    // nothing was committed by either refusal
    val commits = {
      val st = java.nio.file.Files.list(log)
      try st.filter(p =>
        p.getFileName.toString.matches("\\d{20}\\.json")).count()
      finally st.close()
    }
    assert(commits == 1L, s"a refusal still committed: $commits")
  }
}
