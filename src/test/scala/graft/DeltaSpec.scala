package graft

import graft.sources.{DeltaRead, DeltaWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.sources.DeltaRead/DeltaWrite — read-only interop with the
  * public Delta Lake log protocol: add/remove replay, time travel,
  * partitionValues attachment, single-file checkpoint bounds, and
  * LOUD rejection of features this reader would otherwise misread
  * (deletion vectors, column mapping).
  */
class DeltaSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def dir(): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    java.nio.file.Files.createTempDirectory(base, "delta").toString
  }

  test("add/remove replay yields the live snapshot; versionAsOf " +
      "time-travels; removed rows never dup") {
    val d = dir()
    DeltaWrite.commit(d, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    DeltaWrite.commit(d, 1L,
      adds = Seq("f1.parquet" -> Seq((1L, "a2"), (3L, "c")).toDF("id", "v")),
      removes = Seq("f0.parquet"))
    val now = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(now == Seq((1L, "a2"), (3L, "c")),
      s"remove tombstone not honored: $now")
    val v0 = DeltaRead.readDeltaTable(spark, d, versionAsOf = Some(0L))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(v0 == Seq((1L, "a"), (2L, "b")), s"time travel wrong: $v0")
    // unknown version fails loudly
    intercept[IllegalArgumentException](
      DeltaRead.readDeltaTable(spark, d, versionAsOf = Some(9L)))
  }

  test("log-declared schema wins; the scan prunes and pushes down") {
    val d = dir()
    DeltaWrite.commit(d, 0L, Seq("f0.parquet" ->
      spark.read.parquet(s"$sf/nation.parquet")))
    val df = DeltaRead.readDeltaTable(spark, d)
      .filter(col("n_regionkey") === 1).select("n_name")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_regionkey), " +
      "EqualTo(n_regionkey,1)]"), plan.take(2000))
    assert(plan.contains("ReadSchema: struct<n_name:string,n_regionkey:int>")
      || plan.contains("ReadSchema: struct<n_regionkey:int,n_name:string>"),
      plan.take(2000))
    assert(df.count() == 5)
  }

  test("partitioned table: partition values come from the LOG, not " +
      "the file paths") {
    val d = dir()
    // hand-written log: the data files do NOT encode the partition
    // column (the spec allows this; path-derived readers misread it)
    val part = (seg: String, rows: Seq[(Long, Double)]) =>
      rows.toDF("id", "x")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("x", "double").add("seg", "string")
    Seq(("A", Seq((1L, 1.5), (2L, 2.5))), ("B", Seq((3L, 3.5))))
      .zipWithIndex.foreach { case ((seg, rows), i) =>
        // write bare data files first
        DeltaWrite.commit(s"$d-stage$i", 0L,
          Seq(s"f$i.parquet" -> part(seg, rows)))
        java.nio.file.Files.move(
          java.nio.file.Paths.get(s"$d-stage$i", s"f$i.parquet"),
          { val t = java.nio.file.Paths.get(d, s"f$i.parquet")
            java.nio.file.Files.createDirectories(t.getParent); t })
      }
    val log = java.nio.file.Paths.get(d, "_delta_log")
    java.nio.file.Files.createDirectories(log)
    java.nio.file.Files.writeString(log.resolve(f"${0L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(org.json4s.JString(schema.json)))},"partitionColumns":["seg"],"configuration":{},"createdTime":0}}
         |{"add":{"path":"f0.parquet","partitionValues":{"seg":"A"},"size":1,"modificationTime":0,"dataChange":true}}
         |{"add":{"path":"f1.parquet","partitionValues":{"seg":"B"},"size":1,"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    val got = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, Double, String)].collect().toSeq
    assert(got == Seq((1L, 1.5, "A"), (2L, 2.5, "A"), (3L, 3.5, "B")),
      s"log partition values not attached: $got")
  }

  test("percent-encoded add paths decode per the protocol") {
    val d = dir()
    // stage the data file under its DECODED name, log the encoded form
    DeltaWrite.commit(d, 0L, Seq(
      "tmp.parquet" -> Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(d, "tmp.parquet"),
      java.nio.file.Paths.get(d, "f a.parquet"))
    val log = java.nio.file.Paths.get(d, "_delta_log")
    java.nio.file.Files.writeString(log.resolve(f"${1L}%020d.json"),
      """{"add":{"path":"f%20a.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}
        |{"remove":{"path":"tmp.parquet","deletionTimestamp":0,"dataChange":true}}
        |""".stripMargin)
    val got = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b")),
      s"encoded path not decoded: $got")
  }

  test("single-file checkpoint bounds the replay") {
    val d = dir()
    DeltaWrite.commit(d, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a")).toDF("id", "v")))
    DeltaWrite.commit(d, 1L,
      adds = Seq("f1.parquet" -> Seq((2L, "b")).toDF("id", "v")),
      removes = Seq("f0.parquet"))
    // write a version-1 checkpoint in Delta's parquet action shape,
    // then DELETE the replayed JSON commits — only a reader that
    // starts from the checkpoint can still resolve the snapshot
    val state = Seq(
      ("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", "p"),
      (s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(org.json4s.JString(Seq((1L, "a")).toDF("id", "v").schema.json)))},"partitionColumns":[],"configuration":{},"createdTime":0}}""", "m"),
      ("""{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""", "a"))
    val ckDf = spark.read.json(state.map(_._1).toDS())
    val log = java.nio.file.Paths.get(d, "_delta_log")
    ckDf.coalesce(1).write.mode("overwrite")
      .parquet(s"$d/_ck_stage")
    import scala.jdk.CollectionConverters._
    val s0 = java.nio.file.Files.list(java.nio.file.Paths.get(s"$d/_ck_stage"))
    val partF = try s0.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    finally s0.close()
    java.nio.file.Files.move(partF,
      log.resolve(f"${1L}%020d.checkpoint.parquet"))
    java.nio.file.Files.delete(log.resolve(f"${0L}%020d.json"))
    java.nio.file.Files.delete(log.resolve(f"${1L}%020d.json"))
    val got = DeltaRead.readDeltaTable(spark, d)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "b")), s"checkpoint replay wrong: $got")
  }

  test("deletion vectors and column mapping are rejected loudly, " +
      "never silently misread") {
    val d = dir()
    DeltaWrite.commit(d, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a")).toDF("id", "v")))
    val log = java.nio.file.Paths.get(d, "_delta_log")
    java.nio.file.Files.writeString(log.resolve(f"${1L}%020d.json"),
      """{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"x","offset":1,"sizeInBytes":1,"cardinality":1}}}
        |""".stripMargin)
    val e = intercept[IllegalArgumentException](
      DeltaRead.readDeltaTable(spark, d))
    assert(e.getMessage.contains("deletion vectors"))

    val d2 = dir()
    DeltaWrite.commit(d2, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a")).toDF("id", "v")))
    val log2 = java.nio.file.Paths.get(d2, "_delta_log")
    java.nio.file.Files.writeString(log2.resolve(f"${1L}%020d.json"),
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(org.json4s.JString(Seq((1L, "a")).toDF("id", "v").schema.json)))},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}
         |""".stripMargin)
    val e2 = intercept[IllegalArgumentException](
      DeltaRead.readDeltaTable(spark, d2))
    assert(e2.getMessage.contains("column mapping"))
  }
}
