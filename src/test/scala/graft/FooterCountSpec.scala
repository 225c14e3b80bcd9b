package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{DeltaRead, DeltaWrite, IcebergRead, IcebergWrite}

/** Pins the footer-derived row-count mechanism that replaced the
  * dedicated `batch.count()` job on every lakehouse write path: the
  * returned "rows affected" must equal the batch's true row count
  * (parquet block counts are exact by the format), and the staged-
  * write-emptiness test must preserve the no-op-commits-nothing
  * contract without leaving stray staged files behind.
  */
class FooterCountSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def dir(): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    java.nio.file.Files.createTempDirectory(base, "footercount").toString +
      "/t"
  }

  private def logCommits(d: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(d, "_delta_log")
    val s = java.nio.file.Files.list(p)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".json")).toSet
    finally s.close()
  }

  private def parquetFilesUnder(d: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(d)
    if (!java.nio.file.Files.isDirectory(p)) Nil
    else {
      val w = java.nio.file.Files.walk(p)
      try w.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq
      finally w.close()
    }
  }

  test("Delta merge/replace/mergeOnRead return the exact batch row " +
      "count without a count job, and empty batches leave no file") {
    val d = dir()
    val b1 = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    assert(DeltaWrite.merge(spark, d, b1, Seq("id")) == 100L)
    val b2 = (50L to 120L).map(i => (i, "u")).toDF("id", "v")
    assert(DeltaWrite.merge(spark, d, b2, Seq("id")) == 71L)
    // empty merge: returns 0, no commit, no stray staged file
    val filesBefore = parquetFilesUnder(d).toSet
    val verBefore = logCommits(d)
    assert(DeltaWrite.merge(spark, d,
      Seq.empty[(Long, String)].toDF("id", "v"), Seq("id")) == 0L)
    assert(logCommits(d) == verBefore, "empty merge committed")
    assert(parquetFilesUnder(d).toSet == filesBefore,
      "empty merge left a stray staged file")
    // replace returns the new row count; empty replace adds no file
    val d2 = dir()
    assert(DeltaWrite.replace(spark, d2,
      (1L to 7L).map(i => (i, "x")).toDF("id", "v")) == 7L)
    val files2 = parquetFilesUnder(d2).toSet
    assert(DeltaWrite.replace(spark, d2,
      Seq.empty[(Long, String)].toDF("id", "v")) == 0L)
    assert(parquetFilesUnder(d2).toSet == files2,
      "empty replace left a data file behind")
    assert(DeltaRead.readDeltaTable(spark, d2).count() == 0L,
      "empty replace must still replace (empty table)")
    // mergeOnRead returns the batch count; an empty one commits
    // nothing and deletes its probe file
    val d3 = dir()
    DeltaWrite.merge(spark, d3,
      (1L to 10L).map(i => (i, "a")).toDF("id", "v"), Seq("id")): Unit
    assert(DeltaWrite.mergeOnRead(spark, d3,
      (5L to 8L).map(i => (i, "b")).toDF("id", "v"), Seq("id")) == 4L)
    val ver3 = logCommits(d3)
    val files3 = parquetFilesUnder(d3).toSet
    assert(DeltaWrite.mergeOnRead(spark, d3,
      Seq.empty[(Long, String)].toDF("id", "v"), Seq("id")) == 0L)
    assert(logCommits(d3) == ver3, "empty MoR committed")
    assert(parquetFilesUnder(d3).toSet == files3,
      "empty mergeOnRead left its probe file behind")
  }

  test("Iceberg merge/replace/mergeOnRead return the exact batch row " +
      "count; empty merges commit no snapshot") {
    val d = dir()
    val b1 = (1L to 60L).map(i => (i, s"v$i")).toDF("id", "v")
    assert(IcebergWrite.merge(spark, d, b1, Seq("id")) == 60L)
    assert(IcebergWrite.merge(spark, d,
      (30L to 90L).map(i => (i, "u")).toDF("id", "v"), Seq("id")) == 61L)
    val hint = java.nio.file.Paths.get(d, "metadata", "version-hint.text")
    val verBefore = java.nio.file.Files.readString(hint).trim
    assert(IcebergWrite.merge(spark, d,
      Seq.empty[(Long, String)].toDF("id", "v"), Seq("id")) == 0L)
    assert(java.nio.file.Files.readString(hint).trim == verBefore,
      "empty Iceberg merge committed a snapshot")
    // replace + overwrite row counts
    val d2 = dir()
    assert(IcebergWrite.replace(spark, d2,
      (1L to 9L).map(i => (i, "x")).toDF("id", "v")) == 9L)
    // mergeOnRead (both branches: creation, then upsert)
    val d3 = dir()
    assert(IcebergWrite.mergeOnRead(spark, d3,
      (1L to 12L).map(i => (i, "a")).toDF("id", "v"), Seq("id")) == 12L)
    assert(IcebergWrite.mergeOnRead(spark, d3,
      (10L to 14L).map(i => (i, "b")).toDF("id", "v"), Seq("id")) == 5L)
    assert(IcebergRead.readIcebergTable(spark, d3).count() == 14L)
  }

  test("partitioned Delta merge and dynamic partition overwrite " +
      "report footer-exact counts") {
    val d = dir()
    val b1 = (1L to 40L).map(i => (i, if (i % 2 == 0) "E" else "O", i * 1.0))
      .toDF("id", "p", "x")
    assert(DeltaWrite.merge(spark, d, b1, Seq("id"),
      partitionBy = Seq("p")) == 40L)
    assert(DeltaWrite.merge(spark, d,
      (2L to 10L by 2).map(i => (i, "E", -1.0)).toDF("id", "p", "x"),
      Seq("id")) == 5L)
    val ow = (1L to 7L by 2).map(i => (i, "O", 9.9)).toDF("id", "p", "x")
    assert(DeltaWrite.overwritePartitions(spark, d, ow) == 4L)
    assert(DeltaWrite.overwritePartitions(spark, d,
      Seq.empty[(Long, String, Double)].toDF("id", "p", "x")) == 0L)
  }
}
