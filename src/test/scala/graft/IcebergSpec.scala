package graft

import graft.sources.{IcebergRead, IcebergWrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.sources.IcebergRead/IcebergWrite — interop with the public
  * Apache Iceberg table spec: metadata JSON + avro
  * manifest-list/manifest replay, snapshot time travel, v2 position
  * AND equality deletes, changelog derivation, copy-on-write and
  * merge-on-read MERGE writers, and LOUD rejection of surfaces this
  * code would otherwise misread (unknown types, future format
  * versions).
  */
class IcebergSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def dir(): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    java.nio.file.Files.createTempDirectory(base, "iceberg").toString
  }

  test("add/remove commits yield the live snapshot; snapshot ids " +
      "time-travel; unknown snapshot fails loudly") {
    val d = dir()
    val s1 = IcebergWrite.commit(d, Seq(
      "f0.parquet" -> Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    val s2 = IcebergWrite.commit(d,
      adds = Seq("f1.parquet" -> Seq((1L, "a2"), (3L, "c")).toDF("id", "v")),
      removes = Seq("f0.parquet"))
    assert(s1 == 1L && s2 == 2L)
    val now = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(now == Seq((1L, "a2"), (3L, "c")), s"live snapshot wrong: $now")
    val v1 = IcebergRead.readIcebergTable(spark, d, snapshotId = Some(s1))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(v1 == Seq((1L, "a"), (2L, "b")), s"time travel wrong: $v1")
    intercept[IllegalArgumentException](
      IcebergRead.readIcebergTable(spark, d, snapshotId = Some(99L)))
    // removing an unknown file fails loudly, not silently
    intercept[IllegalArgumentException](
      IcebergWrite.commit(d, Nil, removes = Seq("nope.parquet")))
  }

  test("predicate-driven FILE PRUNING: manifest column bounds prune " +
      "the file list before the scan; bounds survive carry-forward " +
      "rewrites; results match the unpruned filter exactly") {
    val d = dir()
    val nat = spark.read.parquet("/root/testdata/sf0.01/nation.parquet")
    IcebergWrite.commit(d, Seq(
      "f0.parquet" -> nat.filter(col("n_nationkey") < 5),
      "f1.parquet" -> nat.filter(col("n_nationkey").between(5, 9)),
      "f2.parquet" -> nat.filter(col("n_nationkey").between(10, 14)),
      "f3.parquet" -> nat.filter(col("n_nationkey") >= 15)))
    val pred = col("n_nationkey") >= 10 && col("n_nationkey") < 15
    val df = IcebergRead.readIcebergTable(spark, d, predicate = Some(pred))
    assert(df.inputFiles.map(_.split('/').last).toSet == Set("f2.parquet"),
      s"bounds pruning read: ${df.inputFiles.mkString(", ")}")
    val expect = IcebergRead.readIcebergTable(spark, d).filter(pred)
      .orderBy("n_nationkey").collect().toSeq
    assert(df.orderBy("n_nationkey").collect().toSeq == expect)

    // a second commit rewrites the manifest carry-forward — bounds
    // must survive on carried entries, so pruning still works
    IcebergWrite.commit(d,
      adds = Seq("f4.parquet" -> nat.filter(col("n_nationkey") < 0)),
      removes = Seq("f3.parquet"))
    val again = IcebergRead.readIcebergTable(spark, d, predicate = Some(pred))
    assert(again.inputFiles.map(_.split('/').last).toSet == Set("f2.parquet"),
      s"carried bounds lost: ${again.inputFiles.mkString(", ")}")

    // string bounds prune too
    val twoLow = nat.filter(col("n_nationkey") < 5)
      .select("n_name").as[String].collect().sorted.take(2).toSeq
    val byName = IcebergRead.readIcebergTable(spark, d,
      predicate = Some(col("n_name").isin(twoLow: _*)))
    assert(byName.inputFiles.map(_.split('/').last).toSet == Set("f0.parquet"),
      byName.inputFiles.mkString(", "))

    // no file can match → empty scan, schema intact
    val none = IcebergRead.readIcebergTable(spark, d,
      predicate = Some(col("n_nationkey") < -1))
    assert(none.inputFiles.isEmpty && none.count() == 0)
    assert(none.schema == IcebergRead.readIcebergTable(spark, d).schema)
  }

  test("adds colliding with ANY existing data/ file are rejected — " +
      "live or previously removed (older snapshots still reference " +
      "the bytes)") {
    val d = dir()
    IcebergWrite.commit(d, Seq(
      "f0.parquet" -> Seq((1L, "a")).toDF("id", "v")))
    // live collision
    val e1 = intercept[IllegalArgumentException](IcebergWrite.commit(d,
      adds = Seq("f0.parquet" -> Seq((9L, "z")).toDF("id", "v"))))
    assert(e1.getMessage.contains("fresh name"), e1.getMessage)
    // remove, then re-add the SAME name: the parquet under data/ is
    // still referenced by snapshot 1 — must reject, not overwrite
    IcebergWrite.commit(d,
      adds = Seq("f1.parquet" -> Seq((2L, "b")).toDF("id", "v")),
      removes = Seq("f0.parquet"))
    val e2 = intercept[IllegalArgumentException](IcebergWrite.commit(d,
      adds = Seq("f0.parquet" -> Seq((9L, "z")).toDF("id", "v"))))
    assert(e2.getMessage.contains("retained snapshots"), e2.getMessage)
    // time travel to snapshot 1 still reads the original bytes
    val v1 = IcebergRead.readIcebergTable(spark, d, snapshotId = Some(1L))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(v1 == Seq((1L, "a")), s"snapshot 1 corrupted: $v1")
  }

  test("v2 position deletes mask physical rows; deletes carry " +
      "forward across later commits") {
    val d = dir()
    IcebergWrite.commit(d, Seq(
      "f0.parquet" -> Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
        .toDF("id", "v")))
    // mask physical rows 1 and 3 of f0 (ids 2 and 4)
    IcebergWrite.commit(d, Nil,
      positionDeletes = Map("f0.parquet" -> Seq(1L, 3L)))
    val got = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (3L, "c")), s"position deletes lost: $got")
    // a later plain append must keep the existing deletes live
    IcebergWrite.commit(d, Seq(
      "f1.parquet" -> Seq((5L, "e")).toDF("id", "v")))
    val after = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(after == Seq((1L, "a"), (3L, "c"), (5L, "e")),
      s"deletes not carried forward: $after")
    // pre-delete snapshot still shows all rows
    val v1 = IcebergRead.readIcebergTable(spark, d, snapshotId = Some(1L))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(v1.map(_._1) == Seq(1L, 2L, 3L, 4L))
  }

  test("schema fidelity: metadata-declared types round-trip and the " +
      "scan prunes/pushes down") {
    val d = dir()
    val df = Seq(
      (1L, 10, "x", 1.5, BigDecimal("12.34"), java.sql.Date.valueOf("2024-01-02")),
      (2L, 20, "y", 2.5, BigDecimal("56.78"), java.sql.Date.valueOf("2024-03-04")))
      .toDF("id", "n", "s", "x", "dec", "dt")
      .withColumn("dec", col("dec").cast("decimal(10,2)"))
    IcebergWrite.commit(d, Seq("f0.parquet" -> df))
    val back = IcebergRead.readIcebergTable(spark, d)
    assert(back.schema("dec").dataType ==
      org.apache.spark.sql.types.DecimalType(10, 2))
    assert(back.schema("dt").dataType ==
      org.apache.spark.sql.types.DateType)
    assert(back.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val q = back.filter(col("n") === 20).select("s")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n), EqualTo(n,20)]"),
      plan.take(2000))
    assert(q.as[String].collect().toSeq == Seq("y"))
  }

  test("v2 equality deletes: matching earlier-sequence rows vanish, " +
      "same/later-sequence rows survive (strict ordering), deletes " +
      "carry forward and time travel restores") {
    val d = dir()
    IcebergWrite.commit(d, Seq(
      "f0.parquet" -> Seq((1L, "x"), (2L, "y"), (3L, "x"), (4L, "z"))
        .toDF("id", "cat")))
    // snapshot 2: delete every row with cat = 'x'
    IcebergWrite.commit(d, Nil,
      equalityDelete = Some(Seq("cat") -> Seq(Tuple1("x")).toDF("cat")))
    val got = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "y"), (4L, "z")), s"equality delete wrong: $got")
    // snapshot 3: a NEW 'x' row lands AFTER the delete's sequence —
    // the strict < rule must keep it while still masking the old ones
    IcebergWrite.commit(d, Seq(
      "f1.parquet" -> Seq((5L, "x")).toDF("id", "cat")))
    val after = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(after == Seq((2L, "y"), (4L, "z"), (5L, "x")),
      s"sequence strictness violated: $after")
    // pre-delete snapshot shows everything
    val v1 = IcebergRead.readIcebergTable(spark, d, snapshotId = Some(1L))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(v1.map(_._1) == Seq(1L, 2L, 3L, 4L))
    // NULL-safe matching: deleting cat IS NULL rows works too
    IcebergWrite.commit(d, Seq(
      "f2.parquet" -> Seq((6L, Option.empty[String]), (7L, Some("w")))
        .toDF("id", "cat")))
    IcebergWrite.commit(d, Nil,
      equalityDelete = Some(
        Seq("cat") -> Seq(Tuple1(Option.empty[String])).toDF("cat")))
    val nulls = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, Option[String])].collect().toSeq
    assert(nulls.map(_._1) == Seq(2L, 4L, 5L, 7L),
      s"null-safe equality delete wrong: $nulls")
    // unknown equality column fails loudly at write
    intercept[RuntimeException](IcebergWrite.commit(d, Nil,
      equalityDelete = Some(Seq("nope") -> Seq(Tuple1("a")).toDF("nope"))))
    // plan shape: the equality anti-join is a HASH join on the
    // null-safe keys with the sequence bound as residual condition —
    // never a nested-loop scan of data × deletes
    val planDf = IcebergRead.readIcebergTable(spark, d)
    planDf.count()
    val plan = planDf.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("LeftAnti"), plan.take(3000))
  }

  test("unsupported surfaces are rejected loudly: format-version 4, " +
      "unknown types, malformed equality deletes") {
    val d = dir()
    IcebergWrite.commit(d, Seq(
      "f0.parquet" -> Seq((1L, "a")).toDF("id", "v")))
    val metaFile = java.nio.file.Paths.get(d, "metadata", "v1.metadata.json")
    val metaText = java.nio.file.Files.readString(metaFile)

    // future format version (v3 now reads within scope — see the
    // deletion-vector test)
    java.nio.file.Files.writeString(metaFile,
      metaText.replace("\"format-version\" : 2", "\"format-version\" : 4"))
    val e1 = intercept[RuntimeException](
      IcebergRead.readIcebergTable(spark, d))
    assert(e1.getMessage.contains("format-version"), e1.getMessage)

    // unknown column type
    java.nio.file.Files.writeString(metaFile,
      metaText.replace("\"type\" : \"string\"", "\"type\" : \"uuid\""))
    val e2 = intercept[RuntimeException](
      IcebergRead.readIcebergTable(spark, d))
    assert(e2.getMessage.contains("uuid"), e2.getMessage)
    java.nio.file.Files.writeString(metaFile, metaText) // restore

    // a malformed equality delete (content=2 without equality_ids):
    // hand-craft the delete manifest and splice it into a snapshot
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |    {"name":"content","type":"int"},
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"record_count","type":"long"}
        |  ]}}
        |]}""".stripMargin)
    val eqMan = java.nio.file.Paths.get(d, "metadata", "manifest-eq.avro")
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](entrySchema))
    w.create(entrySchema, eqMan.toFile)
    val rec = new org.apache.avro.generic.GenericData.Record(entrySchema)
    val dfr = new org.apache.avro.generic.GenericData.Record(
      entrySchema.getField("data_file").schema())
    dfr.put("content", 2) // EQUALITY_DELETES
    dfr.put("file_path", s"file://$d/data/eq-del.parquet")
    dfr.put("file_format", "PARQUET")
    dfr.put("record_count", 1L)
    rec.put("status", 1)
    rec.put("data_file", dfr)
    w.append(rec)
    w.close()
    val listSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |  {"name":"manifest_path","type":"string"},
        |  {"name":"manifest_length","type":"long"},
        |  {"name":"partition_spec_id","type":"int"},
        |  {"name":"content","type":"int"},
        |  {"name":"added_snapshot_id","type":"long"}
        |]}""".stripMargin)
    val eqList = java.nio.file.Paths.get(d, "metadata", "snap-eq-list.avro")
    val lw = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](listSchema))
    lw.create(listSchema, eqList.toFile)
    val lr = new org.apache.avro.generic.GenericData.Record(listSchema)
    lr.put("manifest_path", s"file://$eqMan")
    lr.put("manifest_length", java.nio.file.Files.size(eqMan))
    lr.put("partition_spec_id", 0)
    lr.put("content", 1)
    lr.put("added_snapshot_id", 2L)
    lw.append(lr)
    lw.close()
    val spliced = metaText
      .replace("\"current-snapshot-id\" : 1", "\"current-snapshot-id\" : 2")
      .replace("\"snapshots\" : [ {",
        s"""\"snapshots\" : [ {
           |    "snapshot-id" : 2,
           |    "sequence-number" : 2,
           |    "timestamp-ms" : 0,
           |    "summary" : { "operation" : "append" },
           |    "manifest-list" : "file://$eqList",
           |    "schema-id" : 0
           |  }, {""".stripMargin)
    java.nio.file.Files.writeString(metaFile, spliced)
    val e3 = intercept[RuntimeException](
      IcebergRead.readIcebergTable(spark, d))
    assert(e3.getMessage.contains("equality_ids"), e3.getMessage)
  }

  test("changelog: live-set diffs become INSERT/DELETE rows with " +
      "ordinal + snapshot id; sub-ranges replay only their snapshots") {
    val d = dir()
    IcebergWrite.commit(d, Seq(
      "f0.parquet" -> Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    IcebergWrite.commit(d,
      adds = Seq("f1.parquet" -> Seq((2L, "b2"), (3L, "c")).toDF("id", "v")),
      removes = Seq("f0.parquet"))
    IcebergWrite.commit(d, Seq(
      "f2.parquet" -> Seq((4L, "d")).toDF("id", "v")))
    val all = IcebergRead.readChanges(spark, d, 1L)
      .orderBy("_commit_snapshot_id", "_change_type", "id")
      .select("id", "v", "_change_type", "_change_ordinal",
        "_commit_snapshot_id")
      .as[(Long, String, String, Int, Long)].collect().toSeq
    assert(all == Seq(
      (1L, "a", "INSERT", 0, 1L), (2L, "b", "INSERT", 0, 1L),
      (1L, "a", "DELETE", 1, 2L), (2L, "b", "DELETE", 1, 2L),
      (2L, "b2", "INSERT", 1, 2L), (3L, "c", "INSERT", 1, 2L),
      (4L, "d", "INSERT", 2, 3L)), s"changelog wrong: $all")
    // a sub-range re-bases the ordinal and skips earlier snapshots
    val tail = IcebergRead.readChanges(spark, d, 2L, Some(3L))
      .orderBy("_commit_snapshot_id", "_change_type", "id")
      .select("id", "_change_type", "_change_ordinal")
      .as[(Long, String, Int)].collect().toSeq
    assert(tail == Seq(
      (1L, "DELETE", 0), (2L, "DELETE", 0), (2L, "INSERT", 0),
      (3L, "INSERT", 0), (4L, "INSERT", 1)), s"sub-range wrong: $tail")
    // single-snapshot range at the start: everything is an insert
    val head = IcebergRead.readChanges(spark, d, 1L, Some(1L))
    assert(head.filter(col("_change_type") =!= "INSERT").count() == 0)
    assert(head.count() == 2)
    // bad bounds fail loudly
    intercept[IllegalArgumentException](
      IcebergRead.readChanges(spark, d, 9L))
    intercept[IllegalArgumentException](
      IcebergRead.readChanges(spark, d, 3L, Some(1L)))
  }

  test("changelog: in-range EQUALITY deletes replay against the " +
      "parent snapshot into row-level DELETE rows; same-snapshot " +
      "adds survive; remove+eq-delete combos reject loudly") {
    val d = dir()
    IcebergWrite.commit(d, Seq(
      "f0.parquet" -> Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")))
    // Flink-style upsert commit: eq-delete id=2 + add the new image —
    // the add has the SAME sequence number, so it must survive
    IcebergWrite.commit(d,
      adds = Seq("f1.parquet" -> Seq((2L, "b2")).toDF("id", "v")),
      equalityDelete = Some(Seq("id") -> Seq(Tuple1(2L)).toDF("id")))
    val all = IcebergRead.readChanges(spark, d, 1L)
      .orderBy("_commit_snapshot_id", "_change_type", "id", "v")
      .select("id", "v", "_change_type", "_commit_snapshot_id")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(all == Seq(
      (1L, "a", "INSERT", 1L), (2L, "b", "INSERT", 1L),
      (3L, "c", "INSERT", 1L),
      (2L, "b", "DELETE", 2L), (2L, "b2", "INSERT", 2L)),
      s"equality-delete changelog wrong: $all")
    // the changelog agrees with the snapshot read's end state
    val live = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(live == Seq((1L, "a"), (2L, "b2"), (3L, "c")), live.toString)
    // a sub-range starting at the upsert replays against ITS parent
    val tail = IcebergRead.readChanges(spark, d, 2L)
      .orderBy("_change_type", "v")
      .select("id", "v", "_change_type").as[(Long, String, String)]
      .collect().toSeq
    assert(tail == Seq((2L, "b", "DELETE"), (2L, "b2", "INSERT")),
      s"sub-range eq replay wrong: $tail")
    // remove + equality delete in ONE snapshot would double-emit
    // rows living in the removed file — loud rejection
    IcebergWrite.commit(d, Nil,
      removes = Seq("f0.parquet"),
      equalityDelete = Some(Seq("id") -> Seq(Tuple1(1L)).toDF("id")))
    val e = intercept[RuntimeException](IcebergRead.readChanges(spark, d, 1L))
    assert(e.getMessage.contains("double-emit"), e.getMessage)
    // ...but a range below the mixed snapshot still reads fine
    assert(IcebergRead.readChanges(spark, d, 1L, Some(2L)).count() == 5)
  }

  test("changelog: in-range position deletes emit row-level DELETE " +
      "rows; pre-range deletes don't re-emit") {
    val d = dir()
    IcebergWrite.commit(d, Seq(
      "f0.parquet" -> Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
        .toDF("id", "v")))
    IcebergWrite.commit(d, Nil,
      positionDeletes = Map("f0.parquet" -> Seq(1L))) // id 2
    IcebergWrite.commit(d, Nil,
      positionDeletes = Map("f0.parquet" -> Seq(3L))) // id 4
    val all = IcebergRead.readChanges(spark, d, 1L)
      .orderBy("_commit_snapshot_id", "id")
      .select("id", "_change_type", "_commit_snapshot_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(all == Seq(
      (1L, "INSERT", 1L), (2L, "INSERT", 1L), (3L, "INSERT", 1L),
      (4L, "INSERT", 1L), (2L, "DELETE", 2L), (4L, "DELETE", 3L)),
      s"position-delete changelog wrong: $all")
    // a range starting AFTER the first delete must not re-emit it
    val tail = IcebergRead.readChanges(spark, d, 3L)
      .select("id", "_change_type").as[(Long, String)].collect().toSeq
    assert(tail == Seq((4L, "DELETE")), s"pre-range delete re-emitted: $tail")
    // deleted-row VALUES come from the data file even when the row is
    // no longer live at the range's end
    val deleted = IcebergRead.readChanges(spark, d, 2L, Some(2L))
      .select("id", "v").as[(Long, String)].collect().toSeq
    assert(deleted == Seq((2L, "b")), s"deleted row image wrong: $deleted")
    // an equality delete composes with the position-delete history:
    // it replays against snapshot 3's live rows (ids 1 and 3 — 'c')
    IcebergWrite.commit(d, Nil,
      equalityDelete = Some(Seq("v") -> Seq(Tuple1("c")).toDF("v")))
    val withEq = IcebergRead.readChanges(spark, d, 1L)
      .filter(col("_commit_snapshot_id") === 4L)
      .select("id", "v", "_change_type").as[(Long, String, String)]
      .collect().toSeq
    assert(withEq == Seq((3L, "c", "DELETE")),
      s"eq-delete after position deletes wrong: $withEq")
  }

  test("changelog plan shape: a file added then removed in-range " +
      "scans ONCE and fans out through the non-unique broadcast map") {
    val d = dir()
    IcebergWrite.commit(d, Seq(
      "f0.parquet" -> Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    IcebergWrite.commit(d,
      adds = Seq("f1.parquet" -> Seq((9L, "z")).toDF("id", "v")),
      removes = Seq("f0.parquet"))
    val df = IcebergRead.readChanges(spark, d, 1L)
    val rows = df.orderBy("_commit_snapshot_id", "_change_type", "id")
      .select("id", "_change_type").as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "INSERT"), (2L, "INSERT"),
      (1L, "DELETE"), (2L, "DELETE"), (9L, "INSERT")), s"fan-out wrong: $rows")
    df.queryExecution.toRdd.count() // finalize THIS df's adaptive plan
    val report = graft.plans.PlanAudit.audit(df)
    // one multi-file scan for the whole-file changes (f0 listed for
    // both its insert and its delete, but scanned once) — no
    // per-snapshot union branches
    assert(report.scans == 1,
      s"expected 1 scan node, got ${report.scans}: ${report.summary}")
  }

  test("IcebergWrite.merge: CoW upsert into a real Iceberg table — " +
      "one atomic snapshot per merge, untouched files never " +
      "rewritten, time travel keeps every prior state, no-op batches " +
      "commit nothing, schema drift and delete-carrying tables " +
      "reject") {
    val d = dir()
    val b1 = (1L to 12L).map(i => (i, s"v$i")).toDF("id", "v")
    IcebergWrite.merge(spark, d, b1, Seq("id"), buckets = 4)
    val filesBefore = IcebergRead.readIcebergTable(spark, d)
      .inputFiles.toSet
    assert(filesBefore.size > 1,
      s"initial bucketing wrote one file: $filesBefore")
    def bytes(f: String) = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f.stripPrefix("file:")))
    val byteSnapshot = filesBefore.map(f => f -> bytes(f).toSeq).toMap

    IcebergWrite.merge(spark, d,
      Seq((1L, "V1"), (2L, "V2"), (100L, "V100")).toDF("id", "v"),
      Seq("id"))
    val now = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    val expect = ((3L to 12L).map(i => (i, s"v$i")) ++
      Seq((1L, "V1"), (2L, "V2"), (100L, "V100"))).sortBy(_._1)
    assert(now == expect, s"merged state wrong: $now")
    // untouched files carried byte-identically — O(touched), not O(table)
    val filesAfter = IcebergRead.readIcebergTable(spark, d)
      .inputFiles.toSet
    val carried = filesBefore.intersect(filesAfter)
    assert(carried.nonEmpty,
      "merge rewrote every file (O(table), not O(touched))")
    carried.foreach(f => assert(bytes(f).toSeq == byteSnapshot(f),
      s"carried file rewritten in place: $f"))
    // time travel to the pre-merge snapshot
    val v1 = IcebergRead.readIcebergTable(spark, d, snapshotId = Some(1L))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(v1 == b1.orderBy("id").as[(Long, String)].collect().toSeq,
      v1.toString)
    // empty batch: no snapshot
    val hint = java.nio.file.Paths.get(d, "metadata", "version-hint.text")
    val verBefore = java.nio.file.Files.readString(hint).trim
    IcebergWrite.merge(spark, d,
      Seq.empty[(Long, String)].toDF("id", "v"), Seq("id"))
    assert(java.nio.file.Files.readString(hint).trim == verBefore,
      "empty merge committed a snapshot")
    // schema drift rejects loudly
    val e = intercept[IllegalArgumentException](IcebergWrite.merge(spark, d,
      Seq((1L, 2L)).toDF("id", "other"), Seq("id")))
    assert(e.getMessage.contains("schema"), e.getMessage)
    // a table carrying live delete files rejects CoW merge loudly — a
    // rewrite that ignored them would resurrect deleted rows
    val d2 = dir()
    IcebergWrite.commit(d2, Seq("f0.parquet" ->
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    IcebergWrite.commit(d2, adds = Nil,
      positionDeletes = Map("f0.parquet" -> Seq(0L)))
    val e2 = intercept[IllegalArgumentException](IcebergWrite.merge(spark,
      d2, Seq((2L, "B")).toDF("id", "v"), Seq("id")))
    assert(e2.getMessage.contains("delete"), e2.getMessage)
  }

  test("OPTIMIZE compacts a merge-on-read table: deletes APPLY into " +
      "re-bucketed data files, the replace snapshot emits NO " +
      "changelog rows, reads drop the reconciliation join, time " +
      "travel still works") {
    val d = dir()
    IcebergWrite.mergeOnRead(spark, d,
      (1L to 8L).map(i => (i, s"v$i")).toDF("id", "v"), Seq("id"),
      maxLiveFiles = 5)
    // upserts accrete one data + one eq-delete file each; the cap
    // trips after a few runs and compacts
    (1 to 4).foreach(k => IcebergWrite.mergeOnRead(spark, d,
      Seq((k.toLong, s"u$k")).toDF("id", "v"), Seq("id"),
      maxLiveFiles = 5))
    val inFiles = IcebergRead.readIcebergTable(spark, d).inputFiles
    assert(!inFiles.exists(_.contains("eq-delete")),
      s"compaction must drop applied delete files: ${inFiles.mkString(", ")}")
    assert(inFiles.length <= 8,
      s"compaction did not bound data files: ${inFiles.length}")
    assert(inFiles.exists(_.contains("opt-")), inFiles.mkString(", "))
    val got = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == (1L to 8L).map(i =>
      (i, if (i <= 4) s"u$i" else s"v$i")), s"post-compaction state: $got")
    // the changelog over the whole history shows the real upserts
    // only — the replace snapshot contributes ZERO rows
    val hint = java.nio.file.Files.readString(
      java.nio.file.Paths.get(d, "metadata", "version-hint.text")).trim.toInt
    val changes = IcebergRead.readChanges(spark, d, 1L)
    val bySnap = changes.groupBy("_commit_snapshot_id").count()
      .as[(Long, Long)].collect().toMap
    // find the replace snapshot (summary operation) and assert silence
    val meta = org.json4s.jackson.JsonMethods.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        d, "metadata", s"v$hint.metadata.json")))
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val replaceIds = (meta \ "snapshots").children.filter(s =>
      (s \ "summary" \ "operation").extractOpt[String].contains("replace"))
      .map(s => (s \ "snapshot-id").extract[Long])
    assert(replaceIds.nonEmpty, "no replace snapshot written")
    replaceIds.foreach(id => assert(!bySnap.contains(id),
      s"replace snapshot $id leaked changelog rows: $bySnap"))
    // pre-compaction snapshots still read
    val s1 = IcebergRead.readIcebergTable(spark, d, snapshotId = Some(1L))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(s1 == (1L to 8L).map(i => (i, s"v$i")), s1.toString)
  }

  test("IcebergWrite.mergeOnRead: the Flink/CDC upsert shape — one " +
      "equality-delete file + one data file per merge, NO existing " +
      "data file read or rewritten, reader reconciles by sequence") {
    val d = dir()
    val b1 = (1L to 8L).map(i => (i, s"v$i")).toDF("id", "v")
    IcebergWrite.mergeOnRead(spark, d, b1, Seq("id"))
    val filesBefore = IcebergRead.readIcebergTable(spark, d)
      .inputFiles.toSet
    def bytes(f: String) = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f.stripPrefix("file:")))
    val byteSnapshot = filesBefore.map(f => f -> bytes(f).toSeq).toMap
    IcebergWrite.mergeOnRead(spark, d,
      Seq((2L, "V2"), (99L, "V99")).toDF("id", "v"), Seq("id"))
    val now = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    val expect = ((1L to 8L).filter(_ != 2L).map(i => (i, s"v$i")) ++
      Seq((2L, "V2"), (99L, "V99"))).sortBy(_._1)
    assert(now == expect, s"MoR merged state wrong: $now")
    // EVERY pre-merge data file still live and byte-identical — the
    // O(batch) commit contract (no copy-on-write rewrites)
    val filesAfter = IcebergRead.readIcebergTable(spark, d)
      .inputFiles.toSet
    assert(filesBefore.subsetOf(filesAfter),
      s"MoR merge dropped data files: ${filesBefore -- filesAfter}")
    filesBefore.foreach(f => assert(bytes(f).toSeq == byteSnapshot(f),
      s"MoR merge rewrote a data file: $f"))
    // a second upsert of the SAME key wins over the first (sequence
    // ordering), and time travel restores the pre-merge state
    IcebergWrite.mergeOnRead(spark, d,
      Seq((2L, "V2b")).toDF("id", "v"), Seq("id"))
    val now2 = IcebergRead.readIcebergTable(spark, d)
      .filter(col("id") === 2L).as[(Long, String)].collect().toSeq
    assert(now2 == Seq((2L, "V2b")), s"later sequence must win: $now2")
    val v1 = IcebergRead.readIcebergTable(spark, d, snapshotId = Some(1L))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(v1 == b1.orderBy("id").as[(Long, String)].collect().toSeq,
      v1.toString)
  }

  // ---- identity partitioning / staged writes / retention GC ----

  private def dataFiles(d: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(d, "data")
    val w = java.nio.file.Files.walk(root)
    try w.iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(f => root.relativize(f).toString -> java.nio.file.Files.size(f))
      .toMap
    finally w.close()
  }

  test("partitioned merge: a REAL identity partition spec + manifest " +
      "partition records; untouched partitions' files untouched; the " +
      "probe is partition-pruned (hidden foreign-partition files never " +
      "scanned)") {
    val d = dir()
    IcebergWrite.merge(spark, d,
      Seq((1L, "A", 0.0), (2L, "A", 0.0), (3L, "B", 0.0), (4L, "C", 0.0))
        .toDF("id", "seg", "bal"),
      Seq("id"), buckets = 6, partitionBy = Seq("seg"))
    // the metadata records an identity spec; the manifests carry
    // partition records the reader surfaces
    assert(IcebergRead.tablePartitionCols(d) == Seq("seg"))
    val st = IcebergRead.snapshotState(d, None)
    assert(st.dataFiles.forall(_.partition.keySet == Set("seg")),
      st.dataFiles.map(_.partition).toString)
    val before = dataFiles(d)
    assert(before.keys.exists(_.startsWith("seg=B/")), before.keys.toSeq)
    // hide B and C partitions: a probe that scanned them would throw
    val hidden = before.keys
      .filter(f => f.startsWith("seg=B/") || f.startsWith("seg=C/")).toSeq
    hidden.foreach(f => java.nio.file.Files.move(
      java.nio.file.Paths.get(d, "data", f),
      java.nio.file.Paths.get(d, "data", f + ".hide")))
    IcebergWrite.merge(spark, d,
      Seq((1L, "A", 10.0), (5L, "A", 50.0)).toDF("id", "seg", "bal"),
      Seq("id"))
    hidden.foreach(f => java.nio.file.Files.move(
      java.nio.file.Paths.get(d, "data", f + ".hide"),
      java.nio.file.Paths.get(d, "data", f)))
    val after = dataFiles(d)
    before.filter(k => k._1.startsWith("seg=B/") || k._1.startsWith("seg=C/"))
      .foreach { case (f, sz) =>
        assert(after.get(f).contains(sz), s"untouched partition file $f moved") }
    val got = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "A", 10.0), (2L, "A", 0.0), (3L, "B", 0.0),
      (4L, "C", 0.0), (5L, "A", 50.0)), got.toString)
  }

  test("merge schema evolution: appended columns get FRESH field ids " +
      "past last-column-id; carried files surface NULL; without the " +
      "flag it fails loudly") {
    val d = dir()
    IcebergWrite.merge(spark, d,
      Seq((1L, 1.0), (2L, 2.0)).toDF("id", "bal"), Seq("id"))
    val evolved = Seq((2L, 20.0, "hi")).toDF("id", "bal", "note")
    intercept[IllegalArgumentException](
      IcebergWrite.merge(spark, d, evolved, Seq("id")))
    IcebergWrite.merge(spark, d, evolved, Seq("id"), allowEvolution = true)
    val got = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, Double, Option[String])].collect().toSeq
    assert(got == Seq((1L, 1.0, None), (2L, 20.0, Some("hi"))),
      got.toString)
    // the evolved schema keeps the old ids and appends a fresh one
    val meta = org.json4s.jackson.JsonMethods.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        d, "metadata", "v2.metadata.json")))
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    import org.json4s._
    val cur = (meta \ "current-schema-id").extract[Int]
    val schema = (meta \ "schemas").children.find(s =>
      (s \ "schema-id").extract[Int] == cur).get
    val ids = (schema \ "fields").children.map(f =>
      ((f \ "name").extract[String], (f \ "id").extract[Int]))
    assert(ids == List(("id", 1), ("bal", 2), ("note", 3)), ids.toString)
    assert((meta \ "last-column-id").extract[Int] == 3)
  }

  test("merge and optimize run O(1) Spark jobs, never O(files)") {
    val d = dir()
    IcebergWrite.merge(spark, d,
      (1L to 24L).map(i => (i, 0.0)).toDF("id", "bal"),
      Seq("id"), buckets = 12)
    val sc = spark.sparkContext
    sc.setJobGroup("graft-ice-merge-jobs", "count merge jobs")
    IcebergWrite.merge(spark, d,
      (1L to 24L).filter(_ % 2 == 1).map(i => (i, i.toDouble))
        .toDF("id", "bal"),
      Seq("id"), buckets = 12, maxLiveFiles = 64)
    val mergeJobs = sc.statusTracker.getJobIdsForGroup("graft-ice-merge-jobs")
    sc.clearJobGroup()
    assert(mergeJobs.length <= 14,
      s"merge ran ${mergeJobs.length} jobs for ~12 touched files — " +
        "the single-staged-write contract is broken")
    sc.setJobGroup("graft-ice-opt-jobs", "count optimize jobs")
    IcebergWrite.optimize(spark, d, Seq("id"), buckets = 4)
    val optJobs = sc.statusTracker.getJobIdsForGroup("graft-ice-opt-jobs")
    sc.clearJobGroup()
    assert(optJobs.length <= 6,
      s"optimize ran ${optJobs.length} jobs — per-bucket probes are back")
    assert(IcebergRead.snapshotState(d, None).dataFiles.size <= 4)
    val got = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(got == (1L to 24L).map(i =>
      (i, if (i % 2 == 1) i.toDouble else 0.0)))
  }

  test("expireSnapshots: expired snapshots' files GC'd, current " +
      "snapshot byte-identical, expired time travel refuses loudly") {
    val d = dir()
    IcebergWrite.merge(spark, d,
      (1L to 8L).map(i => (i, 0.0)).toDF("id", "bal"), Seq("id"))
    (1 to 3).foreach(r => IcebergWrite.merge(spark, d,
      (1L to 8L).map(i => (i, i * r.toDouble)).toDF("id", "bal"),
      Seq("id")))
    val liveBefore = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    val res = IcebergWrite.expireSnapshots(spark, d, keepLast = 1)
    assert(res.filesDeleted > 0 && res.bytesDeleted > 0,
      s"nothing GC'd: $res")
    val liveAfter = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(liveAfter == liveBefore, "expireSnapshots changed the snapshot")
    intercept[IllegalArgumentException](
      IcebergRead.readIcebergTable(spark, d, snapshotId = Some(1L)))
    // everything on disk under data/ is referenced by the live set
    val live = IcebergRead.snapshotState(d, None).dataFiles
      .map(f => java.nio.file.Paths.get(d, "data").toAbsolutePath
        .relativize(java.nio.file.Paths.get(
          "/" + f.path.stripPrefix("file:").dropWhile(_ == '/'))
          .toAbsolutePath).toString).toSet
    assert(dataFiles(d).keySet == live,
      s"unreferenced files survived: ${dataFiles(d).keySet -- live}")
  }

  test("merge-created table keeps NON-primitive columns in the " +
      "metadata schema: stats cover only stat-able primitives, but " +
      "creation-from-staged must not drop binary/array columns") {
    val d = dir()
    val b1 = Seq(
      (1L, Array[Byte](1, 2), Seq("a", "b")),
      (2L, Array[Byte](3), Seq("c"))).toDF("id", "payload", "tags")
    IcebergWrite.merge(spark, d, b1, Seq("id"))
    val got = IcebergRead.readIcebergTable(spark, d)
    assert(got.columns.toSeq == Seq("id", "payload", "tags"),
      s"metadata schema lost columns: ${got.columns.toSeq}")
    val rows = got.orderBy("id")
      .as[(Long, Array[Byte], Seq[String])].collect().toSeq
    assert(rows.map(r => (r._1, r._2.toSeq, r._3)) == Seq(
      (1L, Seq[Byte](1, 2), Seq("a", "b")),
      (2L, Seq[Byte](3), Seq("c"))), rows.toString)
    // and a later merge through the same staged path still works
    IcebergWrite.merge(spark, d, Seq(
      (2L, Array[Byte](9), Seq("C")),
      (3L, Array[Byte](7), Seq("d"))).toDF("id", "payload", "tags"),
      Seq("id"))
    val rows2 = IcebergRead.readIcebergTable(spark, d).orderBy("id")
      .as[(Long, Array[Byte], Seq[String])].collect().toSeq
    assert(rows2.map(r => (r._1, r._2.toSeq, r._3)) == Seq(
      (1L, Seq[Byte](1, 2), Seq("a", "b")),
      (2L, Seq[Byte](9), Seq("C")),
      (3L, Seq[Byte](7), Seq("d"))), rows2.toString)
  }

  test("deleteWhere: DELETE as an equality-delete append — data " +
      "files untouched, one delete file per delete, deletes " +
      "compose, empty match writes no commit, partitioned prunes " +
      "(hidden foreign-partition file never opened)") {
    val d = dir()
    IcebergWrite.mergeOnRead(spark, d,
      (1L to 12L).map(i => (i, i * 1.0)).toDF("id", "bal"), Seq("id"))
    def files(sub: String): Set[String] = {
      val p = java.nio.file.Paths.get(d, sub)
      if (!java.nio.file.Files.isDirectory(p)) Set.empty
      else {
        val st = java.nio.file.Files.list(p)
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.map(_.getFileName.toString).toSet
        } finally st.close()
      }
    }
    val dataBefore = files("data")
    assert(IcebergWrite.deleteWhere(spark, d, "id % 3 = 0",
      Seq("id")) == 4L)
    assert(files("data").intersect(dataBefore) == dataBefore,
      "a data file vanished on delete")
    val st1 = IcebergRead.snapshotState(d, None)
    assert(st1.equalityDeleteFiles.size == 1,
      s"expected ONE equality delete file: ${st1.equalityDeleteFiles}")
    assert(IcebergRead.readIcebergTable(spark, d).orderBy("id")
      .as[(Long, Double)].collect().toSeq ==
      (1L to 12L).filterNot(_ % 3 == 0).map(i => (i, i * 1.0)),
      "delete state wrong")
    // second delete composes; an already-deleted row never re-matches
    assert(IcebergWrite.deleteWhere(spark, d, "id <= 3", Seq("id")) == 2L)
    assert(IcebergRead.readIcebergTable(spark, d).orderBy("id")
      .as[(Long, Double)].collect().toSeq ==
      (4L to 12L).filterNot(_ % 3 == 0).map(i => (i, i * 1.0)),
      "composed delete state wrong")
    // empty match: no new metadata version
    val hint = java.nio.file.Paths.get(d, "metadata", "version-hint.text")
    val vBefore = java.nio.file.Files.readString(hint).trim
    assert(IcebergWrite.deleteWhere(spark, d, "id > 1000", Seq("id")) == 0L)
    assert(java.nio.file.Files.readString(hint).trim == vBefore,
      "empty delete wrote a commit")
    // partitioned tables: the matched-key probe prunes through the
    // manifests' column bounds — identity partition columns are data
    // columns with bounds, so a partition-scoped predicate opens ONLY
    // its partition's files. Proof by the hidden-file technique: the
    // foreign partition's data file is replaced on disk with garbage
    // AFTER the commit; a probe that opened it would explode.
    val dp = dir()
    IcebergWrite.merge(spark, dp,
      Seq((1L, "x", 1.0), (2L, "x", 2.0), (3L, "y", 3.0), (4L, "y", 4.0))
        .toDF("id", "part", "bal"),
      Seq("id"), buckets = 2, partitionBy = Seq("part"))
    val yFiles = IcebergRead.snapshotState(dp, None).dataFiles
      .filter(f => f.partition.get("part").contains("y"))
    assert(yFiles.nonEmpty, "fixture needs a y-partition file")
    val yLocal = yFiles.map(f => java.nio.file.Paths.get(
      f.path.stripPrefix("file://")))
    val yBytes = yLocal.map(java.nio.file.Files.readAllBytes)
    yLocal.foreach(p => java.nio.file.Files.write(p,
      "not parquet".getBytes))
    assert(IcebergWrite.deleteWhere(spark, dp,
      "part = 'x' AND id % 2 = 0", Seq("id")) == 1L)
    yLocal.zip(yBytes).foreach { case (p, b) =>
      java.nio.file.Files.write(p, b): Unit }
    assert(IcebergRead.readIcebergTable(spark, dp).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "x", 1.0), (3L, "y", 3.0), (4L, "y", 4.0)),
      "partitioned delete state wrong")
  }

  test("merge with deletePredicate: delete + upsert land in ONE " +
      "snapshot (CoW — deleted rows drop in the rewrite, NO delete " +
      "file written), the delete probe prunes through manifest " +
      "bounds (hidden foreign-partition files never opened), and a " +
      "delete-only merge works") {
    val d = dir()
    IcebergWrite.merge(spark, d,
      Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0))
        .toDF("id", "part", "bal"),
      Seq("id"), buckets = 2, partitionBy = Seq("part"))
    def hint(): Int = java.nio.file.Files.readString(
      java.nio.file.Paths.get(d, "metadata", "version-hint.text"))
      .trim.toInt
    assert(hint() == 1)
    import scala.jdk.CollectionConverters._
    def partBFiles(): Seq[java.nio.file.Path] = {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(d, "data"))
      try w.iterator().asScala.filter(p =>
        p.toString.contains("part=b") &&
          p.getFileName.toString.endsWith(".parquet")).toSeq
      finally w.close()
    }
    val bBytes = partBFiles().map(p =>
      p -> java.nio.file.Files.readAllBytes(p)).toMap
    assert(bBytes.nonEmpty)
    // hide part=b's data files: a fused merge whose delete and batch
    // are confined to part='a' must never open them
    bBytes.keys.foreach(p => java.nio.file.Files.move(p,
      p.resolveSibling(p.getFileName.toString + ".hide")))
    val n =
      try IcebergWrite.merge(spark, d,
        Seq((2L, "a", 99.0)).toDF("id", "part", "bal"), Seq("id"),
        deletePredicate = Some("part = 'a' AND id = 1"))
      finally bBytes.keys.foreach(p => java.nio.file.Files.move(
        p.resolveSibling(p.getFileName.toString + ".hide"), p))
    assert(n == 2L, s"1 upserted + 1 deleted, got $n") // affected rows
    assert(hint() == 2, "delete + upsert must be ONE snapshot")
    val got = IcebergRead.readIcebergTable(spark, d).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((2L, "a", 99.0), (3L, "b", 3.0), (4L, "b", 4.0)),
      got.toString)
    // part=b untouched byte-identically; no delete file anywhere
    bBytes.foreach { case (p, bytes) =>
      assert(java.nio.file.Files.readAllBytes(p).sameElements(bytes),
        s"untouched partition file $p was rewritten") }
    val delFiles = {
      val w = java.nio.file.Files.list(
        java.nio.file.Paths.get(d, "metadata"))
      try w.iterator().asScala.map(_.getFileName.toString)
        .filter(_.contains("deletes")).toSeq
      finally w.close()
    }
    assert(delFiles.isEmpty, s"CoW fused delete wrote delete files: " +
      s"$delFiles")
    // delete-only merge (empty batch): one more snapshot
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("part",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("bal",
          org.apache.spark.sql.types.DoubleType))))
    val n2 = IcebergWrite.merge(spark, d, empty, Seq("id"),
      deletePredicate = Some("id = 4"))
    assert(n2 == 1L, n2.toString)
    assert(hint() == 3)
    val got2 = IcebergRead.readIcebergTable(spark, d).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got2 == Seq((2L, "a", 99.0), (3L, "b", 3.0)), got2.toString)
    // residual + delete cannot combine (loud)
    val e = intercept[IllegalArgumentException](
      IcebergWrite.merge(spark, d,
        Seq((9L, "a", 9.0)).toDF("id", "part", "bal"), Seq("id"),
        residualPredicate = Some("bal > 0"),
        deletePredicate = Some("id = 3")))
    assert(e.getMessage.contains("cannot combine"), e.getMessage)
  }

  test("format-v3 deletion vectors (Puffin): the DV blob masks its " +
      "referenced data file's rows through the normal read path " +
      "(engine reader AND the registered graft-iceberg source); " +
      "plain v3 reads within scope; initial-default refuses loudly") {
    val d = dir()
    IcebergWrite.commit(d, Seq("f0.parquet" ->
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v"))): Unit
    val metaDir = java.nio.file.Paths.get(d, "metadata")
    val metaFile = metaDir.resolve("v1.metadata.json")
    val v3Text = java.nio.file.Files.readString(metaFile)
      .replace("\"format-version\" : 2", "\"format-version\" : 3")
    java.nio.file.Files.writeString(metaFile, v3Text)
    // a v3 table WITHOUT out-of-scope features reads
    assert(IcebergRead.readIcebergTable(spark, d).count() == 4)

    // ---- the Puffin deletion-vector-v1 blob masking physical rows
    // 1 and 3 of f0: 4-byte BE length of magic+bitmap, the magic
    // bytes (D1 D3 39 64 — harmonized with Delta's DV layout), the
    // portable RoaringBitmapArray, 4-byte BE CRC-32 of magic+bitmap
    // serialize() emits magic (D1 D3 39 64) + portable bitmap — the
    // blob frames it with a 4-byte BE length and a 4-byte BE CRC-32
    val bitmap = graft.sources.DeletionVectors.serialize(Seq(1L, 3L))
    val crc = new java.util.zip.CRC32(); crc.update(bitmap)
    val bb = java.nio.ByteBuffer.allocate(4 + bitmap.length + 4)
    bb.putInt(bitmap.length); bb.put(bitmap)
    bb.putInt(crc.getValue.toInt)
    val blob = bb.array()
    val puffin = metaDir.resolve("dv-00002.puffin")
    java.nio.file.Files.write(puffin,
      "PFA1".getBytes(java.nio.charset.StandardCharsets.UTF_8) ++ blob)
    val contentOffset = 4L
    val contentSize = blob.length.toLong

    // the VERBATIM data-file path from the committed data manifest —
    // referenced_data_file must match it exactly
    def avroRecs(p: java.nio.file.Path) = {
      val r = new org.apache.avro.file.DataFileReader(
        p.toFile, new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try Iterator.continually(r).takeWhile(_.hasNext).map(_.next()).toList
      finally r.close()
    }
    val dfPath = avroRecs(metaDir.resolve("manifest-00001-data.avro"))
      .head.get("data_file")
      .asInstanceOf[org.apache.avro.generic.GenericRecord]
      .get("file_path").toString

    // ---- the DV manifest (content=1, PUFFIN, referenced_data_file
    // + content_offset + content_size_in_bytes — the v3 fields)
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |    {"name":"content","type":"int"},
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"record_count","type":"long"},
        |    {"name":"referenced_data_file","type":"string"},
        |    {"name":"content_offset","type":"long"},
        |    {"name":"content_size_in_bytes","type":"long"}
        |  ]}}
        |]}""".stripMargin)
    val dvMan = metaDir.resolve("manifest-dv.avro")
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](entrySchema))
    w.create(entrySchema, dvMan.toFile)
    val rec = new org.apache.avro.generic.GenericData.Record(entrySchema)
    val dfr = new org.apache.avro.generic.GenericData.Record(
      entrySchema.getField("data_file").schema())
    dfr.put("content", 1) // POSITION_DELETES — a DV when referenced
    dfr.put("file_path", s"file://$puffin")
    dfr.put("file_format", "PUFFIN")
    dfr.put("record_count", 2L) // DV cardinality
    dfr.put("referenced_data_file", dfPath)
    dfr.put("content_offset", contentOffset)
    dfr.put("content_size_in_bytes", contentSize)
    rec.put("status", 1)
    rec.put("data_file", dfr)
    w.append(rec)
    w.close()

    // ---- snapshot 2's manifest list: the ORIGINAL data manifest +
    // the DV manifest
    val listSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |  {"name":"manifest_path","type":"string"},
        |  {"name":"manifest_length","type":"long"},
        |  {"name":"partition_spec_id","type":"int"},
        |  {"name":"content","type":"int"},
        |  {"name":"added_snapshot_id","type":"long"}
        |]}""".stripMargin)
    val dvList = metaDir.resolve("snap-dv-list.avro")
    val lw = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](listSchema))
    lw.create(listSchema, dvList.toFile)
    val dataMan = metaDir.resolve("manifest-00001-data.avro")
    Seq((dataMan, 0), (dvMan, 1)).foreach { case (p, content) =>
      val lr = new org.apache.avro.generic.GenericData.Record(listSchema)
      lr.put("manifest_path", s"file://$p")
      lr.put("manifest_length", java.nio.file.Files.size(p))
      lr.put("partition_spec_id", 0)
      lr.put("content", content)
      lr.put("added_snapshot_id", 2L)
      lw.append(lr)
    }
    lw.close()
    val spliced = v3Text
      .replace("\"current-snapshot-id\" : 1", "\"current-snapshot-id\" : 2")
      .replace("\"snapshots\" : [ {",
        s"""\"snapshots\" : [ {
           |    "snapshot-id" : 2,
           |    "sequence-number" : 2,
           |    "timestamp-ms" : 0,
           |    "summary" : { "operation" : "delete" },
           |    "manifest-list" : "file://$dvList",
           |    "schema-id" : 0
           |  }, {""".stripMargin)
    java.nio.file.Files.writeString(metaFile, spliced)

    // positions 1 and 3 ((2,b), (4,d)) are masked — engine reader
    val got = IcebergRead.readIcebergTable(spark, d).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (3L, "c")), got.toString)
    // and the registered source (scan_iceberg's path)
    val viaSource = spark.read.format("graft-iceberg").load(d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(viaSource == Seq((1L, "a"), (3L, "c")), viaSource.toString)

    // a corrupt blob (bad CRC) refuses loudly, never a silent
    // resurrect
    val corrupted = java.nio.file.Files.readAllBytes(puffin)
    corrupted(10) = (corrupted(10) ^ 0xFF).toByte
    java.nio.file.Files.write(puffin, corrupted)
    val eCrc = intercept[Exception](
      IcebergRead.readIcebergTable(spark, d).count())
    assert(eCrc.getMessage != null, "corrupt DV must fail")
    java.nio.file.Files.write(puffin,
      "PFA1".getBytes(java.nio.charset.StandardCharsets.UTF_8) ++ blob)

    // out-of-scope v3: a field carrying initial-default refuses
    val defaulted = spliced.replace("\"name\" : \"v\",",
      "\"name\" : \"v\",\n      \"initial-default\" : \"zz\",")
    assert(defaulted != spliced, "splice anchor missing")
    java.nio.file.Files.writeString(metaFile, defaulted)
    val eDef = intercept[IllegalArgumentException](
      IcebergRead.readIcebergTable(spark, d))
    assert(eDef.getMessage.contains("initial-default"), eDef.getMessage)
    java.nio.file.Files.writeString(metaFile, spliced)

    // ---- WRITE paths refuse the live-DV table loudly: this writer
    // emits format-version 2 metadata and carries only pos/eq delete
    // files — any commit would drop the DV entries and resurrect
    // (2,b)/(4,d). merge, optimize, dropColumns, and the raw commit
    // all refuse; the table stays byte-identical after each refusal.
    val metaBytes = java.nio.file.Files.readAllBytes(metaFile)
    val eMerge = intercept[IllegalArgumentException](
      IcebergWrite.merge(spark, d,
        Seq((9L, "z")).toDF("id", "v"), Seq("id")))
    assert(eMerge.getMessage.contains("deletion vector"),
      eMerge.getMessage)
    val eDrop = intercept[IllegalArgumentException](
      IcebergWrite.dropColumns(spark, d, Seq("v")))
    assert(eDrop.getMessage.toLowerCase.contains("delete"),
      eDrop.getMessage)
    val eCommit = intercept[IllegalArgumentException](
      IcebergWrite.commit(d,
        Seq("late.parquet" -> Seq((9L, "z")).toDF("id", "v"))))
    assert(eCommit.getMessage.contains("deletion vector"),
      eCommit.getMessage)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(metaFile), metaBytes),
      "a refused write still touched the metadata")
    assert(IcebergRead.readIcebergTable(spark, d).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (3L, "c")), "refusals must not change the table")

    // OPTIMIZE is DV-aware: it reads the RECONCILED state (DV masks
    // applied) and its dropDeletes commit drops the applied masks
    // with the rewritten files — same rows back, zero live DVs, and
    // the table keeps format-version 3. (The hand-spliced fixture
    // holds snapshot 2 inside v1.metadata.json; align the version
    // hint so the writer's next snapshot id does not collide.)
    java.nio.file.Files.copy(metaFile,
      metaDir.resolve("v2.metadata.json")): Unit
    java.nio.file.Files.writeString(
      metaDir.resolve("version-hint.text"), "2"): Unit
    IcebergWrite.optimize(spark, d, Seq("id"), buckets = 1)
    val stOpt = IcebergRead.snapshotState(d, None)
    assert(stOpt.deletionVectors.isEmpty,
      s"compaction left live DVs: ${stOpt.deletionVectors}")
    assert(IcebergRead.readIcebergTable(spark, d).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (3L, "c")), "compaction changed the rows")
    assert(java.nio.file.Files.readString(metaDir.resolve(
      s"v${java.nio.file.Files.readString(
        metaDir.resolve("version-hint.text")).trim}.metadata.json"))
      .contains("\"format-version\" : 3"),
      "compaction downgraded the format version")
  }

  test("v3 deletion-vector WRITE: DELETE FROM on a format-3 table " +
      "emits Puffin DV blobs (one snapshot, data files untouched), " +
      "deletes compose by superseding the file's DV, the blobs " +
      "round-trip through the normal read path, and the file is " +
      "spec-shaped (header/footer magic, addressable framing)") {
    val d = dir()
    // creation commit: TWO data files, format-version 3
    IcebergWrite.commit(d, Seq(
      "f0.parquet" -> Seq((1L, "a"), (2L, "b"), (3L, "c"))
        .toDF("id", "v").coalesce(1).sortWithinPartitions("id"),
      "f1.parquet" -> Seq((10L, "x"), (11L, "y"))
        .toDF("id", "v").coalesce(1).sortWithinPartitions("id")),
      formatVersion = 3): Unit
    val metaDir = java.nio.file.Paths.get(d, "metadata")
    assert(IcebergWrite.formatVersionOf(d) == 3)
    val dataBytes = Seq("f0.parquet", "f1.parquet").map(n =>
      n -> java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(d, "data", n))).toMap

    // ---- DELETE 1: masks rows of BOTH files, ONE snapshot
    assert(IcebergWrite.deleteWhere(spark, d,
      "id = 2 OR id = 11", Seq("id")) == 2L)
    assert(java.nio.file.Files.readString(
      metaDir.resolve("version-hint.text")).trim == "2")
    val st1 = IcebergRead.snapshotState(d, None)
    assert(st1.deletionVectors.size == 2,
      s"one DV per touched file expected: ${st1.deletionVectors}")
    assert(st1.positionDeleteFiles.isEmpty &&
      st1.equalityDeleteFiles.isEmpty)
    assert(IcebergRead.readIcebergTable(spark, d).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (3L, "c"), (10L, "x")))
    // data files byte-identical — merge-on-read, not a rewrite
    dataBytes.foreach { case (n, b) =>
      assert(java.util.Arrays.equals(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(d, "data", n)), b),
        s"DV delete rewrote data file $n") }

    // ---- DELETE 2 composes: f0's DV is SUPERSEDED (old ∪ new),
    // f1's untouched DV carries; re-deleting a masked row is a no-op
    assert(IcebergWrite.deleteWhere(spark, d,
      "id = 2 OR id = 3", Seq("id")) == 1L)
    val st2 = IcebergRead.snapshotState(d, None)
    assert(st2.deletionVectors.size == 2,
      s"at most one live DV per file: ${st2.deletionVectors}")
    assert(IcebergRead.readIcebergTable(spark, d).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (10L, "x")))
    // the registered source sees the same state (scan_iceberg's path)
    assert(spark.read.format("graft-iceberg").load(d).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (10L, "x")))
    // empty match writes NO commit
    val vBefore = java.nio.file.Files.readString(
      metaDir.resolve("version-hint.text")).trim
    assert(IcebergWrite.deleteWhere(spark, d, "id > 999", Seq("id")) == 0L)
    assert(java.nio.file.Files.readString(
      metaDir.resolve("version-hint.text")).trim == vBefore)

    // ---- external shape: header and trailing magic, and each
    // manifest-addressed blob decodes with the Delta-harmonized
    // framing at its recorded (offset, content_size)
    st2.deletionVectors.foreach { dv =>
      val p = java.nio.file.Paths.get(
        dv.path.stripPrefix("file://"))
      val all = java.nio.file.Files.readAllBytes(p)
      assert(new String(all.take(4)) == "PFA1", "header magic")
      assert(new String(all.takeRight(4)) == "PFA1", "footer magic")
      val rows = graft.sources.DeletionVectors.decodePuffinDv(
        all, dv.contentOffset.get, dv.contentSize.get,
        Some(dv.recordCount))
      assert(rows.nonEmpty && rows == rows.sorted, rows.toString)
      // the footer payload names the blob with the v3 properties
      val payloadLen = java.nio.ByteBuffer.wrap(all, all.length - 12, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      val payload = new String(all,
        all.length - 12 - payloadLen, payloadLen,
        java.nio.charset.StandardCharsets.UTF_8)
      assert(payload.contains("deletion-vector-v1") &&
        payload.contains("referenced-data-file"), payload)
    }
    // metadata carries the v3 row-lineage fields
    val metaTxt = java.nio.file.Files.readString(metaDir.resolve(
      s"v${java.nio.file.Files.readString(
        metaDir.resolve("version-hint.text")).trim}.metadata.json"))
    assert(metaTxt.contains("\"format-version\" : 3") &&
      metaTxt.contains("next-row-id"), metaTxt.take(400))

    // merge-on-read upserts COMPOSE on the live-DV table: the commit
    // is append-only (eq-delete + data file), so the DVs carry
    // verbatim and the reader reconciles DV masks + the eq delete
    IcebergWrite.mergeOnRead(spark, d,
      Seq((1L, "A2"), (20L, "n")).toDF("id", "v"), Seq("id"))
    assert(IcebergRead.snapshotState(d, None).deletionVectors.size == 2,
      "DVs must carry through a merge-on-read upsert")
    assert(IcebergRead.readIcebergTable(spark, d).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "A2"), (10L, "x"), (20L, "n")))
    // and compaction folds DVs + eq deletes back into plain files
    IcebergWrite.optimize(spark, d, Seq("id"), buckets = 2)
    val stOpt = IcebergRead.snapshotState(d, None)
    assert(stOpt.deletionVectors.isEmpty &&
      stOpt.equalityDeleteFiles.isEmpty,
      s"compaction left live deletes: $stOpt")
    assert(IcebergRead.readIcebergTable(spark, d).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "A2"), (10L, "x"), (20L, "n")))
    assert(IcebergWrite.formatVersionOf(d) == 3,
      "compaction downgraded the format version")
  }

  test("dropColumns: a schema-only snapshot narrows the schema with " +
      "kept field ids intact; partition-column / unknown / " +
      "delete-file-bearing drops refuse loudly") {
    val d = dir()
    IcebergWrite.merge(spark, d,
      Seq((1L, 1.0, "x"), (2L, 2.0, "y")).toDF("id", "bal", "stale"),
      Seq("id"))
    val idsBefore = {
      implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
      val m = org.json4s.jackson.JsonMethods.parse(
        java.nio.file.Files.readString(
          java.nio.file.Paths.get(d, "metadata", "v1.metadata.json")))
      (m \ "schemas").children.head.\("fields").children.map(f =>
        ((f \ "name").extract[String], (f \ "id").extract[Int])).toMap
    }
    IcebergWrite.dropColumns(spark, d, Seq("stale"))
    val got = IcebergRead.readIcebergTable(spark, d).orderBy("id")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1.0), (2L, 2.0)), got.toString)
    assert(IcebergRead.snapshotState(d, None).schema.fieldNames.toSeq ==
      Seq("id", "bal"))
    // kept fields retain their ORIGINAL ids (Iceberg's id-based
    // evolution contract)
    val idsAfter = {
      implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
      val m = org.json4s.jackson.JsonMethods.parse(
        java.nio.file.Files.readString(
          java.nio.file.Paths.get(d, "metadata", "v2.metadata.json")))
      val cur = (m \ "current-schema-id").extract[Int]
      (m \ "schemas").children.find(s =>
        (s \ "schema-id").extract[Int] == cur).get.\("fields").children
        .map(f => ((f \ "name").extract[String],
          (f \ "id").extract[Int])).toMap
    }
    assert(idsAfter == idsBefore.filter(_._1 != "stale"),
      s"$idsAfter vs $idsBefore")
    // a follow-up merge with the narrowed schema lands cleanly
    IcebergWrite.merge(spark, d, Seq((2L, 99.0)).toDF("id", "bal"),
      Seq("id"))
    assert(IcebergRead.readIcebergTable(spark, d).orderBy("id")
      .as[(Long, Double)].collect().toSeq == Seq((1L, 1.0), (2L, 99.0)))
    // refusals
    val e1 = intercept[IllegalArgumentException](
      IcebergWrite.dropColumns(spark, d, Seq("nope")))
    assert(e1.getMessage.contains("does not exist"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      IcebergWrite.dropColumns(spark, d, Seq("id", "bal")))
    assert(e2.getMessage.contains("empty schema"), e2.getMessage)
    val dp = dir()
    IcebergWrite.merge(spark, dp,
      Seq((1L, "a", 1.0)).toDF("id", "part", "bal"),
      Seq("id"), partitionBy = Seq("part"))
    val e3 = intercept[IllegalArgumentException](
      IcebergWrite.dropColumns(spark, dp, Seq("part")))
    assert(e3.getMessage.contains("partition column"), e3.getMessage)
    val dm = dir()
    IcebergWrite.mergeOnRead(spark, dm,
      Seq((1L, 1.0, "x")).toDF("id", "bal", "stale"), Seq("id"))
    IcebergWrite.mergeOnRead(spark, dm,
      Seq((1L, 2.0, "x")).toDF("id", "bal", "stale"), Seq("id"))
    val e4 = intercept[IllegalArgumentException](
      IcebergWrite.dropColumns(spark, dm, Seq("stale")))
    assert(e4.getMessage.contains("delete files"), e4.getMessage)
  }

  test("snapshotIdAtTimestamp: 0-stamped snapshots (fixture mode) " +
      "resolve through their introducing metadata file's mtime; " +
      "real timestamp-ms wins when present; pre-history refuses " +
      "loudly") {
    val d = dir()
    // fixture mode: the historical 0-stamp, exercising the mtime
    // fallback channel
    sys.props("graft.iceberg.zeroTimestamps") = "true"
    try {
      IcebergWrite.merge(spark, d, Seq((1L, 0.0)).toDF("id", "bal"), Seq("id"))
      IcebergWrite.merge(spark, d, Seq((1L, 1.0)).toDF("id", "bal"), Seq("id"))
    } finally sys.props.remove("graft.iceberg.zeroTimestamps")
    val metaDir = java.nio.file.Paths.get(d, "metadata")
    def pin(v: Int, t: String): Unit =
      java.nio.file.Files.setLastModifiedTime(
        metaDir.resolve(s"v$v.metadata.json"),
        java.nio.file.attribute.FileTime.from(
          java.time.Instant.parse(t))): Unit
    pin(1, "2024-01-01T00:00:00Z")
    pin(2, "2024-06-01T00:00:00Z")
    def micros(t: String): Long =
      java.time.Instant.parse(t).toEpochMilli * 1000L
    val early = IcebergRead.snapshotIdAtTimestamp(
      d, micros("2024-03-01T00:00:00Z"))
    val late = IcebergRead.snapshotIdAtTimestamp(
      d, micros("2024-07-01T00:00:00Z"))
    assert(early != late)
    val v1 = IcebergRead.readIcebergTable(spark, d,
      snapshotId = Some(early)).as[(Long, Double)].collect().toSeq
    assert(v1 == Seq((1L, 0.0)), v1.toString)
    val v2 = IcebergRead.readIcebergTable(spark, d,
      snapshotId = Some(late)).as[(Long, Double)].collect().toSeq
    assert(v2 == Seq((1L, 1.0)), v2.toString)
    val e = intercept[IllegalArgumentException](
      IcebergRead.snapshotIdAtTimestamp(d, micros("2023-01-01T00:00:00Z")))
    assert(e.getMessage.contains("precedes the earliest"), e.getMessage)
    // DEFAULT mode stamps the real commit wall-clock into
    // timestamp-ms: mtime scrambling no longer shifts resolution, and
    // same-millisecond commits tie-break by snapshot id
    val d2 = dir()
    val before = System.currentTimeMillis()
    IcebergWrite.merge(spark, d2, Seq((1L, 0.0)).toDF("id", "bal"), Seq("id"))
    IcebergWrite.merge(spark, d2, Seq((1L, 1.0)).toDF("id", "bal"), Seq("id"))
    val meta2 = org.json4s.jackson.JsonMethods.parse(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(d2, "metadata", "v2.metadata.json")))
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val stamps = (meta2 \ "snapshots").children.map(s =>
      (s \ "timestamp-ms").extract[Long])
    assert(stamps.forall(_ >= before), stamps.toString)
    // scramble the metadata mtimes — real stamps still resolve
    val m2 = java.nio.file.Paths.get(d2, "metadata")
    Seq("v1.metadata.json" -> "2031-01-01T00:00:00Z",
        "v2.metadata.json" -> "2030-01-01T00:00:00Z").foreach {
      case (f, ts) => java.nio.file.Files.setLastModifiedTime(
        m2.resolve(f), java.nio.file.attribute.FileTime.from(
          java.time.Instant.parse(ts))): Unit
    }
    val nowPin = IcebergRead.snapshotIdAtTimestamp(
      d2, (System.currentTimeMillis() + 3600000L) * 1000L)
    assert(nowPin == 2L,
      s"real stamps must resolve the LATEST snapshot (tie-break by " +
        s"id on same-ms commits), got $nowPin")
  }

  test("spark.read.format(\"graft-iceberg\"): the registered source " +
      "replays the engine read, snapshotId pins, equality deletes " +
      "reconcile") {
    val d = dir()
    IcebergWrite.mergeOnRead(spark, d,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal"), Seq("id"))
    IcebergWrite.mergeOnRead(spark, d,
      Seq((2L, 99.0)).toDF("id", "bal"), Seq("id"))
    val cur = spark.read.format("graft-iceberg").load(d)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(cur == Seq((1L, 10.0), (2L, 99.0)), cur.toString)
    val direct = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(cur == direct)
    val first = spark.read.format("graft-iceberg")
      .option("snapshotId", 1).load(d)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(first == Seq((1L, 10.0), (2L, 20.0)), first.toString)
  }

  test("format-version gates (pinned contract): v3 reads WITHIN " +
      "SCOPE (DVs applied, lineage inert), out-of-scope v3 " +
      "(initial-default) and v4+ refuse loudly with an actionable " +
      "message") {
    val d = dir()
    IcebergWrite.merge(spark, d,
      Seq((1L, 1.0)).toDF("id", "bal"), Seq("id"))
    // rewrite the current metadata as a v3 table (what a v3 writer's
    // first commit would leave behind)
    val metaDir = java.nio.file.Paths.get(d, "metadata")
    val hint = java.nio.file.Files.readString(
      metaDir.resolve("version-hint.text")).trim
    val metaFile = metaDir.resolve(s"v$hint.metadata.json")
    val text = java.nio.file.Files.readString(metaFile)
    assert(text.contains("\"format-version\" : 2"), text.take(200))
    java.nio.file.Files.writeString(metaFile,
      text.replace("\"format-version\" : 2",
        "\"format-version\" : 3")): Unit
    // an in-scope v3 table READS (the deletion-vector test covers a
    // v3 table whose DVs actually mask rows)
    assert(IcebergRead.readIcebergTable(spark, d).count() == 1L)
    // v4: unknown future semantics — refuse, never risk resurrected
    // rows; the MESSAGE is the contract
    java.nio.file.Files.writeString(metaFile,
      text.replace("\"format-version\" : 2",
        "\"format-version\" : 4")): Unit
    val e = intercept[IllegalArgumentException](
      IcebergRead.readIcebergTable(spark, d).collect())
    assert(e.getMessage.contains("format-version 4 unsupported"),
      e.getMessage)
    assert(e.getMessage.contains("resurrected rows"), e.getMessage)
    // the registered source refuses identically
    val e2 = intercept[IllegalArgumentException](
      spark.read.format("graft-iceberg").load(d).collect())
    assert(e2.getMessage.contains("format-version 4 unsupported"),
      e2.getMessage)
  }

  test("merge with residualPredicate: manifest column bounds prune " +
      "the touched-file probe (out-of-window files never opened); " +
      "out-of-window matched rows stay and the batch key inserts") {
    val d = dir()
    // two files via explicit adds so each carries disjoint ts bounds
    IcebergWrite.commit(d, Seq(
      "lo.parquet" -> Seq(
        (1L, 10.0, java.sql.Timestamp.valueOf("2023-12-01 00:00:00")),
        (2L, 20.0, java.sql.Timestamp.valueOf("2023-12-02 00:00:00")))
        .toDF("id", "bal", "ts"),
      "hi.parquet" -> Seq(
        (3L, 30.0, java.sql.Timestamp.valueOf("2024-01-10 00:00:00")),
        (4L, 40.0, java.sql.Timestamp.valueOf("2024-01-11 00:00:00")))
        .toDF("id", "bal", "ts"))): Unit
    // hide the out-of-window file: a probe that opened it would throw
    java.nio.file.Files.move(
      java.nio.file.Paths.get(d, "data", "lo.parquet"),
      java.nio.file.Paths.get(d, "data", "lo.parquet.hide"))
    val ts2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    IcebergWrite.merge(spark, d,
      Seq((3L, 99.0, ts2)).toDF("id", "bal", "ts"), Seq("id"),
      residualPredicate = Some("ts >= timestamp'2024-01-01 00:00:00'"))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(d, "data", "lo.parquet.hide"),
      java.nio.file.Paths.get(d, "data", "lo.parquet"))
    val got = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id").as[(Long, Double, java.sql.Timestamp)]
      .collect().toSeq.map(r => (r._1, r._2))
    assert(got == Seq((1L, 10.0), (2L, 20.0), (3L, 99.0), (4L, 40.0)),
      got.toString)
    // out-of-window matched key: the target row survives and the
    // batch row inserts alongside (SQL MERGE semantics)
    IcebergWrite.merge(spark, d,
      Seq((1L, 111.0, ts2)).toDF("id", "bal", "ts"), Seq("id"),
      residualPredicate = Some("ts >= timestamp'2024-01-01 00:00:00'"))
    val got2 = IcebergRead.readIcebergTable(spark, d)
      .orderBy("id", "bal").as[(Long, Double, java.sql.Timestamp)]
      .collect().toSeq.map(r => (r._1, r._2))
    assert(got2 == Seq((1L, 10.0), (1L, 111.0), (2L, 20.0),
      (3L, 99.0), (4L, 40.0)), got2.toString)
  }
}
