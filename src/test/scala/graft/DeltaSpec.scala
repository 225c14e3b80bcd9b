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

  test("footer stats ≡ job stats: the driver-side parquet-footer " +
      "fast path returns exactly the grouped stats job's values for " +
      "every primitive type (incl. nulls, all-null columns, decimals " +
      "wide and narrow, micros timestamps); non-ASCII string bounds " +
      "fall back to the job") {
    import org.apache.spark.sql.types._
    val d = dir()
    val df = spark.range(0, 100).selectExpr(
      "id",
      "cast(id as int) as i",
      "cast(id as byte) as bt",
      "cast(id as short) as sh",
      "cast(id * 1.5 as float) as f",
      "id * 2.5 as dbl",
      "cast(id as decimal(9,2)) as dec9",
      "cast(id as decimal(18,4)) as dec18",
      "cast(id as decimal(38,6)) as dec38",
      "concat('s', lpad(cast(id as string), 3, '0')) as s",
      "date_add(date'2024-01-01', cast(id as int)) as dt",
      "timestamp_micros(1700000000000000 + id * 1000000) as ts",
      "id % 2 = 0 as b",
      "if(id % 3 = 0, null, id) as withnulls",
      "cast(null as long) as allnull")
    // bucket into several files so the per-file grouping is exercised
    val tagged = df.withColumn("__graft_target",
      format_string("part-%05d-v0.parquet", pmod(col("id"), lit(3))))
    val staged = DeltaWrite.stageWrite(d, tagged)
    assert(staged.size == 3)
    val schema = df.schema
    val viaFooter = DeltaWrite.footerStatsRaw(
      spark, d, staged.map(_._1), schema)
    assert(viaFooter.isDefined, "footer path unexpectedly bailed")
    val viaJob = DeltaWrite.statsJobFor(spark, d, staged.map(_._1), schema)
    assert(viaFooter.get.keySet == viaJob.keySet)
    for (rel <- viaJob.keys) {
      val (nF, colsF) = viaFooter.get(rel)
      val (nJ, colsJ) = viaJob(rel)
      assert(nF == nJ, s"$rel rows: footer $nF != job $nJ")
      colsF.zip(colsJ).foreach { case ((fF, mnF, mxF, ncF),
          (fJ, mnJ, mxJ, ncJ)) =>
        assert(fF == fJ)
        assert(mnF == mnJ, s"$rel.${fF.name} min: footer $mnF != job $mnJ")
        assert(mxF == mxJ, s"$rel.${fF.name} max: footer $mxF != job $mxJ")
        assert(ncF == ncJ, s"$rel.${fF.name} nulls: footer $ncF != $ncJ")
        // the JSON the log records must also agree byte-for-byte
      }
      assert(DeltaWrite.statsJsonOf(nF, colsF) ==
        DeltaWrite.statsJsonOf(nJ, colsJ), s"$rel stats JSON differs")
    }
    // ZERO-ROW file (no row groups): both paths must report
    // (0 rows, null bounds, 0 nulls) instead of dropping the entry
    val d0 = dir()
    DeltaWrite.writeOne(spark.range(5).selectExpr("id", "id * 1.5 as v")
      .filter(col("id") < 0), d0, "empty.parquet")
    val s0 = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType)))
    val expectEmpty = Map("empty.parquet" ->
      (0L, s0.fields.toSeq.map(f => (f, null: Any, null: Any, 0L))))
    assert(DeltaWrite.footerStatsRaw(spark, d0, Seq("empty.parquet"), s0)
      .contains(expectEmpty), "footer path: empty-file stats wrong")
    assert(DeltaWrite.statsJobFor(spark, d0, Seq("empty.parquet"), s0)
      == expectEmpty, "job path: empty-file stats wrong")

    // non-ASCII string bounds: Java vs UTF8 binary ordering can
    // disagree — the footer path must refuse (full job fallback)
    val d2 = dir()
    val t2 = Seq("a", "éclair", "zz").toDF("s")
      .withColumn("__graft_target", lit("part-00000-v0.parquet"))
    val staged2 = DeltaWrite.stageWrite(d2, t2)
    assert(DeltaWrite.footerStatsRaw(spark, d2, staged2.map(_._1),
      StructType(Seq(StructField("s", StringType)))).isEmpty,
      "non-ASCII bounds must fall back to the stats job")
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

  test("predicate-driven FILE PRUNING: add.stats min/max prune the " +
      "file list before the scan; stats-free files survive; results " +
      "match the unpruned filter exactly") {
    val d = dir()
    val nat = spark.read.parquet(s"$sf/nation.parquet")
    DeltaWrite.commit(d, 0L, Seq(
      "f0.parquet" -> nat.filter(col("n_nationkey") < 5),
      "f1.parquet" -> nat.filter(col("n_nationkey").between(5, 9)),
      "f2.parquet" -> nat.filter(col("n_nationkey").between(10, 14)),
      "f3.parquet" -> nat.filter(col("n_nationkey") >= 15)))
    val pred = col("n_nationkey") >= 10 && col("n_nationkey") < 15
    val df = DeltaRead.readDeltaTable(spark, d, predicate = Some(pred))
    val files = df.inputFiles.map(_.split('/').last).toSet
    assert(files == Set("f2.parquet"), s"stats pruning read: $files")
    val expect = DeltaRead.readDeltaTable(spark, d).filter(pred)
      .orderBy("n_nationkey").collect().toSeq
    assert(df.orderBy("n_nationkey").collect().toSeq == expect)

    // string bounds + IN-list pruning: two names that only f0 holds
    val twoLow = nat.filter(col("n_nationkey") < 5)
      .select("n_name").as[String].collect().sorted.take(2).toSeq
    val byName = DeltaRead.readDeltaTable(spark, d,
      predicate = Some(col("n_name").isin(twoLow: _*)))
    assert(byName.inputFiles.map(_.split('/').last).toSet == Set("f0.parquet"),
      s"IN(${twoLow.mkString(",")}) read: ${byName.inputFiles.mkString(", ")}")

    // a stats-free add (hand-appended commit) is NEVER pruned
    DeltaWrite.commit(s"$d-stage", 0L,
      Seq("f9.parquet" -> nat.filter(col("n_nationkey") < 3)))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$d-stage", "f9.parquet"),
      java.nio.file.Paths.get(d, "f9.parquet"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(d, "_delta_log", f"${1L}%020d.json"),
      """{"add":{"path":"f9.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}
        |""".stripMargin)
    val again = DeltaRead.readDeltaTable(spark, d, predicate = Some(pred))
    assert(again.inputFiles.map(_.split('/').last).toSet ==
      Set("f2.parquet", "f9.parquet"),
      s"stats-free file must survive pruning: ${again.inputFiles.mkString(", ")}")
    // and the filter still removes its rows
    assert(again.orderBy("n_nationkey").collect().toSeq == expect)

    // COERCED literals still prune: the analyzed (un-optimized)
    // predicate wraps the int column in a widening cast against the
    // long literal — exact widening, so stats still decide
    val coerced = DeltaRead.readDeltaTable(spark, d,
      predicate = Some(col("n_nationkey") === lit(12L)))
    assert(coerced.inputFiles.map(_.split('/').last).toSet ==
      Set("f2.parquet", "f9.parquet"),
      s"coerced-literal pruning read: ${coerced.inputFiles.mkString(", ")}")
    // a NARROWING cast changes the comparison (13 casts to byte 13,
    // but 269 would too) — skipping must stand down, never mis-prune,
    // and the row filter still gives exact results
    val narrowed = DeltaRead.readDeltaTable(spark, d,
      predicate = Some(col("n_nationkey").cast("byte") === lit(13.toByte)))
    assert(narrowed.inputFiles.map(_.split('/').last).toSet ==
      Set("f0.parquet", "f1.parquet", "f2.parquet", "f3.parquet",
        "f9.parquet"),
      s"narrowing cast must not prune: ${narrowed.inputFiles.mkString(", ")}")
    assert(narrowed.select("n_nationkey").as[Int].collect().toSeq ==
      Seq(13))
  }

  test("FILE PRUNING on partition values: exact log-recorded values " +
      "prune whole partitions during planning") {
    val d = dir()
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("x", "double").add("seg", "string")
    Seq(Seq((1L, 1.5), (2L, 2.5)), Seq((3L, 3.5)))
      .zipWithIndex.foreach { case (rows, i) =>
        DeltaWrite.commit(s"$d-stage$i", 0L,
          Seq(s"f$i.parquet" -> rows.toDF("id", "x")))
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
    val df = DeltaRead.readDeltaTable(spark, d,
      predicate = Some(col("seg") === "B"))
    assert(df.inputFiles.map(_.split('/').last).toSet == Set("f1.parquet"),
      df.inputFiles.mkString(", "))
    assert(df.select("id").as[Long].collect().toSeq == Seq(3L))
    // no partition matches → the whole file list prunes away
    val none = DeltaRead.readDeltaTable(spark, d,
      predicate = Some(col("seg") === "C"))
    assert(none.inputFiles.isEmpty, none.inputFiles.mkString(", "))
    assert(none.count() == 0)
    // hand-written adds carry NO data-column stats: a data-column
    // predicate must conservatively keep the partition-matching file
    // while the row filter still removes its rows
    val mixed = DeltaRead.readDeltaTable(spark, d,
      predicate = Some(col("seg") === "A" && col("id") >= 99))
    assert(mixed.inputFiles.map(_.split('/').last).toSet == Set("f0.parquet"),
      mixed.inputFiles.mkString(", "))
    assert(mixed.count() == 0)
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

  test("unknown column-mapping modes and unknown reader features are " +
      "rejected loudly, never silently misread") {
    val d2 = dir()
    DeltaWrite.commit(d2, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a")).toDF("id", "v")))
    val log2 = java.nio.file.Paths.get(d2, "_delta_log")
    java.nio.file.Files.writeString(log2.resolve(f"${1L}%020d.json"),
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(org.json4s.JString(Seq((1L, "a")).toDF("id", "v").schema.json)))},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"shuffled"},"createdTime":0}}
         |""".stripMargin)
    val e2 = intercept[IllegalArgumentException](
      DeltaRead.readDeltaTable(spark, d2))
    assert(e2.getMessage.contains("column mapping"))
    // id mode with a field missing its delta.columnMapping.id is a
    // protocol violation — loud, never a name-based fallback
    val d4 = dir()
    DeltaWrite.commit(d4, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a")).toDF("id", "v")))
    val log4 = java.nio.file.Paths.get(d4, "_delta_log")
    java.nio.file.Files.writeString(log4.resolve(f"${1L}%020d.json"),
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(org.json4s.JString(Seq((1L, "a")).toDF("id", "v").schema.json)))},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id"},"createdTime":0}}
         |""".stripMargin)
    val e4 = intercept[IllegalArgumentException](
      DeltaRead.readDeltaTable(spark, d4))
    assert(e4.getMessage.contains("delta.columnMapping.id"))

    val d3 = dir()
    DeltaWrite.commit(d3, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a")).toDF("id", "v")))
    val log3 = java.nio.file.Paths.get(d3, "_delta_log")
    java.nio.file.Files.writeString(log3.resolve(f"${1L}%020d.json"),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}
        |""".stripMargin)
    val e3 = intercept[IllegalArgumentException](
      DeltaRead.readDeltaTable(spark, d3))
    assert(e3.getMessage.contains("typeWidening"))
  }

  // ---- deletion vectors (delta.io PROTOCOL.md + RoaringFormatSpec) ----

  test("DV codec: Z85 and RoaringBitmapArray round-trip; run and " +
      "bitset containers deserialize") {
    import graft.sources.DeletionVectors._
    // ZeroMQ spec test vector: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B
    // encodes to "HelloWorld"
    val zmq = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B)
      .map(_.toByte)
    assert(z85Encode(zmq) == "HelloWorld")
    assert(z85Decode("HelloWorld").toSeq == zmq.toSeq)
    val uuid = java.util.UUID.fromString(
      "00112233-4455-6677-8899-aabbccddeeff")
    val enc = encodeUuid(uuid)
    assert(enc.length == 20)
    val bb = java.nio.ByteBuffer.wrap(z85Decode(enc))
    assert(new java.util.UUID(bb.getLong, bb.getLong) == uuid)

    // serialize → deserialize round-trip incl. cross-64k-block and
    // cross-32-bit-key values
    val rows = Seq(0L, 3L, 70000L, (1L << 32) + 5L, (1L << 32) + 99999L)
    assert(deserialize(serialize(rows)) == rows)

    // hand-crafted RUN container (cookie 12347, 1 container, run 5..8)
    val run = java.nio.ByteBuffer.allocate(4 + 8 + 4 + 4 + 1 + 4 + 2 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    run.putInt(1681511377).putLong(1L).putInt(0) // magic, 1 bitmap, key 0
    run.putInt(12347 | (0 << 16)) // SERIAL_COOKIE, size-1=0
    run.put(1.toByte) // run flag bitset: container 0 is a run
    run.putShort(0.toShort).putShort(3.toShort) // key 0, card-1 = 3
    // size < 4 with runs → no offset header
    run.putShort(1.toShort) // 1 run
    run.putShort(5.toShort).putShort(3.toShort) // start 5, 3 more
    assert(deserialize(run.array()) == Seq(5L, 6L, 7L, 8L))

    // hand-crafted BITSET container (card 5000 > 4096)
    val bs = java.nio.ByteBuffer
      .allocate(4 + 8 + 4 + 4 + 4 + 4 + 4 + 8192)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bs.putInt(1681511377).putLong(1L).putInt(0)
    bs.putInt(12346).putInt(1) // no-run cookie, 1 container
    bs.putShort(0.toShort).putShort(4999.toShort) // card-1
    bs.putInt(4 + 4 + 4 + 4) // offset header
    var w = 0
    while (w < 1024) {
      var word = 0L
      var b = 0
      while (b < 64) {
        if (w * 64 + b < 5000) word |= (1L << b)
        b += 1
      }
      bs.putLong(word)
      w += 1
    }
    assert(deserialize(bs.array()) == (0L until 5000L))
  }

  test("DV file round-trip: size, CRC and cardinality are verified") {
    import graft.sources.DeletionVectors._
    val d = dir()
    val uuid = java.util.UUID.randomUUID()
    val rows = Seq(1L, 3L, 4L, 70001L)
    val (off, size) = writeDvFile(
      java.nio.file.Paths.get(d, s"deletion_vector_$uuid.bin"), rows)
    val desc = Descriptor("u", encodeUuid(uuid), Some(off), size, rows.length.toLong)
    assert(deletedRows(d, desc) == rows)
    // wrong cardinality fails loudly
    intercept[IllegalArgumentException](
      deletedRows(d, desc.copy(cardinality = 2L)))
    // corrupt a data byte → CRC mismatch
    val f = java.nio.file.Paths.get(d, s"deletion_vector_$uuid.bin")
    val bytes = java.nio.file.Files.readAllBytes(f)
    bytes(7) = (bytes(7) ^ 0x5A).toByte
    java.nio.file.Files.write(f, bytes)
    val e = intercept[IllegalArgumentException](deletedRows(d, desc))
    assert(e.getMessage.contains("checksum"))
  }

  test("adds with deletion vectors scan correct: masked rows absent, " +
      "time travel to the pre-DV version restores them") {
    import graft.sources.DeletionVectors
    val d = dir()
    DeltaWrite.commit(d, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
        .toDF("id", "v"),
      "f1.parquet" -> Seq((5L, "e"), (6L, "f")).toDF("id", "v")))
    // commit 1: attach a DV to f0 deleting physical rows 1 and 3
    // (ids 2 and 4) — protocol shape: remove (f0, no DV) + add (f0, DV)
    val uuid = java.util.UUID.randomUUID()
    val (off, size) = DeletionVectors.writeDvFile(
      java.nio.file.Paths.get(d, s"deletion_vector_$uuid.bin"), Seq(1L, 3L))
    val dvJson = s"""{"storageType":"u","pathOrInlineDv":"${DeletionVectors.encodeUuid(uuid)}","offset":$off,"sizeInBytes":$size,"cardinality":2}"""
    val log = java.nio.file.Paths.get(d, "_delta_log")
    java.nio.file.Files.writeString(log.resolve(f"${1L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}
         |{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":$dvJson}}
         |{"remove":{"path":"f0.parquet","deletionTimestamp":0,"dataChange":true}}
         |""".stripMargin)
    val now = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(now == Seq((1L, "a"), (3L, "c"), (5L, "e"), (6L, "f")),
      s"DV mask not applied: $now")
    val v0 = DeltaRead.readDeltaTable(spark, d, versionAsOf = Some(0L))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(v0.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L, 6L),
      s"pre-DV time travel wrong: $v0")
  }

  test("DeltaWrite.merge: CoW upsert into a real _delta_log table — " +
      "one atomic commit per merge, untouched files never rewritten, " +
      "time travel keeps every prior state, no-op batches commit " +
      "nothing, schema drift rejects") {
    val d = dir()
    val b1 = (1L to 12L).map(i => (i, s"v$i")).toDF("id", "v")
    DeltaWrite.merge(spark, d, b1, Seq("id"), buckets = 4)
    val filesBefore = DeltaRead.readDeltaTable(spark, d).inputFiles.toSet
    assert(filesBefore.size > 1, s"initial bucketing wrote one file: $filesBefore")
    def bytes(f: String) = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f.stripPrefix("file:")))
    val byteSnapshot = filesBefore.map(f => f -> bytes(f).toSeq).toMap

    DeltaWrite.merge(spark, d,
      Seq((1L, "V1"), (2L, "V2"), (100L, "V100")).toDF("id", "v"), Seq("id"))
    val now = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    val expect = ((3L to 12L).map(i => (i, s"v$i")) ++
      Seq((1L, "V1"), (2L, "V2"), (100L, "V100"))).sortBy(_._1)
    assert(now == expect, s"merged state wrong: $now")
    // exactly one commit added, and it carried the whole merge
    val logs = java.nio.file.Files.list(
      java.nio.file.Paths.get(d, "_delta_log")).iterator()
    val commits = scala.jdk.CollectionConverters.IteratorHasAsScala(logs)
      .asScala.map(_.getFileName.toString).filter(_.endsWith(".json")).toSeq
    assert(commits.sorted.map(_.take(20).toLong) == Seq(0L, 1L), commits.toString)
    // files live before AND after the merge were never rewritten —
    // the untouched-bucket contract
    val filesAfter = DeltaRead.readDeltaTable(spark, d).inputFiles.toSet
    val carried = filesBefore.intersect(filesAfter)
    assert(carried.nonEmpty, "merge rewrote every file (O(table), not O(touched))")
    carried.foreach(f => assert(bytes(f).toSeq == byteSnapshot(f),
      s"carried file rewritten in place: $f"))
    // time travel to the pre-merge state
    val v0 = DeltaRead.readDeltaTable(spark, d, versionAsOf = Some(0L))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(v0 == b1.orderBy("id").as[(Long, String)].collect().toSeq, v0.toString)
    // empty batch: no commit
    DeltaWrite.merge(spark, d,
      Seq.empty[(Long, String)].toDF("id", "v"), Seq("id"))
    val v1 = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(v1 == expect, "empty merge changed state")
    // schema drift rejects loudly
    val e = intercept[IllegalArgumentException](DeltaWrite.merge(spark, d,
      Seq((1L, 2L)).toDF("id", "other"), Seq("id")))
    assert(e.getMessage.contains("schema"), e.getMessage)
  }

  test("writeCheckpoint bounds the replay: after log cleanup only " +
      "the checkpoint + later commits remain and the snapshot still " +
      "reads; DV descriptors and merge auto-checkpoints survive") {
    val d = dir()
    // versions 0..6 via merges, auto-checkpoint every 3 commits
    DeltaWrite.merge(spark, d, (1L to 6L).map(i => (i, s"v$i")).toDF("id", "v"),
      Seq("id"), buckets = 2, checkpointInterval = 3)
    (1 to 6).foreach(k => DeltaWrite.merge(spark, d,
      Seq((k.toLong, s"u$k")).toDF("id", "v"), Seq("id"),
      checkpointInterval = 3))
    val log = java.nio.file.Paths.get(d, "_delta_log")
    assert(java.nio.file.Files.exists(
      log.resolve(f"${3L}%020d.checkpoint.parquet")) &&
      java.nio.file.Files.exists(
        log.resolve(f"${6L}%020d.checkpoint.parquet")),
      "merge did not auto-checkpoint at the interval")
    val last = java.nio.file.Files.readString(
      log.resolve("_last_checkpoint"))
    assert(last.contains("\"version\":6"), last)
    // log cleanup: drop every JSON commit at or below the checkpoint
    (0L to 6L).foreach(v =>
      java.nio.file.Files.delete(log.resolve(f"$v%020d.json")))
    val got = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == (1L to 6L).map(i => (i, s"u$i")),
      s"checkpoint-bounded read wrong: $got")

    // DV descriptors re-emit verbatim into the checkpoint
    val d2 = dir()
    DeltaWrite.commit(d2, 0L, Seq("f0.parquet" ->
      (1L to 5L).map(i => (i, s"x$i")).toDF("id", "v")
        .coalesce(1).sortWithinPartitions("id")))
    DeltaWrite.commitDeletionVector(d2, 1L, "f0.parquet", Seq(1L, 3L))
    assert(DeltaWrite.writeCheckpoint(spark, d2) == 1L)
    val log2 = java.nio.file.Paths.get(d2, "_delta_log")
    (0L to 1L).foreach(v =>
      java.nio.file.Files.delete(log2.resolve(f"$v%020d.json")))
    val masked = DeltaRead.readDeltaTable(spark, d2)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(masked == Seq((1L, "x1"), (3L, "x3"), (5L, "x5")),
      s"DV through checkpoint wrong: $masked")
  }

  test("txn watermarks: mergeBatch skips replayed batch ids, the " +
      "watermark rides the SAME commit as the data and survives a " +
      "checkpoint + log cleanup") {
    val d = dir()
    val app = "appA"
    assert(DeltaWrite.mergeBatch(spark, d, app, 0L,
      (1L to 4L).map(i => (i, s"v$i")).toDF("id", "v"), Seq("id")) == 4L)
    assert(DeltaWrite.mergeBatch(spark, d, app, 1L,
      Seq((2L, "u2")).toDF("id", "v"), Seq("id")) == 1L)
    // replaying batch 1 (even with DIFFERENT content) is skipped
    assert(DeltaWrite.mergeBatch(spark, d, app, 1L,
      Seq((2L, "BAD")).toDF("id", "v"), Seq("id")) == -1L)
    // another app has its own watermark
    assert(DeltaWrite.mergeBatch(spark, d, "appB", 0L,
      Seq((9L, "b")).toDF("id", "v"), Seq("id")) == 1L)
    assert(DeltaRead.lastTxnVersion(spark, d, app).contains(1L))
    assert(DeltaRead.lastTxnVersion(spark, d, "appB").contains(0L))
    // the watermark survives checkpoint-bounded replay + log cleanup
    val v = DeltaWrite.writeCheckpoint(spark, d)
    val log = java.nio.file.Paths.get(d, "_delta_log")
    (0L to v).foreach(x =>
      java.nio.file.Files.delete(log.resolve(f"$x%020d.json")))
    assert(DeltaRead.lastTxnVersion(spark, d, app).contains(1L),
      "txn watermark lost across checkpoint")
    assert(DeltaWrite.mergeBatch(spark, d, app, 1L,
      Seq((2L, "BAD")).toDF("id", "v"), Seq("id")) == -1L)
    val got = DeltaRead.readDeltaTable(spark, d).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "v1"), (2L, "u2"), (3L, "v3"), (4L, "v4"),
      (9L, "b")), s"state after replays: $got")
  }

  test("OPTIMIZE bounds the merge target's file count: one " +
      "dataChange=false rearrangement commit re-buckets the live set, " +
      "state and CDF are unchanged, time travel still works") {
    val d = dir()
    DeltaWrite.merge(spark, d, (1L to 8L).map(i => (i, s"v$i")).toDF("id", "v"),
      Seq("id"), buckets = 2, enableCdf = true, maxLiveFiles = 4)
    // each merge adds an upsert file; with maxLiveFiles=4 the 4th
    // merge pushes the live set past the cap and auto-optimizes
    (1 to 5).foreach(k => DeltaWrite.merge(spark, d,
      Seq((k.toLong, s"u$k")).toDF("id", "v"), Seq("id"),
      buckets = 2, maxLiveFiles = 4))
    val files = DeltaRead.readDeltaTable(spark, d).inputFiles
    assert(files.length <= 4,
      s"auto-optimize did not bound the file count: ${files.length}")
    assert(files.exists(_.contains("opt-")), files.mkString(", "))
    val got = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == (1L to 8L).map(i =>
      (i, if (i <= 5) s"u$i" else s"v$i")), s"post-optimize state: $got")
    // the CHANGE FEED shows only the real merges — the rearrangement
    // commits contribute zero rows (dataChange=false + no cdc)
    val perVersion = DeltaRead.readChanges(spark, d, 1L)
      .groupBy("_commit_version").count()
      .orderBy("_commit_version")
      .as[(Long, Long)].collect().toMap
    val optVersions = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(
        java.nio.file.Paths.get(d, "_delta_log"))
      val commits = try s.iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".json")).toSeq
      finally s.close()
      // an optimize commit is ALL-rearrangement: every file action
      // carries dataChange=false (later merges legitimately reference
      // opt- files in their removes, so name matching won't do)
      commits.map(_.take(20).toLong).sorted.filter { v =>
        val text = java.nio.file.Files.readString(java.nio.file.Paths
          .get(d, "_delta_log", f"$v%020d.json"))
        text.contains("\"dataChange\":false") &&
          !text.contains("\"dataChange\":true")
      }
    }
    assert(optVersions.nonEmpty, "no optimize commit found")
    optVersions.foreach(v => assert(!perVersion.contains(v),
      s"optimize commit $v leaked CDF rows: $perVersion"))
    // pre-optimize snapshots still read (time travel over carried files)
    val v1 = DeltaRead.readDeltaTable(spark, d, versionAsOf = Some(1L))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(v1.toMap.apply(1L) == "u1" && v1.toMap.apply(2L) == "v2", v1)
  }

  test("merge on a CDF-enabled table writes cdc actions with the " +
      "TRUE row-level changes — carried rows of rewritten files do " +
      "NOT appear in the feed; non-CDF tables get no cdc files") {
    val d = dir()
    val b1 = (1L to 8L).map(i => (i, s"v$i")).toDF("id", "v")
    DeltaWrite.merge(spark, d, b1, Seq("id"), buckets = 2,
      enableCdf = true)
    DeltaWrite.merge(spark, d,
      Seq((2L, "V2"), (100L, "V100")).toDF("id", "v"), Seq("id"))
    val changes = DeltaRead.readChanges(spark, d, 1L)
      .orderBy("_change_type", "id")
      .select("id", "v", "_change_type")
      .as[(Long, String, String)].collect().toSeq
    // key 2 updates (pre+post), key 100 inserts; keys 1 and 3-8 were
    // carried through the bucket rewrite and must NOT appear
    assert(changes == Seq(
      (100L, "V100", "insert"),
      (2L, "V2", "update_postimage"),
      (2L, "v2", "update_preimage")), s"merge CDF wrong: $changes")
    // the creation commit derives as pure inserts, so the full range
    // reads end-to-end
    val all = DeltaRead.readChanges(spark, d, 0L)
    assert(all.filter(col("_commit_version") === 0L).count() == 8L)
    // a non-CDF table's merge writes NO cdc files, and readChanges
    // rejects (feed not enabled)
    val d2 = dir()
    DeltaWrite.merge(spark, d2, b1, Seq("id"), buckets = 2)
    DeltaWrite.merge(spark, d2, Seq((2L, "X")).toDF("id", "v"), Seq("id"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(d2, "_change_data")),
      "non-CDF merge wrote change data")
    val e = intercept[IllegalArgumentException](
      DeltaRead.readChanges(spark, d2, 0L))
    assert(e.getMessage.contains("change data feed"), e.getMessage)
  }

  test("DV sidecars decode in EXECUTORS: the delete side of the " +
      "anti-join is a binaryFile scan + flatMap, never a " +
      "driver-materialized row list") {
    val d = dir()
    DeltaWrite.commit(d, 0L, Seq("f0.parquet" ->
      spark.read.parquet(s"$sf/nation.parquet")
        .coalesce(1).sortWithinPartitions("n_nationkey")))
    DeltaWrite.commitDeletionVector(d, 1L, "f0.parquet", Seq(0L, 2L, 4L))
    val df = DeltaRead.readDeltaTable(spark, d)
    // driver work is O(files): the analyzed plan carries the sidecar
    // SCAN (its decode runs where the task runs), and no local
    // relation of pre-decoded (file, row) pairs exists anywhere
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("binaryFile"), analyzed.take(3000))
    assert(!analyzed.contains("LocalRelation"), analyzed.take(3000))
    val rows = df.orderBy("n_nationkey")
      .select("n_nationkey").as[Int].collect().toSeq
    val all = spark.read.parquet(s"$sf/nation.parquet")
      .orderBy("n_nationkey").select("n_nationkey").as[Int].collect()
    val expect = all.zipWithIndex
      .filterNot { case (_, i) => i == 0 || i == 2 || i == 4 }
      .map(_._1).toSeq
    assert(rows == expect, s"executor-decoded DV mask wrong: $rows")
  }

  test("predicates and pruning reach the scan THROUGH the DV " +
      "anti-join path") {
    val d = dir()
    DeltaWrite.commit(d, 0L, Seq("f0.parquet" ->
      spark.read.parquet(s"$sf/nation.parquet")
        .coalesce(1).sortWithinPartitions("n_nationkey")))
    DeltaWrite.commitDeletionVector(d, 1L, "f0.parquet", Seq(0L, 1L))
    val df = DeltaRead.readDeltaTable(spark, d)
      .filter(col("n_regionkey") === 1).select("n_name")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_regionkey), " +
      "EqualTo(n_regionkey,1)]"), plan.take(3000))
    // the scan reads only the needed columns (+ _metadata, which is
    // synthesized, not stored) — not the full nation schema
    assert(!plan.contains("n_comment"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // nationkeys 0 (AFRICA? region of key0=ALGERIA region 0)… assert
    // by recomputing: rows with n_regionkey=1 minus DV'd positions
    val expect = spark.read.parquet(s"$sf/nation.parquet")
      .orderBy("n_nationkey").collect()
      .zipWithIndex.filterNot { case (_, i) => i == 0 || i == 1 }
      .map(_._1).filter(_.getAs[Number]("n_regionkey").intValue == 1)
      .map(_.getAs[String]("n_name")).toSeq.sorted
    assert(df.orderBy("n_name").as[String].collect().toSeq == expect)
  }

  test("inline ('i') deletion vectors decode from the action itself") {
    import graft.sources.DeletionVectors
    val d = dir()
    DeltaWrite.commit(d, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")))
    val data = DeletionVectors.serialize(Seq(0L))
    val pad = (4 - data.length % 4) % 4
    val payload = DeletionVectors.z85Encode(data ++ Array.fill(pad)(0.toByte))
    // cardinality counts SET rows; Z85 zero-padding adds none
    val dvJson = s"""{"storageType":"i","pathOrInlineDv":"$payload","sizeInBytes":${data.length + pad},"cardinality":1}"""
    val log = java.nio.file.Paths.get(d, "_delta_log")
    java.nio.file.Files.writeString(log.resolve(f"${1L}%020d.json"),
      s"""{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":$dvJson}}
         |{"remove":{"path":"f0.parquet","deletionTimestamp":0,"dataChange":true}}
         |""".stripMargin)
    val got = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "b"), (3L, "c")), s"inline DV not applied: $got")
  }

  test("partitioned reads above unionGroupMax plan as ONE scan node " +
      "with a broadcast partition-value map, values identical") {
    val d = dir()
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("x", "double").add("seg", "string")
    Seq(("A", Seq((1L, 1.5), (2L, 2.5))), ("B", Seq((3L, 3.5))),
        ("C", Seq((4L, 4.5))))
      .zipWithIndex.foreach { case ((_, rows), i) =>
        DeltaWrite.commit(s"$d-stage$i", 0L,
          Seq(s"f$i.parquet" -> rows.toDF("id", "x")))
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
         |{"add":{"path":"f2.parquet","partitionValues":{"seg":"C"},"size":1,"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    val expected = Seq((1L, 1.5, "A"), (2L, 2.5, "A"), (3L, 3.5, "B"),
      (4L, 4.5, "C"))
    def scanCount(df: org.apache.spark.sql.DataFrame): Int = {
      val p = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      p.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.size
    }
    // 3 live partitions > unionGroupMax=1 → broadcast-map path
    val wide = DeltaRead.readDeltaTable(spark, d, unionGroupMax = 1)
    assert(scanCount(wide) == 1,
      s"expected ONE scan node, plan:\n${wide.queryExecution.executedPlan}")
    val gotWide = wide.orderBy("id")
      .as[(Long, Double, String)].collect().toSeq
    assert(gotWide == expected, s"broadcast-map path wrong: $gotWide")
    // default threshold keeps the cheap literal-union plan for 3 groups
    val narrow = DeltaRead.readDeltaTable(spark, d)
    assert(scanCount(narrow) == 3)
    assert(narrow.orderBy("id").as[(Long, Double, String)].collect().toSeq
      == expected)
  }

  test("column mapping 'name' mode: physical col-uuid names (nested " +
      "included) and physical-keyed partition values read back " +
      "logical; a DV composes on top") {
    import org.apache.spark.sql.types._
    val d = dir()
    def meta(phys: String, id: Int) = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id.toLong).build()
    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true, meta("col-aaa", 1)),
      StructField("info", StructType(Seq(
        StructField("tag", StringType, nullable = true, meta("col-ccc", 3)))),
        nullable = true, meta("col-bbb", 2)),
      StructField("seg", StringType, nullable = true, meta("col-ddd", 4))))
    // the data file stores PHYSICAL names, partition col absent
    val data = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("a", "b")
      .select(col("a").as("col-aaa"),
        struct(col("b").as("col-ccc")).as("col-bbb"))
      .coalesce(1).sortWithinPartitions("col-aaa")
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
         |{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":$schemaJson,"partitionColumns":["seg"],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}
         |{"add":{"path":"f0.parquet","partitionValues":{"col-ddd":"A"},"size":1,"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    val got = DeltaRead.readDeltaTable(spark, d)
    assert(got.schema.fieldNames.toSeq == Seq("id", "info", "seg"))
    assert(got.schema("info").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("tag"), "nested field must be logical")
    val rows = got.orderBy("id")
      .select(col("id"), col("info.tag"), col("seg"))
      .as[(Long, String, String)].collect().toSeq
    assert(rows == Seq((1L, "x", "A"), (2L, "y", "A"), (3L, "z", "A")),
      s"mapped read wrong: $rows")
    // a deletion vector composes with the mapping (both default-on
    // in modern writers): mask physical row 1 (id 2)
    val uuid = java.util.UUID.randomUUID()
    val (off, size) = graft.sources.DeletionVectors.writeDvFile(
      java.nio.file.Paths.get(d, s"deletion_vector_$uuid.bin"), Seq(1L))
    java.nio.file.Files.writeString(log.resolve(f"${1L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","columnMapping"],"writerFeatures":["deletionVectors","columnMapping"]}}
         |{"add":{"path":"f0.parquet","partitionValues":{"col-ddd":"A"},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"${graft.sources.DeletionVectors.encodeUuid(uuid)}","offset":$off,"sizeInBytes":$size,"cardinality":1}}}
         |{"remove":{"path":"f0.parquet","deletionTimestamp":0,"dataChange":true}}
         |""".stripMargin)
    val masked = DeltaRead.readDeltaTable(spark, d).orderBy("id")
      .select(col("id"), col("info.tag"), col("seg"))
      .as[(Long, String, String)].collect().toSeq
    assert(masked == Seq((1L, "x", "A"), (3L, "z", "A")),
      s"DV over mapped table wrong: $masked")
  }

  test("column mapping 'id' mode: field ids attach to the read " +
      "schema and physical names resolve the scan — adversarially " +
      "SWAPPED logical/physical names prove logical names are " +
      "ignored; nested fields and a DV compose") {
    import org.apache.spark.sql.types._
    val d = dir()
    def meta(phys: String, id: Int) = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id.toLong).build()
    // physical name of 'id' is "v" and of 'v' is "id" — a reader that
    // fell back to LOGICAL names would swap the columns; physical-name
    // or field-id resolution (the protocol's two equivalent channels,
    // both carried by the read schema) is right
    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true, meta("v", 1)),
      StructField("v", StringType, nullable = true, meta("id", 2)),
      StructField("info", StructType(Seq(
        StructField("tag", StringType, nullable = true, meta("col-tag", 4)))),
        nullable = true, meta("col-info", 3)),
      StructField("seg", StringType, nullable = true, meta("col-seg", 5))))
    def fid(id: Int) = new MetadataBuilder()
      .putLong("parquet.field.id", id.toLong).build()
    val writeSchema = StructType(Seq(
      StructField("v", LongType, nullable = true, fid(1)),
      StructField("id", StringType, nullable = true, fid(2)),
      StructField("col-info", StructType(Seq(
        StructField("col-tag", StringType, nullable = true, fid(4)))),
        nullable = true, fid(3))))
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row(1L, "x", Row("p")), Row(2L, "y", Row("q")), Row(3L, "z", Row("r")))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val data = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), writeSchema)
      .sortWithinPartitions("v")
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
         |{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":$schemaJson,"partitionColumns":["seg"],"configuration":{"delta.columnMapping.mode":"id"},"createdTime":0}}
         |{"add":{"path":"f0.parquet","partitionValues":{"col-seg":"A"},"size":1,"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    val got = DeltaRead.readDeltaTable(spark, d)
    assert(got.schema.fieldNames.toSeq == Seq("id", "v", "info", "seg"))
    // the field-id plumbing must not leak into the surfaced schema
    assert(got.schema.fields.forall(_.metadata == Metadata.empty),
      s"id-mode read leaked schema metadata: ${got.schema.json}")
    val out = got.orderBy("id")
      .select(col("id"), col("v"), col("info.tag"), col("seg"))
      .as[(Long, String, String, String)].collect().toSeq
    assert(out == Seq((1L, "x", "p", "A"), (2L, "y", "q", "A"),
      (3L, "z", "r", "A")), s"id-mapped read wrong: $out")
    // a deletion vector composes: mask physical row 1 (id 2)
    val uuid = java.util.UUID.randomUUID()
    val (off, size) = graft.sources.DeletionVectors.writeDvFile(
      java.nio.file.Paths.get(d, s"deletion_vector_$uuid.bin"), Seq(1L))
    java.nio.file.Files.writeString(log.resolve(f"${1L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","columnMapping"],"writerFeatures":["deletionVectors","columnMapping"]}}
         |{"add":{"path":"f0.parquet","partitionValues":{"col-seg":"A"},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"${graft.sources.DeletionVectors.encodeUuid(uuid)}","offset":$off,"sizeInBytes":$size,"cardinality":1}}}
         |{"remove":{"path":"f0.parquet","deletionTimestamp":0,"dataChange":true}}
         |""".stripMargin)
    val masked = DeltaRead.readDeltaTable(spark, d).orderBy("id")
      .select(col("id"), col("v"), col("seg"))
      .as[(Long, String, String)].collect().toSeq
    assert(masked == Seq((1L, "x", "A"), (3L, "z", "A")),
      s"DV over id-mapped table wrong: $masked")
    // field-id resolution is scoped to the SCAN (a reader option) —
    // an id-mode read must never flip the shared session conf as a
    // side effect (a user who disabled it stays disabled elsewhere)
    assert(spark.conf.get("spark.sql.parquet.fieldId.read.enabled")
      == "false",
      "id-mode read mutated the session-level field-id conf")
  }

  test("a complete multi-part checkpoint bounds the replay like a " +
      "single-file one") {
    val d = dir()
    DeltaWrite.commit(d, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a")).toDF("id", "v")))
    DeltaWrite.commit(d, 1L,
      adds = Seq("f1.parquet" -> Seq((2L, "b")).toDF("id", "v"),
        "f2.parquet" -> Seq((3L, "c")).toDF("id", "v")),
      removes = Seq("f0.parquet"))
    val log = java.nio.file.Paths.get(d, "_delta_log")
    val part1 = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":${org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(org.json4s.JString(Seq((1L, "a")).toDF("id", "v").schema.json)))},"partitionColumns":[],"configuration":{},"createdTime":0}}""",
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
    val part2 = Seq(
      """{"add":{"path":"f2.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
    def writePart(rows: Seq[String], idx: Int): Unit = {
      val stage = s"$d/_ck_stage$idx"
      spark.read.json(rows.toDS()).coalesce(1)
        .write.mode("overwrite").parquet(stage)
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
      val f = try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
      java.nio.file.Files.move(f, log.resolve(
        f"${1L}%020d.checkpoint.$idx%010d.${2}%010d.parquet")): Unit
    }
    writePart(part1, 1)
    writePart(part2, 2)
    java.nio.file.Files.delete(log.resolve(f"${0L}%020d.json"))
    java.nio.file.Files.delete(log.resolve(f"${1L}%020d.json"))
    val got = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "b"), (3L, "c")),
      s"multi-part checkpoint replay wrong: $got")
  }

  test("percent-decoding handles ':' in the first segment and " +
      "'?'/'#' escapes exactly (java.net.URI would scheme-parse or " +
      "truncate; end-to-end reads of such names are then up to the " +
      "filesystem — Hadoop local FS itself rejects ':' file names)") {
    // the ADVICE NPE case: URI("t:a%20b.parquet").getPath is null
    assert(DeltaRead.pctDecode("t:a%20b.parquet") == "t:a b.parquet")
    // '?'/'#' are escapes to decode, not query/fragment separators
    assert(DeltaRead.pctDecode("x%3Fy%23z/a%25.parquet") == "x?y#z/a%.parquet")
    // multi-byte UTF-8 escapes decode as one code point
    assert(DeltaRead.pctDecode("caf%C3%A9=1/f.parquet") == "café=1/f.parquet")
    // no escapes → identity (fast path)
    assert(DeltaRead.pctDecode("seg=a/f.parquet") == "seg=a/f.parquet")
  }

  test("CDF: cdc actions are authoritative, other commits derive " +
      "insert/delete from dataChange file actions") {
    val d = dir()
    DeltaWrite.commit(d, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      "f1.parquet" -> Seq((3L, "c")).toDF("id", "v")),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.commit(d, 1L, adds = Nil, removes = Seq("f1.parquet"))
    // v2: UPDATE id=2 via cdc images; the rewrite actions must be
    // ignored by the CDF reader but still drive the snapshot
    DeltaWrite.commitCdc(d, 2L,
      cdcFiles = Seq("cdc0.parquet" -> Seq(
        (2L, "b", "update_preimage"),
        (2L, "B2", "update_postimage")).toDF("id", "v", "_change_type")),
      adds = Seq("f2.parquet" -> Seq((1L, "a"), (2L, "B2")).toDF("id", "v")),
      removes = Seq("f0.parquet"))
    val changes = DeltaRead.readChanges(spark, d, 0L)
      .select("id", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(changes == Set(
      (1L, "a", "insert", 0L), (2L, "b", "insert", 0L),
      (3L, "c", "insert", 0L),
      (3L, "c", "delete", 1L),
      (2L, "b", "update_preimage", 2L),
      (2L, "B2", "update_postimage", 2L)), changes)
    // range bounds: from=1 drops the inserts; to=1 drops the update
    val tail = DeltaRead.readChanges(spark, d, 1L)
      .select("_commit_version").as[Long].collect().toSeq
    assert(tail.sorted == Seq(1L, 2L, 2L), tail)
    val mid = DeltaRead.readChanges(spark, d, 1L, toVersion = Some(1L))
      .select("_change_type").as[String].collect().toSeq
    assert(mid == Seq("delete"), mid)
    // the snapshot still reflects the cdc commit's REWRITE actions
    val snap = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(snap == Seq((1L, "a"), (2L, "B2")), snap)
  }

  test("CDF gates fail loudly: feed disabled, missing commit in " +
      "range, DV rewrite without cdc") {
    val d = dir()
    DeltaWrite.commit(d, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a")).toDF("id", "v")))
    val e1 = intercept[IllegalArgumentException](
      DeltaRead.readChanges(spark, d, 0L))
    assert(e1.getMessage.contains("enableChangeDataFeed"), e1.getMessage)

    val d2 = dir()
    DeltaWrite.commit(d2, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a")).toDF("id", "v")),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val e2 = intercept[IllegalArgumentException](
      DeltaRead.readChanges(spark, d2, 0L, toVersion = Some(3L)))
    assert(e2.getMessage.contains("absent"), e2.getMessage)

    // a DV-attach commit cannot be derived into row-level changes —
    // but commits after it must still read clean on their own
    DeltaWrite.commit(d2, 1L, Seq(
      "f1.parquet" -> Seq((5L, "e"), (6L, "f")).toDF("id", "v")))
    DeltaWrite.commitDeletionVector(d2, 2L, "f1.parquet", Seq(0L))
    val e3 = intercept[IllegalArgumentException](
      DeltaRead.readChanges(spark, d2, 2L))
    assert(e3.getMessage.contains("deletion-vector"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](
      DeltaRead.readChanges(spark, d2, 0L))
    assert(e4.getMessage.contains("deletion-vector"), e4.getMessage)
    DeltaWrite.commit(d2, 3L, Seq(
      "f3.parquet" -> Seq((7L, "g")).toDF("id", "v")))
    val post = DeltaRead.readChanges(spark, d2, 3L)
      .select("id", "_change_type").as[(Long, String)].collect().toSeq
    assert(post == Seq((7L, "insert")), post)
  }

  test("CDF plans as at most two scan nodes; a file inserted then " +
      "deleted in-range is scanned once and fans out") {
    val d = dir()
    // 6 commits: 0 inserts fA+fB, 1..2 insert more, 3 removes fA,
    // 4 cdc, 5 removes fB — derived files all share TWO scan nodes
    DeltaWrite.commit(d, 0L, Seq(
      "fA.parquet" -> Seq((1L, "a")).toDF("id", "v"),
      "fB.parquet" -> Seq((2L, "b")).toDF("id", "v")),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.commit(d, 1L, Seq("fC.parquet" -> Seq((3L, "c")).toDF("id", "v")))
    DeltaWrite.commit(d, 2L, Seq("fD.parquet" -> Seq((4L, "d")).toDF("id", "v")))
    DeltaWrite.commit(d, 3L, adds = Nil, removes = Seq("fA.parquet"))
    DeltaWrite.commitCdc(d, 4L, cdcFiles = Seq("cdc0.parquet" -> Seq(
      (2L, "b", "update_preimage"), (2L, "b2", "update_postimage"))
      .toDF("id", "v", "_change_type")))
    DeltaWrite.commit(d, 5L, adds = Nil, removes = Seq("fB.parquet"))
    val df = DeltaRead.readChanges(spark, d, 0L)
    val scans = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 2, s"expected 2 scan nodes, got ${scans.size}:\n" +
      df.queryExecution.executedPlan.toString.take(3000))
    // fA appears as insert@0 AND delete@3 from ONE scan of the file
    val fa = df.filter(col("id") === 1L)
      .select("_change_type", "_commit_version")
      .as[(String, Long)].collect().toSet
    assert(fa == Set(("insert", 0L), ("delete", 3L)), fa)
    // 4 inserts + 2 deletes + 2 cdc images
    assert(df.count() == 8, df.collect().mkString("\n"))
  }

  test("CDF composes with column-mapping 'name' mode: physical names " +
      "in data and cdc files, physical-keyed partition values, " +
      "logical names out") {
    import org.apache.spark.sql.types._
    val d = dir()
    def meta(phys: String, id: Int) = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id.toLong).build()
    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true, meta("col-aaa", 1)),
      StructField("v", StringType, nullable = true, meta("col-bbb", 2)),
      StructField("seg", StringType, nullable = true, meta("col-ccc", 3))))
    // stage the physical-named data + cdc parquet through the writer
    def stage(df: org.apache.spark.sql.DataFrame, name: String,
        destSub: String = ""): Unit = {
      val st = s"$d-stage-$name"
      DeltaWrite.commit(st, 0L, Seq(name -> df))
      val dest = java.nio.file.Paths.get(d, destSub, name)
      java.nio.file.Files.createDirectories(dest.getParent)
      java.nio.file.Files.move(java.nio.file.Paths.get(st, name), dest): Unit
    }
    stage(Seq((1L, "x"), (2L, "y")).toDF("a", "b")
      .select(col("a").as("col-aaa"), col("b").as("col-bbb")), "f0.parquet")
    stage(Seq((2L, "y", "update_preimage"), (2L, "Y2", "update_postimage"))
      .toDF("a", "b", "t")
      .select(col("a").as("col-aaa"), col("b").as("col-bbb"),
        col("t").as("_change_type")), "cdc0.parquet", "_change_data")
    val log = java.nio.file.Paths.get(d, "_delta_log")
    java.nio.file.Files.createDirectories(log)
    val schemaJson = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        org.json4s.JString(logical.json)))
    java.nio.file.Files.writeString(log.resolve(f"${0L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
         |{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":$schemaJson,"partitionColumns":["seg"],"configuration":{"delta.columnMapping.mode":"name","delta.enableChangeDataFeed":"true"},"createdTime":0}}
         |{"add":{"path":"f0.parquet","partitionValues":{"col-ccc":"A"},"size":1,"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    java.nio.file.Files.writeString(log.resolve(f"${1L}%020d.json"),
      s"""{"remove":{"path":"f0.parquet","deletionTimestamp":0,"dataChange":true,"partitionValues":{"col-ccc":"A"}}}
         |""".stripMargin)
    java.nio.file.Files.writeString(log.resolve(f"${2L}%020d.json"),
      s"""{"cdc":{"path":"_change_data/cdc0.parquet","partitionValues":{"col-ccc":"A"},"size":1,"dataChange":false}}
         |""".stripMargin)
    val changes = DeltaRead.readChanges(spark, d, 0L)
    assert(changes.schema.fieldNames.toSeq ==
      Seq("id", "v", "seg", "_change_type", "_commit_version"))
    val got = changes
      .select("id", "v", "seg", "_change_type", "_commit_version")
      .as[(Long, String, String, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "x", "A", "insert", 0L), (2L, "y", "A", "insert", 0L),
      (1L, "x", "A", "delete", 1L), (2L, "y", "A", "delete", 1L),
      (2L, "y", "A", "update_preimage", 2L),
      (2L, "Y2", "A", "update_postimage", 2L)), s"mapped CDF wrong: $got")
  }

  // ---- partitioned writes / staged single-job rewrites / vacuum ----

  private def fileBytes(p: java.nio.file.Path): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val w = java.nio.file.Files.walk(p)
    try w.iterator().asScala
      .filter(f => java.nio.file.Files.isRegularFile(f) &&
        !f.startsWith(p.resolve("_delta_log")))
      .map(f => p.relativize(f).toString -> java.nio.file.Files.size(f))
      .toMap
    finally w.close()
  }

  test("partitioned merge: partitionValues land in the log, the final " +
      "state round-trips, untouched partitions' files are untouched, " +
      "and the merge commit only names the batch's partitions") {
    val d = dir()
    val base = Seq((1L, "A", 0.0), (2L, "A", 0.0), (3L, "B", 0.0),
      (4L, "B", 0.0), (5L, "C", 0.0)).toDF("id", "seg", "bal")
    DeltaWrite.merge(spark, d, base, Seq("id"), buckets = 6,
      partitionBy = Seq("seg"))
    assert(DeltaRead.readDeltaTable(spark, d).count() == 5)
    val before = fileBytes(java.nio.file.Paths.get(d))
    assert(before.keys.exists(_.startsWith("seg=B/")), before.keys.toSeq)
    // merge touches only seg=A keys
    DeltaWrite.merge(spark, d,
      Seq((1L, "A", 10.0), (6L, "A", 60.0)).toDF("id", "seg", "bal"),
      Seq("id"))
    val after = fileBytes(java.nio.file.Paths.get(d))
    before.filter(_._1.startsWith("seg=B/")).foreach { case (f, sz) =>
      assert(after.get(f).contains(sz), s"untouched partition file $f moved")
    }
    before.filter(_._1.startsWith("seg=C/")).foreach { case (f, sz) =>
      assert(after.get(f).contains(sz), s"untouched partition file $f moved")
    }
    // commit 1's file actions are confined to the batch's partition
    val c1 = java.nio.file.Files.readString(java.nio.file.Paths.get(
      d, "_delta_log", "%020d.json".format(1)))
    c1.linesIterator.filter(_.nonEmpty).foreach { line =>
      val j = org.json4s.jackson.JsonMethods.parse(line)
      Seq("add", "remove").foreach(k => (j \ k \ "path") match {
        case org.json4s.JString(p) =>
          assert(p.startsWith("seg=A/"), s"commit touched $p")
        case _ =>
      })
    }
    val got = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "A", 10.0), (2L, "A", 0.0), (3L, "B", 0.0),
      (4L, "B", 0.0), (5L, "C", 0.0), (6L, "A", 60.0)), got.toString)
    // partition pruning of the probe is REAL: hide the untouched
    // partitions' files — a probe that scanned them would throw
    val hidden = fileBytes(java.nio.file.Paths.get(d)).keys
      .filter(f => f.startsWith("seg=B/") || f.startsWith("seg=C/")).toSeq
    hidden.foreach(f => java.nio.file.Files.move(
      java.nio.file.Paths.get(d, f), java.nio.file.Paths.get(d, f + ".hide")))
    DeltaWrite.merge(spark, d,
      Seq((2L, "A", 20.0)).toDF("id", "seg", "bal"), Seq("id"))
    hidden.foreach(f => java.nio.file.Files.move(
      java.nio.file.Paths.get(d, f + ".hide"), java.nio.file.Paths.get(d, f)))
    assert(DeltaRead.readDeltaTable(spark, d)
      .filter(col("id") === 2).select("bal").as[Double].head() == 20.0)
  }

  test("partitioned merge + CDF: cdc files are partition-scoped and " +
      "the change feed reads back with partition columns attached") {
    val d = dir()
    DeltaWrite.merge(spark, d,
      Seq((1L, "A", 0.0), (2L, "B", 0.0)).toDF("id", "seg", "bal"),
      Seq("id"), enableCdf = true, partitionBy = Seq("seg"))
    DeltaWrite.merge(spark, d,
      Seq((1L, "A", 1.5), (3L, "B", 3.5)).toDF("id", "seg", "bal"),
      Seq("id"))
    val chg = DeltaRead.readChanges(spark, d, 1L)
      .select("id", "seg", "bal", "_change_type")
      .as[(Long, String, Double, String)].collect().toSet
    assert(chg == Set(
      (1L, "A", 0.0, "update_preimage"),
      (1L, "A", 1.5, "update_postimage"),
      (3L, "B", 3.5, "insert")), chg.toString)
  }

  test("partitioned replace: one staged job, per-partition files, " +
      "log-attached partition values; a later replace re-emits " +
      "metaData instead of silently dropping configuration") {
    val d = dir()
    val df = Seq((1L, "A"), (2L, "B"), (3L, "B")).toDF("id", "seg")
    DeltaWrite.replace(spark, d, df, partitionBy = Seq("seg"))
    val got = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "A"), (2L, "B"), (3L, "B")), got.toString)
    // ADVICE fix: configuration on an existing table re-emits metaData
    DeltaWrite.replace(spark, d, df,
      configuration = Map("delta.enableChangeDataFeed" -> "true"),
      partitionBy = Seq("seg"))
    assert(DeltaRead.tableConfiguration(spark, d)
      .get("delta.enableChangeDataFeed").contains("true"),
      "configuration change on replace was dropped")
    // CREATE OR REPLACE resets properties to the NEW set: a replacing
    // model that no longer requests CDF turns it (and its cdc-write
    // cost) OFF — properties never accrete forever
    DeltaWrite.replace(spark, d, df, partitionBy = Seq("seg"))
    assert(!DeltaRead.tableConfiguration(spark, d)
      .contains("delta.enableChangeDataFeed"),
      "replace must reset table properties to the caller-supplied set")
  }

  test("merge schema evolution: allowEvolution appends new columns " +
      "(carried files surface NULL); without the flag it fails loudly") {
    val d = dir()
    DeltaWrite.merge(spark, d,
      Seq((1L, 1.0), (2L, 2.0)).toDF("id", "bal"), Seq("id"))
    val evolved = Seq((2L, 20.0, "hi")).toDF("id", "bal", "note")
    intercept[IllegalArgumentException](
      DeltaWrite.merge(spark, d, evolved, Seq("id")))
    DeltaWrite.merge(spark, d, evolved, Seq("id"), allowEvolution = true)
    val got = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, Double, Option[String])].collect().toSeq
    assert(got == Seq((1L, 1.0, None), (2L, 20.0, Some("hi"))),
      got.toString)
  }

  test("merge and optimize run O(1) Spark jobs, never O(files)") {
    val d = dir()
    // 12 live files, every one touched by the merge
    DeltaWrite.merge(spark, d,
      (1L to 24L).map(i => (i, 0.0)).toDF("id", "bal"),
      Seq("id"), buckets = 12)
    assert(DeltaRead.liveDataFiles(spark, d).size >= 10)
    val sc = spark.sparkContext
    // merge half the keys so most rewrites carry survivors (the live
    // set stays >buckets and optimize below has real work)
    sc.setJobGroup("graft-merge-jobs", "count merge jobs")
    DeltaWrite.merge(spark, d,
      (1L to 24L).filter(_ % 2 == 1).map(i => (i, i.toDouble))
        .toDF("id", "bal"),
      Seq("id"), buckets = 12, maxLiveFiles = 64)
    val mergeJobs = sc.statusTracker.getJobIdsForGroup("graft-merge-jobs")
    sc.clearJobGroup()
    // AQE splits each shuffle query into several jobs, so the O(1)
    // constant is ~11 (pin, count, probe, staged write, stats) — the
    // pre-staging writer ran ~3 jobs PER FILE (36+ here)
    assert(mergeJobs.length <= 14,
      s"merge ran ${mergeJobs.length} jobs for ~12 touched files — " +
        "the single-staged-write contract is broken")
    assert(DeltaRead.liveDataFiles(spark, d).size > 4)
    sc.setJobGroup("graft-opt-jobs", "count optimize jobs")
    DeltaWrite.optimize(spark, d, Seq("id"), buckets = 4)
    val optJobs = sc.statusTracker.getJobIdsForGroup("graft-opt-jobs")
    sc.clearJobGroup()
    assert(optJobs.length <= 6,
      s"optimize ran ${optJobs.length} jobs — per-bucket probes are back")
    assert(DeltaRead.liveDataFiles(spark, d).size <= 4)
    val got = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(got == (1L to 24L).map(i =>
      (i, if (i % 2 == 1) i.toDouble else 0.0)))
  }

  test("vacuum: superseded files GC'd, live snapshot byte-identical, " +
      "pre-checkpoint time travel and CDF refuse loudly") {
    val d = dir()
    DeltaWrite.merge(spark, d,
      (1L to 8L).map(i => (i, 0.0)).toDF("id", "bal"), Seq("id"))
    (1 to 3).foreach(r => DeltaWrite.merge(spark, d,
      (1L to 8L).map(i => (i, i * r.toDouble)).toDF("id", "bal"),
      Seq("id")))
    val liveBefore = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    val diskBefore = fileBytes(java.nio.file.Paths.get(d))
    val res = DeltaWrite.vacuum(spark, d)
    assert(res.dataFilesDeleted > 0 && res.bytesDeleted > 0,
      s"nothing GC'd: $res")
    val diskAfter = fileBytes(java.nio.file.Paths.get(d))
    assert(diskAfter.size == diskBefore.size - res.dataFilesDeleted)
    // live snapshot identical
    val liveAfter = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(liveAfter == liveBefore, "vacuum changed the live snapshot")
    // time travel to a vacuumed version refuses loudly
    intercept[IllegalArgumentException](
      DeltaRead.readDeltaTable(spark, d, versionAsOf = Some(0L)))
    // every surviving data file is live (referenced by the last state)
    val live = DeltaRead.liveDataFiles(spark, d).map(_.rel).toSet
    assert(diskAfter.keySet == live,
      s"unreferenced files survived: ${diskAfter.keySet -- live}")
  }

  test("v2Checkpoint: a UUID-named checkpoint whose file actions ride " +
      "sidecar parquet bounds the replay (commit JSONs deleted); a " +
      "version-mismatched checkpointMetadata refuses loudly") {
    val d = dir()
    DeltaWrite.commit(d, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    DeltaWrite.commit(d, 1L,
      adds = Seq("f1.parquet" -> Seq((1L, "a2"), (3L, "c")).toDF("id", "v")),
      removes = Seq("f0.parquet"))
    val logDir = java.nio.file.Paths.get(d, "_delta_log")
    val sidecars = logDir.resolve("_sidecars")
    java.nio.file.Files.createDirectories(sidecars)
    // sidecar parquet carrying the live add action
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(d), ".stage")
    spark.read.json(Seq(
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
      .toDS()).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    import scala.jdk.CollectionConverters._
    val part = {
      val s = java.nio.file.Files.list(tmp)
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    java.nio.file.Files.move(part, sidecars.resolve("s1.parquet"))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("v", "string")
    val schemaJson = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        org.json4s.JString(schema.json)))
    val uuid = "3a7c9f12-0000-4000-8000-00000000beef"
    def ckText(declaredVersion: Long): String =
      s"""{"checkpointMetadata":{"version":$declaredVersion}}
         |{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}
         |{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":$schemaJson,"partitionColumns":[],"configuration":{},"createdTime":0}}
         |{"sidecar":{"path":"s1.parquet","sizeInBytes":1}}
         |""".stripMargin
    val ckFile = logDir.resolve(f"${1L}%020d.checkpoint.$uuid.json")
    java.nio.file.Files.writeString(ckFile, ckText(1L))
    java.nio.file.Files.writeString(logDir.resolve("_last_checkpoint"),
      """{"version":1}""")
    // replay must come from the v2 checkpoint ALONE
    java.nio.file.Files.delete(logDir.resolve("%020d.json".format(0)))
    java.nio.file.Files.delete(logDir.resolve("%020d.json".format(1)))
    val got = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a2"), (3L, "c")),
      s"v2 checkpoint replay wrong: $got")
    // a checkpoint declaring the WRONG version is corruption
    java.nio.file.Files.writeString(ckFile, ckText(99L))
    val e = intercept[IllegalArgumentException](
      DeltaRead.readDeltaTable(spark, d))
    assert(e.getMessage.contains("declares version 99"), e.getMessage)
  }

  test("checkpoints RETAIN unexpired remove tombstones (external " +
      "writer, deletionTimestamp != 0) and stay tombstone-free for " +
      "this writer's own always-expired removes") {
    val d = dir()
    DeltaWrite.commit(d, 0L, Seq(
      "f0.parquet" -> Seq((1L, "a")).toDF("id", "v"),
      "f1.parquet" -> Seq((2L, "b")).toDF("id", "v")))
    // an external-style remove with a live retention clock
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(d, "_delta_log", "%020d.json".format(1)),
      """{"remove":{"path":"f1.parquet","deletionTimestamp":1723680000000,"dataChange":true}}
        |""".stripMargin)
    DeltaWrite.writeCheckpoint(spark, d)
    val ck = spark.read.parquet(
      s"$d/_delta_log/${"%020d".format(1)}.checkpoint.parquet")
    val removes = ck.filter(col("remove").isNotNull)
      .select("remove.path", "remove.deletionTimestamp")
      .as[(String, Long)].collect().toSeq
    assert(removes == Seq(("f1.parquet", 1723680000000L)),
      s"unexpired tombstone dropped from the checkpoint: $removes")
    // replay THROUGH the checkpoint (delete the commit JSONs): the
    // tombstone must keep masking f1
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(d, "_delta_log", "%020d.json".format(0)))
    val got = DeltaRead.readDeltaTable(spark, d)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a")), s"tombstone not replayed: $got")
    // our own writer's tombstones (ts=0) checkpoint without remove rows
    val d2 = dir()
    DeltaWrite.merge(spark, d2, Seq((1L, "a")).toDF("id", "v"), Seq("id"))
    DeltaWrite.merge(spark, d2, Seq((1L, "b")).toDF("id", "v"), Seq("id"))
    val ckv = DeltaWrite.writeCheckpoint(spark, d2)
    val ck2 = spark.read.parquet(
      s"$d2/_delta_log/${"%020d".format(ckv)}.checkpoint.parquet")
    assert(!ck2.columns.contains("remove") ||
      ck2.filter(col("remove").isNotNull).count() == 0,
      "expired tombstones leaked into a fixture checkpoint")
  }

  test("null partition value and the literal string " +
      "'__HIVE_DEFAULT_PARTITION__' stay DISTINCT partitions — the " +
      "log's partitionValues re-attach each combo's own rows") {
    val d = dir()
    val df = Seq(
      (1L, Option.empty[String], 1.0),
      (2L, Some("__HIVE_DEFAULT_PARTITION__"), 2.0),
      (3L, Some("A"), 3.0)).toDF("id", "seg", "bal")
    DeltaWrite.replace(spark, d, df, partitionBy = Seq("seg"))
    val got = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, Option[String], Double)].collect().toSeq
    assert(got == Seq(
      (1L, None, 1.0),
      (2L, Some("__HIVE_DEFAULT_PARTITION__"), 2.0),
      (3L, Some("A"), 3.0)), got.toString)
    // and the log distinguishes them: one add with JSON-null seg, one
    // with the literal string
    val c0 = java.nio.file.Files.readString(java.nio.file.Paths.get(
      d, "_delta_log", "%020d.json".format(0)))
    val pvs = c0.linesIterator.filter(_.nonEmpty).flatMap { line =>
      org.json4s.jackson.JsonMethods.parse(line) \ "add" \
        "partitionValues" \ "seg" match {
        case org.json4s.JNull => Some(None)
        case org.json4s.JString(s) => Some(Some(s))
        case _ => None
      }
    }.toSet
    assert(pvs == Set(None, Some("__HIVE_DEFAULT_PARTITION__"), Some("A")),
      pvs.toString)
  }

  test("merge INTO a column-mapped (name mode), DV-carrying, " +
      "partitioned Delta table — the modern-writer default shape: " +
      "physical names round-trip, the DV mask holds (deleted rows " +
      "neither match nor resurrect), untouched partitions stay " +
      "byte-identical, and the remove names the DV descriptor") {
    import org.apache.spark.sql.types._
    val d = dir()
    def meta(phys: String, id: Int) = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id.toLong).build()
    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true, meta("col-aaa", 1)),
      StructField("info", StructType(Seq(
        StructField("tag", StringType, nullable = true, meta("col-ccc", 3)))),
        nullable = true, meta("col-bbb", 2)),
      StructField("seg", StringType, nullable = true, meta("col-ddd", 4))))
    def physFile(rows: Seq[(Long, String)], stage: String,
        name: String): Unit = {
      val data = rows.toDF("a", "b")
        .select(col("a").as("col-aaa"),
          struct(col("b").as("col-ccc")).as("col-bbb"))
        .coalesce(1).sortWithinPartitions("col-aaa")
      DeltaWrite.commit(stage, 0L, Seq(name -> data))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      java.nio.file.Files.move(
        java.nio.file.Paths.get(stage, name),
        java.nio.file.Paths.get(d, name))
    }
    physFile(Seq((1L, "x"), (2L, "y"), (3L, "z")), s"$d-s0", "f0.parquet")
    physFile(Seq((7L, "q"), (8L, "r")), s"$d-s1", "f1.parquet")
    val log = java.nio.file.Paths.get(d, "_delta_log")
    java.nio.file.Files.createDirectories(log)
    val schemaJson = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        org.json4s.JString(logical.json)))
    // a DV on f0 masks physical row 1 (id 2)
    val uuid = java.util.UUID.randomUUID()
    val (off, size) = graft.sources.DeletionVectors.writeDvFile(
      java.nio.file.Paths.get(d, s"deletion_vector_$uuid.bin"), Seq(1L))
    java.nio.file.Files.writeString(log.resolve(f"${0L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","columnMapping"],"writerFeatures":["deletionVectors","columnMapping"]}}
         |{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":$schemaJson,"partitionColumns":["seg"],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}
         |{"add":{"path":"f0.parquet","partitionValues":{"col-ddd":"A"},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"${graft.sources.DeletionVectors.encodeUuid(uuid)}","offset":$off,"sizeInBytes":$size,"cardinality":1}}}
         |{"add":{"path":"f1.parquet","partitionValues":{"col-ddd":"B"},"size":1,"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    val before = DeltaRead.readDeltaTable(spark, d).orderBy("id")
      .select(col("id"), col("info.tag"), col("seg"))
      .as[(Long, String, String)].collect().toSeq
    assert(before == Seq((1L, "x", "A"), (3L, "z", "A"),
      (7L, "q", "B"), (8L, "r", "B")), before.toString)
    val f1Bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(d, "f1.parquet")).toSeq

    // the merge batch: update id 1, RE-INSERT the DV-deleted id 2
    // (it must count as not-matched — the mask holds), insert id 10;
    // seg B untouched
    val batch = Seq((1L, "X", "A"), (2L, "restored", "A"),
      (10L, "new", "A")).toDF("id", "tag", "seg")
      .select(col("id"), struct(col("tag")).as("info"), col("seg"))
    DeltaWrite.merge(spark, d, batch, Seq("id"))
    val got = DeltaRead.readDeltaTable(spark, d).orderBy("id")
      .select(col("id"), col("info.tag"), col("seg"))
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "X", "A"), (2L, "restored", "A"),
      (3L, "z", "A"), (7L, "q", "B"), (8L, "r", "B"),
      (10L, "new", "A")), s"merged mapped+DV state wrong: $got")
    // untouched partition's file is byte-identical
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(d, "f1.parquet")).toSeq == f1Bytes,
      "untouched partition file rewritten")
    // the commit: remove of f0 NAMES the DV descriptor (file actions
    // key on (path, dvUniqueId)); adds carry PHYSICAL-keyed
    // partitionValues and physical-named stats
    val c1 = java.nio.file.Files.readString(
      log.resolve(f"${1L}%020d.json"))
    val actions = c1.linesIterator.filter(_.nonEmpty)
      .map(org.json4s.jackson.JsonMethods.parse(_)).toSeq
    val rm = actions.map(_ \ "remove").filter(_ != org.json4s.JNothing)
    assert(rm.size == 1 && (rm.head \ "deletionVector" \ "cardinality")
      == org.json4s.JInt(1), s"remove lost the DV descriptor: $c1")
    val adds = actions.map(_ \ "add").filter(_ != org.json4s.JNothing)
    assert(adds.nonEmpty && adds.forall(a =>
      (a \ "partitionValues" \ "col-ddd") != org.json4s.JNothing),
      s"adds must carry physical-keyed partitionValues: $c1")
    assert(adds.exists { a =>
      val s = (a \ "stats") match {
        case org.json4s.JString(x) => x
        case _ => ""
      }
      s.contains("col-aaa")
    }, s"stats must be physical-keyed: $c1")
    // the rewritten + upsert files store PHYSICAL column names
    adds.foreach { a =>
      val org.json4s.JString(p) = (a \ "path"): @unchecked
      val cols = spark.read.parquet(
        s"$d/${DeltaRead.pctDecode(p)}").columns.toSet
      assert(cols == Set("col-aaa", "col-bbb"),
        s"staged file $p has non-physical columns: $cols")
    }
    // and a SECOND merge through the now-clean (DV-free) files works
    DeltaWrite.merge(spark, d,
      Seq((3L, "Z", "A")).toDF("id", "tag", "seg")
        .select(col("id"), struct(col("tag")).as("info"), col("seg")),
      Seq("id"))
    assert(DeltaRead.readDeltaTable(spark, d)
      .filter(col("id") === 3).select("info.tag").as[String].head() == "Z")
  }

  test("mergeOnRead: DV-writing upserts — touched data files stay " +
      "byte-identical, one packed DV file per commit, old masks " +
      "merge with new, the protocol upgrades on first DV, and the " +
      "final state matches the CoW merge") {
    val d = dir()
    // creation: bucketed files, plain protocol
    DeltaWrite.mergeOnRead(spark, d,
      (1L to 12L).map(i => (i, 0.0)).toDF("id", "bal"), Seq("id"),
      buckets = 4)
    val before = fileBytes(java.nio.file.Paths.get(d))
      .filter(_._1.endsWith(".parquet"))
    assert(before.size > 1, s"creation wrote one file: ${before.keys}")
    // upsert 1: masks rows via DVs, no data file rewritten
    DeltaWrite.mergeOnRead(spark, d,
      Seq((1L, 10.0), (5L, 50.0), (100L, 1.0)).toDF("id", "bal"),
      Seq("id"))
    val after = fileBytes(java.nio.file.Paths.get(d))
    before.foreach { case (f, sz) =>
      assert(after.get(f).contains(sz), s"data file $f was rewritten") }
    assert(after.keys.count(_.startsWith("deletion_vector_")) == 1,
      s"expected ONE packed DV file: ${after.keys.toSeq.sorted}")
    val got1 = DeltaRead.readDeltaTable(spark, d).orderBy("id")
      .as[(Long, Double)].collect().toSeq
    val want1 = ((2L to 12L).filter(_ != 5L).map(i => (i, 0.0)) ++
      Seq((1L, 10.0), (5L, 50.0), (100L, 1.0))).sortBy(_._1)
    assert(got1 == want1, s"MoR state wrong: $got1")
    // the commit upgraded the protocol for DV readers
    val c1 = java.nio.file.Files.readString(java.nio.file.Paths.get(
      d, "_delta_log", "%020d.json".format(1)))
    assert(c1.contains("deletionVectors"), "protocol not upgraded")
    // upsert 2 touches a key masked file again: masks MERGE (id 1's
    // file gets a second-generation DV covering both old + new rows)
    DeltaWrite.mergeOnRead(spark, d,
      Seq((1L, 11.0), (2L, 22.0)).toDF("id", "bal"), Seq("id"))
    val got2 = DeltaRead.readDeltaTable(spark, d).orderBy("id")
      .as[(Long, Double)].collect().toSeq
    val want2 = ((3L to 12L).filter(_ != 5L).map(i => (i, 0.0)) ++
      Seq((1L, 11.0), (2L, 22.0), (5L, 50.0), (100L, 1.0))).sortBy(_._1)
    assert(got2 == want2, s"second MoR state wrong: $got2")
    // a checkpoint + vacuum keep the DV-carried snapshot intact
    DeltaWrite.writeCheckpoint(spark, d)
    DeltaWrite.vacuum(spark, d): Unit
    assert(DeltaRead.readDeltaTable(spark, d).orderBy("id")
      .as[(Long, Double)].collect().toSeq == want2,
      "vacuum broke the MoR snapshot")
    // loud scope gates: CDF-enabled and partitioned tables refuse
    val dCdf = dir()
    DeltaWrite.merge(spark, dCdf, Seq((1L, "a")).toDF("id", "v"),
      Seq("id"), enableCdf = true)
    val e = intercept[IllegalArgumentException](DeltaWrite.mergeOnRead(
      spark, dCdf, Seq((1L, "b")).toDF("id", "v"), Seq("id")))
    assert(e.getMessage.contains("CDF"), e.getMessage)
  }

  test("a batch spanning too many distinct partition combos fails " +
      "loudly instead of an unbounded driver collect") {
    val d = dir()
    val wide = spark.range(10001L)
      .selectExpr("id", "cast(id as string) AS seg", "id * 1.0 AS bal")
    val e = intercept[IllegalArgumentException](
      DeltaWrite.replace(spark, d, wide, partitionBy = Seq("seg")))
    assert(e.getMessage.contains("coarser"), e.getMessage)
  }

  test("deleteWhere: DELETE as a DV commit — matching rows masked, " +
      "data files byte-identical, masks compose across deletes, " +
      "empty match writes no commit, the match cap and geometry " +
      "gates are loud") {
    val d = dir()
    DeltaWrite.mergeOnRead(spark, d,
      (1L to 12L).map(i => (i, i * 1.0)).toDF("id", "bal"), Seq("id"),
      buckets = 4)
    val before = fileBytes(java.nio.file.Paths.get(d))
      .filter(_._1.endsWith(".parquet"))
    // delete 1: mask via DVs, nothing rewritten, protocol upgraded
    assert(DeltaWrite.deleteWhere(spark, d, "id % 3 = 0") == 4L)
    val after = fileBytes(java.nio.file.Paths.get(d))
    before.foreach { case (f, sz) =>
      assert(after.get(f).contains(sz), s"data file $f was rewritten") }
    assert(after.keys.count(_.startsWith("deletion_vector_")) == 1,
      s"expected ONE packed DV file: ${after.keys.toSeq.sorted}")
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(
      d, "_delta_log", "%020d.json".format(1)))
      .contains("deletionVectors"), "protocol not upgraded")
    assert(DeltaRead.readDeltaTable(spark, d).orderBy("id")
      .as[(Long, Double)].collect().toSeq ==
      (1L to 12L).filterNot(_ % 3 == 0).map(i => (i, i * 1.0)),
      "delete state wrong")
    // delete 2 composes with the existing masks (and an already
    // deleted row never re-matches: id=3 is gone, only 1,2 match)
    assert(DeltaWrite.deleteWhere(spark, d, "id <= 3") == 2L)
    assert(DeltaRead.readDeltaTable(spark, d).orderBy("id")
      .as[(Long, Double)].collect().toSeq ==
      (4L to 12L).filterNot(_ % 3 == 0).map(i => (i, i * 1.0)),
      "composed delete state wrong")
    // empty match: no rows, NO new commit version
    val vBefore = java.nio.file.Files.list(
      java.nio.file.Paths.get(d, "_delta_log")).count()
    assert(DeltaWrite.deleteWhere(spark, d, "id > 1000") == 0L)
    assert(java.nio.file.Files.list(
      java.nio.file.Paths.get(d, "_delta_log")).count() == vBefore,
      "empty delete wrote a commit")
    // a reader still reconciles after checkpoint + vacuum
    DeltaWrite.writeCheckpoint(spark, d)
    DeltaWrite.vacuum(spark, d): Unit
    assert(DeltaRead.readDeltaTable(spark, d).count() == 6L)
    // the match cap is loud
    val eCap = intercept[IllegalArgumentException](
      DeltaWrite.deleteWhere(spark, d, "id > 0", maxMatches = 2))
    assert(eCap.getMessage.contains("selective"), eCap.getMessage)
    // CDF COMPOSES (round 19): the DV masks and a cdc file with the
    // deleted rows' pre-images land in ONE commit, and the change
    // feed reports the delete
    val dCdf = dir()
    DeltaWrite.merge(spark, dCdf,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      Seq("id"), enableCdf = true)
    assert(DeltaWrite.deleteWhere(spark, dCdf, "id = 1") == 1L)
    val cdfCommit = java.nio.file.Files.readString(java.nio.file.Paths
      .get(dCdf, "_delta_log", "%020d.json".format(1)))
    assert(cdfCommit.contains("\"cdc\""),
      s"CDF delete commit carries no cdc action: $cdfCommit")
    assert(DeltaRead.readChanges(spark, dCdf, 1L)
      .select("id", "_change_type").as[(Long, String)]
      .collect().toSeq == Seq((1L, "delete")),
      "change feed must report the deleted row's pre-image")
    assert(DeltaRead.readDeltaTable(spark, dCdf).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq((2L, "b")),
      "CDF delete state wrong")
  }

  test("merge with deletePredicate on a PARTITIONED table: one " +
      "commit — DV masks for delete-only files (partitionValues " +
      "carried), row drops in rewritten files, the delete probe " +
      "prunes (hidden foreign-partition files never opened)") {
    val d = dir()
    DeltaWrite.merge(spark, d,
      Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0))
        .toDF("id", "part", "bal"),
      Seq("id"), buckets = 2, partitionBy = Seq("part"))
    import scala.jdk.CollectionConverters._
    def files(sub: String): Seq[java.nio.file.Path] = {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try w.iterator().asScala.filter(p =>
        p.toString.contains(sub) &&
          p.getFileName.toString.endsWith(".parquet")).toSeq
      finally w.close()
    }
    // hide part=b: batch and delete are confined to part='a'
    val bFiles = files("part=b")
    assert(bFiles.nonEmpty)
    bFiles.foreach(p => java.nio.file.Files.move(p,
      p.resolveSibling(p.getFileName.toString + ".hide")))
    val n =
      try DeltaWrite.merge(spark, d,
        Seq((2L, "a", 99.0)).toDF("id", "part", "bal"), Seq("id"),
        deletePredicate = Some("part = 'a' AND id = 1"))
      finally bFiles.foreach(p => java.nio.file.Files.move(
        p.resolveSibling(p.getFileName.toString + ".hide"), p))
    assert(n == 2L, s"1 upserted + 1 deleted, got $n")
    // ONE commit for the whole statement
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      d, "_delta_log", "%020d.json".format(2))),
      "delete + upsert must be one commit")
    val got = DeltaRead.readDeltaTable(spark, d).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((2L, "a", 99.0), (3L, "b", 3.0), (4L, "b", 4.0)),
      got.toString)
    // a delete hitting ANOTHER partition than the batch: the deleted
    // row's file is DV-masked byte-identically, pv carried on re-add
    val bBytes = files("part=b").map(p =>
      p -> java.nio.file.Files.readAllBytes(p)).toMap
    val n2 = DeltaWrite.merge(spark, d,
      Seq((5L, "a", 5.0)).toDF("id", "part", "bal"), Seq("id"),
      deletePredicate = Some("part = 'b' AND id = 4"))
    assert(n2 == 2L, n2.toString)
    bBytes.foreach { case (p, bytes) =>
      assert(java.nio.file.Files.readAllBytes(p).sameElements(bytes),
        s"DV-masked partition file $p was rewritten") }
    val commit2 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(d, "_delta_log", "%020d.json".format(2)))
    assert(commit2.contains("deletionVector") &&
      commit2.contains("\"part\":\"b\""), commit2)
    val got2 = DeltaRead.readDeltaTable(spark, d).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got2 == Seq((2L, "a", 99.0), (3L, "b", 3.0), (5L, "a", 5.0)),
      got2.toString)
  }

  test("deleteWhere on a PARTITIONED table: partition values + stats " +
      "prune the probe (hidden foreign-partition files are never " +
      "opened), matching rows DV-masked in place, partitionValues " +
      "carried on the re-add") {
    val d = dir()
    DeltaWrite.merge(spark, d,
      Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0))
        .toDF("id", "part", "bal"),
      Seq("id"), buckets = 2, partitionBy = Seq("part"))
    // hide partition b's data files: a delete confined to part='a'
    // must never open them — pruning is what makes the
    // date-partitioned retention delete O(partition), not O(table)
    import scala.jdk.CollectionConverters._
    val bFiles = {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try w.iterator().asScala.filter(p =>
        p.toString.contains("part=b") &&
          p.getFileName.toString.endsWith(".parquet")).toSeq
      finally w.close()
    }
    assert(bFiles.nonEmpty, "expected part=b data files")
    bFiles.foreach(p => java.nio.file.Files.move(p,
      p.resolveSibling(p.getFileName.toString + ".hidden")))
    try
      assert(DeltaWrite.deleteWhere(spark, d,
        "part = 'a' AND id = 1") == 1L)
    finally bFiles.foreach(p => java.nio.file.Files.move(
      p.resolveSibling(p.getFileName.toString + ".hidden"), p))
    val got = DeltaRead.readDeltaTable(spark, d).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0)),
      got.toString)
    // the delete was a DV mask: every data file intact, and the
    // re-added file still carries its partitionValues in the log
    val lastCommit = java.nio.file.Files.readString(
      java.nio.file.Paths.get(d, "_delta_log", "%020d.json".format(1)))
    assert(lastCommit.contains("\"part\":\"a\""),
      s"re-add lost partitionValues: $lastCommit")
    assert(lastCommit.contains("deletionVector"), lastCommit)
  }

  test("merge with residualPredicate: out-of-window rows are NOT " +
      "matched — they stay and the batch row inserts (SQL MERGE " +
      "semantics, exactly what Delta executes for " +
      "incremental_predicates); in-window matches update normally") {
    val d = dir()
    val ts0 = java.sql.Timestamp.valueOf("2023-12-01 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    DeltaWrite.merge(spark, d,
      Seq((1L, "old", ts0), (2L, "cur", ts1)).toDF("id", "v", "ts"),
      Seq("id"), buckets = 1)
    DeltaWrite.merge(spark, d,
      Seq((1L, "x", ts2), (2L, "y", ts2)).toDF("id", "v", "ts"),
      Seq("id"),
      residualPredicate = Some("ts >= timestamp'2024-01-01 00:00:00'"))
    val got = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id", "v").as[(Long, String, java.sql.Timestamp)]
      .collect().toSeq
    // id 1's target row is outside the window: it survives untouched
    // and the batch row INSERTS alongside (the predicate's contract
    // is that real matches are in-window — same as Delta); id 2
    // updates in place
    assert(got == Seq((1L, "old", ts0), (1L, "x", ts2), (2L, "y", ts2)),
      got.toString)
  }

  test("versionAtTimestamp: commit mtimes resolve at-or-before; " +
      "pre-creation, vacuumed and future ranges refuse loudly") {
    val d = dir()
    DeltaWrite.merge(spark, d, Seq((1L, 0.0)).toDF("id", "bal"), Seq("id"))
    DeltaWrite.merge(spark, d, Seq((1L, 1.0)).toDF("id", "bal"), Seq("id"))
    def pin(v: Long, t: String): Unit =
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(d, "_delta_log", f"$v%020d.json"),
        java.nio.file.attribute.FileTime.from(
          java.time.Instant.parse(t))): Unit
    pin(0L, "2024-01-01T00:00:00Z")
    pin(1L, "2024-06-01T00:00:00Z")
    def micros(t: String): Long =
      java.time.Instant.parse(t).toEpochMilli * 1000L
    assert(DeltaRead.versionAtTimestamp(d, micros("2024-03-01T00:00:00Z")) == 0L)
    assert(DeltaRead.versionAtTimestamp(d, micros("2024-06-01T00:00:00Z")) == 1L)
    // strictly after the latest commit: loud (Delta's own refusal —
    // a future-dated typo must not silently read the current state)
    val eFut = intercept[IllegalArgumentException](
      DeltaRead.versionAtTimestamp(d, micros("2030-01-01T00:00:00Z")))
    assert(eFut.getMessage.contains("after the latest commit"),
      eFut.getMessage)
    val e = intercept[IllegalArgumentException](
      DeltaRead.versionAtTimestamp(d, micros("2023-01-01T00:00:00Z")))
    assert(e.getMessage.contains("precedes the earliest"), e.getMessage)
    // vacuumed history: after checkpoint + log cleanup the early
    // commits are GONE from the replayable log — a timestamp in the
    // vacuumed range refuses instead of silently pinning elsewhere
    (2 to 10).foreach(i => DeltaWrite.merge(spark, d,
      Seq((1L, i.toDouble)).toDF("id", "bal"), Seq("id")))
    DeltaWrite.vacuum(spark, d): Unit
    val log = java.nio.file.Paths.get(d, "_delta_log")
    assert(!java.nio.file.Files.exists(
      log.resolve(f"${0L}%020d.json")),
      "expected vacuum to clean pre-checkpoint commit JSON")
    val e2 = intercept[IllegalArgumentException](
      DeltaRead.versionAtTimestamp(d, micros("2024-03-01T00:00:00Z")))
    assert(e2.getMessage.contains("vacuumed"), e2.getMessage)
  }

  test("versionAtTimestamp honors commitInfo.inCommitTimestamp over " +
      "scrambled file mtimes — the in-commit-timestamps reader rule " +
      "(a copied/restored modern-writer table resolves correctly)") {
    val d = dir()
    DeltaWrite.merge(spark, d, Seq((1L, 0.0)).toDF("id", "bal"), Seq("id"))
    DeltaWrite.merge(spark, d, Seq((1L, 1.0)).toDF("id", "bal"), Seq("id"))
    DeltaWrite.merge(spark, d, Seq((1L, 2.0)).toDF("id", "bal"), Seq("id"))
    def t(s: String): Long = java.time.Instant.parse(s).toEpochMilli
    // a modern writer's commits: commitInfo with inCommitTimestamp is
    // the FIRST action of each commit (protocol requirement)
    def stamp(v: Long, millis: Long): Unit = {
      val f = java.nio.file.Paths.get(d, "_delta_log", f"$v%020d.json")
      java.nio.file.Files.writeString(f,
        s"""{"commitInfo":{"inCommitTimestamp":$millis}}""" + "\n" +
          java.nio.file.Files.readString(f)): Unit
    }
    stamp(0L, t("2024-01-01T00:00:00Z"))
    stamp(1L, t("2024-02-01T00:00:00Z"))
    stamp(2L, t("2024-03-01T00:00:00Z"))
    // mtimes LIE — a copy/restore reset them, in reverse order even
    Seq(0L -> "2025-03-01T00:00:00Z", 1L -> "2025-02-01T00:00:00Z",
        2L -> "2025-01-01T00:00:00Z").foreach { case (v, ts) =>
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(d, "_delta_log", f"$v%020d.json"),
        java.nio.file.attribute.FileTime.from(
          java.time.Instant.parse(ts))): Unit
    }
    def micros(s: String): Long = t(s) * 1000L
    assert(DeltaRead.versionAtTimestamp(d,
      micros("2024-01-15T00:00:00Z")) == 0L)
    assert(DeltaRead.versionAtTimestamp(d,
      micros("2024-02-15T00:00:00Z")) == 1L)
    assert(DeltaRead.versionAtTimestamp(d,
      micros("2024-03-01T00:00:00Z")) == 2L)
    val e = intercept[IllegalArgumentException](
      DeltaRead.versionAtTimestamp(d, micros("2024-04-01T00:00:00Z")))
    assert(e.getMessage.contains("after the latest commit"), e.getMessage)
    // the pinned read still replays correctly (commitInfo lines are
    // state-inert)
    val v1 = DeltaRead.readDeltaTable(spark, d, versionAsOf = Some(1L))
      .as[(Long, Double)].collect().toSeq
    assert(v1 == Seq((1L, 1.0)), v1.toString)
  }

  test("spark.read.format(\"graft-delta\"): the registered source " +
      "replays the engine read — current/versionAsOf/timestampAsOf " +
      "pins, DV masks honored, pushed filters drive file pruning") {
    val d = dir()
    DeltaWrite.merge(spark, d,
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "bal"),
      Seq("id"), buckets = 1)
    DeltaWrite.merge(spark, d,
      Seq((2L, 99.0)).toDF("id", "bal"), Seq("id"))
    // current state through the registered short name
    val cur = spark.read.format("graft-delta").load(d)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(cur == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)), cur.toString)
    // and it matches the direct engine read exactly
    val direct = DeltaRead.readDeltaTable(spark, d)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(cur == direct)
    // version pin
    val v0 = spark.read.format("graft-delta").option("versionAsOf", 0)
      .load(d).orderBy("id").as[(Long, Double)].collect().toSeq
    assert(v0 == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)), v0.toString)
    // timestamp pin via commit mtimes
    Seq(0L -> "2024-01-01T00:00:00Z", 1L -> "2024-06-01T00:00:00Z")
      .foreach { case (v, t) =>
        java.nio.file.Files.setLastModifiedTime(
          java.nio.file.Paths.get(d, "_delta_log", f"$v%020d.json"),
          java.nio.file.attribute.FileTime.from(
            java.time.Instant.parse(t))): Unit
      }
    val ts0 = spark.read.format("graft-delta")
      .option("timestampAsOf", "2024-03-01 00:00:00").load(d)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(ts0 == v0, ts0.toString)
    // DV table: deleteWhere masks a row; the source honors the mask
    DeltaWrite.deleteWhere(spark, d, "id = 3"): Unit
    val masked = spark.read.format("graft-delta").load(d)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(masked == Seq((1L, 10.0), (2L, 99.0)), masked.toString)

    // pushed filters reach the engine read as a pruning predicate:
    // two stats-disjoint files, hide one, a filtered read that prunes
    // it succeeds while the unfiltered read throws
    val d2 = dir()
    DeltaWrite.commit(d2, 0L, Seq(
      "lo.parquet" -> Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal"),
      "hi.parquet" -> Seq((100L, 1.0), (200L, 2.0)).toDF("id", "bal")))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(d2, "lo.parquet"),
      java.nio.file.Paths.get(d2, "lo.parquet.hide"))
    intercept[Exception](
      spark.read.format("graft-delta").load(d2).count())
    val hi = spark.read.format("graft-delta").load(d2)
      .filter($"id" >= 100L).orderBy("id")
      .as[(Long, Double)].collect().toSeq
    assert(hi == Seq((100L, 1.0), (200L, 2.0)), hi.toString)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(d2, "lo.parquet.hide"),
      java.nio.file.Paths.get(d2, "lo.parquet"))
  }

  test("DROP COLUMNS records the dropped name; re-adding it (ALTER " +
      "ADD or merge evolution) refuses — carried files still hold " +
      "the old values and would silently resurrect them; a full " +
      "refresh rewrites the data and clears the marker") {
    import org.apache.spark.sql.types._
    val d = dir()
    DeltaWrite.merge(spark, d,
      Seq((1L, 1.0, "old1"), (2L, 2.0, "old2")).toDF("id", "bal", "stale"),
      Seq("id"))
    DeltaWrite.dropColumns(spark, d, Seq("stale"))
    assert(DeltaRead.readDeltaTable(spark, d).columns.toSeq ==
      Seq("id", "bal"))
    // ALTER ADD of the dropped name refuses (case-insensitive)
    val e1 = intercept[IllegalArgumentException](
      DeltaWrite.addColumns(spark, d,
        Seq(StructField("STALE", StringType))))
    assert(e1.getMessage.contains("resurrect"), e1.getMessage)
    // merge evolution re-appending it refuses too
    val e2 = intercept[IllegalArgumentException](
      DeltaWrite.merge(spark, d,
        Seq((3L, 3.0, "boo")).toDF("id", "bal", "stale"),
        Seq("id"), allowEvolution = true))
    assert(e2.getMessage.contains("resurrect"), e2.getMessage)
    // a FRESH name still adds fine
    DeltaWrite.addColumns(spark, d, Seq(StructField("note", StringType)))
    assert(DeltaRead.readDeltaTable(spark, d).columns.toSeq ==
      Seq("id", "bal", "note"))
    // full refresh rewrites every data file — the stale values are
    // physically gone, so the marker clears and the name is reusable
    DeltaWrite.replace(spark, d,
      Seq((1L, 1.0), (2L, 2.0)).toDF("id", "bal"))
    DeltaWrite.addColumns(spark, d,
      Seq(StructField("stale", StringType)))
    val got = DeltaRead.readDeltaTable(spark, d).orderBy("id")
      .as[(Long, Double, Option[String])].collect().toSeq
    assert(got == Seq((1L, 1.0, None), (2L, 2.0, None)),
      s"re-added column after refresh must be NULL, not stale: $got")
  }
}
