package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.EventRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming semantics under MemoryStream (SURVEY §5.5):
  * watermark finalizes windows and drops late rows; streaming dedup
  * collapses duplicates; flatMapGroupsWithState evolves per-key state
  * across micro-batches. No oracle — these behaviors only exist in
  * streaming execution.
  */
class StreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(hour: Int, min: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00")

  private def ev(id: Long, user: Long, typ: String, t: java.sql.Timestamp,
                 v: Double = 1.0): EventRow = EventRow(id, user, typ, t, v)

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  test("watermark: windows finalize once passed; late rows are dropped") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = StreamingOps.tumblingAgg(in.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("s_tumbling")
      .outputMode("append").start()
    withQuery(q) {
      // window [10:00, 11:00): two clicks
      in.addData(ev(1, 1, "click", ts(10, 5)), ev(2, 1, "click", ts(10, 10)))
      q.processAllAvailable()
      // watermark = 10:10 - 10m = 10:00 → nothing finalized yet
      assert(spark.table("s_tumbling").count() == 0)

      // event at 12:30 pushes the watermark to 12:20 → [10,11) closes
      in.addData(ev(3, 1, "click", ts(12, 30)))
      q.processAllAvailable()
      val closed = spark.table("s_tumbling")
        .select("ws", "event_type", "n").as[(java.sql.Timestamp, String, Long)]
        .collect().toSet
      assert(closed.contains((ts(10, 0), "click", 2L)),
        s"window [10,11) not finalized: $closed")

      // a late row inside the closed window must be DROPPED
      in.addData(ev(4, 1, "click", ts(10, 20)))
      q.processAllAvailable()
      val after = spark.table("s_tumbling")
        .filter($"ws" === ts(10, 0)).select("n").as[Long].collect().toSeq
      assert(after == Seq(2L), s"late row leaked into closed window: $after")
    }
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = StreamingOps.dedup(in.toDF(), "1 hour")
      .writeStream.format("memory").queryName("s_dedup")
      .outputMode("append").start()
    withQuery(q) {
      in.addData(ev(1, 1, "click", ts(10, 0)), ev(1, 1, "click", ts(10, 0)),
        ev(2, 2, "view", ts(10, 1)))
      q.processAllAvailable()
      // a duplicate arriving in a LATER batch is suppressed by state —
      // including a redelivery with a re-stamped ts (id-only dedup)
      in.addData(ev(1, 1, "click", ts(10, 0)), ev(2, 2, "view", ts(10, 3)),
        ev(3, 1, "view", ts(10, 2)))
      q.processAllAvailable()
      val ids = spark.table("s_dedup").select("event_id").as[Long]
        .collect().toSeq.sorted
      assert(ids == Seq(1L, 2L, 3L), s"dedup failed: $ids")
    }
  }

  test("flatMapGroupsWithState evolves per-user state across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = StreamingOps.statefulUserAgg(in.toDS())
      .writeStream.format("memory").queryName("s_state")
      .outputMode("update").start()
    withQuery(q) {
      in.addData(ev(1, 7, "click", ts(10, 0), 2.0), ev(2, 7, "view", ts(10, 5), 3.0))
      q.processAllAvailable()
      val b1 = spark.table("s_state").orderBy($"last_seen_ms".desc)
        .as[(Long, Long, Long, Double)].head()
      assert(b1 == ((7L, ts(10, 5).getTime, 2L, 5.0)))

      // second batch: state carries over, not recomputed from scratch
      in.addData(ev(3, 7, "click", ts(10, 30), 4.0))
      q.processAllAvailable()
      val latest = spark.table("s_state").orderBy($"last_seen_ms".desc)
        .as[(Long, Long, Long, Double)].head()
      assert(latest == ((7L, ts(10, 30).getTime, 3L, 9.0)),
        s"state did not evolve: $latest")
    }
  }

  test("file-sink query restarts from its checkpoint without duplicates") {
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "stream_cp")
    val (in, out, cp) = (s"$base/in", s"$base/out", s"$base/cp")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(in)
    def startQ() = spark.readStream.schema("id BIGINT, v STRING").parquet(in)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp).start()
    val q1 = startQ()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out).count() == 2)
    // new data lands while no query is running; the restarted query
    // must pick up only the unprocessed files (offsets from cp)
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(in)
    val q2 = startQ()
    q2.processAllAvailable(); q2.stop()
    val rows = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (3L, "c")),
      s"restart reprocessed or lost rows: $rows")
  }

  // ---- batch ≡ stream parity (VERDICT r2 task 8): the SAME window
  // logic, fed the real events fixture as a closed MemoryStream in
  // complete mode, must reproduce the batch (oracle-checked) key.
  // n is exact; sv tolerates the batch key's per-row DECIMAL(12,2)
  // rounding (≤ 0.005·n) vs the stream's raw double sum.

  private def eventRows: Seq[EventRow] =
    graft.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts", "value")
      .as[EventRow].collect().toSeq

  test("batch ≡ stream parity: tumbling windows on a closed feed") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = StreamingOps.tumblingAgg(in.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("p_tumbling")
      .outputMode("complete").start()
    withQuery(q) {
      in.addData(eventRows: _*)
      q.processAllAvailable()
      val stream = spark.table("p_tumbling").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2)) ->
          (r.getLong(3), r.getDouble(4))).toMap
      val batch = queries.EventWindows.queries("stream_tumbling")(spark, sf)
        .collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2)) ->
          (r.getLong(3), r.getDouble(4))).toMap
      assert(stream.keySet == batch.keySet,
        s"window/key sets differ: only-stream=${stream.keySet -- batch.keySet} " +
          s"only-batch=${batch.keySet -- stream.keySet}")
      batch.foreach { case (k, (n, sv)) =>
        val (ns, ss) = stream(k)
        assert(ns == n, s"count mismatch at $k: stream=$ns batch=$n")
        assert(math.abs(ss - sv) <= 0.005 * n + 1e-6,
          s"sum mismatch at $k: stream=$ss batch=$sv")
      }
    }
  }

  test("batch ≡ stream parity: sliding windows on a closed feed") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = in.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(org.apache.spark.sql.functions
        .window($"ts", "1 hour", "15 minutes").as("w"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"value").as("sv"))
      .select($"w.start".as("ws"), $"w.end".as("we"), $"n", $"sv")
      .writeStream.format("memory").queryName("p_sliding")
      .outputMode("complete").start()
    withQuery(q) {
      in.addData(eventRows: _*)
      q.processAllAvailable()
      val stream = spark.table("p_sliding").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val batch = queries.EventWindows.queries("stream_sliding")(spark, sf)
        .collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(stream.keySet == batch.keySet)
      batch.foreach { case (k, (n, sv)) =>
        val (ns, ss) = stream(k)
        assert(ns == n, s"count mismatch at $k: stream=$ns batch=$n")
        assert(math.abs(ss - sv) <= 0.005 * n + 1e-6,
          s"sum mismatch at $k: stream=$ss batch=$sv")
      }
    }
  }

  test("batch ≡ stream parity: session windows on a closed feed") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = StreamingOps.sessionAgg(in.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("p_session")
      .outputMode("complete").start()
    withQuery(q) {
      in.addData(eventRows: _*)
      q.processAllAvailable()
      val stream = spark.table("p_session").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)) ->
          (r.getLong(3), r.getDouble(4))).toMap
      val batch = queries.EventWindows.queries("stream_session")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)) ->
          (r.getLong(3), r.getDouble(4))).toMap
      assert(stream.keySet == batch.keySet,
        s"session sets differ: only-stream=${(stream.keySet -- batch.keySet).take(3)} " +
          s"only-batch=${(batch.keySet -- stream.keySet).take(3)}")
      batch.foreach { case (k, (n, sv)) =>
        val (ns, ss) = stream(k)
        assert(ns == n, s"count mismatch at $k: stream=$ns batch=$n")
        assert(math.abs(ss - sv) <= 0.005 * n + 1e-6,
          s"sum mismatch at $k: stream=$ss batch=$sv")
      }
    }
  }

  test("batch ≡ stream parity: per-user state on a closed feed") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = StreamingOps.statefulUserAgg(in.toDS())
      .writeStream.format("memory").queryName("p_state")
      .outputMode("update").start()
    withQuery(q) {
      in.addData(eventRows: _*)
      q.processAllAvailable()
      // update mode emits one row per touched user per batch; a single
      // closed batch → exactly the final state per user
      val stream = spark.table("p_state").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      val batch = queries.EventWindows.queries("stream_stateful")(spark, sf)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3))).toMap
      assert(stream.keySet == batch.keySet)
      batch.foreach { case (u, (lastMs, n, tot)) =>
        val (sMs, sN, sTot) = stream(u)
        assert(sMs == lastMs, s"last_seen mismatch for user $u")
        assert(sN == n, s"count mismatch for user $u")
        assert(math.abs(sTot - tot) <= 0.005 * n + 1e-6,
          s"total mismatch for user $u: stream=$sTot batch=$tot")
      }
    }
  }

  test("foreachBatch streaming sink into the warehouse is exactly-once") {
    implicit val sq = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "stream_wh").toString
    val runner = new graft.pipeline.PipelineRunner(
      spark, graft.pipeline.PipelineSpec(Nil), wh)
    runner.initialize()
    val in = MemoryStream[EventRow]
    val q = in.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        runner.appendBatch("ev_sink", batch, id): Unit
      }
      .start()
    withQuery(q) {
      in.addData(ev(1, 1, "click", ts(10, 0)), ev(2, 1, "view", ts(10, 1)))
      q.processAllAvailable()
      in.addData(ev(3, 2, "click", ts(10, 2)))
      q.processAllAvailable()
      assert(runner.readTable("ev_sink").count() == 3)
      // a redelivered micro-batch (failure replay) must be a no-op —
      // same batchId, same (or equal) data
      val replay = Seq(ev(3, 2, "click", ts(10, 2))).toDF()
      assert(runner.appendBatch("ev_sink", replay, 1L) == 0L)
      assert(runner.readTable("ev_sink").count() == 3)
      // a genuinely new batch id still appends
      assert(runner.appendBatch("ev_sink",
        Seq(ev(4, 2, "view", ts(10, 3))).toDF(), 2L) == 1L)
      assert(runner.readTable("ev_sink").count() == 4)
      // vacuum keeps the streamids sidecar with the live generation
      runner.vacuum("ev_sink", minAgeMs = 0L)
      assert(runner.appendBatch("ev_sink", replay, 1L) == 0L,
        "vacuum must not forget committed batch ids")
    }
  }

  test("streaming curation: split-routed exactly-once sinks") {
    // the streaming form of llm_curation_pipeline's routing stage: a
    // doc stream fans out to per-split warehouse tables inside ONE
    // foreachBatch (all three appends share the batch id, each
    // exactly-once). Hash routing means a replay routes identically,
    // so the no-op guarantee composes per table.
    implicit val sq = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "cur_wh").toString
    val runner = new graft.pipeline.PipelineRunner(
      spark, graft.pipeline.PipelineSpec(Nil), wh)
    runner.initialize()
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val routed = graft.operators.Curation
          .holdoutSplit(batch, "doc_id").localCheckpoint()
        for (s <- Seq("train", "val", "test"))
          runner.appendBatch(s"docs_$s",
            routed.filter(col("split") === s).drop("split", "split_bucket"),
            id): Unit
      }
      .start()
    withQuery(q) {
      val docs = (0L until 200L).map(i => (i, s"doc number $i"))
      in.addData(docs.take(100): _*)
      q.processAllAvailable()
      in.addData(docs.drop(100): _*)
      q.processAllAvailable()
      val counts = Seq("train", "val", "test")
        .map(s => s -> runner.readTable(s"docs_$s").count()).toMap
      assert(counts.values.sum == 200, s"routing must partition: $counts")
      assert(counts("train") > 150, s"~90% routes to train: $counts")
      // replayed batch: every split table no-ops under the shared id
      val replay = docs.take(100).toDF("doc_id", "text")
      val routed = graft.operators.Curation.holdoutSplit(replay, "doc_id")
      for (s <- Seq("train", "val", "test"))
        assert(runner.appendBatch(s"docs_$s",
          routed.filter(col("split") === s).drop("split", "split_bucket"),
          0L) == 0L, s"replay must no-op for docs_$s")
      assert(Seq("train", "val", "test")
        .map(s => runner.readTable(s"docs_$s").count()).sum == 200)
      // batch ≡ stream: the streamed split equals the batch split
      val batchSplit = graft.operators.Curation
        .holdoutSplit(docs.toDF("doc_id", "text"), "doc_id")
        .filter(col("split") === "train")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val streamed = runner.readTable("docs_train")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batchSplit)
    }
  }

  test("streaming cardinality sketches: per-micro-batch HLL partials " +
      "appended exactly-once roll up to the one-shot estimate") {
    implicit val sq = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "sketch_wh").toString
    val runner = new graft.pipeline.PipelineRunner(
      spark, graft.pipeline.PipelineSpec(Nil), wh)
    runner.initialize()
    val rnd = new scala.util.Random(23)
    val all = (0L until 90L).map { i =>
      val words = (0 until 10).map(_ => s"w${rnd.nextInt(200)}")
      (i, s"s${i % 3}", words.mkString(" "))
    }
    // the stream: each micro-batch aggregates to per-group sketch
    // rows (few KB) and APPENDS those — the corpus itself is never
    // persisted or rescanned
    val in = MemoryStream[(Long, String, String)]
    val q = in.toDF().toDF("doc_id", "source", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        runner.appendBatch("sketches",
          graft.operators.Sketches.tokenCardinality(batch, "source",
            "text"), id): Unit
      }
      .start()
    withQuery(q) {
      in.addData(all.take(40): _*)
      q.processAllAvailable()
      in.addData(all.drop(40): _*)
      q.processAllAvailable()
      val merged = graft.operators.Sketches.estimateCardinality(
        runner.readTable("sketches"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      import spark.implicits._
      val oneShot = graft.operators.Sketches.estimateCardinality(
        graft.operators.Sketches.tokenCardinality(
          all.toDF("doc_id", "source", "text"), "source", "text"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(merged == oneShot,
        s"streamed partials must roll up exactly: $merged vs $oneShot")
      // replayed micro-batch appends nothing under its original id
      assert(runner.appendBatch("sketches",
        graft.operators.Sketches.tokenCardinality(
          all.take(40).toDF("doc_id", "source", "text"), "source",
          "text"), 0L) == 0L)
      assert(graft.operators.Sketches.estimateCardinality(
        runner.readTable("sketches"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == oneShot, "replay must not perturb the estimates")
    }
  }

  test("streaming decontamination: each micro-batch checks the " +
      "persisted gram table; union ≡ one-shot; replay no-ops") {
    implicit val sq = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "sdecon_wh").toString
    val runner = new graft.pipeline.PipelineRunner(
      spark, graft.pipeline.PipelineSpec(Nil), wh)
    runner.initialize()
    val rnd = new scala.util.Random(17)
    def doc(i: Long) = {
      val words = (0 until 12).map(_ => s"w${rnd.nextInt(30)}")
      (i, words.mkString(" "))
    }
    val all = (0L until 120L).map(doc)
    val bench = all.filter(_._1 % 4 === 0)
    val corpus = all.filterNot(_._1 % 4 === 0)
    // benchmark gram table persisted ONCE, before the stream starts
    graft.operators.Dedup.decontaminateIndex(runner, "bg",
      bench.toDF("doc_id", "text"), "doc_id", "text", n = 2,
      batchId = 0L): Unit
    // the stream: every micro-batch of new corpus docs is checked
    // against the persisted grams and hits append exactly-once
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val hits = graft.operators.Dedup.decontaminateIncremental(
          runner, "bg", batch, "doc_id", "text", n = 2)
        runner.appendBatch("contaminated", hits, id): Unit
      }
      .start()
    withQuery(q) {
      in.addData(corpus.take(45): _*)
      q.processAllAvailable()
      in.addData(corpus.drop(45): _*)
      q.processAllAvailable()
      val streamed = runner.readTable("contaminated")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val oneShot = graft.operators.Dedup.decontaminate(
        corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
        "doc_id", "text", n = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == oneShot,
        s"stream-union must equal one-shot: ${streamed.size} vs ${oneShot.size}")
      assert(streamed.nonEmpty, "fixture must actually contaminate")
      // a replayed micro-batch appends nothing under its original id
      val replayHits = graft.operators.Dedup.decontaminateIncremental(
        runner, "bg", corpus.take(45).toDF("doc_id", "text"),
        "doc_id", "text", n = 2)
      assert(runner.appendBatch("contaminated", replayHits, 0L) == 0L)
      assert(runner.readTable("contaminated").count() == oneShot.size)
    }
  }

  test("foreachBatch streaming MERGE sink upserts exactly-once") {
    implicit val sq = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "stream_mwh").toString
    val runner = new graft.pipeline.PipelineRunner(
      spark, graft.pipeline.PipelineSpec(Nil), wh)
    runner.initialize()
    val in = MemoryStream[EventRow]
    // per-user latest-state upsert: the standard streaming-MERGE shape
    val q = in.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val latest = batch.orderBy(org.apache.spark.sql.functions.col("ts").desc)
          .dropDuplicates("user_id")
          .select("user_id", "event_type", "ts")
        runner.mergeBatch("user_state", latest, id,
          uniqueKey = Seq("user_id"), buckets = 4): Unit
      }
      .start()
    withQuery(q) {
      in.addData(ev(1, 1, "click", ts(10, 0)), ev(2, 2, "view", ts(10, 1)))
      q.processAllAvailable()
      in.addData(ev(3, 1, "purchase", ts(10, 2)))
      q.processAllAvailable()
      val state = runner.readTable("user_state")
        .select("user_id", "event_type")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(state == Map(1L -> "purchase", 2L -> "view"))
      // replayed micro-batch is a no-op on the merged state
      val replay = Seq(ev(3, 1, "IGNORED", ts(10, 2))).toDF()
        .select("user_id", "event_type", "ts")
      assert(runner.mergeBatch("user_state", replay, 1L,
        uniqueKey = Seq("user_id"), buckets = 4) == 0L)
      assert(runner.readTable("user_state")
        .filter($"event_type" === "IGNORED").count() == 0)
    }
  }

  test("mergeBatch recovers from a checkpoint restart: replay is a no-op") {
    // a REAL StreamingQuery stop/restart: q1 commits micro-batch 0,
    // then the checkpoint's commit marker is removed (the crash
    // window: sink committed, checkpoint not yet) so the restarted
    // query REDELIVERS batch 0 through foreachBatch — mergeBatch's
    // streamids ledger must make the replay a no-op, then keep
    // accepting genuinely new batches
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "stream_mcp")
    val (in, cp, wh) = (s"$base/in", s"$base/cp", s"$base/wh")
    val runner = new graft.pipeline.PipelineRunner(
      spark, graft.pipeline.PipelineSpec(Nil), wh)
    runner.initialize()
    val upserted =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    Seq((1L, "a"), (2L, "a")).toDF("id", "v")
      .write.mode("append").parquet(in)
    def startQ() = spark.readStream.schema("id BIGINT, v STRING")
      .parquet(in)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val latest = batch.dropDuplicates("id")
        upserted.add(id -> runner.mergeBatch("ms_state", latest, id,
          uniqueKey = Seq("id"), buckets = 4)): Unit
      }
      .start()
    val q1 = startQ()
    q1.processAllAvailable(); q1.stop()
    assert(runner.readTable("ms_state").count() == 2)
    assert(upserted.poll() == (0L -> 2L))
    // simulate the crash window: drop the commit marker, keep offsets
    // (including its Hadoop checksum shadow — a stale .0.crc fails
    // the restarted query's commit-log rename)
    val commit0 = java.nio.file.Paths.get(cp, "commits", "0")
    assert(java.nio.file.Files.deleteIfExists(commit0),
      "checkpoint commit marker for batch 0 must exist")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(cp, "commits", ".0.crc")): Unit
    val q2 = startQ()
    q2.processAllAvailable()
    // batch 0 was redelivered and ignored: 0 rows upserted, no dups
    assert(upserted.poll() == (0L -> 0L),
      "restarted query must redeliver batch 0 as a no-op")
    assert(runner.readTable("ms_state").count() == 2)
    // new data through the SAME restarted query still upserts
    Seq((2L, "b"), (3L, "b")).toDF("id", "v")
      .write.mode("append").parquet(in)
    q2.processAllAvailable(); q2.stop()
    assert(upserted.poll() == (1L -> 2L))
    val state = runner.readTable("ms_state")
      .as[(Long, String)].collect().toMap
    assert(state == Map(1L -> "a", 2L -> "b", 3L -> "b"),
      s"post-restart upsert wrong: $state")
  }

  test("file-source ingest pipeline: watermarked agg + appendBatch " +
      "survives kill-and-restart AND a crash-window redelivery") {
    // the full Phase-S shape: readStream(files) → watermark tumbling
    // agg → exactly-once warehouse append. Two time-ordered chunks
    // with a real query stop between them; then the crash window
    // (sink committed, checkpoint commit marker lost) forces a
    // redelivery through foreachBatch that the ledger must absorb.
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "stream_fi")
    val (in, cp, wh) = (s"$base/in", s"$base/cp", s"$base/wh")
    val runner = new graft.pipeline.PipelineRunner(
      spark, graft.pipeline.PipelineSpec(Nil), wh)
    runner.initialize()
    def writeChunk(rows: (Long, Int, Int, Double)*): Unit =
      rows.map { case (id, h, m, v) => (id, ts(h, m), id % 3, "click", v) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(in)
    def start() = StreamingOps.startFileIngest(
      spark, runner, in, cp, "fi", delay = "0 seconds")
    // hour 0 + a row in hour 1 → watermark passes hour 0's window end
    writeChunk((1L, 0, 10, 1.0), (2L, 0, 40, 2.0), (3L, 1, 5, 4.0))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    def table() = runner.readTable("fi")
      .select("ws", "event_type", "n", "sv").orderBy("ws")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
    assert(table() == Seq((ts(0, 0), "click", 2L, 3.0)),
      s"hour-0 window must have finalized: ${table()}")
    // kill happened; new data arrives while no query runs. The
    // restarted query recovers offsets AND the watermark from cp.
    writeChunk((4L, 1, 30, 8.0), (5L, 2, 1, 16.0))
    val q2 = start()
    q2.processAllAvailable()
    assert(table() == Seq(
      (ts(0, 0), "click", 2L, 3.0), (ts(1, 0), "click", 2L, 12.0)),
      s"restart lost or duplicated windows: ${table()}")
    // crash-window: drop the LAST commit marker (keep offsets), so
    // restarting redelivers that batch — appendBatch must no-op it
    q2.stop()
    val commits = java.nio.file.Paths.get(cp, "commits")
    val last = java.nio.file.Files.list(commits).iterator()
    import scala.jdk.CollectionConverters._
    val lastBatch = last.asScala.map(_.getFileName.toString)
      .filterNot(_.startsWith(".")).map(_.toLong).max
    java.nio.file.Files.delete(commits.resolve(lastBatch.toString))
    java.nio.file.Files.deleteIfExists(
      commits.resolve(s".$lastBatch.crc")): Unit
    // Spark 4's state-store commit validation would flag the replayed
    // batch as a zombie commit — which is exactly the crash we are
    // simulating (state+sink committed, offsets-log commit lost).
    // startFileIngest must SELF-HEAL: detect the pending replay and
    // recover WITHOUT the host session touching the validation conf
    val cvConf = "spark.sql.streaming.stateStore.commitValidation.enabled"
    val hostCv = spark.conf.get(cvConf, "true")
    val q3 = start()
    q3.processAllAvailable()
    assert(table() == Seq(
      (ts(0, 0), "click", 2L, 3.0), (ts(1, 0), "click", 2L, 12.0)),
      s"redelivered batch must be a ledger no-op: ${table()}")
    // and the SAME recovered query keeps ingesting new data
    writeChunk((6L, 2, 30, 32.0), (7L, 3, 1, 64.0))
    q3.processAllAvailable(); q3.stop()
    assert(table() == Seq(
      (ts(0, 0), "click", 2L, 3.0), (ts(1, 0), "click", 2L, 12.0),
      (ts(2, 0), "click", 2L, 48.0)),
      s"post-recovery ingest wrong: ${table()}")
    // the recovery never mutated the HOST session's validation conf
    assert(spark.conf.get(cvConf, "true") == hostCv,
      "self-healing recovery must be scoped to the recovering query")
  }

  test("session windows close after the gap under a watermark") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = StreamingOps.sessionAgg(in.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("s_session")
      .outputMode("append").start()
    withQuery(q) {
      // one session: 10:00 + 10:05 (gap < 30m)
      in.addData(ev(1, 1, "click", ts(10, 0)), ev(2, 1, "click", ts(10, 5)))
      q.processAllAvailable()
      // events far beyond the session end + watermark close it
      in.addData(ev(3, 1, "click", ts(13, 0)))
      q.processAllAvailable()
      in.addData(ev(4, 1, "click", ts(15, 0)))
      q.processAllAvailable()
      val sessions = spark.table("s_session")
        .select("user_id", "n").as[(Long, Long)].collect().toSet
      assert(sessions.contains((1L, 2L)), s"merged session missing: $sessions")
    }
  }

  test("streaming BPE encode with the persisted tokenizer ≡ batch " +
      "encode; appends are exactly-once") {
    implicit val sq = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "sbpe_wh").toString
    val runner = new graft.pipeline.PipelineRunner(
      spark, graft.pipeline.PipelineSpec(Nil), wh)
    runner.initialize()
    val train = Seq((1L, "low lower lowest"), (2L, "new newer newest"),
      (3L, "low low new new wide")).toDF("doc_id", "text")
    // tokenizer trained ONCE, before the stream starts — each
    // micro-batch is a pure map-only encode against the stored merges
    assert(graft.operators.Bpe.ensureIndex(runner, "tok", train,
      "text", numMerges = 8))
    val arrivals = (10L until 40L).map(i =>
      (i, s"lower newest wide$i low new"))
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val enc = graft.operators.Bpe.encodeWithIndex(
          runner, "tok", batch, "doc_id", "text")
          .select("doc_id", "n_tokens")
        runner.appendBatch("encoded", enc, id): Unit
      }
      .start()
    withQuery(q) {
      in.addData(arrivals.take(15): _*)
      q.processAllAvailable()
      in.addData(arrivals.drop(15): _*)
      q.processAllAvailable()
      val streamed = runner.readTable("encoded")
        .as[(Long, Long)].collect().toMap
      val merges = graft.operators.Bpe.storedMerges(runner, "tok")
      val batchEnc = graft.operators.Bpe.encode(
        arrivals.toDF("doc_id", "text"), "doc_id", "text", merges)
        .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
      assert(streamed == batchEnc)
      assert(streamed.size == 30)
      // replayed micro-batch id → exactly-once no-op
      val replay = graft.operators.Bpe.encodeWithIndex(runner, "tok",
        arrivals.take(15).toDF("doc_id", "text"), "doc_id", "text")
        .select("doc_id", "n_tokens")
      assert(runner.appendBatch("encoded", replay, 0L) == 0L)
    }
  }

  test("delta streaming source → delta sink is exactly-once across a " +
      "crash between sink commit and bookmark write: the replayed " +
      "batch is skipped by the txn watermark") {
    import graft.sources.{DeltaRead, DeltaStreamSource, DeltaWrite}
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    val root = java.nio.file.Files.createTempDirectory(base, "dsrc")
    val (src, snk, cp) = (s"$root/src", s"$root/snk", s"$root/cp")
    DeltaWrite.merge(spark, src,
      Seq((1L, 0.0), (2L, 0.0), (3L, 0.0)).toDF("id", "bal"),
      Seq("id"), enableCdf = true)
    DeltaWrite.merge(spark, src,
      Seq((1L, 10.0), (3L, 30.0)).toDF("id", "bal"), Seq("id"))
    val appId = "dsrc-e2e"
    def applyBatch(df: org.apache.spark.sql.DataFrame, v: Long): Long =
      DeltaWrite.mergeBatch(spark, snk, appId, v,
        df.filter(col("_change_type").isin("insert", "update_postimage"))
          .select("id", "bal"),
        Seq("id"))
    // crash AFTER the sink committed batch 0 but BEFORE the bookmark
    val boom = intercept[RuntimeException](
      DeltaStreamSource.processAvailable(spark, src, cp) { (df, v) =>
        applyBatch(df, v): Unit
        throw new RuntimeException("simulated crash after sink commit")
      })
    assert(boom.getMessage.contains("simulated crash"))
    assert(DeltaStreamSource.readBookmark(cp).isEmpty,
      "bookmark advanced past an incomplete batch")
    // restart: batch 0 REPLAYS; the sink's txn watermark skips it
    val skips = scala.collection.mutable.ListBuffer.empty[Long]
    val n = DeltaStreamSource.processAvailable(spark, src, cp) { (df, v) =>
      skips += applyBatch(df, v)
    }
    assert(n == 2, s"restart should deliver both commits, got $n")
    assert(skips.head == -1L,
      s"replayed batch 0 was applied twice: ${skips.toList}")
    val got = DeltaRead.readDeltaTable(spark, snk)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (2L, 0.0), (3L, 30.0)), got.toString)
    // a third source commit: only IT is delivered on the next drain
    DeltaWrite.merge(spark, src,
      Seq((2L, 20.0)).toDF("id", "bal"), Seq("id"))
    val n2 = DeltaStreamSource.processAvailable(spark, src, cp)(
      (df, v) => applyBatch(df, v): Unit)
    assert(n2 == 1, s"bookmark resume delivered $n2 batches")
    val got2 = DeltaRead.readDeltaTable(spark, snk)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(got2 == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)), got2.toString)
    // a non-CDF table refuses loudly
    val plain = s"$root/plain"
    DeltaWrite.merge(spark, plain, Seq((1L, 1.0)).toDF("id", "bal"),
      Seq("id"))
    val e = intercept[IllegalArgumentException](
      DeltaStreamSource.processAvailable(spark, plain, s"$root/cp2")(
        (_, _) => ()))
    assert(e.getMessage.contains("enableChangeDataFeed"), e.getMessage)
  }

  test("iceberg streaming source → delta sink is exactly-once across " +
      "a crash (replay skipped by the txn watermark); a bookmark " +
      "expired by expireSnapshots refuses loudly") {
    import graft.sources.{DeltaRead, DeltaWrite, IcebergStreamSource, IcebergWrite}
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    val root = java.nio.file.Files.createTempDirectory(base, "isrc")
    val (src, snk, cp) = (s"$root/src", s"$root/snk", s"$root/cp")
    IcebergWrite.mergeOnRead(spark, src,
      Seq((1L, 0.0), (2L, 0.0), (3L, 0.0)).toDF("id", "bal"), Seq("id"))
    IcebergWrite.mergeOnRead(spark, src,
      Seq((1L, 10.0), (3L, 30.0)).toDF("id", "bal"), Seq("id"))
    val appId = "isrc-e2e"
    def applyBatch(df: org.apache.spark.sql.DataFrame, snap: Long): Long =
      DeltaWrite.mergeBatch(spark, snk, appId, snap,
        df.filter(col("_change_type") === "INSERT").select("id", "bal"),
        Seq("id"))
    val boom = intercept[RuntimeException](
      IcebergStreamSource.processAvailable(spark, src, cp) { (df, v) =>
        applyBatch(df, v): Unit
        throw new RuntimeException("simulated crash after sink commit")
      })
    assert(boom.getMessage.contains("simulated crash"))
    assert(IcebergStreamSource.readBookmark(cp).isEmpty)
    val skips = scala.collection.mutable.ListBuffer.empty[Long]
    val n = IcebergStreamSource.processAvailable(spark, src, cp) {
      (df, v) => skips += applyBatch(df, v)
    }
    assert(n == 2, s"restart should deliver both snapshots, got $n")
    assert(skips.head == -1L,
      s"replayed snapshot 1 was applied twice: ${skips.toList}")
    val got = DeltaRead.readDeltaTable(spark, snk)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (2L, 0.0), (3L, 30.0)), got.toString)
    // only the new snapshot on the next drain
    IcebergWrite.mergeOnRead(spark, src,
      Seq((2L, 20.0)).toDF("id", "bal"), Seq("id"))
    assert(IcebergStreamSource.processAvailable(spark, src, cp)(
      (df, v) => applyBatch(df, v): Unit) == 1)
    assert(DeltaRead.readDeltaTable(spark, snk)
      .orderBy("id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // expire PAST the bookmark → the consumer must refuse, never skip
    IcebergWrite.mergeOnRead(spark, src,
      Seq((1L, 11.0)).toDF("id", "bal"), Seq("id"))
    IcebergWrite.expireSnapshots(spark, src, keepLast = 1)
    val e = intercept[IllegalArgumentException](
      IcebergStreamSource.processAvailable(spark, src, cp)((_, _) => ()))
    assert(e.getMessage.contains("EXPIRED"), e.getMessage)
    // a FRESH consumer on the same expired-history table must refuse
    // just as loudly — starting at the earliest retained snapshot
    // would silently deliver an incomplete baseline
    val e2 = intercept[IllegalArgumentException](
      IcebergStreamSource.processAvailable(spark, src, s"$root/cpFresh")(
        (_, _) => ()))
    assert(e2.getMessage.contains("has a parent"), e2.getMessage)
  }

  test("iceberg source snapshot ordering: per-table sequence numbers, " +
      "v1 array order, upgraded tables by timestamp, ambiguous mixed " +
      "metadata refuses loudly") {
    import graft.sources.IcebergStreamSource
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    def mkTable(snaps: Seq[(Long, Option[Long], Option[Long])]): String = {
      val root = java.nio.file.Files.createTempDirectory(base, "iord")
      val metaDir = root.resolve("metadata")
      java.nio.file.Files.createDirectories(metaDir)
      val snapJson = snaps.map { case (id, seq, ts) =>
        val s = new StringBuilder(s"""{"snapshot-id": $id""")
        seq.foreach(v => s.append(s""", "sequence-number": $v"""))
        ts.foreach(v => s.append(s""", "timestamp-ms": $v"""))
        s.append("}").toString
      }.mkString("[", ", ", "]")
      java.nio.file.Files.writeString(metaDir.resolve("v1.metadata.json"),
        s"""{"format-version": 2, "snapshots": $snapJson}""")
      java.nio.file.Files.writeString(
        metaDir.resolve("version-hint.text"), "1")
      root.toString
    }
    // all sequence-numbered (v2): sorted by sequence, not array order
    assert(IcebergStreamSource.orderedSnapshots(mkTable(Seq(
      (30L, Some(3L), None), (10L, Some(1L), None), (20L, Some(2L), None)
    ))) == Seq(10L, 20L, 30L))
    // none sequence-numbered (v1): metadata array order
    assert(IcebergStreamSource.orderedSnapshots(mkTable(Seq(
      (30L, None, None), (10L, None, None), (20L, None, None)
    ))) == Seq(30L, 10L, 20L))
    // v1→v2 upgrade (new snapshots restart sequence numbers at 1):
    // NEVER interleave by the per-snapshot fallback — distinct commit
    // timestamps order the whole history
    assert(IcebergStreamSource.orderedSnapshots(mkTable(Seq(
      (10L, None, Some(1000L)), (20L, None, Some(2000L)),
      (30L, Some(1L), Some(3000L)), (40L, Some(2L), Some(4000L))
    ))) == Seq(10L, 20L, 30L, 40L))
    // mixed metadata with TIED timestamps is unorderable → loud refusal
    val e = intercept[IllegalArgumentException](
      IcebergStreamSource.orderedSnapshots(mkTable(Seq(
        (10L, None, Some(1000L)), (30L, Some(1L), Some(1000L))))))
    assert(e.getMessage.contains("sequence-number"), e.getMessage)
  }
}
