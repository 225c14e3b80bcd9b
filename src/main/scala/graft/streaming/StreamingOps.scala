package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the §2.11 event-time logic
  * (SURVEY §7 phase S; the batch-oracle-checked forms live in
  * `graft.queries.EventWindows`). Every function takes a *streaming*
  * DataFrame (`readStream` / MemoryStream) with the events schema
  * (`event_id long, user_id long, event_type string, ts timestamp,
  * value double`) and returns a streaming result; MemoryStream unit
  * tests in `graft.StreamingSpec` prove watermark late-drop and
  * per-key state evolution.
  *
  * Scale notes: all state (window aggs, dedup keys, per-user state)
  * is bounded by the watermark — without it, stream state grows
  * forever at 100 TB/day. Aggregations shuffle once on the group key;
  * `flatMapGroupsWithState` keys state by user_id, so skewed users
  * are the only hot spot (mitigate upstream via pre-aggregation).
  */
object StreamingOps {

  /** Tumbling 1-hour counts/sums with a watermark: windows finalize
    * (append mode) once the watermark passes their end; rows later
    * than `delay` behind the max seen event time are dropped.
    */
  def tumblingAgg(events: DataFrame, delay: String): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("event_type"), col("n"), col("sv"))

  /** Stateful streaming dedup on event_id alone: a redelivery with a
    * re-stamped ts still dedups (matching the batch analog), and
    * `dropDuplicatesWithinWatermark` evicts each id's state once the
    * watermark passes it, so state stays bounded by `delay` of event
    * time.
    */
  def dedup(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Session windows (30-min gap) under a watermark. */
  def sessionAgg(events: DataFrame, delay: String): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("user_id"), col("w.start").as("ss"), col("w.end").as("se"),
        col("n"), col("sv"))

  /** Stream-stream INNER interval join (click→purchase attribution):
    * each left event joins right events by the same user with
    * `left.ts <= right.ts < left.ts + horizon`. Both sides carry
    * watermarks and the join condition bounds the event-time distance,
    * which is exactly what lets Spark evict buffered join state once
    * the watermark passes — without both, stream-stream join state
    * grows forever at 100 TB/day. Inner-join rows are emitted as soon
    * as both sides have arrived, so on a closed feed the result equals
    * the batch join (parity-tested in `graft.StreamingSpec`); in batch
    * the watermarks are no-ops and this IS the batch range join
    * (`stream_join`'s oracle-checked path — one equi-shuffle on
    * user_id, range predicate evaluated inside the join).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      delay: String, horizon: String): DataFrame = {
    val c = left.select(col("event_id").as("click_id"),
        col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val p = right.select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    c.join(p, col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr(s"INTERVAL '$horizon'"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Per-user running state, updated each micro-batch. */
  case class EventRow(event_id: Long, user_id: Long, event_type: String,
                      ts: java.sql.Timestamp, value: Double)
  case class UserState(lastSeenMs: Long, nEvents: Long, totalValue: Double)
  case class UserStateOut(user_id: Long, last_seen_ms: Long, n_events: Long,
                          total_value: Double)

  /** Custom per-key state via flatMapGroupsWithState (the
    * mapGroupsWithState family): emits the updated running state for
    * every user touched in the micro-batch. ProcessingTimeTimeout is
    * deliberately NOT used — state retention policy belongs to the
    * caller; tests exercise state evolution across batches.
    */
  def statefulUserAgg(events: Dataset[EventRow]): Dataset[UserStateOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserStateOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(Long.MinValue, 0L, 0.0))
          val next = rows.foldLeft(prev) { (st, e) =>
            UserState(math.max(st.lastSeenMs, e.ts.getTime),
              st.nEvents + 1, st.totalValue + e.value)
          }
          state.update(next)
          Iterator(UserStateOut(userId, next.lastSeenMs, next.nEvents,
            next.totalValue))
      }
  }

  /** Events-table streaming source schema (the file-ingest contract —
    * `props` is deliberately absent: an ingest pipeline declares the
    * columns it consumes so later producer-side additions can't
    * change its behavior silently).
    */
  val EventFileSchema: String =
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE"

  /** End-to-end file-source ingestion (SURVEY §7 Phase S): a
    * parquet-directory `readStream` feeds a WATERMARKED transform
    * whose finalized append-mode rows land in a warehouse table via
    * the exactly-once `PipelineRunner.appendBatch` ledger. The
    * returned query is restart-safe: source offsets + watermark live
    * in `checkpoint`, and a micro-batch redelivered after a crash in
    * the sink-committed/checkpoint-not-yet window is a ledger no-op
    * (spec-tested with a real stop → commit-marker removal →
    * restart).
    *
    * Crash-window recovery is SELF-HEALING: a checkpoint whose last
    * offsets entry has no matching commit marker means the next run
    * must REPLAY that batch, and when the state store already
    * committed it (crash after state+sink commit, before the
    * offsets-log commit), Spark 4's state-store commit validation
    * would fail the restart as a zombie commit. The ledger
    * (`appendBatch`), not the validator, is what guarantees
    * exactly-once here — so exactly that restart shape runs on a
    * session CLONE with
    * `spark.sql.streaming.stateStore.commitValidation.enabled=false`,
    * scoped to the recovering query; the host session and every
    * healthy start keep the validator on. When the state store did
    * NOT commit (plain crash), the replay recomputes state and the
    * disabled validator has nothing to validate away.
    *
    * Scale notes: the file source lists only NEW files per trigger
    * (bounded by `maxFilesPerTrigger` for backpressure); state held
    * by the transform is watermark-bounded; the sink appends one
    * member per micro-batch with no table rewrite, so steady-state
    * ingest cost is O(new data), independent of table size.
    */
  def startFileIngest(spark: org.apache.spark.sql.SparkSession,
      runner: graft.pipeline.PipelineRunner,
      inDir: String, checkpoint: String, table: String,
      delay: String = "10 minutes",
      transform: (DataFrame, String) => DataFrame = tumblingAgg,
      maxFilesPerTrigger: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val sess =
      if (pendingReplay(checkpoint)) {
        val recovery = spark.newSession()
        // newSession starts from SparkConf defaults — copy the host's
        // RUNTIME session confs over so the recovery run computes with
        // identical semantics (timezone, state-store provider, …),
        // then scope the one deliberate difference
        spark.conf.getAll.foreach { case (k, v) =>
          try recovery.conf.set(k, v)
          catch { case _: Exception => () } // static conf — already equal
        }
        recovery.conf.set(
          "spark.sql.streaming.stateStore.commitValidation.enabled", "false")
        recovery
      } else spark
    val src = sess.readStream
      .schema(EventFileSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
    transform(src, delay).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        runner.appendBatch(table, batch, id): Unit
      }
      .start()
  }

  /** True iff the checkpoint's newest offsets entry lacks its commit
    * marker — the restart will redeliver that micro-batch.
    */
  private def pendingReplay(checkpoint: String): Boolean = {
    import scala.jdk.CollectionConverters._
    def maxBatch(dir: java.nio.file.Path): Option[Long] =
      if (!java.nio.file.Files.isDirectory(dir)) None
      else {
        val s = java.nio.file.Files.list(dir)
        try s.iterator().asScala
          .map(_.getFileName.toString)
          .filterNot(_.startsWith("."))
          .flatMap(n => scala.util.Try(n.toLong).toOption)
          .maxOption
        finally s.close()
      }
    val base = java.nio.file.Paths.get(checkpoint)
    maxBatch(base.resolve("offsets")).exists(off =>
      maxBatch(base.resolve("commits")).forall(_ < off))
  }
}
