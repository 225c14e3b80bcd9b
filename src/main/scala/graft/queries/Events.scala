package graft.queries

import graft.{QueryGroup, Tables}
import graft.Tables.{dec2, asDouble}
import graft.pipeline.{PipelineRunner, PipelineSpec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.11 event-time windows, batch-first on `events.ts` so the
  * DuckDB oracle applies; the same logic re-runs under Structured
  * Streaming in `graft.streaming.StreamingOps` (watermarks, streaming
  * dedup, flatMapGroupsWithState — MemoryStream-tested in
  * `graft.StreamingSpec`, no oracle there). Spark's
  * window()/session_window() are epoch-aligned; the oracles mirror
  * that with time_bucket / lag-gap-cumsum.
  */
object EventWindows extends QueryGroup {

  override def queries: Map[String, Q] = Map(
    "stream_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec2(col("value")))).as("sv"))
        .select(col("w.start").as("ws"), col("w.end").as("we"),
          col("event_type"), col("n"), col("sv"))
        .orderBy("ws", "event_type")),

    "stream_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec2(col("value")))).as("sv"))
        .select(col("w.start").as("ws"), col("w.end").as("we"),
          col("n"), col("sv"))
        .orderBy("ws")),

    "stream_session" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"),
          col("user_id"))
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec2(col("value")))).as("sv"))
        .select(col("user_id"), col("w.start").as("ss"),
          col("w.end").as("se"), col("n"), col("sv"))
        .orderBy("user_id", "ss")),

    // Per-EVENT sessionization (the funnel-analysis shape, vs
    // stream_session's aggregated windows): lag-gap flag + running sum
    // assigns each event its user-relative session ordinal. Both
    // window functions share ONE (user_id) partition spec — a single
    // shuffle, per-user task size bounded by a user's history. Gap
    // compare in exact µs so engines agree on boundary events.
    "win_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = 1800L * 1000000L // 30 min
      val prev = lag(col("ts"), 1).over(w)
      val newS = when(prev.isNull ||
        unix_micros(col("ts")) - unix_micros(prev) >= gapUs, 1L)
        .otherwise(0L)
      Tables.events(s, d)
        .withColumn("new_s", newS)
        .withColumn("session_seq", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("session_seq"), (col("new_s") === 1L).as("is_session_start"))
        .orderBy("event_id")
    }),

    // Funnel conversion (ordered view → click → purchase): each stage
    // timestamp is a conditional min over the user's events with a
    // strictly-later-than-previous-stage guard — the MATCH_RECOGNIZE
    // subsequence shape, computed with three unbounded-frame window
    // aggregates that share ONE (user_id) shuffle (no sort needed,
    // no self-join of the event log).
    "win_funnel" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
      Tables.events(s, d)
        .withColumn("t1",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" &&
            col("ts") > col("t1"), col("ts"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" &&
            col("ts") > col("t2"), col("ts"))).over(w))
        .groupBy("user_id")
        .agg(max(col("t1")).as("view_ts"), max(col("t2")).as("click_ts"),
          max(col("t3")).as("purchase_ts"))
        .withColumn("converted", col("purchase_ts").isNotNull)
        .orderBy("user_id")
    }),

    // Gaps-and-islands: maximal runs of CONSECUTIVE activity days per
    // user (streak detection — the classic tabibitosan trick): within
    // one (user_id) window, day − row_number is constant exactly on a
    // consecutive run, so it is the island key. Two data shuffles:
    // the distinct dedups map-side on (user_id, day) partials, the
    // window clusters on user_id — and the island groupBy REUSES that
    // partitioning (user_id ⊂ its keys, zero extra exchange,
    // plan-verified); the only other exchange is the oracle-mandated
    // output ORDER BY.
    "win_gaps_islands" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      days
        .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
        .groupBy("user_id", "anchor")
        .agg(min(col("day")).as("streak_start"),
          max(col("day")).as("streak_end"),
          count(lit(1)).as("streak_days"))
        .select("user_id", "streak_start", "streak_end", "streak_days")
        .orderBy("user_id", "streak_start")
    }),

    // Cohort retention: users bucketed by first-seen day, activity
    // counted per (cohort, day offset) — the classic product-
    // analytics triangle (daily grain: the fixture spans one month).
    // Two shuffles total: the per-user first-day aggregate rides the
    // same (user_id) key as the distinct activity-day frame it joins,
    // then one rollup on (cohort, offset). Offsets are exact day
    // arithmetic on truncated days — engines agree on boundaries.
    "win_cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("day", col("ts")).as("m"))
      val firstSeen = ev.groupBy("user_id")
        .agg(min(col("m")).as("cohort"))
      ev.distinct()
        .join(firstSeen, "user_id")
        .select(col("cohort"),
          datediff(col("m"), col("cohort")).as("day_offset"),
          col("user_id"))
        // rows are already unique per (cohort, offset, user): the
        // activity frame is distinct on (user, m) and m = cohort +
        // offset — plain count avoids countDistinct's expand phase
        .groupBy("cohort", "day_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort", "day_offset")
    }),

    // Streaming-only semantics (watermark + stateful dedup) are unit-
    // tested with MemoryStream in graft.streaming; this batch
    // emulation exercises the same dedup logic deterministically:
    // duplicate the feed, dropDuplicates on the event key.
    "stream_watermark_late" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.unionAll(ev)
        .dropDuplicates("event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // Stream-stream interval join, batch-first: the SAME
    // StreamingOps.intervalJoin powers the streaming form (watermarks
    // are no-ops in batch), so the oracle checks the one shared
    // implementation; MemoryStream parity is tested in StreamingSpec.
    "stream_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.streaming.StreamingOps.intervalJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          delay = "1 hour", horizon = "4 hours")
        .orderBy("click_id", "purchase_id")
    }),

    // Batch emulation of per-key running state (mapGroupsWithState's
    // semantics over a closed input): per user last-seen ts, event
    // count, exact value total.
    "stream_stateful" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(col("ts")).as("last_seen"),
          count(lit(1)).as("n_events"),
          asDouble(sum(dec2(col("value")))).as("total_value"))
        .orderBy("user_id")),

    // REAL readStream file-source end-to-end (SURVEY §7 Phase S): the
    // events table is fed to a parquet-directory source in two
    // time-ordered chunks with a full query STOP + checkpoint RESTART
    // between them, through a watermarked tumbling agg whose
    // finalized windows land in the warehouse via the exactly-once
    // appendBatch ledger. A far-future sentinel row then advances the
    // watermark past every real window, so the table holds exactly
    // the full batch tumbling agg — which is what the oracle checks.
    // No-dup/no-loss across the restart is thereby hash-verified, not
    // just asserted.
    // EXACTLY-ONCE streaming upsert INTO a real Delta table: a
    // readStream→foreachBatch sink merges each micro-batch with a
    // `txn` action in the same atomic commit (the Delta protocol's
    // idempotent-writer contract). Batch 0 zeroes every balance,
    // batch 1 merges real balances for custkey%3=0; a deliberate
    // REPLAY of batch 1 is then skipped by the recorded watermark —
    // the oracle checks the final state equals the CoW merge SQL, so
    // a double-applied replay would hash-mismatch.
    "stream_delta_sink" -> ((s, d) => {
      val base = java.nio.file.Paths.get("/root/repo/target/scratch")
      java.nio.file.Files.createDirectories(base)
      val dir = java.nio.file.Files
        .createTempDirectory(base, "stream_delta_sink")
      val (in, cp, tbl) = (s"$dir/in", s"$dir/cp", s"$dir/tbl")
      val cust = Tables.customer(s, d)
      val zero = cust.select(col("c_custkey"), col("c_mktsegment"),
        lit(0.0).as("bal"))
      zero.coalesce(1).write.mode("append").parquet(in)
      val appId = "graft_stream_delta_sink"
      val q = s.readStream.schema(zero.schema).parquet(in)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
          graft.sources.DeltaWrite.mergeBatch(s, tbl, appId, bid, df,
            Seq("c_custkey")): Unit
        }
        .start()
      q.processAllAvailable()
      cust.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").as("bal"))
        .coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable(); q.stop()
      // a crash between sink commit and checkpoint commit replays the
      // last micro-batch — the txn watermark must skip it
      val replay = graft.sources.DeltaWrite.mergeBatch(s, tbl, appId, 1L,
        zero, Seq("c_custkey"))
      require(replay == -1L, s"replayed batch was not skipped: $replay")
      graft.sources.DeltaRead.readDeltaTable(s, tbl).orderBy("c_custkey")
    }),

    // The READ half of the Delta CDC loop (stream_delta_sink is the
    // write half): a checkpoint-bookmarked consumer drains a
    // CDF-enabled Delta table's commits as micro-batches. The key
    // proves the bookmark: the first drain consumes commits 0-1, a
    // THIRD commit lands, and a restarted drain (same checkpoint)
    // delivers ONLY it — the union of everything received must equal
    // the table's full change feed, which the oracle reconstructs.
    "stream_delta_source" -> ((s, d) => {
      val base = java.nio.file.Paths.get("/root/repo/target/scratch")
      java.nio.file.Files.createDirectories(base)
      val dir = java.nio.file.Files
        .createTempDirectory(base, "stream_delta_source")
      val (tbl, cp) = (s"$dir/tbl", s"$dir/cp")
      val cust = Tables.customer(s, d)
      graft.sources.DeltaWrite.merge(s, tbl,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal")),
        Seq("c_custkey"), enableCdf = true)
      graft.sources.DeltaWrite.merge(s, tbl,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      val got = scala.collection.mutable.ListBuffer
        .empty[org.apache.spark.sql.DataFrame]
      val n1 = graft.sources.DeltaStreamSource.processAvailable(
        s, tbl, cp) { (df, _) => got += df }
      require(n1 == 2, s"expected 2 micro-batches (commits 0,1), got $n1")
      // a new commit lands; the restarted consumer must deliver ONLY it
      graft.sources.DeltaWrite.merge(s, tbl,
        cust.filter(col("c_custkey") % 5 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            (col("c_acctbal") + lit(1000.0)).as("bal")),
        Seq("c_custkey"))
      val n2 = graft.sources.DeltaStreamSource.processAvailable(
        s, tbl, cp) { (df, _) => got += df }
      require(n2 == 1, s"bookmark resume delivered $n2 batches, not 1")
      got.reduce(_.unionByName(_))
        .orderBy("_commit_version", "_change_type", "c_custkey")
    }),

    // The Iceberg sibling of stream_delta_source: a bookmarked
    // consumer drains an Iceberg table's NEW snapshots as changelog
    // micro-batches (equality deletes replay as row-level DELETEs).
    // Same restart proof: drain, commit a third snapshot, drain again
    // with the same checkpoint — only the new snapshot is delivered,
    // and the union must equal the full changelog the oracle builds.
    "stream_iceberg_source" -> ((s, d) => {
      val base = java.nio.file.Paths.get("/root/repo/target/scratch")
      java.nio.file.Files.createDirectories(base)
      val dir = java.nio.file.Files
        .createTempDirectory(base, "stream_iceberg_source")
      val (tbl, cp) = (s"$dir/tbl", s"$dir/cp")
      val cust = Tables.customer(s, d)
      graft.sources.IcebergWrite.mergeOnRead(s, tbl,
        cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0.0).as("bal")),
        Seq("c_custkey"))
      graft.sources.IcebergWrite.mergeOnRead(s, tbl,
        cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").as("bal")),
        Seq("c_custkey"))
      val got = scala.collection.mutable.ListBuffer
        .empty[org.apache.spark.sql.DataFrame]
      val n1 = graft.sources.IcebergStreamSource.processAvailable(
        s, tbl, cp) { (df, _) => got += df }
      require(n1 == 2, s"expected 2 micro-batches (snapshots 1,2), got $n1")
      graft.sources.IcebergWrite.mergeOnRead(s, tbl,
        cust.filter(col("c_custkey") % 5 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            (col("c_acctbal") + lit(1000.0)).as("bal")),
        Seq("c_custkey"))
      val n2 = graft.sources.IcebergStreamSource.processAvailable(
        s, tbl, cp) { (df, _) => got += df }
      require(n2 == 1, s"bookmark resume delivered $n2 batches, not 1")
      got.reduce(_.unionByName(_))
        .orderBy("_commit_snapshot_id", "_change_type", "c_custkey")
    }),

    "stream_file_ingest" -> ((s0, d) => {
      // a dedicated session scoped to this pipeline: streaming aggs
      // fix their STATE partition count from the session's shuffle
      // partitions at first checkpoint — a handful of window×type
      // groups doesn't need 32 state stores per micro-batch (the
      // per-query sizing any real deployment does; results are
      // partitioning-independent, which the oracle proves)
      val s = s0.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val base = java.nio.file.Paths.get("/root/repo/target/scratch")
      java.nio.file.Files.createDirectories(base)
      val dir = java.nio.file.Files
        .createTempDirectory(base, "stream_file_ingest")
      val (in, cp, wh) = (s"$dir/in", s"$dir/cp", s"$dir/wh")
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
      val Seq(median, maxTs) = ev
        .select(expr("percentile_approx(unix_micros(ts), 0.5)"),
          max(unix_micros(col("ts"))))
        .head().toSeq.map(_.asInstanceOf[Long]).toSeq
      // chunks split BY TIME so the restarted query never sees data
      // behind its recovered watermark; one file per chunk = one
      // deterministic micro-batch per chunk
      ev.filter(unix_micros(col("ts")) < median)
        .coalesce(1).write.mode("append").parquet(in)
      val runner = new PipelineRunner(s, PipelineSpec(Nil), wh)
      // oracle-portable agg: exact DECIMAL(12,2) sums (Tables.dec2)
      val agg = (df: org.apache.spark.sql.DataFrame, delay: String) => df
        .withWatermark("ts", delay)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          asDouble(sum(dec2(col("value")))).as("sv"))
        .select(col("w.start").as("ws"), col("w.end").as("we"),
          col("event_type"), col("n"), col("sv"))
      def start() = graft.streaming.StreamingOps.startFileIngest(
        s, runner, in, cp, "ingest", delay = "0 seconds",
        transform = agg)
      val q1 = start()
      q1.processAllAvailable(); q1.stop()
      ev.filter(unix_micros(col("ts")) >= median)
        .coalesce(1).write.mode("append").parquet(in)
      val q2 = start() // checkpoint restart picks up only chunk 2
      q2.processAllAvailable()
      // sentinel far past the last event: advances the watermark so
      // every REAL window finalizes; its own (open) window never emits
      s.range(1).select(lit(-1L).as("event_id"),
          timestamp_micros(lit(maxTs + 2L * 3600L * 1000000L)).as("ts"),
          lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
          lit(0.0).as("value"))
        .coalesce(1).write.mode("append").parquet(in)
      q2.processAllAvailable(); q2.stop()
      runner.readTable("ingest").orderBy("ws", "event_type")
    })
  )

  override def oracles: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
        |  time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS we,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
        |FROM events GROUP BY 1, 2, 3 ORDER BY ws, event_type""".stripMargin,

    // the streamed-into-Delta final state must equal the CoW merge
    // SQL — a double-applied replay would double nothing here (merge
    // is idempotent per batch) BUT a zero-balance replay of batch 0
    // content at batch id 1 WOULD zero the merged balances, so the
    // hash catches a broken watermark
    "stream_delta_sink" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // everything the bookmarked consumer received, across the restart,
    // must equal the table's full change feed: creation inserts (v0),
    // the %3 merge's pre/post images (v1), the %5 merge's (v2) —
    // whose PRE values depend on v1 having applied
    "stream_delta_source" ->
      """SELECT c_custkey, c_mktsegment, 0.0 AS bal,
        |  'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, 0.0, 'update_preimage',
        |  CAST(1 AS BIGINT)
        |FROM customer WHERE c_custkey % 3 = 0
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, c_acctbal, 'update_postimage',
        |  CAST(1 AS BIGINT)
        |FROM customer WHERE c_custkey % 3 = 0
        |UNION ALL
        |SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END,
        |  'update_preimage', CAST(2 AS BIGINT)
        |FROM customer WHERE c_custkey % 5 = 0
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, c_acctbal + 1000.0,
        |  'update_postimage', CAST(2 AS BIGINT)
        |FROM customer WHERE c_custkey % 5 = 0
        |ORDER BY _commit_version, _change_type, c_custkey""".stripMargin,

    // the Iceberg changelog across the restart: snapshot 1 inserts,
    // snapshot 2's equality delete replays as row-level DELETEs of
    // the PARENT values (+ the upsert's inserts), snapshot 3 likewise
    // with values that depend on snapshot 2 having applied
    "stream_iceberg_source" ->
      """SELECT c_custkey, c_mktsegment, 0.0 AS bal,
        |  'INSERT' AS _change_type, CAST(1 AS BIGINT) AS _commit_snapshot_id
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, 0.0, 'DELETE', CAST(2 AS BIGINT)
        |FROM customer WHERE c_custkey % 3 = 0
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, c_acctbal, 'INSERT',
        |  CAST(2 AS BIGINT)
        |FROM customer WHERE c_custkey % 3 = 0
        |UNION ALL
        |SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal ELSE 0.0 END,
        |  'DELETE', CAST(3 AS BIGINT)
        |FROM customer WHERE c_custkey % 5 = 0
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, c_acctbal + 1000.0, 'INSERT',
        |  CAST(3 AS BIGINT)
        |FROM customer WHERE c_custkey % 5 = 0
        |ORDER BY _commit_snapshot_id, _change_type, c_custkey""".stripMargin,

    // the streamed-through-restart warehouse table must equal the
    // plain batch tumbling agg (the sentinel closes all real windows)
    "stream_file_ingest" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
        |  time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS we,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
        |FROM events GROUP BY 1, 2, 3 ORDER BY ws, event_type""".stripMargin,

    "stream_sliding" ->
      """WITH offs AS (SELECT unnest([0,1,2,3]) AS k)
        |SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS ws,
        |  time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
        |    + INTERVAL '1 hour' AS we,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
        |FROM events CROSS JOIN offs
        |GROUP BY 1, 2 ORDER BY ws""".stripMargin,

    // dedup of a doubled feed keyed on the (unique) event_id — the
    // per-type counts equal the clean per-type counts
    "stream_watermark_late" ->
      """SELECT event_type, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "stream_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
        |  c.user_id AS user_id, c.ts AS click_ts, p.ts AS purchase_ts
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '4 hours'
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |ORDER BY click_id, purchase_id""".stripMargin,

    "stream_stateful" ->
      """SELECT user_id, max(ts) AS last_seen, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "win_funnel" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t1
        |  FROM events GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN u USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > u.t1 GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT u.user_id, u.t1 AS view_ts, c.t2 AS click_ts,
        |  p.t3 AS purchase_ts, p.t3 IS NOT NULL AS converted
        |FROM u LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "win_gaps_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE)
        |    AS day
        |  FROM events),
        |isl AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER
        |      (PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
        |  FROM days)
        |SELECT user_id, min(day) AS streak_start, max(day) AS streak_end,
        |  CAST(count(*) AS BIGINT) AS streak_days
        |FROM isl GROUP BY user_id, anchor
        |ORDER BY user_id, streak_start""".stripMargin,

    "win_cohort_retention" ->
      """WITH m AS (
        |  SELECT user_id,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS m
        |  FROM events),
        |f AS (SELECT user_id, min(m) AS cohort FROM m GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, m FROM m)
        |SELECT f.cohort,
        |  CAST(date_diff('day', f.cohort, a.m) AS INTEGER)
        |    AS day_offset,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "win_sessionize" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id, ts,
        |  CAST(SUM(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS session_seq,
        |  new_s = 1 AS is_session_start
        |FROM e ORDER BY event_id""".stripMargin,

    "stream_session" ->
      """WITH e AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id, min(ts) AS ss,
        |  max(ts) + INTERVAL '30 minutes' AS se,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sv
        |FROM s GROUP BY user_id, sid ORDER BY user_id, ss""".stripMargin
  )
}
