package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental (streaming-source) consumption of a Delta table's
  * commit log — the READ half of the CDC loop whose write half is
  * [[DeltaWrite.mergeBatch]]: a dbt-ecosystem pipeline chains FROM a
  * Delta table other jobs merge into, processing only NEW commits per
  * run (delta.io PROTOCOL.md; the `readStream.format("delta")` shape
  * re-expressed as checkpoint-bookmarked micro-batches).
  *
  * Semantics: the table must have `delta.enableChangeDataFeed=true` —
  * each micro-batch is [[DeltaRead.readChanges]] over a commit range,
  * so consumers see exact row-level changes (`_change_type`,
  * `_commit_version`): creation/append commits as inserts, merge
  * commits via their authoritative cdc files. The high-water mark (the
  * `startingVersion` bookmark) persists under `checkpointDir` and
  * advances ONLY after the sink returns — a crash between the sink's
  * commit and the bookmark write REPLAYS that batch on restart, which
  * is exactly-once end-to-end when the sink is idempotent (pair with
  * [[DeltaWrite.mergeBatch]]'s `txn` watermark, passing the batch's
  * `_commit_version` as the batchId — the same contract Structured
  * Streaming's foreachBatch + checkpoint gives, test-asserted in
  * StreamingSpec).
  *
  * Scale notes: per micro-batch the driver replays commit METADATA
  * only (one small JSON doc per commit); the data side is
  * readChanges' at-most-two multi-file scan nodes regardless of
  * commit count. A vacuumed-away range refuses loudly inside
  * readChanges ("commits absent") — never a silent gap.
  */
object DeltaStreamSource {

  private def bookmarkFile(checkpointDir: String): java.nio.file.Path =
    java.nio.file.Paths.get(checkpointDir, "graft-delta-source-version")

  /** The persisted high-water mark: the highest commit version already
    * DELIVERED (sink returned + bookmark committed); None for a fresh
    * checkpoint.
    */
  def readBookmark(checkpointDir: String): Option[Long] = {
    val f = bookmarkFile(checkpointDir)
    if (!java.nio.file.Files.isRegularFile(f)) None
    else Some(java.nio.file.Files.readString(f).trim.toLong)
  }

  // atomic: a crash mid-write leaves the previous bookmark intact
  private def writeBookmark(checkpointDir: String, v: Long): Unit = {
    val dir = java.nio.file.Paths.get(checkpointDir)
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, ".bookmark", ".tmp")
    java.nio.file.Files.writeString(tmp, v.toString)
    java.nio.file.Files.move(tmp, bookmarkFile(checkpointDir),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
  }

  /** Drain every commit past the bookmark as micro-batches of
    * `versionsPerBatch` commits each (default 1 — one commit per
    * batch, the natural Delta-source granularity): for each batch,
    * `sink(changes, upToVersion)` runs first, then the bookmark
    * advances to `upToVersion`. Returns the number of batches
    * delivered (0 = nothing new). Restart-safe: an interrupted run
    * resumes from the last committed bookmark and replays at most one
    * batch (make the sink idempotent — see the class doc).
    */
  def processAvailable(spark: SparkSession, tableDir: String,
      checkpointDir: String, versionsPerBatch: Int = 1)
      (sink: (DataFrame, Long) => Unit): Long = {
    require(versionsPerBatch >= 1, "versionsPerBatch must be >= 1")
    require(DeltaRead.tableConfiguration(spark, tableDir)
        .getOrElse("delta.enableChangeDataFeed", "false") == "true",
      s"streaming-source consumption needs delta.enableChangeDataFeed=true " +
        s"(exact row-level change semantics): $tableDir")
    val log = DeltaRead.openLog(tableDir)
    require(log.commits.nonEmpty, s"empty Delta log: $tableDir")
    val latest = log.commits.last
    var from = readBookmark(checkpointDir).getOrElse(-1L)
    var batches = 0L
    while (from < latest) {
      val upTo = math.min(from + versionsPerBatch, latest)
      val changes = DeltaRead.readChanges(spark, tableDir, from + 1,
        Some(upTo))
      sink(changes, upTo)
      writeBookmark(checkpointDir, upTo)
      from = upTo
      batches += 1
    }
    batches
  }
}
