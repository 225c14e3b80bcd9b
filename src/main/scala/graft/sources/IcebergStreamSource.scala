package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._

/** Incremental (streaming-source) consumption of an Iceberg table's
  * snapshot log — the Iceberg sibling of [[DeltaStreamSource]] and
  * the read half of the CDC loop [[IcebergWrite.mergeOnRead]] writes:
  * a pipeline chains FROM an Iceberg table other jobs commit into,
  * processing only NEW snapshots per run (the
  * `incremental append scan` / changelog contract from
  * iceberg.apache.org, re-expressed as bookmarked micro-batches).
  *
  * Each micro-batch is [[IcebergRead.readChanges]] over a snapshot
  * range: INSERT/DELETE rows with `_commit_snapshot_id` (equality/
  * position deletes replay as row-level DELETEs; `replace`/compaction
  * snapshots correctly emit nothing). The high-water mark (last
  * delivered snapshot id) persists under `checkpointDir` and advances
  * ONLY after the sink returns — a crash between the sink's commit
  * and the bookmark write replays that batch on restart, which is
  * exactly-once end-to-end with an idempotent sink (e.g.
  * [[DeltaWrite.mergeBatch]] keyed by the batch's snapshot id —
  * crash-simulated in StreamingSpec, Iceberg source → Delta sink).
  *
  * Retention safety: if `expireSnapshots` has expired the bookmarked
  * snapshot, intermediate history may be GONE — the consumer refuses
  * LOUDLY instead of silently skipping changes.
  *
  * Scale notes: snapshot resolution is driver-side metadata replay
  * (O(manifests) per batch); data-side each batch reads as
  * readChanges' bounded scan set. `_change_ordinal` is range-relative
  * and therefore NOT exposed to sinks (two drains of the same history
  * would disagree); order by `_commit_snapshot_id`.
  */
object IcebergStreamSource {

  private implicit val fmts: Formats = DefaultFormats

  private def bookmarkFile(checkpointDir: String): java.nio.file.Path =
    java.nio.file.Paths.get(checkpointDir, "graft-iceberg-source-snapshot")

  /** The persisted high-water mark: the highest snapshot id already
    * DELIVERED; None for a fresh checkpoint.
    */
  def readBookmark(checkpointDir: String): Option[Long] = {
    val f = bookmarkFile(checkpointDir)
    if (!java.nio.file.Files.isRegularFile(f)) None
    else Some(java.nio.file.Files.readString(f).trim.toLong)
  }

  private def writeBookmark(checkpointDir: String, v: Long): Unit = {
    val dir = java.nio.file.Paths.get(checkpointDir)
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, ".bookmark", ".tmp")
    java.nio.file.Files.writeString(tmp, v.toString)
    java.nio.file.Files.move(tmp, bookmarkFile(checkpointDir),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
  }

  // Snapshot ids in commit order, from the CURRENT metadata. The
  // ordering key is per-TABLE (all-or-nothing): if EVERY snapshot
  // carries a `sequence-number` (format v2) we sort by it; if NONE
  // does (format v1) we keep metadata array order. A MIXED table — a
  // v1→v2 upgrade whose new snapshots restart sequence numbers at 1
  // while old ones have none — cannot be ordered by either key alone,
  // so we fall back to `timestamp-ms`, and refuse loudly when even
  // timestamps tie across the v1/v2 boundary (interleaving a
  // consumer's micro-batches out of commit order would be silent
  // corruption).
  private[graft] def orderedSnapshots(tableDir: String): Seq[Long] = {
    val metaDir = java.nio.file.Paths.get(tableDir, "metadata")
    val hint = metaDir.resolve("version-hint.text")
    require(java.nio.file.Files.isRegularFile(hint),
      s"not a Hadoop-catalog Iceberg table: $tableDir")
    val v = java.nio.file.Files.readString(hint).trim
    val meta = org.json4s.jackson.JsonMethods.parse(
      java.nio.file.Files.readString(
        metaDir.resolve(s"v$v.metadata.json")))
    val snaps = (meta \ "snapshots").children.zipWithIndex.map {
      case (s, i) =>
        ((s \ "snapshot-id").extract[Long],
          (s \ "sequence-number").extractOpt[Long],
          (s \ "timestamp-ms").extractOpt[Long], i)
    }
    if (snaps.forall(_._2.isDefined)) snaps.sortBy(_._2.get).map(_._1)
    else if (snaps.forall(_._2.isEmpty)) snaps.map(_._1)
    else {
      // upgraded table: sequence numbers only cover the post-upgrade
      // tail, so order by commit timestamp — but only if timestamps
      // are strictly usable (present and non-decreasing won't do:
      // ties across the boundary are ambiguous)
      val ts = snaps.map(s => (s._1, s._3, s._4))
      require(ts.forall(_._2.isDefined) &&
          ts.map(_._2.get).distinct.size == ts.size,
        s"Iceberg table $tableDir mixes snapshots with and without " +
          "sequence-number (v1→v2 upgrade) and commit timestamps do " +
          "not disambiguate the order — refusing to stream a possibly " +
          "re-ordered history")
      ts.sortBy(_._2.get).map(_._1)
    }
  }

  // Is `snapshotId` (the earliest RETAINED snapshot) itself an
  // incremental commit — i.e. history before it has been expired?
  // True when it records a `parent-snapshot-id` (external writers) or
  // a `sequence-number` > 1 (v2 sequence numbers start at 1 on the
  // creating commit and survive expireSnapshots' metadata rewrite).
  private def hasParent(tableDir: String, snapshotId: Long): Boolean = {
    val metaDir = java.nio.file.Paths.get(tableDir, "metadata")
    val v = java.nio.file.Files.readString(
      metaDir.resolve("version-hint.text")).trim
    val meta = org.json4s.jackson.JsonMethods.parse(
      java.nio.file.Files.readString(
        metaDir.resolve(s"v$v.metadata.json")))
    (meta \ "snapshots").children.exists { s =>
      (s \ "snapshot-id").extract[Long] == snapshotId &&
        ((s \ "parent-snapshot-id").extractOpt[Long].isDefined ||
          (s \ "sequence-number").extractOpt[Long].exists(_ > 1L))
    }
  }

  /** Drain every snapshot past the bookmark as micro-batches of
    * `snapshotsPerBatch` snapshots each (default 1): for each batch,
    * `sink(changes, upToSnapshotId)` runs first, then the bookmark
    * advances. Returns the number of batches delivered. Restart-safe
    * (at most one batch replays — make the sink idempotent); a
    * bookmark whose snapshot has been EXPIRED refuses loudly.
    */
  def processAvailable(spark: SparkSession, tableDir: String,
      checkpointDir: String, snapshotsPerBatch: Int = 1)
      (sink: (DataFrame, Long) => Unit): Long = {
    require(snapshotsPerBatch >= 1, "snapshotsPerBatch must be >= 1")
    val ordered = orderedSnapshots(tableDir)
    require(ordered.nonEmpty, s"Iceberg table has no snapshots: $tableDir")
    val bookmark = readBookmark(checkpointDir)
    val startIdx = bookmark match {
      case None =>
        // A fresh consumer must see the table's FULL history. If
        // expireSnapshots already trimmed early snapshots, the
        // earliest retained one is an incremental commit (it has a
        // parent) — starting there would silently deliver an
        // incomplete baseline, so refuse as loudly as the
        // expired-bookmark path below does.
        require(!hasParent(tableDir, ordered.head),
          s"earliest retained snapshot ${ordered.head} of $tableDir " +
            "has a parent — history before it has been EXPIRED, so a " +
            "fresh consumer cannot reconstruct the full table state " +
            "(seed the consumer from a batch scan, then bookmark)")
        0
      case Some(b) =>
        val i = ordered.indexOf(b)
        require(i >= 0,
          s"consumer bookmark snapshot $b has been EXPIRED from " +
            s"$tableDir — intermediate changes are unrecoverable " +
            "(re-seed the consumer or retain more snapshots)")
        i + 1
    }
    var batches = 0L
    var idx = startIdx
    while (idx < ordered.size) {
      val endIdx = math.min(idx + snapshotsPerBatch, ordered.size) - 1
      val upTo = ordered(endIdx)
      // _change_ordinal is RANGE-relative — dropped so restarted and
      // one-shot drains deliver identical rows
      val changes = IcebergRead.readChanges(spark, tableDir,
        ordered(idx), Some(upTo)).drop("_change_ordinal")
      sink(changes, upTo)
      writeBookmark(checkpointDir, upTo)
      idx = endIdx + 1
      batches += 1
    }
    batches
  }
}
