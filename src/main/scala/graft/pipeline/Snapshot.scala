package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** SCD-2 snapshots (dbt 1.9 `check` strategy): maintain
  * (key, tracked cols, valid_from, valid_to) history where exactly one
  * open row (valid_to IS NULL) exists per present key, closing rows
  * whose tracked columns changed and inserting the new versions.
  *
  * Scale: one shuffle join of the open rows against the new state on
  * the snapshot key; closed history is carried through untouched
  * (union, no recompute), so cost is O(open + new), not O(history).
  */
object Snapshot {

  /** One snapshot step against ONLY the open rows: returns
    * (closedDelta, nextOpen). The closed history is never an input —
    * storage can therefore APPEND the closed delta and replace the
    * open set, making a snapshot run O(open + changes) in I/O as well
    * as compute (the runner's snapshot storage does exactly this; a
    * full-history rewrite per scheduled snapshot would be O(table)).
    */
  /** The `dbt_is_deleted` flag column carried by every row of a
    * `hard_deletes = new_record` snapshot (dbt 1.9's column name).
    */
  val DeletedCol = "dbt_is_deleted"

  /** `hardDeletes` (dbt 1.9 `hard_deletes`, see [[HardDeletes]]):
    * `Ignore` keeps vanished keys open, `Invalidate` (default)
    * closes them at `asOf`, `NewRecord` additionally opens a
    * deletion-marker row flagged `dbt_is_deleted = true` and
    * re-versions resurrected keys.
    */
  def scd2Step(prevOpen: Option[DataFrame], current: DataFrame,
               keyCols: Seq[String], compareCols: Seq[String],
               asOf: String,
               hardDeletes: HardDeletes = HardDeletes.Invalidate)
      : (DataFrame, DataFrame) = {
    val newRec = hardDeletes == HardDeletes.NewRecord
    val asOfTs = lit(asOf).cast(TimestampType)
    val newState0 = current.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("valid_from", asOfTs)
      .withColumn("valid_to", lit(null).cast(TimestampType))
    val newState =
      if (newRec) newState0.withColumn(DeletedCol, lit(false)) else newState0

    prevOpen match {
      case None => (newState.filter(lit(false)), newState)
      case Some(open0) =>
        // a table snapshotted before a switch TO new_record lacks the
        // flag column — its rows are all live
        val open =
          if (newRec && !open0.columns.contains(DeletedCol))
            open0.withColumn(DeletedCol, lit(false))
          else open0
        // never-null: stored flags could hold NULLs
        val isMarker: Column =
          if (newRec) coalesce(col(DeletedCol), lit(false)) else lit(false)
        val cur = current.select(
          keyCols.map(col) ++
            compareCols.map(c => col(c).as(s"__new_$c")) :+
            lit(true).as("__present"): _*)
        val joined = open.join(cur, keyCols, "left")
        val valueChanged: Column = compareCols.map(c =>
          !(col(c) <=> col(s"__new_$c"))).reduce(_ || _)
        // a present key whose open row is the deletion marker must
        // re-version even with unchanged values (resurrection)
        val changedPred = valueChanged || isMarker
        val present = col("__present").isNotNull
        // vanished keys: Ignore keeps them open; NewRecord keeps an
        // EXISTING marker open (a key deleted two snapshots ago must
        // not re-close / re-mark every run)
        val keepOpenOnDelete: Column = hardDeletes match {
          case HardDeletes.Ignore     => lit(true)
          case HardDeletes.Invalidate => lit(false)
          case HardDeletes.NewRecord  => isMarker
        }
        val stillOpen = joined
          .filter((present && !changedPred) || (!present && keepOpenOnDelete))
          .select(open.columns.map(col).toIndexedSeq: _*)
        val toClose = joined
          .filter((present && changedPred) || (!present && !keepOpenOnDelete))
          .select(open.columns.map(col).toIndexedSeq: _*)
          .withColumn("valid_to", asOfTs)

        // new versions: keys that are brand new, or whose values changed.
        // Key absence is tested on an explicit presence marker — a key
        // whose first tracked column is legitimately NULL (and
        // unchanged) must NOT be misread as brand new, or it would get
        // a second open row.
        val openKeyed = open.select(
          keyCols.map(col) ++
            compareCols.map(c => col(c).as(s"__old_$c")) ++ Seq(
            (if (newRec) coalesce(col(DeletedCol), lit(false))
             else lit(false)).as("__old_marker"),
            lit(true).as("__had_open")): _*)
        val fresh = newState.join(openKeyed, keyCols, "left")
          .filter(col("__had_open").isNull || col("__old_marker") ||
            compareCols.map(c => !(col(c) <=> col(s"__old_$c"))).reduce(_ || _))
          .select(newState.columns.map(col).toIndexedSeq: _*)

        // deletion markers: the vanished key's last values live on in
        // an open row flagged deleted, valid_from = the run clock
        val nextOpen =
          if (!newRec) stillOpen.unionByName(fresh)
          else {
            val markers = joined.filter(!present && !isMarker)
              .select(open.columns.map(col).toIndexedSeq: _*)
              .withColumn("valid_from", asOfTs)
              .withColumn("valid_to", lit(null).cast(TimestampType))
              .withColumn(DeletedCol, lit(true))
            stillOpen.unionByName(fresh).unionByName(markers)
          }
        (toClose, nextOpen)
    }
  }

  /** One snapshot step under dbt's TIMESTAMP strategy: a row changed
    * when its `tsCol` is STRICTLY newer than the open row's. Unlike
    * `check`, validity carries ROW time, not run time: a new version
    * opens at its own `tsCol` and closes its predecessor at that same
    * instant; only hard deletes (key absent from `current`) close at
    * the injected run clock `asOf`. Same (closedDelta, nextOpen)
    * contract and O(open + new) cost as [[scd2Step]]; `payloadCols`
    * must include `tsCol`.
    */
  def scd2StepTimestamp(prevOpen: Option[DataFrame], current: DataFrame,
      keyCols: Seq[String], payloadCols: Seq[String], tsCol: String,
      asOf: String,
      hardDeletes: HardDeletes = HardDeletes.Invalidate)
      : (DataFrame, DataFrame) = {
    require(payloadCols.contains(tsCol),
      s"timestamp strategy: tracked columns must include $tsCol")
    val newRec = hardDeletes == HardDeletes.NewRecord
    val asOfTs = lit(asOf).cast(TimestampType)
    val newState0 = current.select((keyCols ++ payloadCols).map(col): _*)
      .withColumn("valid_from", col(tsCol).cast(TimestampType))
      .withColumn("valid_to", lit(null).cast(TimestampType))
    val newState =
      if (newRec) newState0.withColumn(DeletedCol, lit(false)) else newState0

    // "strictly newer", total over NULLs (Spark filters DROP null
    // predicates — they never coerce to false, so every branch below
    // needs a never-null expression): a non-null ts beats a null one;
    // a null ts never beats anything (a never-updated incoming row
    // cannot supersede, and is not a hard delete either).
    def newerThan(newTs: Column, oldTs: Column): Column =
      coalesce(newTs > oldTs, newTs.isNotNull && oldTs.isNull)

    prevOpen match {
      case None => (newState.filter(lit(false)), newState)
      case Some(open0) =>
        val open =
          if (newRec && !open0.columns.contains(DeletedCol))
            open0.withColumn(DeletedCol, lit(false))
          else open0
        val isMarker: Column =
          if (newRec) coalesce(col(DeletedCol), lit(false)) else lit(false)
        // explicit presence marker (not ts nullness): key presence and
        // ts comparability are independent — scd2Step's NULL-compare
        // trap, same fix
        val cur = current.select(
          keyCols.map(col) ++ Seq(
            col(tsCol).cast(TimestampType).as("__new_ts"),
            lit(true).as("__present")): _*)
        val joined = open.join(cur, keyCols, "left")
        val newer = newerThan(col("__new_ts"), col(tsCol))
        val present = col("__present").isNotNull
        // a resurrected key (open marker, key present) re-versions
        // even when its ts did not advance
        val supersede = newer || isMarker
        val keepOpenOnDelete: Column = hardDeletes match {
          case HardDeletes.Ignore     => lit(true)
          case HardDeletes.Invalidate => lit(false)
          case HardDeletes.NewRecord  => isMarker
        }
        val stillOpen = joined
          .filter((present && !supersede) || (!present && keepOpenOnDelete))
          .select(open.columns.map(col).toIndexedSeq: _*)
        // a DELETION MARKER's successor transitions at the incoming
        // row ts only when that ts is AFTER the deletion instant (the
        // marker's valid_from); otherwise at the run clock. Comparing
        // against the carried pre-delete tsCol instead would let a
        // row ts inside the deleted window (u1 < ts < delete-time)
        // close the marker BEFORE it opened (inverted interval) and
        // overlap the closed pre-delete version.
        val markerHandoff =
          when(col("__new_ts") > col("valid_from"), col("__new_ts"))
            .otherwise(asOfTs)
        val toClose = joined
          .filter((present && supersede) || (!present && !keepOpenOnDelete))
          // superseded rows close at their successor's row time (the
          // marker-handoff clock for resurrections); hard deletes at
          // the run clock
          .withColumn("valid_to",
            when(present && isMarker, markerHandoff)
              .when(present && newer, col("__new_ts"))
              .otherwise(asOfTs))
          .select(open.columns.map(col).toIndexedSeq: _*)

        val openKeyed = open.select(
          keyCols.map(col) ++ Seq(
            col(tsCol).cast(TimestampType).as("__old_ts"),
            col("valid_from").as("__old_from"),
            (if (newRec) coalesce(col(DeletedCol), lit(false))
             else lit(false)).as("__old_marker"),
            lit(true).as("__had_open")): _*)
        // a resurrected row opens at the SAME instant its marker
        // closes (markerHandoff): its own tsCol only when that is
        // after the deletion instant (__old_from = the marker's
        // valid_from), else the run clock. Opening at a tsCol inside
        // the deleted window would predate the deletion interval and
        // overlap the closed pre-delete version (duplicate key for
        // as-of queries inside the deleted window).
        val fresh = newState.join(openKeyed, keyCols, "left")
          .filter(col("__had_open").isNull || col("__old_marker") ||
            newerThan(col(tsCol).cast(TimestampType), col("__old_ts")))
          .withColumn("valid_from",
            when(coalesce(col("__old_marker"), lit(false)),
              when(col(tsCol).cast(TimestampType) > col("__old_from"),
                col(tsCol).cast(TimestampType)).otherwise(asOfTs))
              .otherwise(col("valid_from")))
          .select(newState.columns.map(col).toIndexedSeq: _*)

        val nextOpen =
          if (!newRec) stillOpen.unionByName(fresh)
          else {
            val markers = joined.filter(!present && !isMarker)
              .select(open.columns.map(col).toIndexedSeq: _*)
              .withColumn("valid_from", asOfTs)
              .withColumn("valid_to", lit(null).cast(TimestampType))
              .withColumn(DeletedCol, lit(true))
            stillOpen.unionByName(fresh).unionByName(markers)
          }
        (toClose, nextOpen)
    }
  }

  /** Apply one snapshot step over a FULL history frame. `prev` must
    * have `keyCols ++ compareCols ++ (valid_from, valid_to)`; pass
    * None for the first snapshot. `asOf` is the logical snapshot
    * timestamp (deterministic inputs → deterministic history; never
    * wall-clock here). Convenience form of `scd2Step` for callers that
    * hold history in one frame.
    */
  def scd2(prev: Option[DataFrame], current: DataFrame,
           keyCols: Seq[String], compareCols: Seq[String],
           asOf: String): DataFrame =
    prev match {
      case None =>
        scd2Step(None, current, keyCols, compareCols, asOf)._2
      case Some(p) =>
        val closed = p.filter(col("valid_to").isNotNull)
        val (closedDelta, nextOpen) = scd2Step(
          Some(p.filter(col("valid_to").isNull)),
          current, keyCols, compareCols, asOf)
        closed.unionByName(closedDelta).unionByName(nextOpen)
    }
}
