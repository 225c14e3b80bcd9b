package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Interval-overlap join (SURVEY §2.3 family): all (left, right) pairs
  * whose half-open time intervals intersect — `sL < eR AND sR < eL`.
  * The naive formulation is a pure inequality join, which Spark plans
  * as a broadcast-nested-loop (O(|L|·|R|) compares — a scale killer).
  *
  * Scale shape (the standard banding trick, same family as
  * `join_theta_range`): each interval explodes into the fixed-width
  * time buckets it covers, the join is an EQUI-join on bucket id
  * (hash-partitionable, skew = bucket occupancy), the exact overlap
  * predicate filters candidates, and each surviving pair is kept only
  * in the single bucket containing `max(sL, sR)` — overlapping
  * intervals share that bucket by construction, so every true pair
  * appears exactly once without a distinct. Cost is linear in
  * (intervals × buckets-per-interval) + true-pair count; `bucketSec`
  * trades explode factor against per-bucket candidate density.
  */
object IntervalJoin {

  /** `left`/`right` carry id + [start, end) timestamp columns; output
    * is (leftId, rightId) for every overlapping pair.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  idL: String, startL: String, endL: String,
                  idR: String, startR: String, endR: String,
                  bucketSec: Long): DataFrame = {
    val w = bucketSec * 1000000L // work in exact epoch µs
    def banded(df: DataFrame, id: String, s: String, e: String,
               side: String) =
      df.select(col(id).as(s"${side}_id"),
          unix_micros(col(s)).as(s"s_$side"),
          unix_micros(col(e)).as(s"e_$side"))
        // degenerate [s, s) intervals overlap nothing — and would
        // otherwise feed sequence() a descending bucket range
        .filter(col(s"s_$side") < col(s"e_$side"))
        // a half-open [s, e) touches buckets floor(s/w)..floor((e-1)/w)
        .withColumn("bucket", explode(sequence(
          floor(col(s"s_$side") / w),
          floor((col(s"e_$side") - 1) / w))))
    banded(left, idL, startL, endL, "l")
      .join(banded(right, idR, startR, endR, "r"), "bucket")
      .filter(col("s_l") < col("e_r") && col("s_r") < col("e_l") &&
        col("bucket") === floor(greatest(col("s_l"), col("s_r")) / w))
      .select(col("l_id"), col("r_id"))
  }

  /** Point-in-interval lookup join (the IP→geo range-table / price-
    * band / keyless temporal-validity shape): each left POINT joins
    * every right half-open interval `[start, end)` containing it.
    * A point falls in exactly ONE fixed-width bucket, so the plan is
    * a hash EQUI-join on bucket id — the point side stays MAP-ONLY
    * (no explode, no dedup needed), only intervals replicate to their
    * covering buckets — never a nested loop over the inequality.
    *
    * Columns are the caller's NUMERIC representation (epoch µs via
    * `unix_micros` for timestamps); `bucketWidth` is in the same
    * units — size it near the typical interval length so interval
    * replication stays O(1) per row at any corpus size.
    */
  def pointInRangeJoin(points: DataFrame, ranges: DataFrame,
                       idP: String, pCol: String,
                       idR: String, startR: String, endR: String,
                       bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val p = points
      .select(col(idP).as("p_id"), col(pCol).cast(LongType).as("p"))
      .withColumn("bucket", floor(col("p") / bucketWidth))
    val r = ranges
      .select(col(idR).as("r_id"), col(startR).cast(LongType).as("s"),
        col(endR).cast(LongType).as("e"))
      .filter(col("s") < col("e")) // degenerate [s, s) contains nothing
      .withColumn("bucket", explode(sequence(
        floor(col("s") / bucketWidth),
        floor((col("e") - 1) / bucketWidth))))
    p.join(r, "bucket")
      .filter(col("s") <= col("p") && col("p") < col("e"))
      .select(col("p_id"), col("r_id"))
  }
}
