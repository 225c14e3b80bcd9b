package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY §2.3 join_asof): for each left row, the latest
  * right row with rightTs <= leftTs within the same key group.
  *
  * Spark 4 batch has no native as-of operator, and the naive
  * formulation (correlated subquery / inequality join) degrades to a
  * per-row scan. This implementation uses the union+window trick:
  * tag both sides, union, one window over (key, ts) carrying the last
  * right payload forward. Cost = ONE shuffle on the key — linear at
  * 100 TB, no broadcast of the right side, skew limited to key skew
  * (saltable).
  */
object AsOfJoin {

  /** Left as-of join. `payload` columns are carried from the right side
    * (null when no right row at-or-before). Both frames must contain
    * `keyCol` and `tsCol`.
    *
    * `direction` mirrors pandas `merge_asof`: `"backward"` (default)
    * matches the LATEST right row with rightTs <= leftTs; `"forward"`
    * the EARLIEST right row with rightTs >= leftTs — same union+window
    * shape, the forward window just orders ts descending (still ONE
    * shuffle). `tolerance` (seconds, timestamp ts columns) nulls the
    * payload when the matched right row is further than the bound —
    * the carried right ts rides the same window, no extra join.
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payload: Seq[String],
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward: $direction")
    val leftCols = left.columns
    // the payload columns AND the matched right ts ride ONE struct —
    // last(ignoreNulls) over separate columns could take each from a
    // DIFFERENT right row when a payload value is NULL (the tolerance
    // gate would then bound a newer row's ts while emitting an older
    // row's value); a struct is non-null whenever the right row
    // exists, so the whole match is atomic
    val taggedRight = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__kind"),
        struct(col(tsCol).as("__ts") +: payload.map(col): _*)
          .as("__match")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val matchType = taggedRight.schema("__match").dataType
    val taggedLeft = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__kind"),
        lit(null).cast(matchType).as("__match")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col): _*)
    val ord =
      if (direction == "backward") col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(keyCol)
      .orderBy(ord, col("__kind"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__last", last(col("__match"), ignoreNulls = true).over(w))
    // interval arithmetic, not unix_timestamp subtraction — exact at
    // µs resolution and identical across engines (no per-side floor)
    val inBound: Column = tolerance match {
      case None => lit(true)
      case Some(sec) =>
        if (direction == "backward")
          col("__last.__ts") >= col(tsCol) - expr(s"INTERVAL $sec SECONDS")
        else
          col("__last.__ts") <= col(tsCol) + expr(s"INTERVAL $sec SECONDS")
    }
    carried.filter(col("__kind") === 1)
      .select((leftCols.map(col) ++
        payload.map(c =>
          when(inBound, col(s"__last.$c")).as(c))).toIndexedSeq: _*)
  }
}
