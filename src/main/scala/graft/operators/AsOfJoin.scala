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
    // carry the matched right ts alongside the payload so tolerance
    // can bound the gap without a second join
    val carryCols = payload :+ tsCol
    // kind 0 = right (sorts first on ts tie → the match is inclusive)
    val taggedRight = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__kind")) ++
        payload.map(c => col(c).as(s"__p_$c")) ++
        Seq(col(tsCol).as(s"__p_$tsCol")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__kind")) ++
        payload.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
        Seq(lit(null).cast(right.schema(tsCol).dataType).as(s"__p_$tsCol")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col): _*)
    val ord =
      if (direction == "backward") col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(keyCol)
      .orderBy(ord, col("__kind"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = carryCols.foldLeft(taggedRight.unionByName(taggedLeft)) {
      case (df, c) =>
        df.withColumn(s"__last_$c",
          last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    // interval arithmetic, not unix_timestamp subtraction — exact at
    // µs resolution and identical across engines (no per-side floor)
    val inBound: Column = tolerance match {
      case None => lit(true)
      case Some(sec) =>
        if (direction == "backward")
          col(s"__last_$tsCol") >=
            col(tsCol) - expr(s"INTERVAL $sec SECONDS")
        else
          col(s"__last_$tsCol") <=
            col(tsCol) + expr(s"INTERVAL $sec SECONDS")
    }
    carried.filter(col("__kind") === 1)
      .select((leftCols.map(col) ++
        payload.map(c =>
          when(inBound, col(s"__last_$c")).as(c))).toIndexedSeq: _*)
  }
}
