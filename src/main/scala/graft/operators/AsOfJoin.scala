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
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // kind 0 = right (sorts first on ts tie, i.e. inclusive at-or-before)
    val taggedRight = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__kind")) ++
        payload.map(c => col(c).as(s"__p_$c")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__kind")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__kind"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payload.foldLeft(taggedRight.unionByName(taggedLeft)) {
      case (df, c) =>
        df.withColumn(s"__last_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__kind") === 1)
      .select((leftCols.map(col) ++
        payload.map(c => col(s"__last_$c").as(c))).toIndexedSeq: _*)
  }
}
