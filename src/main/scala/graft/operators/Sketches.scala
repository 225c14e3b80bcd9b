package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable-sketch operators — the incremental-aggregation pattern
  * that makes corpus-wide statistics maintainable at 100 TB without
  * rescans. A COUNT(DISTINCT token) over a grown corpus re-shuffles
  * every token ever seen; an HLL sketch per ingest batch is a few KB
  * per group, unions register-wise (an exact, associative,
  * commutative merge — max per register), and the union over any
  * partition of the data IS the sketch of the whole — so per-batch
  * sketches persisted to the warehouse roll up to corpus-lifetime
  * cardinality in a vocabulary-free, rescan-free way.
  *
  * Spark-first: `hll_sketch_agg` (Apache DataSketches HLL under the
  * hood, codegen'd ObjectHashAggregate with map-side partials) +
  * `hll_union_agg` + `hll_sketch_estimate` — no custom UDAF needed.
  * No reference analogue (`dbtoperator.py` orchestrates only); the
  * recipe is the standard partial-aggregate design every
  * telemetry/corpus-audit pipeline uses.
  */
object Sketches {

  /** Per-`byCol` HLL sketch of the distinct tokens of `textCol` —
    * the PARTIAL: run once per ingest batch and persist the binary
    * sketch column. One explode + one hash-agg (map-side partial
    * sketches merge in-executor before the #groups-row shuffle).
    * `lgK` = DataSketches lgConfigK (2^lgK registers; 12 → ~1.6%
    * relative standard error at 4 KB per group).
    */
  def tokenCardinality(df: DataFrame, byCol: String, textCol: String,
                       lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK out of DataSketches range: $lgK")
    df.select(col(byCol).as("grp"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("grp")
      .agg(hll_sketch_agg(col("token"), lit(lgK)).as("sketch"))
  }

  /** Misra–Gries heavy-hitter summary of capacity `k`: a mergeable
    * frequency sketch with the guarantee that EVERY item occurring
    * more than N/(k+1) times survives in the summary (no false
    * negatives; counts are undercounts by at most N/(k+1)). The merge
    * is the Agarwal et al. 2012 mergeable-summaries form — combine
    * count maps, then subtract the (k+1)-th largest count from all
    * and drop non-positives — which preserves the guarantee across
    * arbitrary partitionings, so per-partition partials compose
    * exactly like any algebraic aggregate.
    */
  final class MisraGries(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Map[String, Long]] {
    require(k > 0, s"capacity must be positive: $k")
    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      b.get(x) match {
        case Some(c) => b.updated(x, c + 1)
        case None if b.size < k => b.updated(x, 1L)
        case None => // classic decrement step, amortized O(1)/token
          b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }

    override def merge(a: Map[String, Long],
                       b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** EXACT heavy hitters — every token with frequency > N/`ratio` —
    * in two map-heavy passes, never a vocabulary-wide shuffle:
    *
    *  1. SKETCH: one pass builds a Misra–Gries summary of capacity
    *     `k` ≥ `ratio` (so the guarantee covers the threshold) merged
    *     from per-partition partials; candidates ≤ k strings reach
    *     the driver — nothing vocabulary-sized.
    *  2. VERIFY: one pass exact-counts ONLY the candidate tokens
    *     (map-side combine ⇒ at most k rows per partition enter the
    *     shuffle) and keeps those above the threshold. The summary's
    *     no-false-negative guarantee makes the result EXACT.
    *
    * A naive `groupBy(token)` shuffles the whole vocabulary to find a
    * handful of frequent rows; this shuffles ≤ k rows per partition —
    * the 100 TB form of frequency mining. Threshold compares integers
    * (`cnt · ratio > N`), never a double frequency.
    */
  def heavyHitters(docs: DataFrame, textCol: String, ratio: Int,
                   k: Int = 0): DataFrame = {
    val cap = if (k > 0) k else 2 * ratio
    require(cap >= ratio,
      s"capacity $cap < ratio $ratio would void the MG guarantee")
    val toks = docs.select(
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val mg = new MisraGries(cap)
    import docs.sparkSession.implicits._
    // sketch + total N in the SAME pass — the corpus tokenizes twice
    // total (sketch, then verify), not three times
    val (summary, total) = toks.as[String]
      .select(mg.toColumn, count(lit(1)).as[Long]).head()
    val candidates = summary.keys.toSeq
    toks.filter(col("token").isin(candidates: _*))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * ratio > lit(total))
      .orderBy("token")
  }

  /** The MERGE + estimate: union any number of per-batch sketch
    * frames (register-wise max — exact, so merging batch sketches ≡
    * sketching the union of the batches, property-tested) and read
    * the cardinality estimate. Runs on #groups × #batches rows —
    * nothing corpus-sized.
    */
  def estimateCardinality(sketches: DataFrame): DataFrame =
    sketches.groupBy("grp")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .cast(LongType).as("est_distinct"))
}
