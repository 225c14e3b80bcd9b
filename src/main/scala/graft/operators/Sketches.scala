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
