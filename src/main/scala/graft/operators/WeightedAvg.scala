package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate (SURVEY §2.4 agg_custom_udaf / §2.9
  * udaf_typed): weighted average over exact cent-scaled longs.
  *
  * Inputs are pre-scaled to integers (price → cents, qty → centi-units)
  * so the partial aggregation is exact integer math — order-independent
  * and overflow-safe to ~10^18, i.e. deterministic under any shuffle /
  * partial-final split at 100 TB. The finish step converts the exact
  * decimal to double with correct rounding (same as an engine
  * DECIMAL→DOUBLE cast), so the DuckDB oracle matches bitwise.
  */
object WeightedAvg extends Aggregator[(Long, Long), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), in: (Long, Long)): (Long, Long) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Long, Long)): Double = {
    if (b._2 == 0L) Double.NaN
    else java.math.BigDecimal.valueOf(b._1, 4).doubleValue() /
      java.math.BigDecimal.valueOf(b._2, 2).doubleValue()
  }
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: wavg(price_cents, qty_cents). */
  def wavg(priceCents: Column, qtyCents: Column): Column =
    udaf(this, Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(priceCents, qtyCents)
}
