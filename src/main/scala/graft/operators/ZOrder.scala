package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping — the layout optimization behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`: rows sort by an interleaved-bit curve value
  * so every output file/row-group covers a small HYPER-RECTANGLE of
  * the key space instead of a thin slice of one column. Parquet
  * min/max stats then prune scans filtered on ANY of the clustered
  * columns; a single-column sort prunes only its own column.
  *
  * 100 TB shape: the curve value is one codegen'd integer expression
  * (no UDF, no shuffle of its own); `clusteredWrite` adds exactly one
  * range exchange (sampled balanced bounds — the same mechanism as a
  * global sort, but followed by only a PER-PARTITION sort, never a
  * merge); everything else is the writer. Quantization bounds come
  * from a 1-row broadcast aggregate, the win_ntile_approx trick.
  *
  * Everything is exact integer arithmetic so layout decisions are
  * reproducible across runs and engines — the DuckDB oracle replays
  * the full quantize+interleave pipeline bit-for-bit.
  */
object ZOrder {

  /** Quantize a numeric column into `[0, 2^bits)` buckets against
    * inclusive `[min, max]` bounds: `floor((c−min)·(2^bits−1) /
    * (max−min))`, degenerate ranges collapsing to bucket 0. The
    * double division is exact for any realistic magnitudes (operands
    * are exact integers ≪ 2^53 and the quotient's fractional part is
    * a multiple of 1/(max−min) ≫ one ulp), so DuckDB's replay of the
    * same formula agrees bit-for-bit.
    *
    * PRECONDITION: `(max − min) · (2^bits − 1)` must fit a long —
    * the caller's range/bits combination owns this (e.g. a ns-epoch
    * column spanning decades needs bits ≤ 12, or pre-scaling to
    * µs/s). Spark 4's default ANSI mode makes a violation a loud
    * ARITHMETIC_OVERFLOW error, never silent wraparound; DuckDB
    * promotes to HUGEINT and errors on the final cast instead.
    */
  def quantize(c: Column, min: Column, max: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val buckets = (1L << bits) - 1
    when(max.cast(LongType) === min.cast(LongType), lit(0L))
      .otherwise(floor(
        (c.cast(LongType) - min.cast(LongType)) * buckets /
          (max.cast(LongType) - min.cast(LongType))).cast(LongType))
  }

  /** Interleave the low `bits` bits of the already-quantized columns
    * into one Morton code: column `ci`'s bit `i` lands at output bit
    * `i·k + ci`. Unrolled into a flat OR chain of shift/mask terms —
    * whole-stage codegen compiles it to straight-line integer ops.
    */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2 && k <= 4, s"interleave wants 2-4 columns, got $k")
    require(bits >= 1 && k * bits <= 62, s"k*bits must fit a long: $k*$bits")
    val terms = for {
      i <- 0 until bits
      (c, ci) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast(LongType), i).bitwiseAND(lit(1L)), i * k + ci)
    terms.reduce(_ bitwiseOR _)
  }

  /** The DuckDB expression replaying [[interleave]] over column
    * expressions `cols` — kept HERE so operator and oracle can never
    * drift apart. Every term is FULLY parenthesized: DuckDB gives
    * `<<`/`>>`/`&`/`|` one shared left-associative precedence level
    * (the Postgres rule), so an unparenthesized `a << 1 | b << 3`
    * chain nests the shifts and overflows.
    */
  def interleaveSql(cols: Seq[String], bits: Int): String = {
    val k = cols.size
    (for {
      i <- 0 until bits
      (c, ci) <- cols.zipWithIndex
    } yield s"(((($c) >> $i) & 1) << ${i * k + ci})").mkString(" | ")
  }

  /** Write `df` clustered by the given Morton code: ONE range
    * exchange on the code (sampled bounds → `numFiles` balanced
    * output files), a per-partition sort (so row-group stats inside
    * each file stay tight too), then plain parquet. Readers get
    * file- AND row-group-level min/max pruning on every clustered
    * dimension; no global merge ever runs.
    */
  def clusteredWrite(df: DataFrame, zCol: Column, path: String,
                     numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    df.withColumn("zval", zCol)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(path)
  }
}
