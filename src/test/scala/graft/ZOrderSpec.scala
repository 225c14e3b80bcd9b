package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering: Morton-code arithmetic, write layout, and the
  * property the whole feature exists for — per-file min/max extents
  * shrink on EVERY clustered dimension (so parquet stats prune scans
  * filtered on any of them), where a single-column sort leaves the
  * other dimension's extent at full range in every file.
  */
class ZOrderSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("interleave places column ci's bit i at position i*k+ci") {
    val df = Seq((3L, 1L), (0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L))
      .toDF("x", "y")
    val got = df.select(
      ZOrder.interleave(Seq(col("x"), col("y")), bits = 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (x=0b11, y=0b01) → x0@0 + y0@1 + x1@2 = 1+2+4 = 7
    // x-only fills even bits (0x5555), y-only odd bits (0xAAAA)
    assert(got == Seq(7L, 0L, 0x5555L, 0xAAAAL, 0xFFFFL))
  }

  test("interleave rejects shapes that overflow a long") {
    intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq(col("x")), bits = 8) // k < 2
    }
    intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq(col("x"), col("y")), bits = 32) // 64 > 62
    }
  }

  test("quantize maps [min,max] onto [0, 2^bits) monotonically; " +
      "degenerate range collapses to 0") {
    val df = Seq(10L, 20L, 55L, 100L).toDF("v")
    val got = df.select(
      ZOrder.quantize(col("v"), lit(10L), lit(100L), bits = 8).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(got.head == 0L && got.last == 255L)
    assert(got == got.sorted)
    assert(got(2) == (55L - 10L) * 255L / 90L)
    val degenerate = df.select(
      ZOrder.quantize(col("v"), lit(7L), lit(7L), bits = 8).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(degenerate.forall(_ == 0L))
  }

  test("interleaveSql replays interleave exactly (spark-sql evaluation " +
      "of the duckdb expression text)") {
    // the oracle string uses only >>, <<, &, | — valid in Spark SQL
    // too, so evaluate it directly against the native expression
    val df = (0L until 64L).map(i => (i * 7 % 256, i * 13 % 256))
      .toDF("x", "y")
    val mismatches = df.select(
      ZOrder.interleave(Seq(col("x"), col("y")), bits = 8).as("a"),
      expr(ZOrder.interleaveSql(Seq("x", "y"), bits = 8)).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatches == 0L)
  }

  test("clusteredWrite shrinks per-file extents on BOTH dimensions; " +
      "a plain sort leaves dim 2 at full range") {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    val dir = java.nio.file.Files.createTempDirectory(base, "zorder")
    // 64×64 grid, both dims uniform on [0,63]
    val grid = (0L until 4096L).map(i => (i / 64L, i % 64L))
      .toDF("x", "y")
    val z = ZOrder.interleave(Seq(
      ZOrder.quantize(col("x"), lit(0L), lit(63L), 6),
      ZOrder.quantize(col("y"), lit(0L), lit(63L), 6)), bits = 6)
    ZOrder.clusteredWrite(grid, z, s"$dir/z", numFiles = 16)

    def maxExtent(path: String, c: String): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("e"))
        .agg(max(col("e"))).collect()(0).getLong(0)

    // 16 z-range files over a 64×64 grid: an aligned 256-code block is
    // a 16×16 quadrant (extent 15); sampled range bounds can straddle
    // two adjacent quadrants (extent ≤ 31) — either way FAR below the
    // full-range slice (63) an unclustered layout gives
    assert(maxExtent(s"$dir/z", "x") <= 32L)
    assert(maxExtent(s"$dir/z", "y") <= 32L)

    // baseline: sort by x only — x prunes, y is full-range everywhere
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/x")
    assert(maxExtent(s"$dir/x", "x") <= 8L)
    assert(maxExtent(s"$dir/x", "y") == 63L)
  }
}
