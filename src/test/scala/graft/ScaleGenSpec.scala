package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.ScaleGen — the soak-data synthesizer's contracts: exact N×
  * row counts, FK-consistent key strides, timeline tiling for events
  * (constant density), text decorrelation that still preserves
  * within-replica duplicate structure, and the orthogonal embedding
  * transform (within-replica cosines bit-preserved, cross-replica
  * ~0).
  */
class ScaleGenSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dst: String = {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    val d = java.nio.file.Files.createTempDirectory(base, "sg").toString
    ScaleGen.scale(spark, sf, d, 2)
    d
  }

  test("2x scale: fact tables double exactly, dimensions copy as-is") {
    for ((t, dim) <- Seq("customer" -> false, "orders" -> false,
      "lineitem" -> false, "events" -> false, "documents" -> false,
      "embeddings" -> false, "part" -> false, "supplier" -> false,
      "nation" -> true, "region" -> true)) {
      val n0 = spark.read.parquet(s"$sf/$t.parquet").count()
      val n1 = spark.read.parquet(s"$dst/$t.parquet").count()
      assert(n1 == (if (dim) n0 else 2 * n0), s"$t: $n0 -> $n1")
    }
  }

  test("FK strides hold: no orphan lineitems or orders in any replica") {
    val li = spark.read.parquet(s"$dst/lineitem.parquet")
    val o = spark.read.parquet(s"$dst/orders.parquet")
    val c = spark.read.parquet(s"$dst/customer.parquet")
    assert(li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
      .count() == 0, "orphan lineitems")
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .count() == 0, "orphan orders")
  }

  test("events tile the timeline: replica 1 starts after replica 0 " +
      "ends (constant density, linear interval-join outputs)") {
    val ev = spark.read.parquet(s"$dst/events.parquet")
    val r0max = ev.filter(col("event_id") < ScaleGen.Stride)
      .agg(max("ts")).head().getTimestamp(0)
    val r1min = ev.filter(col("event_id") >= ScaleGen.Stride)
      .agg(min("ts")).head().getTimestamp(0)
    assert(r0max.before(r1min),
      s"replicas overlap in time: r0 max=$r0max r1 min=$r1min")
  }

  test("text decorrelates across replicas but preserves within-" +
      "replica duplicate structure") {
    val d1 = spark.read.parquet(s"$dst/documents.parquet")
    val r0 = d1.filter(col("doc_id") < ScaleGen.Stride)
      .select(col("doc_id").as("id"), col("text").as("t0"))
    val r1 = d1.filter(col("doc_id") >= ScaleGen.Stride)
      .select((col("doc_id") - ScaleGen.Stride).as("id"),
        col("text").as("t1"))
    val joined = r0.join(r1, "id")
    assert(joined.filter(col("t0") === col("t1")).count() == 0,
      "every doc must differ from its replica (even empty ones)")
    // exact-dup groups are preserved per replica: identical texts in
    // r0 stay identical in r1 (dictionary substitution is consistent)
    def dupPairs(c: org.apache.spark.sql.Column) = joined
      .groupBy(c).count().filter(col("count") >= 2)
      .agg(coalesce(sum(col("count") * (col("count") - 1)), lit(0L))
        .cast("long")).head().getLong(0)
    assert(dupPairs(col("t0")) == dupPairs(col("t1")),
      "within-replica exact-dup pair count must be preserved")
    // n_chars stays consistent with the rewritten text
    assert(d1.filter(col("n_chars") =!= length(col("text"))).count() == 0)
  }

  test("embedding transform is orthogonal: within-replica cosines " +
      "bit-preserved, cross-replica decorrelated") {
    val e = spark.read.parquet(s"$dst/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def vec(id: Long): Seq[Double] = e.filter(col("vec_id") === id)
      .head().getSeq[Double](1)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val (a0, b0) = (vec(0L), vec(1L))
    val (a1, b1) = (vec(ScaleGen.Stride), vec(ScaleGen.Stride + 1))
    assert(math.abs(cos(a0, b0) - cos(a1, b1)) < 1e-12,
      "within-replica pairwise cosine must be preserved")
    assert(math.abs(cos(a0, a1)) < 0.5,
      s"cross-replica cosine should be ~0, got ${cos(a0, a1)}")
  }
}
