package graft

import graft.functions.GraftFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native VecDot expression must agree bit-for-bit with the
  * higher-order `aggregate(zip_with(...))` form (same sequential fold
  * order), survive interpreted AND codegen execution, and propagate
  * null arrays.
  */
class VectorExpressionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(3)
  private val vecs = (0L until 30L)
    .map(i => (i, Seq.fill(32)(rnd.nextFloat() - 0.5f)))

  test("native dot == higher-order dot, bitwise") {
    GraftFunctions.register(spark)
    val df = vecs.toDF("id", "v")
    val pairs = df.select(col("id").as("a"), col("v").as("va"))
      .crossJoin(df.select(col("id").as("b"), col("v").as("vb")))
      .filter(col("a") < col("b"))
    val rows = pairs.select(
      GraftFunctions.vecDot(col("va"), col("vb")).as("native"),
      Similarity.dot(col("va").cast("array<double>"),
        col("vb").cast("array<double>")).as("ho"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("native") == r.getAs[Double]("ho"))
    }
  }

  test("native cosine == higher-order cosine") {
    GraftFunctions.register(spark)
    val df = vecs.toDF("id", "v")
    val pairs = df.select(col("id").as("a"), col("v").as("va"))
      .crossJoin(df.select(col("id").as("b"), col("v").as("vb")))
      .filter(col("a") < col("b")).limit(100)
    val rows = pairs.select(
      GraftFunctions.vecCosine(col("va"), col("vb")).as("native"),
      Similarity.cosine(col("va"), col("vb")).as("ho")).collect()
    rows.foreach(r =>
      assert(r.getAs[Double]("native") == r.getAs[Double]("ho")))
  }

  test("null array propagates null; mismatched lengths use min") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f, 5.0f))),
      (Option.empty[Seq[Float]], Some(Seq(1.0f))))
      .toDF("a", "b")
    val out = df.select(GraftFunctions.vecDot(col("a"), col("b")).as("d"))
      .collect()
    assert(out(0).getAs[Double]("d") == 1.0 * 3 + 2.0 * 4)
    assert(out(1).isNullAt(0))
  }

  test("non-float/double array inputs are rejected, not reinterpreted") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(1, 2, 3), Seq(4, 5, 6))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(GraftFunctions.vecDot(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("graft_vec_dot requires")),
      s"expected a clear type error, got: ${messages(e).mkString(" | ")}")
  }

  test("expression participates in WholeStageCodegen") {
    GraftFunctions.register(spark)
    // a parquet scan keeps the projection in the physical plan (a
    // local Seq would be constant-folded into LocalTableScan)
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(GraftFunctions.vecDot(col("embedding"), col("embedding"))
        .as("n2"))
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project [graft_vec_dot"), p.take(1000))
    // and it actually executes through the codegen path
    assert(df.filter(col("n2") >= 0.0).count() > 0)
  }
}
