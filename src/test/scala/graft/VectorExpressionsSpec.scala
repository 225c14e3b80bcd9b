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

  test("vecCosArgmax == array_position(argmax) over the unrolled " +
      "literal form, bitwise, incl. zero-vector NaN rows") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val cents: Seq[Seq[Double]] =
      Seq.tabulate(5)(_ => Seq.fill(8)(rnd.nextGaussian()))
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian())))
    val df = rows.toDF("vec_id", "v").repartition(4)
    // the reference: the exact expression kmeansCentroids used before
    val cosArr = array(cents.map { cv =>
      val cn = math.sqrt(cv.map(x => x * x).sum)
      GraftFunctions.vecDot(col("v"), array(cv.map(lit): _*)) /
        (sqrt(GraftFunctions.vecDot(col("v"), col("v"))) * lit(cn))
    }: _*)
    val want = df.select(col("vec_id"),
      (array_position(cosArr, array_max(cosArr)) - 1).cast("int").as("cid"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    val got = df.select(col("vec_id"),
      GraftFunctions.vecCosArgmax(col("v"), typedLit(cents)).as("cid"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == want.toSeq)
    // a zero vector cosines to NaN everywhere; under ANSI the old `/`
    // form would even throw DIVIDE_BY_ZERO — the native expression
    // instead lands it deterministically on centroid 0 (first NaN
    // wins, matching Spark's NaN-is-largest double order)
    val z = Seq((0L, Seq.fill(8)(0.0))).toDF("vec_id", "v")
    assert(z.select(GraftFunctions.vecCosArgmax(col("v"),
      typedLit(cents))).head().getInt(0) == 0)
  }

  test("vecL2Argmin == array_position(argmin) over the unrolled " +
      "literal form; float vectors read natively") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(19)
    val cents: Seq[Seq[Double]] =
      Seq.tabulate(6)(_ => Seq.fill(4)(rnd.nextGaussian()))
    val rows = Seq.tabulate(150)(i =>
      (i.toLong, Seq.fill(4)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "v").repartition(3)
    val dv = col("v").cast("array<double>")
    val scores = array(cents.map { cv =>
      lit(cv.map(x => x * x).sum) - lit(2.0) *
        GraftFunctions.vecDot(dv, array(cv.map(lit): _*))
    }: _*)
    val want = df.select(col("vec_id"),
      (array_position(scores, array_min(scores)) - 1).cast("int").as("c"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    // float input path: float→double per lane is exact, so the argmin
    // must agree with the cast-to-double reference
    val got = df.select(col("vec_id"),
      GraftFunctions.vecL2Argmin(col("v"), typedLit(cents)).as("c"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("centroid-scan expressions demand a literal matrix and keep " +
      "codegen source value-independent across literal changes") {
    GraftFunctions.register(spark)
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "v")
    // a column (non-foldable) centroid arg is rejected loudly
    val e = intercept[Exception] {
      df.select(GraftFunctions.vecCosArgmax(col("v"),
        array(col("v")))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("must be a literal")),
      messages(e).mkString(" | "))
    // Lloyd-iteration cache-stability: two plans differing ONLY in
    // centroid values generate identical codegen source (values ride
    // `references`, not the source text) — the compile-once property
    // the k-means loop relies on
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    def source(cents: Seq[Seq[Double]]): String = {
      val plan = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(GraftFunctions.vecCosArgmax(
          col("embedding").cast("array<double>"), typedLit(cents)).as("c"))
        .queryExecution.executedPlan
      val wscg = plan.collectFirst { case w: WholeStageCodegenExec => w }
      assert(wscg.nonEmpty, plan.toString.take(500))
      wscg.get.doCodeGen()._2.body
    }
    val s1 = source(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val s2 = source(Seq(Seq(2.5, 3.5), Seq(4.5, 5.5)))
    assert(s1 == s2,
      "codegen source must not embed centroid values")
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
