package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, round, sqrt}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression for the embedding hot path (SURVEY §4's
  * "custom Expression only if profiling demands"): a codegen'd dot
  * product over `array<float|double>` that compiles to a tight
  * primitive loop inside WholeStageCodegen — no per-element lambda
  * dispatch, no boxing, unlike the `aggregate(zip_with(...))`
  * higher-order form.
  *
  * Element access branches on the child's element type at *plan* time
  * (float vs double), so no cast node is inserted and float arrays
  * read their 4-byte lanes directly. Array elements must be non-null
  * (embeddings are); null *arrays* propagate null via
  * `BinaryExpression`'s default null handling. Other element types
  * (array<int>, array<decimal>, …) are rejected with a clear error at
  * plan time — `getFloat`/`getDouble` on an unsafe array of a
  * different width would silently reinterpret bytes. (The check lives
  * in `dataType`/eval/codegen rather than `checkInputDataTypes`
  * because `TypeCheckResult` is private[sql].)
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  private def assertInputTypes(): Unit =
    if (!(elemOk(left) && elemOk(right)))
      throw new IllegalArgumentException(
        s"$prettyName requires array<float> or array<double> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = {
    // childrenResolved guard: analysis rules may probe dataType while
    // children are still unresolved placeholders
    if (childrenResolved) assertInputTypes()
    DoubleType
  }
  override def prettyName: String = "graft_vec_dot"

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // belt-and-braces for paths that never consult dataType
  private lazy val typesChecked: Boolean = { assertInputTypes(); true }

  override def nullSafeEval(a: Any, b: Any): Any = {
    assert(typesChecked)
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloatArr(left), isFloatArr(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    assert(typesChecked)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val xv = if (isFloatArr(left)) s"(double) $x.getFloat($i)"
               else s"$x.getDouble($i)"
      val yv = if (isFloatArr(right)) s"(double) $y.getFloat($i)"
               else s"$y.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $xv * $yv;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Shared literal-matrix plumbing for the centroid-scan expressions:
  * the centroid argument must be FOLDABLE (a plan literal — k-means /
  * PQ bake trained centroids into the plan), and its value reaches
  * generated code through `references` (a `double[][]` reference
  * object), NOT as source-embedded constants. That keeps the
  * generated source byte-identical across Lloyd iterations whose only
  * difference is the centroid values — so iteration 2..n reuse the
  * iteration-1 compiled class instead of recompiling the whole stage
  * (the dominant cost of the previous k-unrolled `array(lit...)`
  * form on small data, and a free win at any scale).
  */
private[functions] object VecLit {
  def matrix(e: Expression): Array[Array[Double]] = {
    require(e.foldable,
      "centroid argument must be a literal (trained centroids are " +
        "baked into the plan)")
    val elemType = e.dataType match {
      case ArrayType(ArrayType(et @ (FloatType | DoubleType), _), _) => et
      case other => throw new IllegalArgumentException(
        s"centroid argument must be array<array<float|double>>, " +
          s"got ${other.sql}")
    }
    val ad = e.eval(null).asInstanceOf[ArrayData]
    require(ad != null && ad.numElements() > 0,
      "centroid literal must be a non-empty array")
    Array.tabulate(ad.numElements()) { i =>
      elemType match {
        case DoubleType => ad.getArray(i).toDoubleArray()
        case _ => ad.getArray(i).toFloatArray().map(_.toDouble)
      }
    }
  }
}

/** Common shell: `(vector, centroid-matrix-literal) → int` index of
  * the best-scoring centroid. Subclasses fix the score and the
  * better-than ordering; both the interpreted and generated paths
  * scan centroids in index order with first-occurrence-wins ties,
  * matching `array_position(arr, array_max/min(arr)) - 1` exactly
  * (including Spark's NaN-is-largest double ordering).
  */
abstract class VecBestCentroid extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable

  @transient protected lazy val cmat: Array[Array[Double]] =
    VecLit.matrix(right)

  protected def isFloatVec: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"$prettyName requires an array<float|double> vector, " +
        s"got ${other.sql}")
  }

  /** Per-centroid driver-side constant (norm for cosine, ‖c‖² for
    * L2) — precomputed once, shipped via `references`.
    */
  protected def centConst: Array[Double]
  /** Scala score for the interpreted path. */
  protected def score(dot: Double, vnorm2: Double, const: Double): Double
  /** True when the candidate score beats the incumbent. */
  protected def better(s: Double, best: Double): Boolean
  /** Incumbent initializer (-inf for argmax, +inf for argmin). */
  protected def worst: Double
  /** Java literal for `worst` (interpolating a Double prints
    * `-Infinity`, which is not Java). */
  protected def worstJava: String
  /** Java source for the score; `dot`/`vn2`/`cc` are in scope. */
  protected def scoreJava(dot: String, vn2: String, cc: String): String
  /** Java source for the better-than test. */
  protected def betterJava(s: String, best: String): String
  /** Whether the vector's squared norm is needed (cosine only). */
  protected def needsVNorm: Boolean

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) null
    else {
      val x = a.asInstanceOf[ArrayData]
      val lf = isFloatVec
      val consts = centConst
      var vn2 = 0.0
      if (needsVNorm) {
        var i = 0
        val n = x.numElements()
        while (i < n) {
          val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
          vn2 += xv * xv
          i += 1
        }
      }
      var best = worst
      var bestIdx = 0
      var c = 0
      while (c < cmat.length) {
        val cv = cmat(c)
        val n = math.min(x.numElements(), cv.length)
        var s = 0.0
        var i = 0
        while (i < n) {
          val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
          s += xv * cv(i)
          i += 1
        }
        val sc = score(s, vn2, consts(c))
        if (better(sc, best)) { best = sc; bestIdx = c }
        c += 1
      }
      bestIdx
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lf = isFloatVec
    val cm = ctx.addReferenceObj("cmat", cmat, "double[][]")
    val cc = ctx.addReferenceObj("centConst", centConst, "double[]")
    nullSafeCodeGen(ctx, ev, (x, _) => {
      val vn2 = ctx.freshName("vn2")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val sc = ctx.freshName("sc")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val xv = if (lf) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val vnormCode = if (needsVNorm)
        s"""
           |for (int $i = 0; $i < $x.numElements(); $i++) {
           |  $vn2 += $xv * $xv;
           |}
         """.stripMargin
      else ""
      s"""
         |double $vn2 = 0.0;
         |$vnormCode
         |double $best = $worstJava;
         |int $bestIdx = 0;
         |for (int $c = 0; $c < $cm.length; $c++) {
         |  final double[] $cv = $cm[$c];
         |  final int $n =
         |    java.lang.Math.min($x.numElements(), $cv.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $xv * $cv[$i];
         |  }
         |  final double $sc = ${scoreJava(s, vn2, s"$cc[$c]")};
         |  if (${betterJava(sc, best)}) { $best = $sc; $bestIdx = $c; }
         |}
         |${ev.value} = $bestIdx;
       """.stripMargin
    })
  }
}

/** 0-based argmax of cosine(v, centroid) over a literal centroid
  * matrix — the k-means assignment step, fused (norms + k dots +
  * argmax in one pass) and codegen-cache-stable across iterations.
  * Bit-identical to `array_position(cosArr, array_max(cosArr)) - 1`
  * over `vec_dot(v,c)/(sqrt(vec_dot(v,v))·‖c‖)` per element.
  */
case class VecCosArgmax(left: Expression, right: Expression)
    extends VecBestCentroid {
  override def prettyName: String = "graft_vec_cos_argmax"
  @transient override protected lazy val centConst: Array[Double] =
    cmat.map(cv => math.sqrt(cv.map(x => x * x).sum))
  override protected def needsVNorm: Boolean = true
  override protected def worst: Double = Double.NegativeInfinity
  override protected def worstJava: String =
    "java.lang.Double.NEGATIVE_INFINITY"
  override protected def score(dot: Double, vn2: Double,
      const: Double): Double = dot / (math.sqrt(vn2) * const)
  // Spark double ordering: NaN is LARGER than anything; first
  // occurrence of the max wins
  override protected def better(s: Double, best: Double): Boolean =
    s > best || (s.isNaN && !best.isNaN)
  override protected def scoreJava(dot: String, vn2: String,
      cc: String): String = s"$dot / (java.lang.Math.sqrt($vn2) * $cc)"
  override protected def betterJava(s: String, best: String): String =
    s"$s > $best || (java.lang.Double.isNaN($s) && " +
      s"!java.lang.Double.isNaN($best))"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosArgmax =
    copy(left = newLeft, right = newRight)
}

/** 0-based argmin of ‖v − centroid‖² over a literal centroid matrix,
  * scored as ‖c‖² − 2·v·c (the ‖v‖² term is constant per row and
  * drops out of the argmin) — the PQ assignment step. Bit-identical
  * to `array_position(scores, array_min(scores)) - 1` over
  * `lit(‖c‖²) - 2·vec_dot(v,c)` per element (NaN never wins the min,
  * matching Spark's NaN-is-largest ordering).
  */
case class VecL2Argmin(left: Expression, right: Expression)
    extends VecBestCentroid {
  override def prettyName: String = "graft_vec_l2_argmin"
  @transient override protected lazy val centConst: Array[Double] =
    cmat.map(_.map(x => x * x).sum)
  override protected def needsVNorm: Boolean = false
  override protected def worst: Double = Double.PositiveInfinity
  override protected def worstJava: String =
    "java.lang.Double.POSITIVE_INFINITY"
  override protected def score(dot: Double, vn2: Double,
      const: Double): Double = const - 2.0 * dot
  override protected def better(s: Double, best: Double): Boolean =
    s < best
  override protected def scoreJava(dot: String, vn2: String,
      cc: String): String = s"$cc - 2.0 * $dot"
  override protected def betterJava(s: String, best: String): String =
    s"$s < $best"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Argmin =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level wrappers for the native expressions. */
object GraftFunctions {

  val dotName = "graft_vec_dot"
  val cosArgmaxName = "graft_vec_cos_argmax"
  val l2ArgminName = "graft_vec_l2_argmin"

  private def arity2(name: String)(
      mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"$name takes 2 arguments")
    mk(args.head, args(1))
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    dotName -> arity2(dotName)(VecDot),
    cosArgmaxName -> arity2(cosArgmaxName)(VecCosArgmax),
    l2ArgminName -> arity2(l2ArgminName)(VecL2Argmin))

  /** Idempotently register the native functions on a session (the
    * runtime path; `GraftExtensions` is the `spark.sql.extensions`
    * config path for clusters).
    */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }

  /** Native dot product over array<float|double>; register first. */
  def vecDot(a: Column, b: Column): Column = call_function(dotName, a, b)

  /** Native cosine (rounded 6 dp like `Similarity.cosine`). */
  def vecCosine(a: Column, b: Column): Column =
    round(vecDot(a, b) / (sqrt(vecDot(a, a)) * sqrt(vecDot(b, b))), 6)

  /** 0-based nearest-centroid-by-cosine over a LITERAL centroid
    * matrix (k-means assignment); `cents` must be foldable.
    */
  def vecCosArgmax(v: Column, cents: Column): Column =
    call_function(cosArgmaxName, v, cents)

  /** 0-based nearest-centroid-by-L2 over a LITERAL centroid matrix
    * (PQ assignment); `cents` must be foldable.
    */
  def vecL2Argmin(v: Column, cents: Column): Column =
    call_function(l2ArgminName, v, cents)
}

/** `spark.sql.extensions`-style injector (SURVEY §4 /
  * `SparkSessionExtensions`): `--conf spark.sql.extensions=
  * graft.functions.GraftExtensions` makes the native functions
  * available to pure-SQL users on a cluster.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.dotName),
      new ExpressionInfo(classOf[VecDot].getName, GraftFunctions.dotName),
      (args: Seq[Expression]) => VecDot(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.cosArgmaxName),
      new ExpressionInfo(classOf[VecCosArgmax].getName,
        GraftFunctions.cosArgmaxName),
      (args: Seq[Expression]) => VecCosArgmax(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.l2ArgminName),
      new ExpressionInfo(classOf[VecL2Argmin].getName,
        GraftFunctions.l2ArgminName),
      (args: Seq[Expression]) => VecL2Argmin(args.head, args(1))))
    // auto-rewrite naive interval-overlap inequality joins (which
    // would plan as BroadcastNestedLoopJoin) into the banded hash
    // equi-join — see graft.plans.BandedIntervalJoinRule
    ext.injectOptimizerRule(_ => graft.plans.BandedIntervalJoinRule)
  }
}
