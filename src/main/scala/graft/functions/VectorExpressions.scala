package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, round, sqrt}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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

/** Registration + Column-level wrappers for the native expressions. */
object GraftFunctions {

  val dotName = "graft_vec_dot"

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    dotName -> { args =>
      require(args.length == 2, s"$dotName takes 2 arguments")
      VecDot(args.head, args(1))
    })

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
    // auto-rewrite naive interval-overlap inequality joins (which
    // would plan as BroadcastNestedLoopJoin) into the banded hash
    // equi-join — see graft.plans.BandedIntervalJoinRule
    ext.injectOptimizerRule(_ => graft.plans.BandedIntervalJoinRule)
  }
}
