package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-membership test over 64-bit fingerprints — the same
  * shape as Spark's internal `BloomFilterMightContain` (used by its
  * runtime row-level filtering), exposed as a registered function so
  * operators can pre-filter a 100 TB scan against a driver-built
  * filter. `left` is the LongType value under test; `right` is a
  * foldable BinaryType literal holding the serialized
  * `org.apache.spark.util.sketch.BloomFilter`.
  *
  * The filter deserializes ONCE per executor (lazy, from the literal
  * bytes carried by the plan) and codegen calls `mightContainLong`
  * directly inside whole-stage codegen — no per-row lambda dispatch,
  * no UDF boxing. Guarantees follow the sketch: false negatives are
  * impossible, false positives bounded by the build-time `fpp`.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  private def assertInputTypes(): Unit = {
    require(left.dataType == LongType,
      s"$prettyName requires a BIGINT value, got ${left.dataType.sql}")
    require(right.dataType == BinaryType && right.foldable,
      s"$prettyName requires a foldable BINARY serialized filter")
  }

  override def dataType: DataType = {
    if (childrenResolved) assertInputTypes()
    BooleanType
  }
  override def prettyName: String = "graft_bloom_might_contain"

  // one deserialization per executor; the literal bytes travel with
  // the serialized plan, the filter object itself rides the codegen
  // reference array
  @transient private lazy val filter: BloomFilter = {
    assertInputTypes()
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: null serialized filter")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(v: Any, ignored: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // only the value child is evaluated per row — the filter is a
    // compile-time reference, never re-read from the literal bytes
    val bfRef = ctx.addReferenceObj("graftBloomFilter", filter,
      classOf[BloomFilter].getName)
    val leftGen = left.genCode(ctx)
    ev.copy(code = code"""
      ${leftGen.code}
      boolean ${ev.isNull} = ${leftGen.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${ev.value} = $bfRef.mightContainLong(${leftGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column wrappers for the bloom expressions. */
object BloomFunctions {

  val containsName = "graft_bloom_might_contain"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      containsName,
      { args =>
        require(args.length == 2, s"$containsName takes 2 arguments")
        BloomMightContain(args.head, args(1))
      },
      "scala_udf")

  /** Serialize a driver-built filter for use as a plan literal. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Membership test of a BIGINT column against a serialized filter;
    * register first.
    */
  def mightContain(value: Column, filterBytes: Array[Byte]): Column =
    call_function(containsName, value, lit(filterBytes))
}
