package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** File-level data skipping shared by [[DeltaRead]] and
  * [[IcebergRead]] — the lakehouse contract that a predicate prunes
  * the FILE LIST during planning (Delta `add.stats`, Iceberg manifest
  * column bounds) so a partition-filtered query on a 100 TB table
  * never lists-and-footer-reads every file.
  *
  * The evaluator is deliberately conservative tri-state logic over
  * per-file column stats: for each file it decides whether the
  * predicate is `Some(true)` (every row matches), `Some(false)` (no
  * row can match — the file is PRUNED) or `None` (unknown / mixed —
  * the file is scanned). Anything it does not understand — casts that
  * change comparison semantics, unsupported expressions, missing
  * stats — evaluates to `None`, never to a prune, so skipping is
  * purely an optimization: callers re-apply the predicate as a normal
  * `.filter` and correctness never depends on the stats.
  *
  * Values are normalized into comparable domains before any bound
  * check: `BigDecimal` (integers, decimals, date days, timestamp
  * micros — exact), `Double` (float/double — the engine's own
  * comparison domain, since stats text round-trips shortest-repr ↔
  * double exactly), `String`, and `Boolean`; mixed
  * BigDecimal/Double comparisons go through the double's exact
  * binary expansion.
  */
object FileSkipping {

  /** Per-column stats for one file. `exact` is set when every row
    * holds that value (partition columns); `min`/`max` are inclusive
    * bounds in the normalized domain.
    */
  final case class ColStats(
      min: Option[Any] = None,
      max: Option[Any] = None,
      nullCount: Option[Long] = None,
      exact: Option[Option[Any]] = None) // Some(None) = all-null partition value

  /** Stats for one file: row count + per-LOGICAL-column stats. */
  final case class FileStats(
      numRecords: Option[Long],
      cols: Map[String, ColStats])

  /** Resolve an (unanalyzed) predicate Column against `schema`,
    * returning the type-coerced Catalyst condition. The same analyzed
    * expression both drives skipping and re-applies as the row filter.
    */
  def resolve(spark: SparkSession, schema: StructType, pred: Column): Expression = {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[Row](), schema)
    empty.filter(pred).queryExecution.analyzed match {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      case other => sys.error(s"predicate did not analyze to a Filter: $other")
    }
  }

  /** `false` exactly when NO row of a file with `stats` can satisfy
    * the resolved predicate `expr` — the prune decision.
    */
  def mayMatch(expr: Expression, stats: FileStats): Boolean =
    eval(expr, stats) != Some(false)

  // ---- normalization ----

  /** Literal internal value → comparable domain; None = unsupported. */
  private def normLit(value: Any, dt: DataType): Option[Any] = {
    if (value == null) return None
    dt match {
      case ByteType | ShortType | IntegerType =>
        Some(BigDecimal(value.asInstanceOf[Number].longValue))
      case LongType => Some(BigDecimal(value.asInstanceOf[Number].longValue))
      // float/double stay in the Double domain: stats text
      // round-trips shortest-repr ↔ double EXACTLY, so comparisons
      // agree with the engine's own float semantics (a BigDecimal
      // domain would see 0.1 ≠ 0.1f's binary expansion and mis-prune)
      case FloatType =>
        val f = value.asInstanceOf[Float]
        if (f.isNaN || f.isInfinite) None else Some(f.toDouble)
      case DoubleType =>
        val d = value.asInstanceOf[Double]
        if (d.isNaN || d.isInfinite) None else Some(d)
      case _: DecimalType =>
        Some(value.asInstanceOf[org.apache.spark.sql.types.Decimal].toBigDecimal)
      case DateType => Some(BigDecimal(value.asInstanceOf[Number].longValue)) // days
      case TimestampType | _: TimestampNTZType =>
        Some(BigDecimal(value.asInstanceOf[Number].longValue)) // micros
      case StringType => Some(value.toString) // UTF8String → String
      case BooleanType => Some(value.asInstanceOf[Boolean])
      case _ => None
    }
  }

  /** External (stats-side) value → comparable domain. Accepts the
    * shapes the readers produce: numbers, strings, java dates.
    */
  def normStat(value: Any, dt: DataType): Option[Any] = {
    if (value == null) return None
    dt match {
      case ByteType | ShortType | IntegerType | LongType => value match {
        case n: Number => Some(BigDecimal(n.longValue))
        case s: String => scala.util.Try(BigDecimal(s.trim)).toOption
        case _ => None
      }
      case FloatType | DoubleType => value match {
        case d: Double => if (d.isNaN || d.isInfinite) None else Some(d)
        case f: Float => if (f.isNaN || f.isInfinite) None else Some(f.toDouble)
        // stats written from float/double values round-trip exactly
        // through text/decimal; doubleValue only rounds for stats that
        // never were doubles (exotic foreign writers) — acceptable
        case d: java.math.BigDecimal => Some(d.doubleValue).filterNot(_.isNaN)
        case d: BigDecimal => Some(d.doubleValue).filterNot(_.isNaN)
        case n: Number => Some(n.doubleValue)
        case s: String => scala.util.Try(s.trim.toDouble)
          .toOption.filterNot(d => d.isNaN || d.isInfinite)
        case _ => None
      }
      case _: DecimalType => value match {
        case d: java.math.BigDecimal => Some(BigDecimal(d))
        case d: BigDecimal => Some(d)
        case n: Number => Some(BigDecimal(n.longValue))
        case s: String => scala.util.Try(BigDecimal(s.trim)).toOption
        case _ => None
      }
      case DateType => value match {
        case n: Number => Some(BigDecimal(n.longValue)) // epoch days
        case s: String => scala.util.Try(
          BigDecimal(java.time.LocalDate.parse(s.trim).toEpochDay)).toOption
        case d: java.sql.Date => Some(BigDecimal(d.toLocalDate.toEpochDay))
        case _ => None
      }
      case TimestampType | _: TimestampNTZType => value match {
        case n: Number => Some(BigDecimal(n.longValue)) // epoch micros
        case s: String => scala.util.Try {
          val inst = java.time.OffsetDateTime.parse(s.trim).toInstant
          BigDecimal(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
        }.toOption
        case _ => None
      }
      case StringType => value match {
        case s: String => Some(s)
        case _ => None
      }
      case BooleanType => value match {
        case b: Boolean => Some(b)
        case s: String => scala.util.Try(s.trim.toBoolean).toOption
        case _ => None
      }
      case _ => None
    }
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    // mixed domains (an int column cast to double in the predicate):
    // exact-binary decimal expansion keeps the comparison exact
    case (x: BigDecimal, y: Double) =>
      Some(x.compare(BigDecimal(new java.math.BigDecimal(y))))
    case (x: Double, y: BigDecimal) =>
      Some(BigDecimal(new java.math.BigDecimal(x)).compare(y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(x.compareTo(y))
    case _ => None
  }

  // ---- tri-state evaluation ----

  // an attribute reference, possibly under a cast that is EXACT and
  // order-preserving (value-injective widening) — only then is
  // comparing the ORIGINAL stats domain equivalent to comparing the
  // cast values. Narrowing or rounding casts (double→int truncates,
  // long→double and int→float round, decimal scale loss rounds)
  // CHANGE the comparison and must evaluate to None, never a prune.
  private def attrOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case Cast(a: AttributeReference, to, _, _) =>
      def intRank(dt: DataType): Option[Int] = dt match {
        case ByteType => Some(0); case ShortType => Some(1)
        case IntegerType => Some(2); case LongType => Some(3)
        case _ => None
      }
      // decimal digits needed to hold every value of an int type
      def intDigits(dt: DataType): Option[Int] = dt match {
        case ByteType => Some(3); case ShortType => Some(5)
        case IntegerType => Some(10); case LongType => Some(19)
        case _ => None
      }
      val exactWidening = (a.dataType, to) match {
        case (f, t) if intRank(f).isDefined && intRank(t).isDefined =>
          intRank(f).get <= intRank(t).get
        case (ByteType | ShortType | IntegerType, DoubleType) => true
        case (ByteType | ShortType, FloatType) => true
        case (FloatType, DoubleType) => true
        case (f, d: DecimalType) if intDigits(f).isDefined =>
          d.scale >= 0 && d.precision - d.scale >= intDigits(f).get
        case (f: DecimalType, t: DecimalType) =>
          t.scale >= f.scale &&
            t.precision - t.scale >= f.precision - f.scale
        case _ => false
      }
      if (exactWidening) Some(a.name) else None
    case _ => None
  }

  private def litOf(e: Expression): Option[Option[Any]] = e match {
    case Literal(null, _) => Some(None)
    case Literal(v, dt) => normLit(v, dt).map(Some(_))
    // the predicate is ANALYZED but not optimized, so type coercion
    // leaves literals wrapped in casts (`longCol === 3` carries
    // Cast(3: Int, Long)) — fold them here, in the CAST's type (the
    // domain Spark itself compares in), or pruning is silently inert
    // for every coerced literal
    case c: Cast if c.foldable && c.deterministic =>
      scala.util.Try(c.eval(null)).toOption.flatMap { v =>
        if (v == null) Some(None) else normLit(v, c.dataType).map(Some(_))
      }
    case _ => None
  }

  private def and(l: Option[Boolean], r: Option[Boolean]): Option[Boolean] =
    (l, r) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }

  private def or(l: Option[Boolean], r: Option[Boolean]): Option[Boolean] =
    (l, r) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }

  /** Some(b) = the predicate is b for EVERY row of the file; None =
    * unknown or mixed. Null predicate results count as false (filter
    * semantics), so `Some(true)` additionally requires zero nulls in
    * the referenced column.
    */
  private def eval(expr: Expression, fs: FileStats): Option[Boolean] = {
    def col(name: String): ColStats = fs.cols.getOrElse(name, ColStats())

    // bounds of `name` in the normalized domain: exact value wins
    def bounds(name: String): (Option[Any], Option[Any]) = {
      val c = col(name)
      c.exact match {
        case Some(Some(v)) => (Some(v), Some(v))
        case Some(None) => (None, None) // all-null
        case None => (c.min, c.max)
      }
    }
    def noNulls(name: String): Boolean = {
      val c = col(name)
      c.exact.exists(_.isDefined) || c.nullCount.contains(0L)
    }
    def allNulls(name: String): Boolean = {
      val c = col(name)
      c.exact.contains(None) ||
        (c.nullCount.isDefined && fs.numRecords.isDefined &&
          c.nullCount == fs.numRecords)
    }

    // tri-state comparison of column `name` against literal `v` under
    // comparator SIGN test `test` (e.g. _ < 0 for LessThan). The
    // file's non-null values span [l, h]; the sign of cmp(x, v) over
    // that span covers at most {sign(cmp(l,v)) .. sign(cmp(h,v))} —
    // a superset of the achievable signs, which is conservative both
    // ways (a prune needs NO sign to pass, all-match needs ALL to).
    def compare(name: String, v: Any, test: Int => Boolean): Option[Boolean] = {
      if (allNulls(name)) return Some(false) // null compare → null → filtered
      val (lo, hi) = bounds(name)
      (for {
        l <- lo; h <- hi
        cl <- cmp(l, v).map(Integer.signum)
        ch <- cmp(h, v).map(Integer.signum)
      } yield {
        val signs = cl to ch
        if (signs.forall(s => !test(s))) Some(false)
        else if (signs.forall(test) && noNulls(name)) Some(true)
        else None
      }).getOrElse(None)
    }

    expr match {
      case Literal(b: Boolean, BooleanType) => Some(b)
      case Literal(null, BooleanType) => Some(false)
      case And(l, r) => and(eval(l, fs), eval(r, fs))
      case Or(l, r) => or(eval(l, fs), eval(r, fs))
      case Not(c) => eval(c, fs).map(!_)
      case IsNull(e) => attrOf(e) match {
        case Some(n) if allNulls(n) => Some(true)
        case Some(n) if noNulls(n) => Some(false)
        case _ => None
      }
      case IsNotNull(e) => attrOf(e) match {
        case Some(n) if allNulls(n) => Some(false)
        case Some(n) if noNulls(n) => Some(true)
        case _ => None
      }
      case EqualTo(l, r) => binary(l, r, fs,
        (n, v) => compare(n, v, _ == 0), (n, v) => compare(n, v, _ == 0))
      case EqualNullSafe(l, r) =>
        def isNullOf(n: String): Option[Boolean] =
          if (allNulls(n)) Some(true)
          else if (noNulls(n)) Some(false)
          else None
        (attrOf(l), litOf(r), attrOf(r), litOf(l)) match {
          case (Some(n), Some(None), _, _) => isNullOf(n)
          case (_, _, Some(n), Some(None)) => isNullOf(n)
          case _ => binary(l, r, fs,
            (n, v) => compare(n, v, _ == 0), (n, v) => compare(n, v, _ == 0))
        }
      case LessThan(l, r) => binary(l, r, fs,
        (n, v) => compare(n, v, _ < 0), (n, v) => compare(n, v, _ > 0))
      case LessThanOrEqual(l, r) => binary(l, r, fs,
        (n, v) => compare(n, v, _ <= 0), (n, v) => compare(n, v, _ >= 0))
      case GreaterThan(l, r) => binary(l, r, fs,
        (n, v) => compare(n, v, _ > 0), (n, v) => compare(n, v, _ < 0))
      case GreaterThanOrEqual(l, r) => binary(l, r, fs,
        (n, v) => compare(n, v, _ >= 0), (n, v) => compare(n, v, _ <= 0))
      case In(e, list) => attrOf(e) match {
        case Some(n) =>
          val lits = list.map(litOf)
          if (lits.exists(_.isEmpty)) None // non-literal element
          else {
            val vals = lits.flatten.flatten // null elements never match
            val perValue = vals.map(v => compare(n, v, _ == 0))
            if (perValue.forall(_ == Some(false))) Some(false)
            else if (perValue.exists(_ == Some(true))) Some(true)
            else None
          }
        case None => None
      }
      case InSet(e, set) => attrOf(e) match {
        case Some(n) =>
          val dt = e.dataType
          val vals = set.toSeq.filter(_ != null).map(v => normLit(v, dt))
          if (vals.exists(_.isEmpty)) None
          else {
            val perValue = vals.flatten.map(v => compare(n, v, _ == 0))
            if (perValue.forall(_ == Some(false))) Some(false)
            else if (perValue.exists(_ == Some(true))) Some(true)
            else None
          }
        case None => None
      }
      case org.apache.spark.sql.catalyst.expressions.StartsWith(l, r) =>
        (attrOf(l), litOf(r)) match {
          case (Some(n), Some(Some(prefix: String))) =>
            if (allNulls(n)) Some(false)
            else {
              val (lo, hi) = bounds(n)
              (for {
                l0 <- lo.collect { case s: String => s }
                h0 <- hi.collect { case s: String => s }
              } yield {
                // prefixed strings sort as prefix ≤ x, with any string
                // ABOVE the prefix that doesn't carry it sorting above
                // them all — so the range is disjoint exactly when the
                // file's max is below the prefix, or its min is beyond
                // every prefixed string
                if (h0 < prefix) Some(false)
                else if (l0 > prefix && !l0.startsWith(prefix)) Some(false)
                else if (l0.startsWith(prefix) && h0.startsWith(prefix) &&
                  noNulls(n)) Some(true)
                else None
              }).getOrElse(None)
            }
          case _ => None
        }
      case _ => None
    }
  }

  private def binary(l: Expression, r: Expression, fs: FileStats,
      direct: (String, Any) => Option[Boolean],
      flipped: (String, Any) => Option[Boolean]): Option[Boolean] =
    (attrOf(l), litOf(r), attrOf(r), litOf(l)) match {
      case (Some(n), Some(Some(v)), _, _) => direct(n, v)
      case (Some(_), Some(None), _, _) => Some(false) // cmp to NULL → null
      case (_, _, Some(n), Some(Some(v))) => flipped(n, v)
      case (_, _, Some(_), Some(None)) => Some(false)
      case _ => None
    }
}
