package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst rewrite for interval-overlap joins (SURVEY §2.3 family,
  * the auto-applied form of `operators.IntervalJoin`): an INNER join
  * whose condition is EXACTLY the overlap conjunction
  *
  * {{{ sL < eR  AND  sR < eL }}}
  *
  * (each `[s, e)` pair computed from one child) has no equi-key, so
  * Spark plans a BroadcastNestedLoopJoin — O(|L|·|R|) compares, the
  * scale killer this library's manual `overlapJoin` exists to avoid.
  * This rule rewrites the logical join into the banded form
  * automatically, so a user can write the NAIVE condition and still
  * get the hash equi-join plan:
  *
  *  - each side explodes into the fixed-width buckets its interval
  *    covers (`floor(s/w) .. floor(greatest(e-1, s)/w)` — the
  *    `greatest` keeps inverted/empty intervals in their start bucket,
  *    preserving the naive join's semantics even for s ≥ e rows);
  *  - the join becomes `bucketL = bucketR AND <original condition>
  *    AND bucketL = floor(greatest(sL, sR)/w)` — the last conjunct is
  *    the exactly-once rule (every true pair shares the bucket of the
  *    later start, and is kept only there), so no distinct is needed;
  *  - a final Project restores the original output attributes.
  *
  * Numeric operands join on their own scale; timestamp operands are
  * compared in epoch microseconds. The bucket width is
  * `spark.graft.intervalJoin.bucketWidth` in the operand's unit
  * (µs for timestamps; default 1 hour) — size it near the typical
  * interval length so per-row replication stays O(1).
  *
  * The rule only fires when the condition has exactly these two
  * conjuncts: a join that also carries an equi-key is already
  * hash-planned with the range as a residual filter, and rewriting
  * it would only add explode cost. NULL bounds behave identically in
  * both forms (the conjunction is null-rejecting; `sequence` of a
  * NULL bound generates nothing). After one application the join has
  * four-plus conjuncts, so the fixed-point optimizer cannot re-fire.
  *
  * Install via `spark.sql.extensions=graft.functions.GraftExtensions`
  * (cluster config) or
  * `spark.experimental.extraOptimizations ++= Seq(BandedIntervalJoinRule)`
  * (running session).
  */
object BandedIntervalJoinRule extends Rule[LogicalPlan]
    with PredicateHelper {

  val BucketWidthConf = "spark.graft.intervalJoin.bucketWidth"
  private val DefaultWidthMicros = 3600L * 1000000L

  /** Idempotently add the rule to a running session (the
    * `spark.sql.extensions=graft.functions.GraftExtensions` config is
    * the cluster path; this is the REPL/notebook path).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  /** One side's interval bounds, already in comparable Long space. */
  private case class Bounds(s: Expression, e: Expression)

  private def supported(dt: DataType): Boolean = dt match {
    case TimestampType | LongType | IntegerType | ShortType | ByteType =>
      true
    case _ => false
  }

  /** Rebase a comparison operand into LongType (µs for timestamps,
    * days for dates, widened integral otherwise).
    */
  private def asLong(e: Expression): Expression = e.dataType match {
    case TimestampType => UnixMicros(e)
    case LongType      => e
    case _             => Cast(e, LongType)
  }

  private def from(side: LogicalPlan, e: Expression): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic && supported(e.dataType)

  /** `a < b` with `a` from `l` and `b` from `r`, normalizing `b > a`.
    * Returns (leftOperand, rightOperand).
    */
  private def ltAcross(c: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression)] = c match {
    case LessThan(a, b) if from(l, a) && from(r, b)    => Some((a, b))
    case GreaterThan(b, a) if from(l, a) && from(r, b) => Some((a, b))
    case _                                             => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(l, r, Inner, Some(cond), hint)
        if j.resolved && splitConjunctivePredicates(cond).size == 2 =>
      val conjs = splitConjunctivePredicates(cond)
      // sL < eR (left start vs right end) and sR < eL (right start vs
      // left end) — in either conjunct order
      val matched = Seq(conjs, conjs.reverse).view.flatMap { cs =>
        for {
          (sL, eR) <- ltAcross(cs.head, l, r)
          (sR, eL) <- ltAcross(cs(1), r, l)
        } yield (Bounds(asLong(sL), asLong(eL)),
          Bounds(asLong(sR), asLong(eR)))
      }.headOption
      matched match {
        case Some((bl, br)) =>
          val w = Literal(conf.getConfString(BucketWidthConf,
            DefaultWidthMicros.toString).toLong, LongType)
          val rewritten = banded(j, l, r, bl, br, cond, w, hint)
          logInfo(s"graft: rewrote interval-overlap BNLJ join to the " +
            s"banded hash equi-join (bucket width ${w.value})")
          rewritten
        case None => j
      }
  }

  /** floor(x / w) with the same double-floor semantics as the
    * DataFrame `floor(col / w)` the manual operator uses — one
    * consistent bucket function everywhere.
    */
  private def bucketOf(x: Expression, w: Expression): Expression =
    Cast(Floor(Divide(Cast(x, DoubleType), Cast(w, DoubleType))), LongType)

  /** Explode `child` into its interval's covering buckets as a new
    * column; returns (plan, bucketAttr).
    */
  private def explodeBuckets(child: LogicalPlan, b: Bounds,
      w: Expression): (LogicalPlan, Attribute) = {
    // covers floor(s/w) .. floor(greatest(e-1, s)/w): never
    // descending, and an inverted/empty interval still lands in its
    // start bucket (it can pair with partners whose start precedes
    // its own — semantics identical to the un-rewritten join)
    // explicit step + session tz: Sequence is TimeZoneAwareExpression
    // and stays UNRESOLVED without a timeZoneId, even for longs
    val seq = Sequence(
      bucketOf(b.s, w),
      bucketOf(Greatest(Seq(Subtract(b.e, Literal(1L)), b.s)), w),
      Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))
    val bucket = AttributeReference("__graft_bucket", LongType)()
    (Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(bucket), child), bucket)
  }

  private def banded(j: Join, l: LogicalPlan, r: LogicalPlan,
      bl: Bounds, br: Bounds, cond: Expression, w: Expression,
      hint: JoinHint): LogicalPlan = {
    val (lg, bL) = explodeBuckets(l, bl, w)
    val (rg, bR) = explodeBuckets(r, br, w)
    // exactly-once: keep each true pair only in the bucket of the
    // later start (both sides cover it: maxS < min(eL, eR) given the
    // overlap predicate holds, and the greatest() floor above keeps
    // even degenerate intervals through their own start bucket)
    val dedup = EqualTo(bL, bucketOf(Greatest(Seq(bl.s, br.s)), w))
    val newCond = And(EqualTo(bL, bR), And(cond, dedup))
    Project(j.output, Join(lg, rg, Inner, Some(newCond), hint))
  }
}
