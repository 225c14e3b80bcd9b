package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst rewrite for range joins (SURVEY §2.3 family, the
  * auto-applied form of `operators.IntervalJoin`): an INNER join
  * whose condition is EXACTLY one of
  *
  * {{{ sL < eR  AND  sR < eL          // interval overlap
  *     lo (<|≤) p  AND  p (<|≤) hi    // point-in-range lookup }}}
  *
  * (bounds computed from one child each; `p` shared between the two
  * conjuncts) has no equi-key, so Spark plans a
  * BroadcastNestedLoopJoin — O(|L|·|R|) compares, the scale killer
  * this library's manual `overlapJoin`/`pointInRangeJoin` exist to
  * avoid. This rule rewrites the logical join into the banded form
  * automatically, so a user can write the NAIVE condition and still
  * get the hash equi-join plan (for point-in-range the point side
  * stays map-only — one bucket per row, no exactly-once conjunct
  * needed). For the overlap shape:
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

  /** Hard per-row explode cap. Open-ended intervals with a sentinel
    * bound (`valid_to = 9999-12-31` over hour buckets ≈ 7e7 buckets
    * PER ROW) would otherwise amplify into runaway row counts or a
    * Sequence allocation failure. Exceeding the cap fails LOUDLY with
    * the remedy (raise the bucket width, or cap the sentinel) instead
    * of silently OOMing — correctness is never affected, only whether
    * the query runs.
    */
  val MaxBucketsConf = "spark.graft.intervalJoin.maxBucketsPerRow"
  private val DefaultMaxBuckets = 100000L

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

  /** Normalize any of `< ≤ > ≥` to (lo, hi, strictHi) meaning
    * `lo < hi` / `lo ≤ hi`, regardless of how it was written.
    */
  private def cmpNorm(c: Expression)
      : Option[(Expression, Expression, Boolean)] = c match {
    case LessThan(a, b)           => Some((a, b, true))
    case GreaterThan(b, a)        => Some((a, b, true))
    case LessThanOrEqual(a, b)    => Some((a, b, false))
    case GreaterThanOrEqual(b, a) => Some((a, b, false))
    case _                        => None
  }

  /** Point-in-range shape: `lo (<|≤) p AND p (<|≤) hi` with `p`
    * computed from one child and `lo`/`hi` from the other — the
    * keyless lookup join (IP→geo range table, price band, temporal
    * validity). Returns (point, pointOnLeft, lo, hiInclusive) in Long
    * space, `hi` already adjusted for strictness so the covering
    * bucket range is `floor(lo/w) .. floor(greatest(hiIncl, lo)/w)`.
    */
  private def pointRange(conjs: Seq[Expression], l: LogicalPlan,
      r: LogicalPlan)
      : Option[(Expression, Boolean, Expression, Expression)] =
    Seq(conjs, conjs.reverse).view.flatMap { cs =>
      for {
        (lo, p1, _) <- cmpNorm(cs.head)
        (p2, hi, hiStrict) <- cmpNorm(cs(1))
        if p1.semanticEquals(p2)
        pointOnLeft <-
          if (from(l, p1) && from(r, lo) && from(r, hi)) Some(true)
          else if (from(r, p1) && from(l, lo) && from(l, hi)) Some(false)
          else None
      } yield {
        val hiL = asLong(hi)
        val hiIncl = if (hiStrict) Subtract(hiL, Literal(1L)) else hiL
        (asLong(p1), pointOnLeft, asLong(lo), hiIncl)
      }
    }.headOption

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(l, r, Inner, Some(cond), hint)
        if j.resolved && splitConjunctivePredicates(cond).size == 2 =>
      val conjs = splitConjunctivePredicates(cond)
      // width=0 would divide-by-zero into one global bucket (silent
      // O(n·m) degeneration); a negative width makes the per-row
      // Sequence bounds descend and throw mid-query — fail at plan
      // time with the conf key, same contract as the manual operator.
      // Lazy so a bad conf only fails joins the rule actually
      // rewrites, not every 2-conjunct inner join in the session.
      lazy val w: Literal = {
        val width = conf.getConfString(BucketWidthConf,
          DefaultWidthMicros.toString).toLong
        require(width > 0,
          s"$BucketWidthConf must be > 0 (got $width)")
        Literal(width, LongType)
      }
      // 1) point-in-range first — the cheaper rewrite (the point side
      //    stays MAP-ONLY and needs no exactly-once conjunct, a point
      //    being in exactly one bucket); the shared `p` operand
      //    distinguishes it from the two-interval overlap shape
      pointRange(conjs, l, r) match {
        case Some((p, pointOnLeft, lo, hiIncl)) =>
          logInfo("graft: rewrote point-in-range BNLJ join to a " +
            s"banded hash equi-join (bucket width ${w.value})")
          bandedPoint(j, l, r, p, pointOnLeft, lo, hiIncl, cond, w, hint)
        case None =>
          // 2) interval overlap: sL < eR AND sR < eL (either conjunct
          //    order, either operand orientation)
          val matched = Seq(conjs, conjs.reverse).view.flatMap { cs =>
            for {
              (sL, eR) <- ltAcross(cs.head, l, r)
              (sR, eL) <- ltAcross(cs(1), r, l)
            } yield (Bounds(asLong(sL), asLong(eL)),
              Bounds(asLong(sR), asLong(eR)))
          }.headOption
          matched match {
            case Some((bl, br)) =>
              logInfo("graft: rewrote interval-overlap BNLJ join to " +
                s"the banded hash equi-join (bucket width ${w.value})")
              banded(j, l, r, bl, br, cond, w, hint)
            case None => j
          }
      }
  }

  /** floor(x / w) with the same double-floor semantics as the
    * DataFrame `floor(col / w)` the manual operator uses — one
    * consistent bucket function everywhere.
    */
  private def bucketOf(x: Expression, w: Expression): Expression =
    Cast(Floor(Divide(Cast(x, DoubleType), Cast(w, DoubleType))), LongType)

  /** Explode `child` into its half-open interval's covering buckets
    * — `floor(s/w) .. floor(greatest(e-1, s)/w)`: never descending,
    * and an inverted/empty interval still lands in its start bucket
    * (it can pair with partners whose start precedes its own —
    * semantics identical to the un-rewritten join).
    */
  private def explodeBuckets(child: LogicalPlan, b: Bounds,
      w: Expression): (LogicalPlan, Attribute) =
    explodeBucketRange(child, b.s, Subtract(b.e, Literal(1L)), w)

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

  /** Point-in-range rewrite: the point side gains its ONE bucket via
    * a map-only Project; only the range side explodes to covering
    * buckets (`floor(lo/w) .. floor(greatest(hiIncl, lo)/w)` — the
    * greatest keeps empty ranges representable; their rows can never
    * satisfy the predicate, identical to the naive join). No dedup
    * conjunct: each true pair meets in exactly one bucket.
    */
  private def bandedPoint(j: Join, l: LogicalPlan, r: LogicalPlan,
      p: Expression, pointOnLeft: Boolean, lo: Expression,
      hiIncl: Expression, cond: Expression, w: Expression,
      hint: JoinHint): LogicalPlan = {
    val (pointChild, rangeChild) = if (pointOnLeft) (l, r) else (r, l)
    val bucketAlias = Alias(bucketOf(p, w), "__graft_pbucket")()
    val pointPlan =
      Project(pointChild.output :+ bucketAlias, pointChild)
    val pAttr = bucketAlias.toAttribute
    val (rangePlan, rAttr) =
      explodeBucketRange(rangeChild, lo, hiIncl, w)
    val newCond = And(EqualTo(pAttr, rAttr), cond)
    val (nl, nr) = if (pointOnLeft) (pointPlan, rangePlan)
      else (rangePlan, pointPlan)
    Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
  }

  /** Explode `child` into buckets `floor(lo/w)..floor(max(hiIncl,
    * lo)/w)` (inclusive hi, never descending). Explicit step +
    * session tz: Sequence is TimeZoneAwareExpression and stays
    * UNRESOLVED without a timeZoneId, even over longs.
    */
  private def explodeBucketRange(child: LogicalPlan, lo: Expression,
      hiIncl: Expression, w: Expression): (LogicalPlan, Attribute) = {
    val loB = bucketOf(lo, w)
    val hiB = bucketOf(Greatest(Seq(hiIncl, lo)), w)
    val maxB = Literal(conf.getConfString(MaxBucketsConf,
      DefaultMaxBuckets.toString).toLong, LongType)
    val seq = Sequence(loB, hiB,
      Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))
    // fail loudly on pathological ranges (open-ended sentinel bounds)
    // instead of materializing millions of bucket rows per input row
    val guarded = If(
      LessThanOrEqual(Subtract(hiB, loB), maxB),
      seq,
      Cast(RaiseError(Literal(
        s"graft banded range join: an interval covers more than " +
          s"${maxB.value} buckets — raise $BucketWidthConf (or " +
          s"$MaxBucketsConf), or bound the interval's sentinel end")),
        seq.dataType))
    val bucket = AttributeReference("__graft_bucket", LongType)()
    (Generate(Explode(guarded), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(bucket), child), bucket)
  }
}
