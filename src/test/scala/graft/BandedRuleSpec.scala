package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.plans.BandedIntervalJoinRule — the optimizer rewrite that
  * turns a NAIVE interval-overlap inequality join (BNLJ-bound) into
  * the banded hash equi-join. Asserts (a) the plan actually changes
  * shape, (b) results are row-identical to the un-rewritten join on
  * adversarial data (inverted/empty intervals, NULL bounds, bucket-
  * boundary touches), (c) the rule leaves equi-key joins alone.
  */
class BandedRuleSpec extends AnyFunSuite with SparkTestBase {

  // fresh session state: extraOptimizations is session-scoped, so the
  // rule installed here never leaks into the other suites' plans
  private lazy val s2 = {
    val s = spark.newSession()
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ graft.plans.BandedIntervalJoinRule
    s
  }

  private def ts(m: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 0${m / 60}%d:${m % 60}%02d:00")

  private def overlap(a: DataFrame, b: DataFrame) =
    a.join(b, a("s1") < b("e2") && b("s2") < a("e1"))

  test("naive timestamp overlap join rewrites to a hash equi-join " +
      "with identical results") {
    import s2.implicits._
    val rnd = new scala.util.Random(11)
    val left = Seq.tabulate(80) { i =>
      val st = rnd.nextInt(600)
      (i.toLong, ts(st), ts(st + rnd.nextInt(150)))
    }.toDF("lid", "s1", "e1")
    val right = (Seq.tabulate(60) { i =>
      val st = rnd.nextInt(600)
      (1000L + i, Some(ts(st)), Some(ts(st + rnd.nextInt(150))))
    } :+ ((2000L, None: Option[java.sql.Timestamp], Some(ts(10)))))
      .toDF("rid", "s2", "e2")

    val joined = overlap(left, right).select("lid", "rid")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("Generate explode"), plan.take(3000))

    val got = joined.as[(Long, Long)].collect().toSeq.sorted
    // reference: the same naive join in the UN-extended base session
    val want = {
      import spark.implicits._
      val l = left.collect(); val r = right.collect()
      (for {
        lr <- l; rr <- r
        if !rr.isNullAt(1) && !rr.isNullAt(2)
        if lr.getTimestamp(1).before(rr.getTimestamp(2)) &&
          rr.getTimestamp(1).before(lr.getTimestamp(2))
      } yield (lr.getLong(0), rr.getLong(0))).toSeq.sorted
    }
    assert(got == want)
    assert(got.distinct == got, "exactly-once per pair")
  }

  test("inverted and empty intervals keep the naive join's semantics " +
      "through the rewrite") {
    import s2.implicits._
    // left 1: inverted [30, 10) — still satisfies s1<e2 && s2<e1 for
    // right 10 ([0, 40)): 30<40 && 0<10. A rewrite that dropped
    // degenerate intervals would lose this pair.
    val left = Seq((1L, ts(30), ts(10)), (2L, ts(50), ts(50)))
      .toDF("lid", "s1", "e1")
    val right = Seq((10L, ts(0), ts(40)), (11L, ts(45), ts(55)))
      .toDF("rid", "s2", "e2")
    val got = overlap(left, right).select("lid", "rid")
      .as[(Long, Long)].collect().toSeq.sorted
    // 1×10 as above; 1×11: 30<55 but 45<10 fails; 2×10: 50<40 fails;
    // 2×11: 50<55 && 45<50 — empty [50,50) still pairs, like the BNLJ
    assert(got == Seq((1L, 10L), (2L, 11L)), s"$got")
  }

  test("a join that also has an equi key is left alone") {
    import s2.implicits._
    val left = Seq((1L, 7L, ts(0), ts(20))).toDF("lid", "k1", "s1", "e1")
    val right = Seq((2L, 7L, ts(10), ts(30))).toDF("rid", "k2", "s2", "e2")
    val j = left.join(right,
      col("k1") === col("k2") && col("s1") < col("e2") &&
        col("s2") < col("e1"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate explode"), plan.take(3000))
    assert(j.count() == 1)
  }

  test("point-in-range lookups rewrite with a MAP-ONLY point side, " +
      "inclusive and strict bounds both preserved") {
    import s2.implicits._
    val rnd = new scala.util.Random(23)
    val pts = Seq.tabulate(70)(i => (i.toLong, rnd.nextInt(800).toLong))
      .toDF("pid", "p")
    val rngRows = Seq.tabulate(50) { i =>
      val s = rnd.nextInt(800).toLong
      (1000L + i, s, s + rnd.nextInt(200).toLong)
    }
    val rng = rngRows.toDF("rid", "s", "e")
    // s <= p AND p < e (SCD2-validity style)
    val j = pts.join(rng, col("s") <= col("p") && col("p") < col("e"))
      .select("pid", "rid")
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert("Generate explode".r.findAllIn(plan).size == 1,
      "only the range side may explode:\n" + plan.take(3000))
    val got = j.as[(Long, Long)].collect().toSeq.sorted
    val want = (for {
      (pid, p) <- pts.as[(Long, Long)].collect().toSeq
      (rid, s, e) <- rngRows if s <= p && p < e
    } yield (pid, rid)).sorted
    assert(got == want)
    // fully inclusive bounds (BETWEEN) rewrite too, boundary kept
    val j2 = pts.join(rng, col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "rid")
    assert(!j2.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val got2 = j2.as[(Long, Long)].collect().toSeq.sorted
    val want2 = (for {
      (pid, p) <- pts.as[(Long, Long)].collect().toSeq
      (rid, s, e) <- rngRows if s <= p && p <= e
    } yield (pid, rid)).sorted
    assert(got2 == want2)
  }

  test("pathological interval spans fail loudly instead of exploding " +
      "millions of bucket rows") {
    import s2.implicits._
    s2.conf.set(graft.plans.BandedIntervalJoinRule.MaxBucketsConf, "10")
    try {
      val wide = Seq((1L, 0L, 3600L * 1000000L * 50L))
        .toDF("lid", "s1", "e1") // 50 hour-buckets > cap of 10
      val pts = Seq((9L, 5L, 6L)).toDF("rid", "s2", "e2")
      val j = overlap(wide, pts).select("lid", "rid")
      val e = intercept[Exception](j.count())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(e).exists(_.contains("covers more than")),
        s"expected the loud bucket-cap error, got: ${msgs(e)}")
      // within the cap the same shape still runs
      s2.conf.set(graft.plans.BandedIntervalJoinRule.MaxBucketsConf, "100")
      assert(overlap(wide, pts).count() == 1)
    } finally s2.conf.unset(graft.plans.BandedIntervalJoinRule.MaxBucketsConf)
  }

  test("bucketWidth<=0 fails at plan time naming the conf key, and " +
      "only for joins the rule would rewrite") {
    import s2.implicits._
    s2.conf.set(graft.plans.BandedIntervalJoinRule.BucketWidthConf, "0")
    try {
      val left = Seq((1L, 0L, 20L)).toDF("lid", "s1", "e1")
      val right = Seq((2L, 10L, 30L)).toDF("rid", "s2", "e2")
      // an overlap join WOULD be rewritten → must fail at plan time
      // (explain/executedPlan), before any task runs, naming the conf
      val e = intercept[Exception](
        overlap(left, right).queryExecution.executedPlan)
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(e).exists(
        _.contains(graft.plans.BandedIntervalJoinRule.BucketWidthConf)),
        s"expected the conf key in the error, got: ${msgs(e)}")
      // a plain 2-conjunct equi-join is never rewritten — the bad
      // conf must NOT poison it (ADVICE r11: the require used to run
      // before band-shape matching)
      val a = Seq((1L, 5L)).toDF("k1", "x1")
      val b = Seq((1L, 7L)).toDF("k2", "x2")
      assert(a.join(b, col("k1") === col("k2") &&
        col("x1") < col("x2")).count() == 1)
      // negative width fails the same way
      s2.conf.set(graft.plans.BandedIntervalJoinRule.BucketWidthConf, "-5")
      val e2 = intercept[Exception](
        overlap(left, right).queryExecution.executedPlan)
      assert(msgs(e2).exists(
        _.contains(graft.plans.BandedIntervalJoinRule.BucketWidthConf)))
    } finally
      s2.conf.unset(graft.plans.BandedIntervalJoinRule.BucketWidthConf)
  }

  test("integer-typed bounds band on their own scale") {
    import s2.implicits._
    val left = Seq((1L, 0L, 5000L), (2L, 9000L, 9500L))
      .toDF("lid", "s1", "e1")
    val right = Seq((10L, 4000L, 4500L), (11L, 9400L, 12000L))
      .toDF("rid", "s2", "e2")
    val got = overlap(left, right).select("lid", "rid")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 10L), (2L, 11L)), s"$got")
  }
}
