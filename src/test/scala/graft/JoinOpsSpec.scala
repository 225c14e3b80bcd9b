package graft

import graft.operators.{AsOfJoin, SkewJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-operator semantics: salted joins are row-identical to plain
  * joins (salting is pure skew mechanics), as-of picks the latest
  * at-or-before row including the equal-timestamp tie.
  */
class JoinOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("salted inner join is row-identical to the plain join") {
    // hot key 1 (90% of rows) + spread keys; dup right rows too
    val left = ((1 to 900).map(i => (1L, i.toLong)) ++
      (901 to 1000).map(i => (i.toLong % 7 + 2, i.toLong)))
      .toDF("k", "id")
    val right = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (1L, "hot2"))
      .toDF("k", "v")
    val plain = left.join(right, "k")
      .groupBy("k", "v").count().orderBy("k", "v")
      .as[(Long, String, Long)].collect().toSeq
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", "id", salts = 8)
      .groupBy("k", "v").count().orderBy("k", "v")
      .as[(Long, String, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("salted join keeps rows whose discriminator is NULL") {
    val left = Seq((1L, Some(10L)), (1L, None), (2L, None))
      .toDF("k", "id")
    val right = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val plain = left.join(right, "k")
      .select("k", "v").as[(Long, String)].collect().toSeq.sorted
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", "id", salts = 4)
      .select("k", "v").as[(Long, String)].collect().toSeq.sorted
    assert(salted == plain, s"null-discriminator rows dropped: $salted")
  }

  test("as-of join takes the latest at-or-before row, ties inclusive") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val left = Seq((1L, ts(10), 100L), (1L, ts(20), 101L), (2L, ts(5), 102L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, ts(10), "r@10"), (1L, ts(15), "r@15"),
      (1L, ts(30), "r@30"), (3L, ts(1), "other"))
      .toDF("k", "ts", "payload")
    val out = AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("payload"))
      .orderBy("lid")
      .select("lid", "payload").as[(Long, Option[String])].collect().toSeq
    assert(out == Seq(
      (100L, Some("r@10")), // equal ts counts (inclusive)
      (101L, Some("r@15")), // latest at-or-before 00:20
      (102L, None)))        // key 2 has no right rows
  }

  test("interval overlap join: exactly-once pairs across bucket " +
    "boundaries, touching endpoints excluded (half-open)") {
    import graft.operators.IntervalJoin
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 0${m / 60}%d:${m % 60}%02d:00")
    // intervals in minutes; bucket = 60s → many buckets per interval
    val left = Seq((1L, ts(0), ts(90)),   // spans 2 hour-buckets
      (2L, ts(100), ts(110))).toDF("id", "s", "e")
    val right = Seq((10L, ts(80), ts(120)), // overlaps BOTH
      (11L, ts(90), ts(95)),   // touches 1's end exactly → NOT a pair
      (12L, ts(200), ts(210))) // disjoint
      .toDF("id", "s", "e")
    val got = IntervalJoin.overlapJoin(left, right,
        "id", "s", "e", "id", "s", "e", bucketSec = 60L)
      .as[(Long, Long)].collect().toSeq.sorted
    // 1×10 (80<90), 2×10 (100<120); 1×11 touches at 90 (half-open, no);
    // 2×11 disjoint (95 ≤ 100)
    assert(got == Seq((1L, 10L), (2L, 10L)), s"$got")
    // exactly-once: no duplicates even though pairs share many buckets
    assert(got.distinct == got)
  }

  test("point-in-range join: half-open boundaries, bucket-crossing " +
    "intervals, degenerate ranges; equals the quadratic reference") {
    import graft.operators.IntervalJoin
    val pts = Seq((1L, 0L), (2L, 59L), (3L, 60L), (4L, 150L))
      .toDF("pid", "p")
    val rng = Seq(
      (10L, 0L, 60L),    // covers p=0, p=59; NOT p=60 (half-open)
      (11L, 50L, 200L),  // spans 3 buckets: covers 59, 60, 150
      (12L, 150L, 150L), // degenerate — contains nothing
      (13L, 151L, 160L)) // just after p=150
      .toDF("rid", "s", "e")
    val got = IntervalJoin.pointInRangeJoin(pts, rng,
        "pid", "p", "rid", "s", "e", bucketWidth = 60L)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L),
      (4L, 11L)), s"$got")
    assert(got.distinct == got, "exactly-once per true pair")
    // randomized agreement with the quadratic reference
    val rnd = new scala.util.Random(7)
    val rp = Seq.tabulate(60)(i => (i.toLong, rnd.nextInt(500).toLong))
    val rr = Seq.tabulate(40) { i =>
      val s = rnd.nextInt(500).toLong
      (1000L + i, s, s + rnd.nextInt(120).toLong)
    }
    val gotR = IntervalJoin.pointInRangeJoin(
        rp.toDF("pid", "p"), rr.toDF("rid", "s", "e"),
        "pid", "p", "rid", "s", "e", bucketWidth = 64L)
      .as[(Long, Long)].collect().toSeq.sorted
    val want = (for {
      (pid, p) <- rp; (rid, s, e) <- rr if s <= p && p < e
    } yield (pid, rid)).sorted
    assert(gotR == want)
  }

  test("as-of tolerance gates the MATCHED row even when its payload " +
    "is NULL (gate ts and value must come from the same right row)") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // latest right row at 00:59 has a NULL payload; the older 00:00
    // row holds 'A'. A per-column carry would pass the gate on 00:59's
    // ts but emit 00:00's out-of-tolerance 'A'.
    val left = Seq((1L, ts(59), 100L)).toDF("k", "ts", "lid")
      .withColumn("ts", col("ts") + expr("INTERVAL 1 MINUTE")) // 01:00
    val right = Seq((1L, ts(0), Some("A")), (1L, ts(59), None))
      .toDF("k", "ts", "payload")
    val out = AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("payload"),
        tolerance = Some(120L))
      .select("lid", "payload").as[(Long, Option[String])].collect().toSeq
    // the matched row IS in tolerance (00:59 vs 01:00) — its payload
    // is genuinely NULL, so NULL must come out, never the stale 'A'
    assert(out == Seq((100L, None)), s"$out")
    // and without tolerance the same match still yields NULL
    val noTol = AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("payload"))
      .select("lid", "payload").as[(Long, Option[String])].collect().toSeq
    assert(noTol == Seq((100L, None)), s"$noTol")
  }

  test("degenerate [s,s) intervals pair with nothing and do not feed " +
    "sequence() a descending bucket range") {
    import graft.operators.IntervalJoin
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val left = Seq((1L, ts(10), ts(10)), // empty interval
      (2L, ts(10), ts(20))).toDF("id", "s", "e")
    val right = Seq((10L, ts(5), ts(15))).toDF("id", "s", "e")
    val got = IntervalJoin.overlapJoin(left, right,
        "id", "s", "e", "id", "s", "e", bucketSec = 60L)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((2L, 10L)), s"$got")
  }

  test("forward as-of takes the earliest at-or-after row; tolerance " +
    "nulls matches beyond the bound") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val left = Seq((1L, ts(10), 100L), (1L, ts(20), 101L),
      (1L, ts(40), 102L), (2L, ts(5), 103L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, ts(10), "r@10"), (1L, ts(25), "r@25"),
      (1L, ts(55), "r@55")).toDF("k", "ts", "payload")
    val fwd = AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("payload"),
        direction = "forward")
      .orderBy("lid")
      .select("lid", "payload").as[(Long, Option[String])].collect().toSeq
    assert(fwd == Seq(
      (100L, Some("r@10")), // equal ts inclusive in forward too
      (101L, Some("r@25")), // earliest at-or-after 00:20
      (102L, Some("r@55")),
      (103L, None)))
    // tolerance 600s: 00:40 → r@55 is 15 min away → nulled; the
    // 5-min gaps survive
    val tol = AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("payload"),
        direction = "forward", tolerance = Some(600L))
      .orderBy("lid")
      .select("lid", "payload").as[(Long, Option[String])].collect().toSeq
    assert(tol == Seq(
      (100L, Some("r@10")),
      (101L, Some("r@25")),
      (102L, None),
      (103L, None)))
  }
}
