package graft

import graft.operators.Dedup
import graft.pipeline.Snapshot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed

/** ScalaCheck-driven algebraic properties (SURVEY §5.3). Each property
  * samples a handful of cases deterministically (fixed seed) — every
  * case launches Spark jobs, so the sample counts stay small while the
  * generators cover shapes example tests miss (random graphs, random
  * multi-step histories).
  */
class PropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // ---- clusters ≡ reference union-find ---------------------------------

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  test("clusters equals union-find on random graphs") {
    val graphGen = for {
      n <- Gen.choose(2, 25)
      nEdges <- Gen.choose(1, 40)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield (n, edges.distinct)

    sample(graphGen, 8, seed = 1234L).foreach { case (n, edges) =>
      val got = Dedup.clusters(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      val want = unionFind(n, edges)
      assert(got == want, s"edges=$edges")
    }
  }

  // ---- SCD2 invariants over random multi-step histories ----------------

  test("SCD2 invariants hold over random histories") {
    // per step: for each of 4 keys, the key is absent or carries one
    // of 3 values (absence exercises hard deletes)
    val stepGen: Gen[Seq[(Long, String)]] =
      Gen.sequence[Seq[Option[(Long, String)]], Option[(Long, String)]](
        (1L to 4L).map { k =>
          Gen.oneOf[Option[(Long, String)]](None,
            Some((k, "x")), Some((k, "y")), Some((k, "z")))
        }).map(_.flatten)

    val historyGen = Gen.listOfN(4, stepGen)

    sample(historyGen, 6, seed = 99L).foreach { history =>
      val times = (1 to history.size)
        .map(i => f"2024-0$i%d-01 00:00:00")
      var snap: Option[DataFrame] = None
      history.zip(times).foreach { case (state, t) =>
        snap = Some(Snapshot.scd2(snap,
          state.toDF("id", "v"), Seq("id"), Seq("v"), t)
          .localCheckpoint())
      }
      val rows = snap.get
        .select("id", "v", "valid_from", "valid_to")
        .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
        .collect().toSeq

      // 1. at most one open row per key; open ⇔ key present in last state
      val lastState = history.last.toMap
      rows.groupBy(_._1).foreach { case (k, krows) =>
        val open = krows.filter(_._4.isEmpty)
        assert(open.size <= 1, s"key $k has ${open.size} open rows")
        if (lastState.contains(k)) {
          assert(open.size == 1, s"present key $k has no open row")
          assert(open.head._2 == lastState(k),
            s"open row for $k is ${open.head._2}, want ${lastState(k)}")
        } else assert(open.isEmpty, s"deleted key $k still open")
      }
      // 2. intervals are non-overlapping and ordered per key
      rows.groupBy(_._1).values.foreach { krows =>
        val sorted = krows.sortBy(_._3.getTime)
        sorted.sliding(2).foreach {
          case Seq(prev, next) =>
            assert(prev._4.isDefined, "only the last row may be open")
            assert(prev._4.get.getTime <= next._3.getTime,
              s"overlapping intervals: $prev then $next")
          case _ => ()
        }
      }
    }
  }

  test("step-based SCD2 accumulation ≡ full-frame scd2 on random histories") {
    // the runner's append-only snapshot storage accumulates
    // closedDelta batches and swaps the open set (scd2Step); the
    // result must equal folding scd2 over full history frames
    val stepGen: Gen[Seq[(Long, String)]] =
      Gen.sequence[Seq[Option[(Long, String)]], Option[(Long, String)]](
        (1L to 4L).map { k =>
          Gen.oneOf[Option[(Long, String)]](None,
            Some((k, "x")), Some((k, "y")), Some((k, "z")))
        }).map(_.flatten)

    sample(Gen.listOfN(4, stepGen), 5, seed = 7L).foreach { history =>
      val times = (1 to history.size).map(i => f"2024-0$i%d-01 00:00:00")
      var full: Option[DataFrame] = None
      var closedAcc: Seq[DataFrame] = Nil
      var open: Option[DataFrame] = None
      history.zip(times).foreach { case (state, t) =>
        val cur = state.toDF("id", "v")
        full = Some(Snapshot.scd2(full, cur, Seq("id"), Seq("v"), t)
          .localCheckpoint())
        val (closedDelta, nextOpen) =
          Snapshot.scd2Step(open, cur, Seq("id"), Seq("v"), t)
        closedAcc = closedAcc :+ closedDelta.localCheckpoint()
        open = Some(nextOpen.localCheckpoint())
      }
      val stepwise = (closedAcc ++ open.toSeq).reduce(_ unionByName _)
        .select("id", "v", "valid_from", "valid_to")
        .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
        .collect().toSeq.sorted
      val fullRows = full.get
        .select("id", "v", "valid_from", "valid_to")
        .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
        .collect().toSeq.sorted
      assert(stepwise == fullRows, s"history=$history")
    }
  }

  // ---- microbatch: any gap-free run schedule ≡ one-shot backfill -------

  test("microbatch run schedules converge to the one-shot interval") {
    import graft.pipeline._
    // random event rows over ten days + a random schedule of
    // advancing end clocks, each advancing ≤ 24h so consecutive runs'
    // windows overlap (lookback=1 keeps the coverage gap-free — dbt's
    // scheduling contract); the final table must equal the plain
    // interval filter [begin, lastEnd) regardless of HOW the clocks
    // landed (mid-window partial batches re-healed, replays, etc.)
    val caseGen = for {
      n <- Gen.choose(5, 30)
      rows <- Gen.listOfN(n, for {
        day <- Gen.choose(1, 10)
        hour <- Gen.choose(0, 23)
      } yield (day, hour))
      steps <- Gen.choose(2, 4)
      advances <- Gen.listOfN(steps, Gen.choose(1, 24))
    } yield (rows, advances)

    sample(caseGen, 4, seed = 777L).zipWithIndex.foreach {
      case (((rows, advances)), i) =>
        val data = rows.zipWithIndex.map { case ((d, h), id) =>
          (id.toLong,
            java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00"))
        }
        val spec = PipelineSpec(Seq(Model("pmb", Nil,
          Materialization.IncrementalMicrobatch("ts", "day", "2024-01-01"),
          (sp, _) => { import sp.implicits._; data.toDF("id", "ts") })))
        val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
        java.nio.file.Files.createDirectories(base)
        val w = java.nio.file.Files.createTempDirectory(base, "pmb").toString
        val r = new PipelineRunner(spark, spec, w)
        var clock = java.time.LocalDateTime.parse("2024-01-02T06:00:00")
        advances.foreach { h =>
          clock = clock.plusHours(h.toLong)
          val res = r.run(Seq(s"run --event-time-end $clock"))
          assert(res.success, s"case $i: run at $clock failed")
        }
        val lastEnd = java.sql.Timestamp.valueOf(
          clock.format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss")))
        val got = r.readTable("pmb").select("id").as[Long]
          .collect().toSeq.sorted
        val want = data.filter(_._2.before(lastEnd)).map(_._1).sorted
        assert(got == want,
          s"case $i: advances=$advances lastEnd=$lastEnd")
    }
  }

  // ---- chunking covers every token exactly -----------------------------

  test("chunkSliding: random (size, stride, doc) — full coverage, " +
      "correct overlap, reassembly round-trips") {
    import graft.operators.Curation
    val gen = for {
      size <- Gen.choose(1, 10)
      stride <- Gen.choose(1, size)
      nTok <- Gen.choose(0, 40)
    } yield (size, stride, nTok)
    sample(gen, 8, 991L).foreach { case (size, stride, nTok) =>
      val text = (0 until nTok).map(i => s"w$i").mkString(" ")
      val chunks = Curation.chunkSliding(
        Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size, stride)
        .orderBy("chunk_id").collect()
      if (nTok == 0) assert(chunks.isEmpty)
      else {
        // starts are exactly the stride multiples below nTok
        val starts = chunks.map(_.getLong(2)).toSeq
        assert(starts == (0L until nTok.toLong by stride.toLong).toSeq,
          s"size=$size stride=$stride n=$nTok starts=$starts")
        // every token covered; adjacent chunks overlap by size−stride
        val covered = chunks.flatMap(c =>
          c.getLong(2) until (c.getLong(2) + c.getLong(3))).toSet
        assert(covered == (0L until nTok.toLong).toSet)
        // chunk text round-trips against the source tokens
        chunks.foreach { c =>
          val want = (c.getLong(2) until
            math.min(c.getLong(2) + size, nTok.toLong))
            .map(i => s"w$i").mkString(" ")
          assert(c.getString(4) == want)
        }
      }
    }
  }

  // ---- z-order interleave is a bijection on the quantized grid ---------

  test("ZOrder.interleave: random bit widths — bijective, " +
      "sql replay agrees, contiguous z-ranges stay spatially bounded") {
    import graft.operators.ZOrder
    val gen = Gen.choose(2, 6)
    sample(gen, 3, 313L).foreach { bits =>
      val n = 1 << bits
      val grid = (0L until (n.toLong * n)).map(i => (i / n, i % n))
        .toDF("x", "y")
      val zs = grid.select(
        ZOrder.interleave(Seq(col("x"), col("y")), bits).as("z"),
        expr(ZOrder.interleaveSql(Seq("x", "y"), bits)).as("z2"))
        .collect()
      assert(zs.forall(r => r.getLong(0) == r.getLong(1)),
        s"bits=$bits: sql replay diverged")
      val set = zs.map(_.getLong(0)).toSet
      assert(set.size == n * n && set.min == 0L &&
        set.max == (n.toLong * n) - 1, s"bits=$bits: not a bijection")
    }
  }

  // ---- MinHash estimate vs true Jaccard --------------------------------

  test("MinHash estimate tracks true shingle Jaccard on random docs") {
    val rnd = new scala.util.Random(7)
    def randDoc(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    // pairs: a base doc and a mutation sharing a long prefix
    val docs = (0 until 6).flatMap { i =>
      val base = randDoc(300)
      val mut = base.take(150 + rnd.nextInt(100)) + randDoc(80)
      Seq((2L * i, base), (2L * i + 1, mut))
    }
    def shingles(s: String) = s.sliding(5).toSet
    val est = Dedup.minHashNearDups(docs.toDF("doc_id", "text"),
      "doc_id", "text", k = 32, bands = 32, threshold = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    docs.grouped(2).foreach { case Seq((ia, ta), (ib, tb)) =>
      val truth = {
        val (sa, sb) = (shingles(ta), shingles(tb))
        sa.intersect(sb).size.toDouble / sa.union(sb).size
      }
      est.get((ia, ib)).foreach { e =>
        // k=32 ⇒ σ ≈ sqrt(j(1-j)/32) ≤ 0.09; 4σ ≈ 0.36 bound
        assert(math.abs(e - truth) < 0.36,
          s"pair ($ia,$ib): est=$e truth=$truth")
      }
    }
  }

  // ---- banded interval join ≡ quadratic reference ----------------------

  test("interval overlap join equals the quadratic reference on " +
    "random interval sets (exactly-once, any bucket width)") {
    val ivGen = for {
      n <- Gen.choose(1, 12)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0L, 5000L)
        len <- Gen.choose(1L, 900L)
      } yield (s, s + len))
    } yield rows.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
    def toDf(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("id", "ss", "es").select(col("id"),
        timestamp_seconds(col("ss")).as("s"),
        timestamp_seconds(col("es")).as("e"))
    sample(Gen.zip(ivGen, ivGen, Gen.oneOf(7L, 60L, 1000L)), 6, 4242L)
      .foreach { case (ls, rs, w) =>
        val got = graft.operators.IntervalJoin.overlapJoin(
            toDf(ls), toDf(rs), "id", "s", "e", "id", "s", "e",
            bucketSec = w)
          .as[(Long, Long)].collect().toSeq.sorted
        val want = (for {
          (il, sl, el) <- ls
          (ir, sr, er) <- rs
          if sl < er && sr < el
        } yield (il, ir)).sorted
        assert(got == want, s"w=$w\n got=$got\nwant=$want")
      }
  }
}
