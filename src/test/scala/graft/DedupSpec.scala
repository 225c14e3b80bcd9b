package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties for the hash-family dedup operators (SURVEY §5.3):
  * exact-dedup idempotence, MinHash estimate sanity, SimHash blocking
  * recall guarantee — the no-oracle keys' verification.
  */
class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("exact dedup groups case/whitespace variants and keeps min id") {
    val df = Seq(
      (1L, "Hello World"), (2L, "  hello world  "), (3L, "HELLO WORLD"),
      (4L, "something else")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text").collect()
    assert(out.length == 2)
    val big = out.find(_.getAs[Long]("n") == 3L).get
    assert(big.getAs[Long]("keep_id") == 1L)
  }

  test("exact dedup is idempotent") {
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val once = Dedup.exact(df, "doc_id", "text")
    val survivors = once.select(col("keep_id").as("doc_id"))
      .join(df, "doc_id")
    val twice = Dedup.exact(survivors, "doc_id", "text")
    assert(twice.count() == once.count())
    assert(twice.agg(max("n")).head.getLong(0) == 1L)
  }

  test("minhash: identical docs get est_sim 1.0 and are paired") {
    val text = "the quick brown fox jumps over the lazy dog repeatedly"
    val df = Seq((1L, text), (2L, text), (3L, "totally different content here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashNearDups(df, "doc_id", "text",
      k = 32, bands = 8, threshold = 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("a") == 1L && pairs.head.getAs[Long]("b") == 2L)
    assert(pairs.head.getAs[Double]("est_sim") == 1.0)
  }

  test("minhash: emits each candidate pair exactly once") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = (1L to 6L).map(i => (i, base + " suffix" + (i % 2)))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashNearDups(df, "doc_id", "text",
      k = 32, bands = 8, threshold = 0.1)
    val dup = pairs.groupBy("a", "b").count().filter(col("count") > 1)
    assert(dup.count() == 0)
    // pair ordering invariant
    assert(pairs.filter(col("a") >= col("b")).count() == 0)
  }

  test("minhash maxBucket star cap: same connected components, " +
      "linear pair count inside oversized buckets") {
    // 8 identical docs (one giant bucket in every band) + 2 singletons
    val big = "the same boilerplate page body repeated across the crawl"
    val df = ((1L to 8L).map(i => (i, big)) ++
      Seq((100L, "unique text one entirely"), (200L, "another unique doc")))
      .toDF("doc_id", "text")
    val full = Dedup.minHashNearDups(df, "doc_id", "text",
      k = 32, bands = 8, threshold = 0.0)
    val capped = Dedup.minHashNearDups(df, "doc_id", "text",
      k = 32, bands = 8, threshold = 0.0, maxBucket = 3)
    // star pairing bounds the blowup: 8 identical docs → 7 star pairs
    // instead of C(8,2)=28
    assert(full.count() == 28L)
    assert(capped.count() == 7L)
    assert(capped.filter(col("a") =!= 1L).count() == 0L) // all via min id
    // downstream clustering sees identical components
    val cf = Dedup.clusters(full.select("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cc = Dedup.clusters(capped.select("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cf == cc)
    // mixed regime: small buckets still enumerate all pairs
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val mixed = ((1L to 5L).map(i => (i, big)) ++
      Seq((10L, base + " tail0"), (11L, base + " tail0")))
      .toDF("doc_id", "text")
    val m = Dedup.minHashNearDups(mixed, "doc_id", "text",
      k = 32, bands = 8, threshold = 0.0, maxBucket = 3).collect()
    assert(m.exists(r => r.getLong(0) == 10L && r.getLong(1) == 11L))
  }

  test("record linkage: self-linkage ≡ near-dup pairs plus mirrors " +
      "and diagonal; cross-corpus finds identical docs") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota"
    val df = (1L to 6L).map(i => (i, base + " suffix" + (i % 2)))
      .toDF("doc_id", "text")
    val self = Dedup.minHashLinkage(df, df, "doc_id", "text",
      k = 32, bands = 8, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = Dedup.minHashNearDups(df, "doc_id", "text",
      k = 32, bands = 8, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // dedup pairs = linkage above the diagonal
    assert(pairs == self.filter { case (a, b) => a < b })
    // linkage is symmetric and reflexive on identical signatures
    assert(self.map(_.swap) == self)
    (1L to 6L).foreach(i => assert(self.contains((i, i))))
    // two disjoint corpora: the shared doc links across sides
    val leftC = Seq((1L, base + " left"), (2L, "completely other words"))
      .toDF("doc_id", "text")
    val rightC = Seq((10L, base + " left"), (11L, "unrelated content"))
      .toDF("doc_id", "text")
    val linked = Dedup.minHashLinkage(leftC, rightC, "doc_id", "text",
      k = 32, bands = 8, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getDouble(2))).toMap
    assert(linked.contains((1L, 10L)) && linked((1L, 10L)) == 1.0)
    assert(!linked.keySet.exists { case (a, b) => a == 2L || b == 11L })
  }

  test("minhash estimate tracks true Jaccard loosely") {
    // two docs sharing roughly half their shingles
    val shared = "aaaa bbbb cccc dddd eeee ffff gggg hhhh"
    val d1 = shared + " iiii jjjj kkkk llll"
    val d2 = shared + " mmmm nnnn oooo pppp"
    val df = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val pairs = Dedup.minHashNearDups(df, "doc_id", "text",
      k = 32, bands = 16, threshold = 0.0).collect()
    if (pairs.nonEmpty) { // banding may or may not surface the pair
      val est = pairs.head.getAs[Double]("est_sim")
      assert(est > 0.2 && est < 0.95, s"est_sim=$est far from ~0.5-0.7")
    }
  }

  test("simhash blocking recall: every pair within maxDist is found") {
    val maxDist = 7
    val rnd = new scala.util.Random(42)
    // pairs (2i, 2i+1): second = first with d<=maxDist bits flipped
    val rows = (0 until 50).flatMap { i =>
      val base = rnd.nextLong()
      val d = rnd.nextInt(maxDist + 1)
      val flipped = (0 until d)
        .map(_ => rnd.nextInt(64))
        .distinct // flipping the same bit twice would cancel
        .foldLeft(base)((v, b) => v ^ (1L << b))
      Seq((2L * i, base), (2L * i + 1, flipped))
    }
    val sigs = rows.toDF("doc_id", "simhash")
    val found = Dedup.simHashNearDups(sigs, "doc_id", maxDist)
      .select("a", "b").as[(Long, Long)].collect().toSet
    (0 until 50).foreach { i =>
      val (a, b) = (2L * i, 2L * i + 1)
      val dist = java.lang.Long.bitCount(rows(2 * i)._2 ^ rows(2 * i + 1)._2)
      assert(dist <= maxDist)
      assert(found.contains((a, b)),
        s"pair ($a,$b) at hamming distance $dist missed (recall violation)")
    }
  }

  test("simhash blocking never returns pairs beyond maxDist") {
    // two signatures at hamming distance 32 that still share chunk 0
    val a = 0L
    val b = 0xFFFFFFFF00000000L // top 32 bits differ, bottom chunk equal
    val sigs = Seq((1L, a), (2L, b)).toDF("doc_id", "simhash")
    assert(Dedup.simHashNearDups(sigs, "doc_id", maxDist = 7).count() == 0)
  }

  test("simhash emits no self-pairs and tolerates duplicate input " +
      "rows / one id under two near signatures") {
    // id 7 appears with TWO signatures one bit apart (a re-ingested
    // doc after a near-identical edit) and id 1's row is duplicated;
    // id 7's signatures sit far (>maxDist) from the id-1/2 group
    val far = 0xFFFF00000000F000L
    val sigs = Seq((1L, 10L), (1L, 10L), (7L, far), (7L, far ^ 1L),
      (2L, 10L)).toDF("doc_id", "simhash")
    val pairs = Dedup.simHashNearDups(sigs, "doc_id", maxDist = 7)
      .select("a", "b").as[(Long, Long)].collect().toSeq
    assert(pairs.forall { case (a, b) => a != b },
      s"self-pairs leaked: ${pairs.filter(p => p._1 == p._2)}")
    assert(pairs.toSet == Set((1L, 2L)), s"pairs wrong: $pairs")
  }

  test("simhash maxGroupPairs star cap: same connected components, " +
      "linear pair count on a template corpus") {
    // a pathological template corpus: signature S shared by 60 docs,
    // signature S^1 (one bit away) shared by 40 — exact emission is
    // C(60,2)+C(40,2)+60*40 = 1770+780+2400 pairs for one component
    val s = 0x0F0F0F0F0F0F0F0FL
    val rows = (0 until 60).map(i => (i.toLong, s)) ++
      (100 until 140).map(i => (i.toLong, s ^ 1L)) ++
      // a separate small near-pair component + a singleton
      Seq((500L, 0x7000000000000000L), (501L, 0x7000000000000001L),
        (900L, 0x123456789abcdefL))
    val sigs = rows.toDF("doc_id", "simhash")
    val exact = Dedup.simHashNearDups(sigs, "doc_id", maxDist = 7)
    val capped = Dedup.simHashNearDups(sigs, "doc_id", maxDist = 7,
      maxGroupPairs = Some(100L))
    val nExact = exact.count()
    val nCapped = capped.count()
    assert(nExact == 1770L + 780L + 2400L + 1L, s"exact count $nExact")
    // star cap: 59 + 39 edges for the two big groups, ONE rep pair
    // across them, and the small component's true pair
    assert(nCapped == 59L + 39L + 1L + 1L, s"capped count $nCapped")
    def comps(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    val (ce, cc) = (comps(exact), comps(capped))
    assert(ce.keySet == cc.keySet,
      "cap must not drop nodes from the pair graph")
    // identical partition into components (same label sets)
    assert(ce.groupBy(_._2).view.mapValues(_.keySet).toMap ==
      cc.groupBy(_._2).view.mapValues(_.keySet).toMap,
      "connected components must be preserved under the cap")
    // capped output still never self-pairs
    assert(capped.filter(col("a") === col("b")).count() == 0)
  }

  test("simhash signature is deterministic") {
    val df = Seq((1L, "some stable text about weather and climate"))
      .toDF("doc_id", "text")
    val s1 = Dedup.simHash(df, "doc_id", "text").head.getLong(1)
    val s2 = Dedup.simHash(df, "doc_id", "text").head.getLong(1)
    assert(s1 == s2)
  }

  test("clusters: min-label connected components over pair graph") {
    // components {1,2,3} (chain), {4,5}, and a long path {10..14}
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("a", "b")
    val out = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(4L) == 4L && out(5L) == 4L)
    assert((10L to 14L).forall(out(_) == 10L))
  }

  test("clusters: a custom lineage cut produces identical components") {
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("a", "b")
    val default = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    // a cache-based cut (what a caller might pass when neither local
    // nor durable checkpoint fits) must not change results
    val cached = Dedup.clusters(pairs, cut = df => df.cache())
      .as[(Long, Long)].collect().toMap
    assert(cached == default)
  }

  /** Sequential greedy reference: process docs in id order, keep a doc
    * iff it shares no band bucket with an already-kept doc.
    */
  private def seqGreedy(bandRows: Seq[(Long, Int, Long)]): Set[Long] = {
    val byDoc = bandRows.groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    val keptBuckets = scala.collection.mutable.Set.empty[(Int, Long)]
    val kept = scala.collection.mutable.Set.empty[Long]
    byDoc.keys.toSeq.sorted.foreach { id =>
      if (!byDoc(id).exists(keptBuckets)) {
        kept += id; keptBuckets ++= byDoc(id)
      }
    }
    kept.toSet
  }

  /** Random docs over a tiny vocab + explicit near-copies so band
    * collisions actually happen.
    */
  private def randomDocs(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val out = scala.collection.mutable.Buffer.empty[(Long, String)]
    (0 until n).foreach { i =>
      val d =
        if (i % 3 == 2) out(i - 1)._2 + " tail" + rnd.nextInt(2) // near-copy
        else Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      out += ((i.toLong, d))
    }
    out.toSeq
  }

  test("greedyKeep equals the sequential greedy reference") {
    for (seed <- Seq(1, 2, 3)) {
      val docs = randomDocs(seed, 30).toDF("doc_id", "text")
      val bands = Dedup.bandRows(docs, "doc_id", "text", k = 16, bands = 4)
      val collected = bands.as[(Long, Int, Long)].collect().toSeq
      val expected = seqGreedy(collected)
      val got = Dedup.greedyKeep(bands).as[Long].collect().toSet
      assert(got == expected, s"seed=$seed: got=$got expected=$expected")
    }
  }

  test("incremental dedup ≡ one-shot greedy over the union (property)") {
    for (seed <- Seq(11, 12)) {
      val all = randomDocs(seed, 30)
      val docs = all.toDF("doc_id", "text")
      val oneShot = Dedup.greedyKeep(
        Dedup.bandRows(docs, "doc_id", "text", k = 16, bands = 4))
        .as[Long].collect().toSet
      val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
      java.nio.file.Files.createDirectories(base)
      val wh = java.nio.file.Files.createTempDirectory(base, "dd").toString
      val r = new graft.pipeline.PipelineRunner(spark,
        graft.pipeline.PipelineSpec(Nil), wh)
      val split = 15L
      val b1 = docs.filter(col("doc_id") < split)
      val b2 = docs.filter(col("doc_id") >= split)
      val k1 = Dedup.dedupIncremental(r, "cb", b1, "doc_id", "text",
        batchId = 0L, k = 16, bands = 4).as[Long].collect().toSet
      val k2 = Dedup.dedupIncremental(r, "cb", b2, "doc_id", "text",
        batchId = 1L, k = 16, bands = 4).as[Long].collect().toSet
      assert(k1.union(k2) == oneShot,
        s"seed=$seed: incremental=${k1.union(k2)} oneShot=$oneShot")
      // the corpus state holds exactly the kept docs' bands
      val stored = r.readTable("cb").select("id").distinct()
        .as[Long].collect().toSet
      assert(stored == oneShot)
    }
  }

  test("lineDedup keeps globally-first occurrences and rebuilds docs") {
    val df = Seq(
      (1L, "alpha\nbeta\nalpha"), // within-doc repeat of alpha
      (2L, "beta\ngamma"),        // beta already seen in doc 1
      (3L, "alpha\nbeta")         // every line seen before
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, "doc_id", "text").orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 2L, "alpha\nbeta"),
      (2L, 2L, 1L, "gamma"),
      (3L, 2L, 0L, null)))
  }

  test("lineDedup ignores empty lines and is idempotent on survivors") {
    val df = Seq((1L, "a\n\n\nb"), (2L, "c\n\nb")).toDF("doc_id", "text")
    val once = Dedup.lineDedup(df, "doc_id", "text")
    assert(once.orderBy("doc_id").collect().map(_.getLong(1)).toSeq ==
      Seq(2L, 2L)) // blank lines never count
    val again = Dedup.lineDedup(
      once.filter(col("text").isNotNull).select("doc_id", "text"),
      "doc_id", "text")
    assert(again.agg(sum(col("n_lines") - col("n_kept"))).head.getLong(0) == 0L)
  }

  test("dupSpans merges overlapping duplicated grams into maximal spans") {
    // docs share the run "a b c d": with n=3 the starts 2,3 (doc 1)
    // overlap and must merge into one [2,5] span
    val df = Seq((1L, "x a b c d y"), (2L, "a b c d z w"))
      .toDF("doc_id", "text")
    val out = Dedup.dupSpans(df, "doc_id", "text", n = 3)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 2L, 5L, 4L, 2L),
      (2L, 1L, 4L, 4L, 2L)))
  }

  test("dupSpans splits on gaps, merges abutting coverage") {
    // "a b" and "c d" duplicated, "b x"/"b c" unique. In doc 1 the
    // coverages [1,2] and [4,5] have a gap → two spans; in doc 3 the
    // coverages [1,2] and [3,4] abut → one contiguous region
    val df = Seq(
      (1L, "a b x c d"),
      (2L, "a b y c d"),
      (3L, "a b c d"),
      (4L, "a b z c d")).toDF("doc_id", "text")
    val out = Dedup.dupSpans(df, "doc_id", "text", n = 2)
      .filter(col("doc_id").isin(1L, 3L))
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, 1L), (1L, 4L, 5L, 1L),
      (3L, 1L, 4L, 2L)))
  }

  test("dupSpans: docs shorter than n and unique docs yield no rows") {
    val df = Seq((1L, "a b"), (2L, "p q r s t"), (3L, "u v w x y"))
      .toDF("doc_id", "text")
    assert(Dedup.dupSpans(df, "doc_id", "text", n = 3).count() == 0L)
  }

  test("dupSpanRemove drops exactly the covered tokens, keeps the rest") {
    // same fixture as the merge test: doc 1 loses [2,5], doc 2 [1,4]
    val df = Seq((1L, "x a b c d y"), (2L, "a b c d z w"))
      .toDF("doc_id", "text")
    val out = Dedup.dupSpanRemove(df, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, 6L, 4L, "x y"), (2L, 6L, 4L, "z w")))
  }

  test("dupSpanRemove: unique docs pass through, full coverage → NULL") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "p q r s t"))
      .toDF("doc_id", "text")
    val out = Dedup.dupSpanRemove(df, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out(0).isNullAt(3) && out(0).getAs[Long]("n_removed") == 3L)
    assert(out(1).isNullAt(3))
    assert(out(2).getAs[Long]("n_removed") == 0L &&
      out(2).getAs[String]("text") == "p q r s t")
  }

  test("dupSpanRemove removal count ≡ dupSpans coverage on the corpus") {
    val docs = Tables.documents(spark, sf)
    val removed = Dedup.dupSpanRemove(docs, "doc_id", "text", n = 8)
      .select(col("doc_id"), col("n_removed"))
    val spanSum = Dedup.dupSpans(docs, "doc_id", "text", n = 8)
      .groupBy("doc_id").agg(sum("span_len").as("cov"))
    val bad = removed.join(spanSum, Seq("doc_id"), "left")
      .withColumn("cov", coalesce(col("cov"), lit(0L)))
      .filter(col("n_removed") =!= col("cov"))
    assert(bad.count() == 0L)
  }

  test("jaccardForPairs computes exact token-set jaccard") {
    val df = Seq((1L, "a b c d"), (2L, "c d e f")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = Dedup.jaccardForPairs(df, pairs, "doc_id", "text").head()
    assert(out.getAs[Long]("common") == 2L)
    assert(math.abs(out.getAs[Double]("jaccard") - 2.0 / 6.0) < 1e-12)
  }

  test("containmentForPairs: asymmetric, self-containment = 1, " +
    "sub-n-token docs drop") {
    // doc 1's grams: {a b c, b c d} — both appear in doc 2 (A ⊂ B,
    // cont_ab = 1.0 while cont_ba < 1); doc 3 has < 3 tokens → no
    // grams → its pair vanishes rather than emitting 0/0
    val df = Seq((1L, "a b c d"), (2L, "a b c d e f"), (3L, "x y"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 1L), (3L, 1L)).toDF("doc_a", "doc_b")
    val rows = Dedup.containmentForPairs(df, pairs, "doc_id", "text", n = 3)
      .collect().map(r =>
        (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap
    assert(rows.keySet == Set((1L, 2L), (1L, 1L)))
    val ab = rows((1L, 2L))
    assert(ab.getAs[Long]("common") == 2L && ab.getAs[Long]("n_a") == 2L)
    assert(ab.getAs[Double]("cont_ab") == 1.0)
    assert(math.abs(ab.getAs[Double]("cont_ba") - 2.0 / 4.0) < 1e-12)
    assert(rows((1L, 1L)).getAs[Double]("cont_ab") == 1.0)
  }

  test("wordNgrams: sliding windows, short docs yield empty arrays") {
    val rows = Seq((1L, "a b c d"), (2L, "x y"), (3L, "One, Two THREE!"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.wordNgrams(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) == Seq("a b c", "b c d"))
    assert(rows(2L).isEmpty) // fewer tokens than n — not a DOWN-sequence
    assert(rows(3L) == Seq("one two three")) // tokenizer lowercases/strips
  }

  test("decontaminate: n-gram overlap against a benchmark, broadcast plan") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "we saw the quick brown fox yesterday"), // 2 shared 3-grams
      (2L, "a completely different document here"),  // clean
      (3L, "quick brown fox jumps high"),            // 2 shared
      (4L, "fox the brown quick")                    // same words, no 3-gram
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, bench, "doc_id", "text", n = 3)
    val byId = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares "the quick brown" + "quick brown fox";
    // doc 3 shares "quick brown fox" + "brown fox jumps"
    assert(byId == Map(1L -> 2L, 3L -> 2L))
    // the benchmark side must broadcast — the corpus is never shuffled
    // into a sort-merge join at scale
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("decontaminateBloom ≡ decontaminate (no false negatives, FPs " +
      "killed by the confirm join) at loose and tight fpp") {
    for (seed <- Seq(41, 42); fpp <- Seq(0.5, 0.01)) {
      val docs = randomDocs(seed, 40).toDF("doc_id", "text")
      val bench = docs.filter(col("doc_id") % 5 === 0)
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val exact = Dedup.decontaminate(train, bench, "doc_id", "text", n = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val bloom = Dedup.decontaminateBloom(train, bench, "doc_id", "text",
        n = 2, fpp = fpp)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(bloom == exact, s"seed=$seed fpp=$fpp")
    }
    intercept[IllegalArgumentException] {
      Dedup.decontaminateBloom(
        Seq((1L, "a b c")).toDF("doc_id", "text"),
        Seq((2L, "a b c")).toDF("doc_id", "text"),
        "doc_id", "text", n = 2, fpp = 1.5)
    }
  }

  test("decontaminateBloom prefilter is a codegen'd scan-stage filter " +
      "ahead of the broadcast confirm join") {
    // parquet-backed fixture: over a local Seq relation the optimizer
    // would constant-fold the whole map-only prefilter away
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    val dir = java.nio.file.Files.createTempDirectory(base, "bloom").toString
    randomDocs(43, 30).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val out = Dedup.decontaminateBloom(
      docs.filter(col("doc_id") % 5 =!= 0),
      docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", n = 2)
    val plan = out.queryExecution.executedPlan.toString
    // the bloom membership test runs as a Filter expression (inside
    // whole-stage codegen), and the exact confirm is still a broadcast
    // join — the corpus is never shuffled by gram
    assert(plan.contains("graft_bloom_might_contain"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("incremental decontamination ≡ one-shot over any batch split") {
    for (seed <- Seq(21, 22)) {
      val docs = randomDocs(seed, 40).toDF("doc_id", "text")
      val bench = docs.filter(col("doc_id") % 5 === 0)
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val oneShot = Dedup.decontaminate(train, bench, "doc_id", "text", n = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
      java.nio.file.Files.createDirectories(base)
      val wh = java.nio.file.Files.createTempDirectory(base, "dc").toString
      val r = new graft.pipeline.PipelineRunner(spark,
        graft.pipeline.PipelineSpec(Nil), wh)
      // benchmark seeded in two batches (second anti-joins the first),
      // corpus checked in two batches — any split must reproduce the
      // one-shot result exactly
      val split = 20L
      Dedup.decontaminateIndex(r, "bg",
        bench.filter(col("doc_id") < split), "doc_id", "text", n = 2,
        batchId = 0L)
      Dedup.decontaminateIndex(r, "bg",
        bench.filter(col("doc_id") >= split), "doc_id", "text", n = 2,
        batchId = 1L)
      val inc = Seq(
        train.filter(col("doc_id") < split),
        train.filter(col("doc_id") >= split))
        .zipWithIndex
        .flatMap { case (b, _) =>
          Dedup.decontaminateIncremental(r, "bg", b, "doc_id", "text", n = 2)
            .collect().map(row => row.getLong(0) -> row.getLong(1))
        }.toMap
      assert(inc == oneShot, s"seed=$seed: inc=$inc oneShot=$oneShot")
      // the gram table is a SET: re-seeding batch 0's benchmark docs
      // under a new batch id appends zero rows
      assert(Dedup.decontaminateIndex(r, "bg",
        bench.filter(col("doc_id") < split), "doc_id", "text", n = 2,
        batchId = 2L) == 0L)
    }
  }

  test("gram table is format-stamped; mismatched tables fail loudly") {
    val docs = randomDocs(31, 10).toDF("doc_id", "text")
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    val wh = java.nio.file.Files.createTempDirectory(base, "gf").toString
    val r = new graft.pipeline.PipelineRunner(spark,
      graft.pipeline.PipelineSpec(Nil), wh)
    Dedup.decontaminateIndex(r, "gt", docs, "doc_id", "text", n = 2,
      batchId = 0L)
    // stamped on create, carried across a subsequent append
    assert(r.tableSidecar("gt", "gramhash_format")
      .contains(Dedup.GramHashFormatVersion))
    Dedup.decontaminateIndex(r, "gt", docs.filter(col("doc_id") < 5),
      "doc_id", "text", n = 2, batchId = 1L)
    assert(r.tableSidecar("gt", "gramhash_format")
      .contains(Dedup.GramHashFormatVersion))
    // an UNSTAMPED table (written by the pre-versioning string-hash
    // build) must be rejected by both the reader and the extender —
    // a silent read would report zero contamination
    r.appendBatch("legacy", docs.select(col("doc_id").as("gh")), 0L)
    val e1 = intercept[IllegalArgumentException] {
      Dedup.decontaminateIncremental(r, "legacy", docs, "doc_id", "text",
        n = 2).collect()
    }
    assert(e1.getMessage.contains("unstamped"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.decontaminateIndex(r, "legacy", docs, "doc_id", "text", n = 2,
        batchId = 1L)
    }
    assert(e2.getMessage.contains("rebuild"), e2.getMessage)
    // the escape hatch the error names: drop clears the table AND its
    // metadata (stamp, stream ledger), then a rebuild re-stamps and
    // re-accepts batch ids from zero
    r.dropTable("legacy")
    assert(!r.tableExists("legacy"))
    assert(Dedup.decontaminateIndex(r, "legacy", docs, "doc_id", "text",
      n = 2, batchId = 0L) > 0L, "post-drop batch 0 must not replay-skip")
    assert(r.tableSidecar("legacy", "gramhash_format")
      .contains(Dedup.GramHashFormatVersion))
    Dedup.decontaminateIncremental(r, "legacy", docs, "doc_id", "text",
      n = 2).collect() // reader accepts the rebuilt table
  }

  test("inverted index: batch-split appends ≡ one-shot postings, " +
      "replay no-ops, term filter pushes into the postings scan") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = randomDocs(31, 40).toDF("doc_id", "text")
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    def build(splits: Seq[org.apache.spark.sql.DataFrame]) = {
      val wh = java.nio.file.Files.createTempDirectory(base, "inv").toString
      val r = new graft.pipeline.PipelineRunner(spark,
        graft.pipeline.PipelineSpec(Nil), wh)
      splits.zipWithIndex.foreach { case (b, i) =>
        TextAnalysis.invertedIndexAppend(r, "p", b, "doc_id", "text",
          i.toLong): Unit
      }
      r
    }
    val rOne = build(Seq(docs))
    val rTwo = build(Seq(docs.filter(col("doc_id") < 20),
      docs.filter(col("doc_id") >= 20)))
    def postings(r: graft.pipeline.PipelineRunner) =
      r.readTable("p").select("term", "doc_id").collect()
        .map(x => (x.getString(0), x.getLong(1))).toSet
    assert(postings(rOne) == postings(rTwo),
      "any batch split must build the same posting set")
    // replayed batch appends nothing under its original id
    assert(TextAnalysis.invertedIndexAppend(rTwo, "p",
      docs.filter(col("doc_id") < 20), "doc_id", "text", 0L) == 0L)
    // AND-search equals a direct predicate over the docs
    val hits = TextAnalysis.invertedIndexSearch(rTwo, "p",
      Seq("alpha", "beta")).collect().map(_.getLong(0)).toSet
    val want = docs.collect().collect {
      case row if {
        val t = row.getString(1).split("[^a-z0-9]+").toSet
        t.contains("alpha") && t.contains("beta")
      } => row.getLong(0)
    }.toSet
    assert(hits == want && hits.nonEmpty, s"$hits vs $want")
    // the term predicate reaches the parquet scan of the postings
    val plan = TextAnalysis.invertedIndexSearch(rTwo, "p",
      Seq("alpha", "beta")).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term, [alpha,beta])]") ||
      plan.contains("In(term"), plan.take(2000))
  }
}
