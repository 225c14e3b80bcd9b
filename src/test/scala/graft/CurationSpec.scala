package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation operators (SURVEY §2.12 additions): deterministic
  * hash-routed splits/shards, mixture rates, normalization,
  * length histograms.
  */
class CurationSpec extends AnyFunSuite with SparkTestBase {

  private def docs = Tables.documents(spark, sf)

  test("holdoutSplit: hash-routed, stable under corpus growth") {
    val full = Curation.holdoutSplit(docs.select("doc_id"), "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // membership is a pure function of the id: a SUBSET corpus (the
    // pipeline before new data arrived) assigns identically — the
    // anti-contamination property row sampling does not have
    val subset = Curation.holdoutSplit(
      docs.filter(col("doc_id") % 3 === 0).select("doc_id"), "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.foreach { case (id, s) => assert(full(id) == s) }
    // buckets land in [0,100) and labels follow the thresholds
    val rows = Curation.holdoutSplit(docs.select("doc_id"), "doc_id")
      .collect()
    rows.foreach { r =>
      val b = r.getAs[Long]("split_bucket")
      assert(b >= 0 && b < 100)
      val want = if (b < 90) "train" else if (b < 95) "val" else "test"
      assert(r.getAs[String]("split") == want)
    }
    // md5 is uniform enough that 500 docs put train near 90%
    val train = rows.count(_.getAs[String]("split") == "train").toDouble
    assert(train / rows.length > 0.8 && train / rows.length < 0.98,
      s"train fraction ${train / rows.length}")
  }

  test("shardAssign: every shard populated, assignment deterministic") {
    val a = Curation.shardAssign(docs.select("doc_id"), "doc_id", 8)
      .collect().map(r =>
        r.getLong(0) -> (r.getAs[Long]("shard"),
          r.getAs[Long]("shard_order"))).toMap
    val b = Curation.shardAssign(docs.select("doc_id"), "doc_id", 8)
      .collect().map(r =>
        r.getLong(0) -> (r.getAs[Long]("shard"),
          r.getAs[Long]("shard_order"))).toMap
    assert(a == b, "assignment must be deterministic across runs")
    assert(a.values.forall { case (s, _) => s >= 0 && s < 8 })
    assert(a.values.map(_._1).toSet.size == 8,
      "500 uniform docs must touch all 8 shards")
    // split and shard hashes are salted apart: shard must not be a
    // function of the split bucket (correlation breaks stratification)
    val split = Curation.holdoutSplit(docs.select("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("split_bucket") % 8)
      .toMap
    assert(a.exists { case (id, (s, _)) => split(id) != s },
      "salts must decorrelate shard from split")
  }

  test("holdoutSplit and shardAssign plan no exchange (map-only)") {
    for (df <- Seq(
      Curation.holdoutSplit(docs.select("doc_id"), "doc_id"),
      Curation.shardAssign(docs.select("doc_id"), "doc_id", 8))) {
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
      assert(exchanges.isEmpty,
        s"routing must be map-only: ${exchanges.map(_.nodeName)}")
    }
  }

  test("mixtureRates uniform: binding domain at 1.0, rate=min/tokens") {
    val rows = Curation.mixtureRates(docs, "source", "text").collect()
    val tokens = rows.map(r =>
      r.getAs[String]("domain") -> r.getAs[Long]("n_tokens")).toMap
    val minTok = tokens.values.min
    rows.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate > 0 && rate <= 1.0 + 1e-12, s"rate out of range: $r")
      val expect = minTok.toDouble / tokens(r.getAs[String]("domain"))
      assert(math.abs(rate - expect) < 1e-9, s"$r expected $expect")
    }
    assert(rows.exists(r => r.getAs[Double]("rate") == 1.0),
      "the smallest domain must keep everything")
  }

  test("mixtureRates explicit targets: sampled mass hits the mixture") {
    val targets = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val rows = Curation.mixtureRates(docs, "source", "text", Some(targets))
      .collect()
    assert(rows.map(_.getAs[String]("domain")).toSet == targets.keySet,
      "domains absent from the target mixture are dropped")
    val sampled = rows.map(r => r.getAs[String]("domain") ->
      r.getAs[Double]("rate") * r.getAs[Long]("n_tokens")).toMap
    val total = sampled.values.sum
    targets.foreach { case (d, share) =>
      assert(math.abs(sampled(d) / total - share / targets.values.sum)
        < 1e-9, s"$d share ${sampled(d) / total}")
    }
    assert(rows.map(_.getAs[Double]("rate")).max > 1.0 - 1e-12,
      "the binding domain must keep (essentially) everything")
  }

  test("langIdNgram: recovers labels on trigram-separable languages, " +
      "deterministic, missing-gram penalty bounded") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // two synthetic "languages" with disjoint character inventories —
    // profiles must separate them perfectly
    val aa = Seq("abba abab baba", "abab abba bbaa", "aabb abab")
    val zz = Seq("zyzzy zyzy yzzy", "zyzy yzyz zzyy", "yyzz zyzy")
    val docs = (aa.map(("aa", _)) ++ zz.map(("zz", _))).zipWithIndex
      .map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langIdNgram(docs, "doc_id", "lang", "text",
      topP = 10).collect()
    val truth = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(r.getAs[String]("pred_lang") == truth(r.getAs[Long]("doc_id")),
        s"misclassified: $r")
      // distance never exceeds nGrams · penalty
      assert(r.getAs[Long]("dist") >= 0)
    }
    assert(out.length == docs.count(), "every doc with grams classified")
    val again = TextAnalysis.langIdNgram(docs, "doc_id", "lang", "text",
      topP = 10).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getString(1))).toSet)
    // sub-3-char docs produce no grams and drop out (both engines)
    val short = Seq((99L, "aa", "ab")).toDF("doc_id", "lang", "text")
    assert(TextAnalysis.langIdNgram(docs.union(short), "doc_id", "lang",
      "text", topP = 10).filter(col("doc_id") === 99L).count() == 0)
  }

  test("graft_trigram_counts ≡ explode+count of sliding 3-char " +
      "windows (the shape langIdNgram replaced), incl. short/empty " +
      "strings and repeats") {
    import spark.implicits._
    graft.functions.TextSignatures.register(spark)
    val texts = Seq("abba abab baba", "aaaa", "ab", "", "a b c d",
      "zz zz zz", "0123456789 0123")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "nt")
    val viaKernel = df.select(col("id"),
      explode(graft.functions.TextSignatures.trigramCounts(col("nt")))
        .as("gn"))
      .select(col("id"), col("gn.g").as("g"), col("gn.n").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val viaExplode = df.select(col("id"),
      explode(when(length(col("nt")) < 3, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(col("nt")) - 2),
          i => col("nt").substr(i, lit(3))))).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(viaKernel == viaExplode)
  }

  test("graft_dsir_buckets ≡ conv(substring(md5(f),1,8),16,10) % k " +
      "over unigrams+bigrams (the expression dsirFeatures replaced), " +
      "incl. empty and 1-token docs") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    graft.functions.TextSignatures.register(spark)
    val texts = Seq("the quick brown fox", "a", "", "x y",
      "repeat repeat repeat", "0 1 22 333 4444")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.tokens(col("text")).as("tk"))
    val k = 1024
    val viaKernel = df.select(col("id"),
      graft.functions.TextSignatures.dsirBuckets(col("tk"), k).as("b"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val bi = when(size(col("tk")) >= 2,
      transform(sequence(lit(1), size(col("tk")) - 1),
        i => concat_ws(" ", slice(col("tk"), i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val viaExpr = df.select(col("id"),
      transform(concat(col("tk"), bi),
        f => conv(substring(md5(f), 1, 8), 16, 10)
          .cast("long") % k).as("b"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(viaKernel == viaExpr)
  }

  test("temperatureRates: sqrt-weights upweight low-resource domains") {
    import spark.implicits._
    val df = Seq(
      ("small", Seq.fill(100)("w").mkString(" ")),
      ("big", Seq.fill(10000)("w").mkString(" ")))
      .toDF("source", "text")
    val rows = Curation.temperatureRates(df, "source", "text")
      .collect().map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("weight_q"),
          r.getAs[Long]("rate_ppm"))).toMap
    // exact sqrt quantization: √100·1e6 = 10_000_000, √10000·1e6 = 1e8
    assert(rows("small")._2 == 10000000L)
    assert(rows("big")._2 == 100000000L)
    // raw share of small = 100/10100 ≈ 0.99%; α=0.5 share = 1/11 ≈ 9%
    assert(rows("small")._3 == 10000000L * 1000000L / 110000000L)
    val rawShare = 100.0 / 10100.0
    assert(rows("small")._3 / 1e6 > 5 * rawShare,
      "temperature smoothing must upweight the small domain")
  }

  test("unimaxAllocation: exact walk on a hand-checked fixture") {
    import spark.implicits._
    // tokens: a=10, b=100, c=100. N=2, B=210/2=105. Ascending walk:
    //   a: fair=105/3=35, cap=2·10=20  → 20, remaining 85
    //   b: fair= 85/2=42, cap=200      → 42, remaining 43
    //   c: fair= 43/1=43, cap=200      → 43
    val df = Seq(
      ("a", Seq.fill(10)("w").mkString(" ")),
      ("b", Seq.fill(100)("w").mkString(" ")),
      ("c", Seq.fill(100)("w").mkString(" ")))
      .toDF("lang", "text")
    val rows = Curation.unimaxAllocation(df, "lang", "text", maxEpochs = 2)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("alloc_tokens"), r.getAs[Long]("epochs_ppm"),
          r.getAs[Long]("rate_ppm"))).toMap
    assert(rows("a") == ((20L, 2000000L, 20L * 1000000 / 105)))
    assert(rows("b") == ((42L, 420000L, 42L * 1000000 / 105)))
    assert(rows("c") == ((43L, 430000L, 43L * 1000000 / 105)))
  }

  test("unimaxAllocation: epoch cap and budget invariants on testdata") {
    val rows = Curation.unimaxAllocation(docs, "lang", "text", maxEpochs = 3)
      .collect()
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val realized = rows.map(_.getAs[Long]("alloc_tokens")).sum
    assert(realized <= totalTokens / 2, "allocation must respect the budget")
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc_tokens") <= 3 * r.getAs[Long]("n_tokens"),
        s"epoch cap violated: $r")
      assert(r.getAs[Long]("epochs_ppm") <= 3000000L)
    }
    // UniMax's point: no language oversamples past the cap, and the
    // budget that low-resource languages leave behind spreads over
    // the rest — with 5 same-order-of-magnitude languages at B=T/2
    // nothing should hit the cap and allocations should be near-equal
    // (floor-division drift only)
    val allocs = rows.map(_.getAs[Long]("alloc_tokens"))
    if (rows.forall(r =>
        r.getAs[Long]("alloc_tokens") < 3 * r.getAs[Long]("n_tokens"))) {
      assert(allocs.max - allocs.min <= rows.length,
        s"uncapped languages must share equally: ${allocs.toSeq}")
    }
    // deterministic across runs
    val again = Curation.unimaxAllocation(docs, "lang", "text", maxEpochs = 3)
      .collect().map(_.getAs[Long]("alloc_tokens"))
    assert(allocs.toSeq == again.toSeq)
  }

  test("mixtureRates: a zero-token domain cannot zero the budget") {
    import spark.implicits._
    val df = Seq(
      ("a", "alpha words here"), ("a", "more alpha text"),
      ("b", "beta corpus line"),
      ("z", "!!! ... ???")) // tokenizes empty under [a-z0-9]
      .toDF("source", "text")
    val rows = Curation.mixtureRates(df, "source", "text").collect()
    assert(rows.map(_.getAs[String]("domain")).toSet == Set("a", "b"),
      "token-less domains hold no mixable mass and must drop out")
    assert(rows.forall(r => r.getAs[Double]("rate") > 0),
      s"a degenerate domain must not zero real domains: ${rows.toSeq}")
    assert(rows.exists(r => r.getAs[Double]("rate") == 1.0))
  }

  test("mixtureSample: deterministic, rate-faithful hash sampling") {
    val kept = Curation.mixtureSample(docs, "source", "text", "doc_id")
    val again = Curation.mixtureSample(docs, "source", "text", "doc_id")
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == again.select("doc_id").collect().map(_.getLong(0)).toSet,
      "hash routing must be deterministic across runs")
    assert(ids.nonEmpty && ids.size < docs.count(),
      "a non-uniform corpus must be downsampled somewhere")
    // per-domain keep fraction tracks the computed rate (hash-uniform
    // Bernoulli over ~25 docs/domain: loose tolerance)
    val rates = Curation.mixtureRates(docs, "source", "text")
      .select("domain", "rate").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val keptBySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totBySrc = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rates.foreach { case (src, rate) =>
      val frac = keptBySrc.getOrElse(src, 0L).toDouble / totBySrc(src)
      assert(math.abs(frac - rate) < 0.35,
        s"$src kept $frac but rate is $rate")
    }
  }

  test("normalize is idempotent and canonicalizes") {
    import spark.implicits._
    val cases = Seq(
      "  Hello,   WORLD!  " -> "hello world",
      "a--b__c" -> "a b c",
      "" -> "")
    val got = cases.map(_._1).toDF("text")
      .select(Curation.normalize(col("text")).as("n"))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2))
    // idempotence over the real corpus
    val twice = docs.select(
      Curation.normalize(col("text")).as("once"),
      Curation.normalize(Curation.normalize(col("text"))).as("twice"))
      .filter(col("once") =!= col("twice")).count()
    assert(twice == 0L)
  }

  test("curation pipeline: dedup's fp agg is the only corpus shuffle") {
    val p = SparkEntry.queries("llm_curation_pipeline")(spark, sf)
      .queryExecution.executedPlan.toString
    // one hash exchange for the fp dedup agg + the output orderBy's
    // range exchange (verify protocol) — filter/normalize/split/shard
    // must all stay map-side
    val hash = "Exchange hashpartitioning".r.findAllIn(p).size
    val range = "Exchange rangepartitioning".r.findAllIn(p).size
    assert(hash == 1 && range == 1,
      s"expected 1 hash + 1 range exchange, got $hash/$range:\n" +
        p.take(3000))
    assert(p.split("Exchange hashpartitioning").last.take(20).contains("fp"),
      "dedup must shuffle on fp")
  }

  test("quality classifier learns its weak teacher; scoring is map-only") {
    import graft.operators.{QualityClassifier, TextAnalysis}
    val labeled = docs.withColumn("label",
      TextAnalysis.gopherReason(
        TextAnalysis.gopherNWords(col("text")),
        TextAnalysis.gopherMeanWlen(col("text")),
        TextAnalysis.gopherStopCount(col("text"))) === "pass")
    val w = QualityClassifier.train(labeled, "text", "label")
    assert(w.coefficients.exists(_ != 0.0), "degenerate fit")
    val scored = QualityClassifier.score(labeled, "text", w)
      .select(col("doc_id"), col("label"),
        (col("quality_prob") > 0.5).as("pred"))
      .collect()
    // the features embed the teacher's signals, so the LR must
    // reproduce the rule on a large majority of the corpus
    val agree = scored.count(r =>
      r.getAs[Boolean]("label") == r.getAs[Boolean]("pred")).toDouble
    assert(agree / scored.length > 0.85,
      s"classifier agrees on only ${agree / scored.length}")
    assert(scored.exists(_.getAs[Boolean]("pred")) &&
      scored.exists(!_.getAs[Boolean]("pred")),
      "must not collapse to a constant prediction")
    // scoring is a single codegen'd projection: no exchange, no
    // ML-runtime nodes in the plan
    val plan = QualityClassifier.score(docs, "text", w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("lengthHistogram partitions the corpus exactly") {
    val rows = Curation.lengthHistogram(docs, "text", "source").collect()
    val caps = Set(16L, 32L, 64L, 128L, 256L, 512L, Long.MaxValue)
    rows.foreach(r => assert(caps.contains(r.getAs[Long]("len_cap"))))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count(),
      "every doc lands in exactly one bucket")
  }

  test("c4Filter applies every C4 rule with fixed reason precedence") {
    import spark.implicits._
    val good = "this line has five good words.\nanother line of five words!\na third line of words?"
    val df = Seq(
      (1L, good),                                       // survives
      (2L, good + "\nLorem Ipsum dolor sit amet."),     // bad word
      (3L, good + "\nfunction() { return 1; }"),        // brace
      (4L, "only two good lines here now.\nso the doc cannot survive."),
      (5L, "no terminal punctuation on this line\n" + good), // line dropped, doc ok
      (6L, "short line.\n" + good)                      // <5 words line dropped
    ).toDF("doc_id", "text")
    val out = Curation.c4Filter(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, true, "kept"),
      (2L, 4L, 4L, false, "bad_word"),
      (3L, 4L, 3L, false, "brace"),
      (4L, 2L, 2L, false, "too_few_lines"),
      (5L, 4L, 3L, true, "kept"),
      (6L, 4L, 3L, true, "kept")))
    // surviving text contains only the lines that passed
    val t5 = Curation.c4Filter(df, "doc_id", "text")
      .filter(col("doc_id") === 5L).head.getAs[String]("text")
    assert(t5 == good)
  }

  test("c4Filter: empty doc yields NULL text; rules can be disabled") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "brace { but allowed here ok."))
      .toDF("doc_id", "text")
    val out = Curation.c4Filter(df, "doc_id", "text",
      dropBraces = false, minLines = 1).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text") == null)
    assert(!out(0).getAs[Boolean]("keep") &&
      out(0).getAs[String]("reason") == "too_few_lines")
    assert(out(1).getAs[Boolean]("keep"))
  }

  test("dsirWeights: target ≡ raw collapses every log-weight to zero") {
    // when the target predicate admits everything, p_target = p_raw
    // bucket-for-bucket and the smoothed log-ratio is exactly 0
    val w = Curation.dsirWeights(docs, "text", lit(true), k = 64)
      .collect()
    assert(w.nonEmpty)
    w.foreach { r =>
      assert(r.getAs[Long]("n_target") == r.getAs[Long]("n_raw"))
      assert(r.getAs[Long]("logw_q") == 0L)
    }
  }

  test("dsirScore separates disjoint-vocabulary domains") {
    import spark.implicits._
    val a = (1 to 40).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta", "tgt"))
    val b = (41 to 80).map(i =>
      (i.toLong, "uno dos tres cuatro cinco seis", "other"))
    val df = (a ++ b).toDF("doc_id", "text", "dom")
    val s = Curation.dsirScore(df, "doc_id", "text",
        col("dom") === "tgt", k = 256)
      .join(df.select("doc_id", "dom"), "doc_id").collect()
    val ts = s.filter(_.getAs[String]("dom") == "tgt")
      .map(_.getAs[Long]("dsir_logw_q"))
    val os = s.filter(_.getAs[String]("dom") == "other")
      .map(_.getAs[Long]("dsir_logw_q"))
    // the importance weight must rank every target-profile doc above
    // every off-target doc, with the right signs
    assert(ts.min > os.max)
    assert(ts.min > 0L && os.max < 0L)
  }

  test("dsirScore plan: weight table broadcast, per-doc agg partial") {
    val plan = Curation.dsirScore(docs, "doc_id", "text",
      col("lang") === "en", k = 64).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "k-row weight table must broadcast:\n" + plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("perplexityBuckets: corpus-frequency drives the tercile order") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // 9 docs, one language: three all-common, three mixed, three of
    // unique tokens — mean NLL orders them head < middle < tail
    val common = (1 to 3).map(i =>
      (i.toLong, "ord ord ord ord ord ord", "xx"))
    val mixed = (4 to 6).map(i =>
      (i.toLong, s"ord ord ord mid$i mid$i mid$i", "xx"))
    val rare = (7 to 9).map(i =>
      (i.toLong, s"r${i}a r${i}b r${i}c r${i}d r${i}e r${i}f", "xx"))
    val df = (common ++ mixed ++ rare).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.perplexityBuckets(df, "doc_id", "text", "lang")
      .orderBy("doc_id").collect()
    val buckets = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("ppl_bucket")).toMap
    (1L to 3L).foreach(i => assert(buckets(i) == "head", s"doc $i"))
    (4L to 6L).foreach(i => assert(buckets(i) == "middle", s"doc $i"))
    (7L to 9L).foreach(i => assert(buckets(i) == "tail", s"doc $i"))
    // quantized unigram logprob matches the closed form
    val lp = TextAnalysis.unigramLogProbs(df, "text")
      .filter(col("token") === "ord").head()
    val total = 3 * 6 + 3 * 6 + 3 * 6 // 54 tokens overall
    val want = math.round(math.log(lp.getAs[Long]("cnt").toDouble / total) * 1e6)
    assert(lp.getAs[Long]("lp_q") == want)
  }

  test("bigramNll: add-one-smoothed bigram NLL matches the closed form") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // corpus: "a b a b", "a b c", "z"; vocab {a,b,c,z} → V=4
    // bigrams: doc1: (a,b),(b,a),(a,b)  doc2: (a,b),(b,c)
    // c(a,b)=3, c(b,a)=1, c(b,c)=1 ; c(a·)=3, c(b·)=2
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramNll(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    def lpq(c: Long, cn: Long) =
      math.round(math.log((c + 1.0) / (cn + 4.0)) * 1e6)
    val pAB = lpq(3, 3); val pBA = lpq(1, 2); val pBC = lpq(1, 2)
    assert(out.length == 2) // single-token doc 3 drops out
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 3L)
    assert(out(0).getLong(2) == -(pAB + pBA + pAB))
    assert(out(1).getLong(0) == 2L && out(1).getLong(1) == 2L)
    assert(out(1).getLong(2) == -(pAB + pBC))
    // smoothing: every NLL is strictly positive (probs < 1)
    assert(out.forall(_.getLong(2) > 0))
  }

  test("perplexityBuckets: terciles are per-language and exhaustive") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val out = TextAnalysis.perplexityBuckets(docs, "doc_id", "text", "lang")
    val n = out.count()
    assert(n > 0 && n <= docs.count()) // token-less docs drop out
    // per language, bucket sizes differ by at most 1 (ntile(3))
    val sizes = out.groupBy("lang", "ppl_bucket").count()
      .collect().groupBy(_.getString(0))
    sizes.foreach { case (lang, rows) =>
      assert(rows.length == 3 || rows.map(_.getLong(2)).sum < 3,
        s"$lang missing a bucket")
      val cs = rows.map(_.getLong(2))
      assert(cs.max - cs.min <= 1, s"$lang unbalanced: ${cs.toSeq}")
    }
  }

  test("c4Filter is map-only (no exchange in the plan)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Curation.c4Filter(docs, "doc_id", "text",
        sepRegex = " ", requireTerminalPunct = false)
        .queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
      assert(exchanges.isEmpty, plan.toString.take(2000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("tokenEntropy: uniform doc = ln(n_distinct), constant doc = 0, " +
      "token-less docs drop") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d"),     // 4 distinct, uniform → ln 4
      (2L, "a a a a a"),   // constant → 0
      (3L, "...!!!")       // tokenizes empty → dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(math.abs(got(0).getDouble(3) - math.log(4)) < 1e-5)
    assert(got(0).getLong(1) == 4 && got(0).getLong(2) == 4)
    assert(got(1).getDouble(3) == 0.0 && got(1).getLong(2) == 1)
  }

  test("repetitionNgrams: fully repeated text maxes both signals; " +
      "all-distinct grams zero the dup fraction") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val df = Seq(
      (1L, "x y x y x y x y"), // 2-grams: "x y"×4,"y x"×3 → top 4/7;
                               // 3-grams: 2 distinct over 6 → dup 4/6
      (2L, "a b c d e"),       // all grams distinct → dup 0
      (3L, "p q")              // one 2-gram, no 3-gram → NULL dup
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionNgrams(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(math.abs(got(0).getDouble(1) - 4.0 / 7) < 1e-9)
    assert(math.abs(got(0).getDouble(2) - 4.0 / 6) < 1e-9)
    assert(got(1).getDouble(2) == 0.0)
    assert(math.abs(got(1).getDouble(1) - 1.0 / 4) < 1e-9)
    assert(got(2).getDouble(1) == 1.0 && got(2).isNullAt(2))
  }

  test("ngramTopK: counts occurrences and doc frequency, ranks with " +
      "gram tie-break") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val df = Seq(
      (1L, "a b c a b c"),  // "a b c"×2, "b c a"×1
      (2L, "a b c z z z")   // "a b c"×1, "c z z", "z z z", "b c z"
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramTopK(df, "doc_id", "text", n = 3, k = 3)
      .orderBy("rank").collect()
    assert(got(0).getString(1) == "a b c")
    assert(got(0).getLong(2) == 3 && got(0).getLong(3) == 2)
    assert(got(1).getLong(2) == 1) // ties at 1 occurrence, gram order
    assert(got(1).getString(1) < got(2).getString(1))
  }

  test("dsirResample: deterministic Gumbel-top-k, importance-weighted " +
      "toward target-like docs") {
    import spark.implicits._
    // disjoint vocabularies; the target predicate marks domain A —
    // A-looking docs carry positive log-weights and dominate the draw
    val rows = (0L until 100L).map(i => (i, s"alpha beta gamma delta a$i")) ++
      (100L until 200L).map(i => (i, s"omega psi chi phi b$i"))
    val df = rows.toDF("doc_id", "text")
    val pick = Curation.dsirResample(df, "doc_id", "text",
      col("doc_id") < 100, k = 64, keep = 50)
    val ids = pick.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.size == 50)
    val again = Curation.dsirResample(df, "doc_id", "text",
      col("doc_id") < 100, k = 64, keep = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == again, "the draw must be deterministic")
    val fromA = ids.count(_ < 100L)
    assert(fromA >= 40, s"importance weighting must favor A: $fromA/50")
    // but it IS a sample, not a top-k by score: with equal weights
    // the gumbel keys decide, and both domains appear
    val uniform = Curation.dsirResample(df, "doc_id", "text",
      lit(true), k = 64, keep = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(uniform.exists(_ < 100L) && uniform.exists(_ >= 100L),
      "degenerate target (everything) ⇒ near-uniform draw across domains")
  }

  test("chunkSliding: overlap, boundaries, tails, and empty docs") {
    import graft.operators.Curation
    import spark.implicits._
    val df = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"), // 7 toks, size 4 stride 2 → 4 chunks
      (2L, "a b"),                  // shorter than one chunk → 1 chunk
      (3L, "...")                   // tokenizes empty → no chunks
    ).toDF("doc_id", "text")
    val got = Curation.chunkSliding(df, "doc_id", "text", 4, 2)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 2L, 4L, "t2 t3 t4 t5"),
      (1L, 2L, 4L, 3L, "t4 t5 t6"),
      (1L, 3L, 6L, 1L, "t6"),
      (2L, 0L, 0L, 2L, "a b")))
    // consecutive chunks overlap by chunkSize − stride tokens, and
    // every token of doc 1 appears in at least one chunk
    val covered = got.filter(_._1 == 1L)
      .flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (0L until 7L).toSet)
    intercept[IllegalArgumentException] {
      Curation.chunkSliding(df, "doc_id", "text", 4, 5) // stride > size
    }
  }

  test("chunkSliding is map-only: no exchange anywhere in the plan") {
    import graft.operators.Curation
    val out = Curation.chunkSliding(docs, "doc_id", "text", 8, 6)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("winnowFingerprints: the winnowing guarantee — docs sharing a " +
      "run of ≥ w+k−1 tokens share a fingerprint; density is bounded") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta" // 6 = w+k−1 tokens
    val df = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"nine eight seven $shared"),
      (3L, "totally unrelated content here entirely"),
      (4L, "ab"), // 1 gram-less short doc (< k tokens)
      (5L, "p q r s")  // 2 grams < w → single global min
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(df, "doc_id", "text",
      k = 3, w = 4).collect().map(r => r.getLong(0) -> r.getLong(1))
    val by = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((by(1L) intersect by(2L)).nonEmpty,
      "shared 6-token run must share a fingerprint")
    // the unrelated doc fingerprints on its own, sharing nothing
    assert(by(3L).nonEmpty && (by(1L) intersect by(3L)).isEmpty)
    assert(!by.contains(4L), "gram-less docs yield nothing")
    assert(by(5L).size == 1, "short doc → single global-min fingerprint")
    // density: ≤ number of windows, and distinct
    val g1 = 9 // doc 1: 11 tokens → 9 grams → 6 windows
    assert(by(1L).size <= g1 - 4 + 1)
  }

  test("winnowFingerprints is map-only: no exchange in the plan") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", 3, 4)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("collocations: bound pairs outrank frequent-but-independent " +
      "pairs; minCount floors the noise") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    // "aa bb" always co-occur (8×, each token only in the pair);
    // "xx yy" co-occur 2× but both tokens are common everywhere
    val fill = (1 to 10).map(i => s"xx f$i yy g$i").mkString(" ")
    val df = Seq(
      (1L, Seq.fill(8)("aa bb").mkString(" ") + " " + fill),
      (2L, "xx yy " + fill),
      (3L, "xx yy rare1 rare2")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(df, "text", minCount = 2, k = 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.head._1 == "aa" && got.head._2 == "bb" && got.head._3 == 8L)
    assert(got.exists(p => p._1 == "xx" && p._2 == "yy"))
    // rare1/rare2 co-occur once — under minCount, never emitted
    assert(!got.exists(p => p._1 == "rare1"))
    // PMI(aa,bb) hand-check: c_ab=8, c_a=c_b=8 (each aa/bb token
    // only ever appears in the repeated pair) — quantized-integer
    // assembly recomputed from the data
    val nUni = df.select(TextAnalysis.tokens(col("text"))).collect()
      .map(_.getSeq[String](0).size).sum
    val nBi = df.select(TextAnalysis.tokens(col("text"))).collect()
      .map(r => math.max(r.getSeq[String](0).size - 1, 0)).sum
    def q(x: Double) = math.round(math.log(x) * 1e6)
    val expected = q(8) - q(nBi.toDouble) - q(8) - q(8) +
      2 * q(nUni.toDouble)
    val gotPmi = TextAnalysis.collocations(df, "text", 2, 100)
      .filter(col("a") === "aa").collect()(0).getLong(3)
    assert(gotPmi == expected, s"got $gotPmi expected $expected")
  }

  test("zipfSlope: an exact power-law vocabulary recovers its exponent") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    // counts 64,32,16,8,4,2,1 at ranks 1..7 → ln f = ln 64 − ln2·ln r/…
    // freq(r) = 2^(7−r) is NOT a pure power law in r; use f(r)=c/r:
    // tokens t1..t8 with counts 840/r → slope ≈ −1
    val rows = (1 to 8).flatMap { r =>
      Seq.fill(840 / r)((r.toLong, f"t$r%02d"))
    }
    val df = rows.toDF("doc_id", "text")
    val got = TextAnalysis.zipfSlope(df, "text", k = 8).collect()(0)
    assert(got.getLong(0) == 8)
    // 840/r isn't exactly c·r^-1 after integer floor; tolerance 2%
    assert(math.abs(got.getDouble(1) + 1.0) < 0.02,
      s"slope ${got.getDouble(1)}")
  }

  test("bm25TopK: tf raises the score sublinearly, rarity raises it, " +
    "long docs are penalized") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val docs = Seq(
      (1L, "rare common pad1 pad2"),          // rare ×1
      (2L, "rare rare common pad1"),          // rare ×2 → ranks above 1
      (3L, "common common common pad1"),      // only the common term
      (4L, "rare " + Seq.fill(40)("pad").mkString(" ")) // long doc
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        queryTerms = Seq("rare", "common"), k = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("bm25")).toMap
    // doc 2 (tf=2 of the rarer term) beats doc 1 (tf=1)
    assert(got(2L) > got(1L))
    // the long doc's single 'rare' is length-penalized below doc 1's
    assert(got(1L) > got(4L))
    // common-only doc scores lowest of the rare-bearing docs
    assert(got(3L) < got(1L))
    // sublinearity: doubling tf less than doubles the contribution
    assert(got(2L) < 2 * got(1L))
  }

  test("bleuForPairs: clipped precision — repeated candidate grams " +
    "credit only up to reference multiplicity") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    // ref has one 'the'; candidate 'the the the' holds 3 → clip1 = 1
    // (the classic degenerate-candidate example BLEU's clipping fixes)
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the the the"),
      (3L, "the cat sat")  // identical to ref → bleu2 = 1
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got = TextAnalysis.bleuForPairs(docs, pairs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_b") -> r).toMap
    val degen = got(2L)
    assert(degen.getAs[Long]("clip1") == 1L &&
      degen.getAs[Long]("tot1") == 3L)
    assert(degen.getAs[Long]("clip2") == 0L) // 'the the' not in ref
    assert(degen.getAs[Double]("bleu2") == 0.0)
    val ident = got(3L)
    assert(ident.getAs[Long]("clip1") == 3L &&
      ident.getAs[Long]("clip2") == 2L &&
      ident.getAs[Double]("bleu2") == 1.0)
  }

  test("rougeLForPairs: LCS identities — self=1, disjoint=0, order " +
    "sensitivity vs bag overlap") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c d"),   // identical → F1 = 1
      (3L, "x y z w"),   // disjoint → 0
      (4L, "d c b a"),   // same BAG reversed → LCS = 1, F1 = 0.25
      (5L, "a b x c d")  // a b c d in order + 1 extra → LCS=4, F1=8/9
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
      .toDF("doc_a", "doc_b")
    val got = TextAnalysis.rougeLForPairs(docs, pairs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_b") ->
        (r.getAs[Int]("lcs"), r.getAs[Double]("rouge_l"))).toMap
    assert(got(2L) == ((4, 1.0)))
    assert(got(3L) == ((0, 0.0)))
    assert(got(4L) == ((1, 0.25)))
    assert(got(5L)._1 == 4 &&
      math.abs(got(5L)._2 - 8.0 / 9.0) < 1e-12)
  }
}
