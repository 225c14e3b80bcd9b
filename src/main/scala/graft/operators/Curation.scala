package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators a training-data pipeline runs between
  * filtering and batch assembly: deterministic holdout splits, shard
  * assignment, mixture (domain-reweighting) rates, text
  * normalization, and length histograms. The reference's dbt layer
  * has no analogue (`dbtoperator.py` orchestrates only); these follow
  * the published curation recipes (GPT-3 §2.2 data mixtures, The
  * Pile, CCNet normalization).
  *
  * Every decision here derives from md5 or exact integer arithmetic,
  * never from engine RNG or float rounding, for two reasons that
  * matter at 100 TB: (a) re-runs and backfills MUST route a doc to
  * the same split/shard or train/test contamination creeps in when
  * the corpus grows; (b) the DuckDB oracle replays the same formula,
  * so portability is proof of determinism. All ops are map-only or
  * one hash-agg — no joins, no windows over corpus-sized frames.
  */
object Curation {

  /** First 8 md5 hex chars of (`id` + salt) as an unsigned 32-bit
    * value — the deterministic, engine-portable hash every routing
    * decision below derives from. Spark `conv(hex,16,10)` ≡ DuckDB
    * `('0x' || hex)::BIGINT`; both operate on the same md5 string.
    * The salt keeps independent decisions (split vs shard) from
    * correlating: without it a doc's shard would be a function of
    * its split bucket.
    */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast(StringType), lit(salt))), 1, 8),
      16, 10).cast(LongType)

  /** Deterministic train/val/test split on a STABLE id: bucket =
    * hash % 100, `[0,trainPct)` → train, `[trainPct,trainPct+valPct)`
    * → val, rest → test. Hash-routed (not row-sampled) so membership
    * is a pure function of the id — growing the corpus or re-running
    * a backfill never moves an existing doc across the split (the
    * property that keeps eval sets uncontaminated over a pipeline's
    * lifetime). Map-only; adds `split_bucket` and `split`.
    */
  def holdoutSplit(df: DataFrame, idCol: String,
                   trainPct: Int = 90, valPct: Int = 5,
                   salt: String = "split"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percentages: train=$trainPct val=$valPct")
    val b = hashBucket(col(idCol), salt) % 100
    df.withColumn("split_bucket", b)
      .withColumn("split",
        when(col("split_bucket") < trainPct, "train")
          .otherwise(when(col("split_bucket") < trainPct + valPct, "val")
            .otherwise("test")))
  }

  /** Deterministic shard assignment for training-data layout: shard =
    * hash % n, plus a `shard_order` hash that gives a stable
    * pseudo-random WITHIN-shard order (the corpus-shuffle step of
    * batch assembly — sorting by a hash is a deterministic shuffle).
    * Map-only; the writer partitions by `shard` and sorts by
    * `shard_order`, so the one shuffle is the write's own exchange.
    */
  def shardAssign(df: DataFrame, idCol: String, numShards: Int,
                  salt: String = "shard"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    df.withColumn("shard", hashBucket(col(idCol), salt) % numShards)
      .withColumn("shard_order", hashBucket(col(idCol), salt + ".order"))
  }

  /** Domain-mixture sampling rates (the GPT-3/Pile data-mixing step):
    * given per-domain token masses, the DOWNSAMPLING rate per domain
    * that hits `targets` (domain → share summing to ≤1; None =
    * uniform) without upsampling anything. The achievable budget is
    * B = min over domains of tokens_d / share_d; rate_d =
    * share_d · B / tokens_d ∈ (0, 1], with the binding domain at
    * exactly 1.0. Uniform targets reduce to rate_d =
    * min(tokens)/tokens_d.
    *
    * Input `df` is the raw corpus; tokens are counted map-only
    * (size(split), no explode) and aggregated to #domains rows —
    * everything after the one hash-agg runs on that tiny frame, so
    * the unpartitioned window is a single trivial task (the
    * llm_domain_mix shape). Returns one row per domain:
    * (domain, n_docs, n_tokens, target_share, rate).
    */
  def mixtureRates(df: DataFrame, domainCol: String, textCol: String,
                   targets: Option[Map[String, Double]] = None)
      : DataFrame = {
    targets.foreach { t =>
      require(t.values.forall(_ > 0), "target shares must be positive")
      require(t.values.sum <= 1.0 + 1e-9, "target shares must sum to <= 1")
    }
    // a zero-token domain (all docs tokenize empty — punctuation-only
    // or non-Latin text under the [a-z0-9] tokenizer) holds no token
    // mass to mix, but left in it would collapse the budget min() to
    // 0 and zero EVERY domain's rate — drop it from the rates frame
    // instead (its docs carry no tokens; mixtureSample's inner join
    // then drops them too)
    val perDomain = df
      .select(col(domainCol).as("domain"),
        size(TextAnalysis.tokens(col(textCol))).cast(LongType).as("toks"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val share: Column = targets match {
      case Some(t) =>
        val m = map(t.toSeq.flatMap { case (k, v) =>
          Seq(lit(k), lit(v)) }: _*)
        m(col("domain"))
      case None =>
        lit(1.0) / count(lit(1)).over(Window.partitionBy())
          .cast(DoubleType)
    }
    val w = Window.partitionBy() // #domains rows — trivial single task
    perDomain
      .withColumn("target_share", share)
      .filter(col("target_share").isNotNull) // domains absent from targets
      .withColumn("__budget",
        min(col("n_tokens").cast(DoubleType) / col("target_share")).over(w))
      .withColumn("rate",
        col("target_share") * col("__budget") /
          col("n_tokens").cast(DoubleType))
      .select("domain", "n_docs", "n_tokens", "target_share", "rate")
  }

  /** APPLY mixture rates as a deterministic per-doc sample: keep a
    * doc iff hash(id) < rate_d · 2³² — the Bernoulli(rate) decision
    * routed by the id hash instead of RNG, so re-runs/backfills keep
    * exactly the same docs (and the DuckDB oracle replays the
    * decision bit-for-bit; hash and 2³²-scaled rate are both exact
    * doubles, so the compare is engine-portable). The rates frame is
    * #domains rows → broadcast join; the corpus side is scan +
    * map-only filter. Two corpus scans total (one to weigh, one to
    * sample) — inherent to any aggregate-then-filter.
    */
  def mixtureSample(df: DataFrame, domainCol: String, textCol: String,
                    idCol: String,
                    targets: Option[Map[String, Double]] = None,
                    salt: String = "mix"): DataFrame = {
    // frame-qualified join refs: a corpus whose domain column is
    // itself named "domain" (or "rate") must not collide with the
    // rates frame's columns
    val rates = mixtureRates(df, domainCol, textCol, targets)
      .select(col("domain").as("__mix_domain"), col("rate").as("__mix_rate"))
    df.join(broadcast(rates), col(domainCol) === col("__mix_domain"))
      .filter(hashBucket(col(idCol), salt).cast(DoubleType) <
        col("__mix_rate") * lit(4294967296.0))
      .drop("__mix_domain", "__mix_rate")
  }

  /** Temperature-smoothed mixture rates at α = 0.5 (the exponentiated
    * smoothing of mBERT / XLM-R — Conneau et al. 2020 §3.1 sample
    * languages ∝ p_l^α): weight_l = √tokens_l, rate_l = weight_l /
    * Σ weights — upweights low-resource domains relative to their raw
    * share without the hard epoch cap of [[unimaxAllocation]].
    *
    * α is PINNED at 0.5 because √ is the one exponent IEEE 754
    * requires correctly rounded: sqrt of the same BIGINT-derived
    * double is bit-identical in every engine, so quantizing it
    * (`round(√tokens · 1e6)` → BIGINT) yields exact integer weights
    * and a floor-division `rate_ppm` the oracle replays bit-for-bit.
    * A general p^α runs through `pow`, which is NOT correctly-rounded
    * portable — callers wanting other temperatures accept engine
    * drift or precompute weights upstream.
    *
    * Same 100 TB shape as [[mixtureRates]]: one corpus hash-agg to
    * #domains rows, all mixture math on that tiny frame. Returns
    * (domain, n_docs, n_tokens, weight_q, rate_ppm) ordered by the
    * caller.
    */
  def temperatureRates(df: DataFrame, domainCol: String, textCol: String)
      : DataFrame = {
    val perDomain = df
      .select(col(domainCol).as("domain"),
        size(TextAnalysis.tokens(col(textCol))).cast(LongType).as("toks"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val w = Window.partitionBy() // #domains rows — trivial single task
    perDomain
      .withColumn("weight_q",
        round(sqrt(col("n_tokens").cast(DoubleType)) * 1e6)
          .cast(LongType))
      .withColumn("rate_ppm",
        expr("(weight_q * 1000000) div sum(weight_q) over ()"))
  }

  /** UniMax language-sampling allocation (Chung et al. 2023, "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining", ICLR 2023, Algorithm 1): given a
    * token budget B and a per-language epoch cap N, walk languages in
    * ASCENDING token-mass order; each language takes
    * min(N · tokens_l, remaining / languages_left) — low-resource
    * languages are capped at N epochs (never oversampled into
    * memorization), and whatever budget they leave spreads uniformly
    * over the larger languages. The result is the closest-to-uniform
    * mixture that respects the epoch cap — the published alternative
    * to temperature sampling for multilingual pretraining.
    *
    * Budget is `budgetNum/budgetDen` of the corpus's total tokens
    * (default half). ALL arithmetic is exact integer math — Long
    * floor-division for the fair share, parts-per-million outputs
    * (`epochs_ppm` = allocated epochs · 1e6, `rate_ppm` = share of
    * the realized budget · 1e6) — so the DuckDB oracle replays the
    * walk bit-for-bit via a recursive CTE and re-runs are stable
    * across engines.
    *
    * 100 TB shape: the corpus is touched by ONE map-only token count
    * + hash-agg to #languages rows (the [[mixtureRates]] /
    * llm_domain_mix shape). The sequential walk is inherent to the
    * algorithm (each step's fair share depends on what smaller
    * languages left behind) but runs over ≤ #languages rows on the
    * driver — the nlist ≪ N pattern, same as k-means centroids.
    * Zero-token languages are dropped (no mass to allocate; keeping
    * them would still be fine — min(0, fair) = 0 — but the rates
    * frame mirrors mixtureRates' contract).
    *
    * Returns one row per language: (lang, n_docs, n_tokens,
    * alloc_tokens, epochs_ppm, rate_ppm), ordered by lang.
    */
  def unimaxAllocation(df: DataFrame, langCol: String, textCol: String,
                       maxEpochs: Int,
                       budgetNum: Long = 1L, budgetDen: Long = 2L)
      : DataFrame = {
    require(maxEpochs > 0, s"maxEpochs must be positive: $maxEpochs")
    require(budgetNum > 0 && budgetDen > 0 && budgetNum <= budgetDen,
      s"budget fraction must be in (0,1]: $budgetNum/$budgetDen")
    val spark = df.sparkSession
    val perLang = df
      .select(col(langCol).as("lang"),
        size(TextAnalysis.tokens(col(textCol))).cast(LongType).as("toks"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (lang, _, tok) => (tok, lang) } // UniMax walk order
    val total = perLang.map(_._3).sum
    var remaining = total / budgetDen * budgetNum +
      total % budgetDen * budgetNum / budgetDen // overflow-safe B = total·num/den
    val n = perLang.length
    val allocs = perLang.zipWithIndex.map { case ((lang, docs, tok), i) =>
      val fair = remaining / (n - i)
      val u = math.min(tok * maxEpochs, fair)
      remaining -= u
      (lang, docs, tok, u)
    }
    val realized = allocs.map(_._4).sum
    import spark.implicits._
    allocs.toSeq
      .map { case (lang, docs, tok, u) =>
        (lang, docs, tok, u, u * 1000000L / tok,
          if (realized == 0) 0L else u * 1000000L / realized)
      }
      .toDF("lang", "n_docs", "n_tokens", "alloc_tokens",
        "epochs_ppm", "rate_ppm")
      .orderBy("lang")
  }

  /** CCNet-style text normalization: lowercase, non-alphanumerics to
    * spaces, whitespace runs collapsed, trimmed — the canonical form
    * exact-dedup and fingerprinting hash. Pure codegen'd
    * expressions, map-only.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9]", " "), " +", " "))

  /** Power-of-2 token-length histogram per `by` group — the
    * doc-length diagnostic that drives packing budgets and truncation
    * policy. Buckets are an explicit integer CASE chain (16/32/64/…)
    * rather than floor(log2(double)): an exact power of two must not
    * fall into the lower bucket through float error, and the integer
    * compare replays identically in the oracle. One map-only pass +
    * one hash-agg to (#groups × #buckets) rows.
    */
  def lengthHistogram(df: DataFrame, textCol: String, by: String)
      : DataFrame = {
    val caps = Seq(16L, 32L, 64L, 128L, 256L, 512L)
    val toks = size(TextAnalysis.tokens(col(textCol))).cast(LongType)
    val bucket = caps.reverse
      .foldLeft(lit(Long.MaxValue): Column)((acc, cap) =>
        when(toks <= cap, cap).otherwise(acc))
    df.select(col(by), bucket.as("len_cap"))
      .groupBy(by, "len_cap")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Hashed n-gram feature buckets for DSIR (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling" §3.2):
    * unigrams and word bigrams, each feature-hashed into `k` buckets
    * by the same md5 bucket [[hashBucket]] routes on — deterministic
    * and engine-portable, never engine RNG. Map-only (a transform
    * over the token array; no explode until the caller aggregates).
    *
    * Takes the TOKEN ARRAY column, not the text: the bigram lambda
    * references the array per element, so an inlined `tokens(text)`
    * would re-run the tokenizer regex per bigram — O(tokens²) per
    * doc, the [[Dedup.wordNgramHashes]] pathology (measured ~5× on
    * llm_dsir_score at sf0.1). Callers materialize tokens once
    * behind a projection boundary.
    */
  def dsirFeatures(tk: Column, k: Int): Column = {
    // native single-pass kernel: identical buckets to the former
    // per-feature `conv(substring(md5(f),1,8),16,10) % k` lambda
    // chain, minus the 32-char hex materialization + string parse per
    // feature and the per-element lambda dispatch (~2× on the dsir
    // keys at sf0.1; CurationSpec pins kernel ≡ expression). The
    // caller contract is unchanged: pass MATERIALIZED tokens.
    graft.functions.TextSignatures.dsirBuckets(tk, k)
  }

  /** DSIR importance weights: per hash-bucket
    * log(p_target(b) / p_raw(b)) with add-1 smoothing, quantized to
    * BIGINT (`round(ln·1e6)`, the tfIdfTopK trick) so downstream
    * scoring is exact integer math. `targetPred` marks the target
    * distribution (the small high-quality slice — e.g. one curated
    * domain); raw is the whole input.
    *
    * One corpus scan: features explode map-only, ONE hash-agg keyed
    * on the bucket carries both counts (target via a conditional
    * sum), and all ratio math runs on the k-row result — the totals
    * window is a trivial single task over k rows, never the corpus.
    * Returns (bucket, n_target, n_raw, logw_q), k rows at most.
    */
  def dsirWeights(df: DataFrame, textCol: String, targetPred: Column,
                  k: Int = 1024): DataFrame = {
    require(k > 0, "k must be positive")
    graft.functions.TextSignatures.register(df.sparkSession)
    val dist = df
      .select(targetPred.as("__t"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("__t"),
        explode(dsirFeatures(col("__tk"), k)).as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("n_target"),
        count(lit(1)).as("n_raw"))
    val w = Window.partitionBy() // k rows — trivial single task
    dist
      .withColumn("__nt", sum(col("n_target")).over(w))
      .withColumn("__nr", sum(col("n_raw")).over(w))
      .select(col("bucket"), col("n_target"), col("n_raw"),
        round((log((col("n_target") + 1).cast(DoubleType) /
                   (col("__nt") + k).cast(DoubleType)) -
               log((col("n_raw") + 1).cast(DoubleType) /
                   (col("__nr") + k).cast(DoubleType))) * 1e6)
          .cast(LongType).as("logw_q"))
  }

  /** Per-document DSIR importance score: the sum of its hashed
    * features' log-weights — documents whose n-gram profile looks
    * like the target distribution score high and get kept by the
    * importance resample. Returns (idCol, n_feats, dsir_logw_q);
    * docs that tokenize empty have no features and drop out (they
    * carry no evidence either way).
    *
    * 100 TB shape: the weight table is ≤ k rows → broadcast; the
    * corpus side is a map-only feature explode + one per-doc
    * hash-agg with map-side partials. Two corpus scans total (one to
    * weigh, one to score) — inherent to any aggregate-then-apply,
    * the mixtureSample shape.
    */
  def dsirScore(df: DataFrame, idCol: String, textCol: String,
                targetPred: Column, k: Int = 1024): DataFrame = {
    graft.functions.TextSignatures.register(df.sparkSession)
    val wtab = dsirWeights(df, textCol, targetPred, k)
      .select(col("bucket"), col("logw_q"))
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col(idCol),
        explode(dsirFeatures(col("__tk"), k)).as("bucket"))
      .join(broadcast(wtab), "bucket")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"),
        sum(col("logw_q")).as("dsir_logw_q"))
  }

  /** DSIR importance RESAMPLING — the selection step the scores
    * exist for (Xie et al. 2023 §3.3): draw `keep` documents without
    * replacement with probability proportional to their importance
    * weight, via the Gumbel-top-k identity (argtop-k of
    * log w + Gumbel(0,1) ≡ weighted sampling without replacement).
    * The Gumbel noise is DETERMINISTIC — u derives from the same
    * salted md5 bucket every other routing decision uses, so re-runs
    * and backfills select the identical set, and the DuckDB oracle
    * replays the draw (never engine RNG).
    *
    * Quantization: g quantizes to BIGINT (`round(g·1e6)`) on the
    * same 1e6 nat scale as `dsir_logw_q`, so the selection key is an
    * exact integer sum. 100 TB shape: everything rides
    * [[dsirScore]]'s plan plus one map-only projection; the top-keep
    * is TakeOrderedAndProject — no global sort.
    */
  def dsirResample(df: DataFrame, idCol: String, textCol: String,
                   targetPred: Column, k: Int = 1024,
                   keep: Int = 100): DataFrame = {
    require(keep > 0, s"keep must be positive: $keep")
    // u in (0,1): 32-bit hash + 0.5 over 2^32 (never exactly 0 or 1,
    // so -ln(-ln u) is finite)
    val u = (hashBucket(col(idCol), "|dsir-gumbel").cast(DoubleType) +
      lit(0.5)) / lit(4294967296.0)
    val gq = round(-log(-log(u)) * 1e6).cast(LongType)
    dsirScore(df, idCol, textCol, targetPred, k)
      .withColumn("gumbel_q", gq)
      .withColumn("key_q", col("dsir_logw_q") + col("gumbel_q"))
      .orderBy(col("key_q").desc, col(idCol)).limit(keep)
      .select(col(idCol), col("dsir_logw_q"), col("gumbel_q"),
        col("key_q"))
  }

  /** C4 cleaning heuristics (Raffel et al. 2020 §2.2, the rules that
    * produced C4 from Common Crawl), line-level then doc-level:
    * lines survive when they have ≥ `minWordsPerLine` words and (when
    * `requireTerminalPunct`) end in terminal punctuation; the doc is
    * dropped when it contains any `badWords` phrase (their "List of
    * Dirty, Naughty…" stand-in, matched case-insensitively), contains
    * a curly brace (their code marker), or keeps fewer than
    * `minLines` lines (their ≥-3-sentences rule).
    *
    * One row per doc: (idCol, n_lines, n_kept, keep, reason, text) —
    * `reason` is the first failing doc rule ('bad_word' | 'brace' |
    * 'too_few_lines' | 'kept') with a fixed precedence so re-runs and
    * the oracle agree; `text` is the surviving lines joined by
    * `joinSep` (NULL when none survive). Callers filter `keep`.
    *
    * 100 TB shape: entirely MAP-ONLY — every rule is an array/string
    * expression inside whole-stage codegen; no explode, no shuffle,
    * nothing leaves the scan stage (plan-asserted no Exchange).
    */
  def c4Filter(df: DataFrame, idCol: String, textCol: String,
               sepRegex: String = "\n", joinSep: String = "\n",
               minWordsPerLine: Int = 5,
               requireTerminalPunct: Boolean = true,
               minLines: Int = 3,
               badWords: Seq[String] = Seq("lorem ipsum", "javascript"),
               dropBraces: Boolean = true): DataFrame = {
    val lines = filter(split(col(textCol), sepRegex),
      l => trim(l) =!= "")
    def lineOk(l: Column): Column = {
      val words = size(filter(split(trim(l), "\\s+"), w => w =!= "")) >=
        minWordsPerLine
      if (requireTerminalPunct) words && l.rlike("[.!?\"']\\s*$")
      else words
    }
    val kept = filter(lines, lineOk(_))
    val lowered = lower(col(textCol))
    val hasBad = badWords.map(w => lowered.contains(w.toLowerCase))
      .reduceOption(_ || _).getOrElse(lit(false))
    val hasBrace =
      if (dropBraces) col(textCol).contains("{") else lit(false)
    val tooFew = size(kept) < minLines
    df.select(
      col(idCol),
      size(lines).cast(LongType).as("n_lines"),
      size(kept).cast(LongType).as("n_kept"),
      (!hasBad && !hasBrace && !tooFew).as("keep"),
      when(hasBad, "bad_word").when(hasBrace, "brace")
        .when(tooFew, "too_few_lines").otherwise("kept").as("reason"),
      nullif(array_join(kept, joinSep), lit("")).as("text"))
  }

  /** Sliding-window chunking with overlap — the retrieval-corpus /
    * context-window prep step (RAG ingestion, long-doc training
    * splits): each doc becomes windows of up to `chunkSize` tokens
    * whose starts step by `stride` (stride < chunkSize ⇒ consecutive
    * chunks share `chunkSize − stride` boundary tokens, so no answer
    * span is ever cut without a copy that contains it whole).
    *
    * One row per chunk: (id, chunk_id, start_tok, n_chunk_tokens,
    * chunk_text); chunk starts are 0-based multiples of `stride`
    * strictly below the doc's token count, so token-less docs emit
    * nothing and every token lands in ≥1 chunk. Entirely MAP-ONLY
    * (tokens → transform over a start sequence → posexplode);
    * the only shuffle a pipeline sees is its writer's partitionBy.
    * Deterministic integer arithmetic end-to-end — the DuckDB oracle
    * replays chunk boundaries and text exactly.
    */
  def chunkSliding(df: DataFrame, idCol: String, textCol: String,
                   chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1: $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize]: $stride")
    val tk = col("__tk")
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__tk"))
      .filter(size(tk) >= 1)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), size(tk) - 1, lit(stride)),
          s => struct(
            s.cast(LongType).as("start_tok"),
            least(lit(chunkSize), size(tk) - s).cast(LongType)
              .as("n_chunk_tokens"),
            concat_ws(" ", slice(tk, s + 1, lit(chunkSize)))
              .as("chunk_text")))))
      .select(col(idCol), col("pos").cast(LongType).as("chunk_id"),
        col("col.start_tok"), col("col.n_chunk_tokens"),
        col("col.chunk_text"))
  }
}
