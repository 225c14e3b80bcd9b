package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (north-star,
  * BASELINE.json): tokenization, quality scoring, language-ID
  * heuristic, fingerprinting. All pure `functions._` expressions —
  * codegen'd, no UDFs, embarrassingly parallel (no shuffle) at 100 TB.
  */
object TextAnalysis {

  /** Whitespace/punctuation tokenizer → array of lowercase tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Count of matches of a BPE-ish token regex: words, numbers, or
    * single punctuation marks (approximates subword token count
    * without a vocab).
    */
  def tokenCount(text: Column): Column =
    size(filter(split(lower(text), "\\s+"), t => t =!= "")) +
      size(filter(split(lower(text), "[a-z0-9\\s]+"), t => t =!= ""))

  /** ROUGE-L F1 between doc pairs given a (doc_a, doc_b) candidate
    * frame (Lin 2004) — the SEQUENCE-aware overlap signal: LCS credits
    * tokens only in order, so shuffled bags that fool n-gram overlap
    * score low. With β=1, F = 2·LCS/(|A|+|B|).
    *
    * Scale shape mirrors [[graft.operators.Dedup.editDistanceForPairs]]:
    * two id equi-joins attach `maxTokens`-capped token prefixes, then a
    * per-pair LCS. The O(len²) DP runs in a Scala UDF — Spark has no
    * subsequence built-in (`levenshtein` is edit distance) — bounded by
    * the cap and by the CANDIDATE pair count, never a corpus product;
    * a UDF at pair granularity is off the per-token hot path.
    */
  def rougeLForPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
                     textCol: String, maxTokens: Int = 64): DataFrame = {
    val lcsUdf = udf { (aSeq: Seq[String], bSeq: Seq[String]) =>
      // intern tokens to int ids first — the O(cap²) inner loop then
      // compares ints, not strings (string equals on common-prefix
      // tokens dominated the DP; ~4× at sf0.1)
      val ids = new java.util.HashMap[String, Integer]()
      def intern(t: String): Int = {
        var v = ids.get(t)
        if (v == null) { v = Integer.valueOf(ids.size); ids.put(t, v) }
        v.intValue
      }
      val a = new Array[Int](aSeq.length)
      var x = 0
      aSeq.foreach { t => a(x) = intern(t); x += 1 }
      val b = new Array[Int](bSeq.length)
      x = 0
      bSeq.foreach { t => b(x) = intern(t); x += 1 }
      // single-row DP: dp(j) = LCS(a[0..i), b[0..j)), prev = diagonal
      val dp = new Array[Int](b.length + 1)
      var i = 1
      while (i <= a.length) {
        var prev = 0
        var j = 1
        while (j <= b.length) {
          val tmp = dp(j)
          dp(j) =
            if (a(i - 1) == b(j - 1)) prev + 1
            else math.max(dp(j), dp(j - 1))
          prev = tmp
          j += 1
        }
        i += 1
      }
      dp(b.length)
    }
    val tk = docs.select(col(idCol).as("id"),
      coalesce(slice(tokens(col(textCol)), 1, maxTokens),
        array().cast("array<string>")).as("tk"))
    pairs
      .join(tk.withColumnRenamed("id", "doc_a")
        .withColumnRenamed("tk", "tk_a"), "doc_a")
      .join(tk.withColumnRenamed("id", "doc_b")
        .withColumnRenamed("tk", "tk_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        lcsUdf(col("tk_a"), col("tk_b")).as("lcs"),
        size(col("tk_a")).as("n_a"), size(col("tk_b")).as("n_b"))
      .withColumn("rouge_l",
        when(col("n_a") + col("n_b") === 0, lit(0.0))
          .otherwise(lit(2.0) * col("lcs") / (col("n_a") + col("n_b"))))
  }

  /** BLEU-2 components between doc pairs (Papineni et al. 2002):
    * MODIFIED (clipped) n-gram precision — candidate gram occurrences
    * count only up to the reference's multiplicity, the repetition
    * fence plain overlap lacks. doc_a is the reference, doc_b the
    * candidate. Emits exact-integer clipped/total counts per order
    * (n=1,2) and `bleu2` = √(p1·p2) — the geometric mean via sqrt,
    * which IEEE rounds exactly and thus compares bit-identically
    * cross-engine (the brevity penalty's `exp` does NOT; callers
    * apply BP from `n_a`/`n_b` when they need the headline number).
    *
    * Scale shape: per-doc (gram, count) frames — grouped once, grams
    * as values not positions — joined per CANDIDATE pair with
    * `sum(min(cnt_a, cnt_b))`; linear in pair count, never a corpus
    * product. Docs with no grams at an order contribute p_n = 0.
    */
  def bleuForPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    // (id, gram-hash, cnt) at order n — multiplicity retained (BLEU
    // clips on counts, unlike the distinct frames of Jaccard)
    def gramCounts(n: Int): DataFrame = {
      val tk = docs.select(col(idCol).as("id"),
        tokens(col(textCol)).as("__tk"))
      tk.select(col("id"), explode(when(size(col("__tk")) >= n,
          transform(sequence(lit(1), size(col("__tk")) - n + 1),
            i => xxhash64(slice(col("__tk"), i, lit(n)))))
          .otherwise(array().cast("array<bigint>"))).as("gh"))
        .groupBy("id", "gh").agg(count(lit(1)).as("cnt"))
    }
    // per-pair clipped count at order n. The precision DENOMINATOR
    // needs no gram frame at all: the candidate's total n-gram
    // multiplicity is arithmetically len−n+1, so only the clipped
    // numerator pays gram joins.
    def clipped(n: Int): DataFrame = {
      val g = gramCounts(n)
      pairs
        .join(g.withColumnRenamed("id", "doc_a")
          .withColumnRenamed("cnt", "ca"), "doc_a")
        .join(g.withColumnRenamed("id", "doc_b")
          .withColumnRenamed("cnt", "cb"), Seq("doc_b", "gh"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(least(col("ca"), col("cb"))).as(s"clip$n"))
    }
    val lens = docs.select(col(idCol).as("id"),
      size(tokens(col(textCol))).as("len"))
    def tot(len: Column, n: Int): Column =
      greatest(len - (n - 1), lit(0)).cast("long")
    pairs
      .join(clipped(1), Seq("doc_a", "doc_b"), "left")
      .join(clipped(2), Seq("doc_a", "doc_b"), "left")
      .join(lens.withColumnRenamed("id", "doc_a")
        .withColumnRenamed("len", "n_a"), "doc_a")
      .join(lens.withColumnRenamed("id", "doc_b")
        .withColumnRenamed("len", "n_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("clip1"), lit(0L)).as("clip1"),
        tot(col("n_b"), 1).as("tot1"),
        coalesce(col("clip2"), lit(0L)).as("clip2"),
        tot(col("n_b"), 2).as("tot2"),
        col("n_a"), col("n_b"))
      .withColumn("bleu2",
        when(col("tot1") === 0 || col("tot2") === 0 ||
          col("clip1") === 0 || col("clip2") === 0, lit(0.0))
          .otherwise(sqrt(
            (col("clip1").cast("double") / col("tot1")) *
              (col("clip2").cast("double") / col("tot2")))))
  }

  /** Gopher quality-rule signals (Rae et al. 2021 variant) — the ONE
    * definition the standalone filter key and the composed curation
    * pipeline both build on, so a threshold tweak cannot make them
    * silently diverge. All map-only codegen'd expressions; every
    * signal divides exact integers, so keep decisions are
    * engine-portable.
    */
  def gopherNWords(text: Column): Column =
    size(tokens(text)).cast(org.apache.spark.sql.types.LongType)

  def gopherMeanWlen(text: Column): Column =
    length(regexp_replace(lower(text), "[^a-z0-9]", ""))
      .cast(org.apache.spark.sql.types.DoubleType) /
      nullif(size(tokens(text)), lit(0))

  def gopherStopCount(text: Column): Column =
    size(filter(tokens(text), x => x.isin(stopEn.map(lit): _*)))
      .cast(org.apache.spark.sql.types.LongType)

  /** First-failing-rule audit over ALREADY-COMPUTED signal columns
    * (pass named columns, not raw text — the signals are multiply
    * referenced and should be materialized once by a projection).
    */
  def gopherReason(nWords: Column, meanWlen: Column,
                   stopCount: Column): Column =
    when(nWords < 30, "too_short")
      .when(nWords > 100000, "too_long")
      .when(meanWlen < 3.0 || meanWlen > 10.0, "word_length")
      .when(stopCount < 2, "stopwords")
      .otherwise("pass")

  /** Corpus TF-IDF, top-k terms per document — the classic keyword /
    * topic-signal extractor over a training corpus.
    *
    * 100 TB shape: tokenize-explode is map-only; tf is one shuffle on
    * (doc, term) with map-side partial counts; document frequency
    * reuses the tf pairs (partial-agg on term); the doc count is a
    * SECOND full scan of `docs` (it cannot come from tf — token-less
    * docs still count toward N), riding in as a broadcast scalar;
    * tf⋈idf shuffles on term (the vocab can be large — no broadcast
    * assumption); the final top-k is a per-doc window. No driver-side
    * actions.
    *
    * Determinism across engines: idf = ln(N/df) is quantized per TERM
    * to a BIGINT (`round(ln·1e6)`) before scoring, so the score is
    * exact integer math (`tf * idf_q`) and the top-k ranking (score
    * desc, term asc) cannot flip on last-ulp libm differences — the
    * same trick as the embedding ops' fixed-point dot products.
    */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val nDocs = docs.select(
      countDistinct(col(idCol)).cast("double").as("n_docs"))
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("term"),
        round(log(col("n_docs") / col("df")) * 1e6).cast("long")
          .as("idf_q"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_q").desc, col("term"))
    tf.join(idf, "term")
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf") * col("idf_q")).as("score_q"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).drop("rk")
  }

  /** BM25 retrieval ranking (Robertson–Spärck Jones) for a fixed
    * query-term set: score(d) = Σ_t idf(t) · tf·(k1+1) /
    * (tf + k1·(1−b+b·dl/avgdl)). Uses the RATIONAL idf variant
    * idf = (N−df+0.5)/(df+0.5) — no logarithm, so every factor is an
    * IEEE-exact rational of integer counts (N, df, tf, dl exact;
    * 0.5-halves exactly representable) and scores are BIT-IDENTICAL
    * cross-engine without quantization (ln's last-ulp drift is why
    * [[tfIdfTopK]] must quantize; this variant doesn't).
    *
    * 100 TB shape: one corpus pass builds (doc, term, tf) for the
    * query terms ONLY (the filter pushes into the explode side before
    * the aggregation); df/avgdl are scalar aggregates broadcast onto
    * the score; top-k is a `TakeOrderedAndProject`, never a global
    * sort.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val toks = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("__tk"))
    val lens = toks.select(col("doc_id"), size(col("__tk")).as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = toks
      .select(col("doc_id"), explode(col("__tk")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        // every operand below is an exact rational of integers
        ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) *
            col("dl") / (col("sum_dl").cast("double") / col("n_docs")))))
          .as("part"), col("term"))
      // plain sum(double) is accumulation-order-dependent — fold the
      // per-term parts in SORTED TERM ORDER so both engines add the
      // same doubles in the same sequence (bit-identical totals)
      .groupBy("doc_id")
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("part")))),
        lit(0.0), (acc, x) => acc + x.getField("part")).as("bm25"))
    scored.orderBy(col("bm25").desc, col("doc_id")).limit(k)
  }

  /** Per-doc interior bigrams (u, v) derived MAP-ONLY from the token
    * array (`transform(sequence…)` — no window, no positional
    * self-join). Docs with < 2 tokens contribute nothing.
    */
  private def bigrams(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("ts")) - 2),
        i => struct(element_at(col("ts"), i + 1).as("u"),
          element_at(col("ts"), i + 2).as("v")))).as("bg"))
      .select(col(idCol), col("bg.u").as("u"), col("bg.v").as("v"))

  /** Bigram LM scoring with add-one (Laplace) smoothing over the
    * corpus vocabulary — one conditional-probability step past
    * [[unigramLogProbs]] toward the KenLM n-gram scoring CCNet uses:
    * p(v|u) = (c(u,v)+1) / (c(u·)+|V|), log-quantized to BIGINT so
    * per-doc sums hash-compare across engines. Returns one row per
    * scoreable doc: (idCol, n_bigrams, nll_q) with
    * nll_q = Σ −round(ln p · 1e6) — exact integer math end to end.
    *
    * 100 TB shape: bigram derivation is map-only from the token
    * array; the count tables shuffle on token keys with map-side
    * partials (bigram-distinct-sized, ≪ corpus); |V| rides in as a
    * 1-row broadcast (never a driver collect); the score join
    * shuffles on (u, v) and the final agg on the doc id.
    */
  def bigramNll(docs: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    val bg = bigrams(docs, idCol, textCol)
    val cuv = bg.groupBy("u", "v").agg(count(lit(1)).as("c"))
    val cu = cuv.groupBy("u").agg(sum(col("c")).as("cn"))
    val vsz = docs.select(explode(tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("vsz"))
    val lp = cuv.join(cu, "u").crossJoin(broadcast(vsz))
      .select(col("u"), col("v"),
        round(log((col("c") + lit(1)).cast("double") /
          (col("cn") + col("vsz")).cast("double")) * 1e6)
          .cast("long").as("lp_q"))
    bg.join(lp, Seq("u", "v"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(-col("lp_q")).as("nll_q"))
  }

  /** Corpus unigram language model: per-token
    * log p(token) = ln(count / total), quantized to BIGINT
    * (`round(ln·1e6)`, the tfIdfTopK trick) so every downstream sum
    * and comparison is exact integer math. One explode + one
    * hash-agg; the total-token count rides in as a broadcast scalar
    * (the vocab frame is never globally windowed — at corpus scale
    * the vocabulary is still millions of rows).
    */
  def unigramLogProbs(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.select(
      sum(col("cnt")).cast("double").as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("token"), col("cnt"),
        round(log(col("cnt").cast("double") / col("total")) * 1e6)
          .cast("long").as("lp_q"))
  }

  /** CCNet-style perplexity scoring and bucketing (Wenzek et al.
    * 2020 §3.3): score every document by its mean per-token negative
    * log-likelihood under the corpus unigram LM ([[unigramLogProbs]]
    * — their KenLM 5-gram stands in; the plumbing, not the LM, is
    * the operator), then split each language into `head` / `middle` /
    * `tail` terciles — head = most fluent, the slice CCNet keeps.
    * Returns (idCol, langCol, n_toks, nll_q, nll_mean, ppl_bucket);
    * docs that tokenize empty drop out (no tokens to score).
    *
    * 100 TB shape: the token→logprob join shuffles on the token (no
    * small-vocab broadcast assumption — same stance as tfIdfTopK),
    * the per-doc agg shuffles on the id, both with map-side
    * partials. The tercile split is an EXACT per-language ntile —
    * one task per language, the win_ntile_partitioned shape; when a
    * single language dominates the corpus, swap the bucket column
    * for the approx-quantile boundary form (`Windows.globalNtile`
    * with `exact=false` per language — disagreement confined to the
    * boundary neighborhoods). Ordering is (nll_mean, id): nll_mean
    * divides exact integers, so the order — and the oracle's — is
    * engine-portable.
    */
  def perplexityBuckets(docs: DataFrame, idCol: String,
                        textCol: String, langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lp = unigramLogProbs(docs, textCol).select("token", "lp_q")
    val scored = docs
      .select(col(idCol), col(langCol),
        explode(tokens(col(textCol))).as("token"))
      .join(lp, "token")
      .groupBy(idCol, langCol)
      .agg(count(lit(1)).as("n_toks"), sum(-col("lp_q")).as("nll_q"))
      .withColumn("nll_mean",
        col("nll_q").cast("double") / col("n_toks") / 1e6)
    val byLang = Window.partitionBy(langCol)
      .orderBy(col("nll_mean"), col(idCol))
    scored.withColumn("ppl_bucket",
      element_at(array(lit("head"), lit("middle"), lit("tail")),
        ntile(3).over(byLang)))
  }

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  val stopEn = Seq("the", "a", "and", "of", "to", "in", "is")
  val stopEs = Seq("el", "la", "de", "que", "y", "los")
  val stopDe = Seq("der", "die", "und", "das", "ist", "ein")
  val stopFr = Seq("le", "la", "et", "les", "des", "un")

  /** Stopword-hit language-ID heuristic. Ties resolve en>es>de>fr. */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val (en, es, de, fr) =
      (hits(t, stopEn), hits(t, stopEs), hits(t, stopDe), hits(t, stopFr))
    when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Char-trigram array of CCNet-normalized text — [[Curation
    * .normalize]]'s exact chain (lower, non-alnum→space, collapse,
    * trim) so spaces act as word boundaries inside grams, the
    * Cavnar–Trenkle setup. Empty array under 3 chars (Spark's
    * `sequence(1,0)` would step DOWNWARD, so the short-text guard is
    * explicit; DuckDB's `generate_series(1,0)` is empty — the oracle
    * needs no guard). Pure codegen'd array expressions, map-only.
    */
  /** `nt` MUST be a materialized column (an attribute reference, not
    * the normalize() expression tree): the lambda evaluates its input
    * once per element, so an embedded regexp chain would re-normalize
    * the whole doc per trigram — O(len²) regex work per doc (the
    * quadratic-tokenizer pitfall; callers project normalize() into a
    * column first).
    */
  /** Persisted inverted index — the corpus-search infrastructure
    * behind WIMBD-style "what's in my big data?" auditing (Elazar et
    * al. 2023): a warehouse table of (term, doc) postings, appended
    * per ingest batch exactly-once (idempotent batchId via the
    * runner's write-audit-publish ledger), so term lookups never
    * rescan raw text. Postings are ROWS, not collected arrays —
    * appendable, and a term's posting list can exceed any single
    * array's practical size at 100 TB.
    *
    * Per batch: one map-only explode + a (doc, term) distinct — the
    * only shuffle, carrying the batch's postings. At 100 TB the table
    * would be written bucketed/partitioned by a term hash so lookups
    * prune files; here the term predicate pushes into the parquet
    * scan (plan-asserted in the spec).
    */
  def invertedIndexAppend(runner: graft.pipeline.PipelineRunner,
                          table: String, batch: DataFrame, idCol: String,
                          textCol: String, batchId: Long): Long = {
    val postings = batch
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .distinct()
    runner.appendBatch(table, postings, batchId)
  }

  /** AND-query over the persisted index: docs containing EVERY term in
    * `terms`. The term filter (`isin`) pushes into the postings scan;
    * the count-distinct agg runs on matching postings only (≤ |terms|
    * rows per doc), never the corpus.
    */
  def invertedIndexSearch(runner: graft.pipeline.PipelineRunner,
                          table: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "invertedIndexSearch: empty term set")
    runner.readTable(table)
      .filter(col("term").isin(terms.map(lit): _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") === terms.length)
      .select("doc_id")
  }

  /** Rank-profile language ID (Cavnar & Trenkle 1994, "N-Gram-Based
    * Text Categorization") — the real training-data language
    * classifier behind the [[langId]] stopword heuristic: per
    * language, the top-`topP` char trigrams by frequency form a rank
    * profile; a doc is classified by OUT-OF-PLACE distance — for each
    * of the doc's own top-`topP` trigrams, |doc rank − profile rank|,
    * or `topP` when the profile lacks the gram — to the nearest
    * profile (ties to the lexically-first language).
    *
    * Self-supervised here: profiles train on the corpus's own `lang`
    * labels and every doc is re-classified (the closed-world audit a
    * pipeline runs to find mislabeled docs). All ranks and distances
    * are exact integer math with lexical tie-breaks, so the DuckDB
    * oracle replays the full train + classify pipeline bit-for-bit.
    *
    * 100 TB shape: the profile side is one explode → (lang, gram)
    * hash-agg (map-side partials) → per-lang rank window — the window
    * runs on #langs partitions but each holds ≤ |charset|³ distinct
    * grams (46k for [a-z0-9 ]), bounded regardless of corpus size —
    * and the ≤ #langs·topP-row result BROADCASTS. The classify side
    * is explode → (doc, gram) hash-agg → per-doc top-P window (task
    * size bounded by a doc's vocabulary) → broadcast join + (doc,
    * lang) hash-agg → per-doc argmin window over #langs rows. No
    * corpus-sized join or sort anywhere.
    *
    * Returns (doc id, pred_lang, dist), one row per doc with ≥1
    * trigram.
    */
  def langIdNgram(df: DataFrame, idCol: String, langCol: String,
                  textCol: String, topP: Int = 40): DataFrame = {
    require(topP > 0, s"topP must be positive: $topP")
    // normalize ONCE per doc, then count trigrams per doc in ONE
    // native single-pass expression (graft_trigram_counts, the
    // TextSignatures kernel family): the frame arrives at the
    // (doc, gram, n) grain MAP-ONLY — no per-occurrence explode of
    // ~hundreds of rows per doc, no corpus-sized hash-agg shuffle,
    // and the checkpoint that feeds BOTH the profile and classify
    // sides materializes one row per DISTINCT (doc, gram). The former
    // explode→groupBy shape measured 2.7 s of this key's 5.1 s at
    // sf0.1; at 100 TB it was the key's largest shuffle.
    graft.functions.TextSignatures.register(df.sparkSession)
    val grams = df
      .select(col(idCol).as("__id"), col(langCol).as("__lang"),
        Curation.normalize(col(textCol)).as("__nt"))
      .select(col("__id"), col("__lang"),
        explode(graft.functions.TextSignatures.trigramCounts(col("__nt")))
          .as("gn"))
      .select(col("__id"), col("__lang"),
        col("gn.g").as("g"), col("gn.n").as("n"))
      .localCheckpoint(eager = false)
    val wLang = Window.partitionBy("__lang")
      .orderBy(col("n").desc, col("g"))
    val profile = grams.groupBy("__lang", "g")
      .agg(sum(col("n")).as("n"))
      .withColumn("rl", row_number().over(wLang))
      .filter(col("rl") <= topP)
      .select(col("__lang").as("plang"), col("g"), col("rl"))
    val wDoc = Window.partitionBy("__id").orderBy(col("n").desc, col("g"))
    val docG = grams.select(col("__id"), col("g"), col("n"))
      .withColumn("rd", row_number().over(wDoc))
      .filter(col("rd") <= topP)
      .select("__id", "g", "rd")
      .localCheckpoint(eager = false) // feeds the present-join AND the per-doc count
    val present = docG.join(broadcast(profile), "g")
      .groupBy("__id", "plang")
      .agg(sum(abs(col("rd") - col("rl"))).as("s"),
        count(lit(1)).as("c"))
    val nGrams = docG.groupBy("__id").agg(count(lit(1)).as("ng"))
    val langs = profile.select(col("plang")).distinct()
    val dist = nGrams.crossJoin(broadcast(langs))
      .join(present, Seq("__id", "plang"), "left")
      .select(col("__id"),
        col("plang"),
        (coalesce(col("s"), lit(0L)) +
          (col("ng") - coalesce(col("c"), lit(0L))) * topP).as("dist"))
    val wBest = Window.partitionBy("__id")
      .orderBy(col("dist"), col("plang"))
    dist.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("__id").as(idCol), col("plang").as("pred_lang"),
        col("dist"))
  }

  /** Doc-quality score in [−0.1, 0.9]: length saturation + lexical
    * diversity − punctuation density. Integer-derived arithmetic only
    * (deterministic across engines).
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val nChars = length(text)
    val nWords = size(t)
    val nDistinct = size(array_distinct(t))
    val nPunct = length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))
    val lenScore = least(nChars, lit(500)).cast("double") / 500.0
    val diversity = nDistinct.cast("double") / nullif(nWords, lit(0))
    val punctRatio = nPunct.cast("double") / nullif(nChars, lit(0))
    round(lenScore * 0.5 + diversity * 0.4 - punctRatio * 0.1, 6)
  }

  /** 64-bit-hex document fingerprint over whitespace-normalized text. */
  def fingerprint(text: Column): Column =
    substring(md5(trim(regexp_replace(lower(text), "\\s+", " "))), 1, 16)

  /** WIMBD-style corpus n-gram analysis (Elazar et al. 2023 "What's
    * In My Big Data?"): the `k` most frequent word `n`-grams
    * corpus-wide, with occurrence and document-frequency counts —
    * the first report run over a new crawl (boilerplate, license
    * headers, and template spam surface at the top).
    *
    * 100 TB shape: grams travel through BOTH corpus-sized hash-aggs
    * as xxhash64 fingerprints, never strings (the llm_decontaminate
    * trick — measured 2.4× on this key at sf0.1): the (hash, doc)
    * pre-agg caps any gram's shuffle fan-in at n_docs, the per-hash
    * rollup shuffles 16 bytes a row, and only the WINNERS' text is
    * recovered by a second map-only scan semi-filtered on the
    * broadcast winning-hash set. Tie-break correctness is preserved
    * exactly: the hash phase only computes the kth-place COUNT
    * (ties in the count order need no tie-break), every gram at or
    * above that count joins back (bounded by the boundary tie
    * width), and the final rank orders by (count desc, gram text) —
    * identical to the all-strings form, engine-portable. The final
    * top-k runs on that tiny candidate frame; no global sort of the
    * gram space ever materializes.
    */
  def ngramTopK(docs: DataFrame, idCol: String, textCol: String,
                n: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc"),
      tokens(col(textCol)).as("__tk"))
    val counts = toks
      .select(col("doc"),
        explode(Dedup.wordNgramHashes(col("__tk"), n)).as("gh"))
      .groupBy("gh", "doc").agg(count(lit(1)).as("c"))
      .groupBy("gh")
      .agg(sum(col("c")).as("n_occurrences"), count(lit(1)).as("n_docs"))
    // kth-largest count = admission threshold; candidates = every
    // gram at or above it (≥ k rows, bounded by boundary-tie width)
    val thr = broadcast(counts
      .orderBy(col("n_occurrences").desc).limit(k)
      .agg(min(col("n_occurrences")).as("__thr")))
    val winners = broadcast(
      counts.crossJoin(thr).filter(col("n_occurrences") >= col("__thr"))
        .select("gh", "n_occurrences", "n_docs"))
    // second map-only scan recovers ONLY the winners' gram text
    val names = toks
      .select(explode(arrays_zip(
        Dedup.wordNgramHashes(col("__tk"), n).as("gh"),
        wordNgramStrings(col("__tk"), n).as("gram"))).as("z"))
      .select(col("z.gh").as("gh"), col("z.gram").as("gram"))
      .join(winners, "gh")
      .groupBy("gh", "n_occurrences", "n_docs")
      .agg(min(col("gram")).as("gram"))
    val w = Window.orderBy(col("n_occurrences").desc, col("gram"))
    names
      .orderBy(col("n_occurrences").desc, col("gram")).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "gram", "n_occurrences", "n_docs")
  }

  /** Word n-gram STRINGS over an already-tokenized array — the
    * display form [[ngramTopK]] recovers for winning hashes; same
    * windowing as [[Dedup.wordNgramHashes]] so `arrays_zip` pairs
    * each hash with its text.
    */
  private[operators] def wordNgramStrings(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - n + 1),
        i => concat_ws(" ", slice(tk, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Winnowing fingerprints (Schleimer et al. 2003 — the MOSS
    * algorithm): per doc, the distinct minima of every `w`-window of
    * `k`-gram hashes. The winnowing guarantee: any two docs sharing a
    * token run of ≥ `w + k − 1` tokens share at least one
    * fingerprint, while fingerprint density stays ~2/(w+1) of the
    * gram count — the bounded-size alternative to shipping every
    * gram into an index (copy/plagiarism/near-dup candidate
    * generation at a fraction of full-gram cost).
    *
    * One row per (doc, fingerprint), distinct. Entirely MAP-ONLY
    * (plan-asserted): grams, hashes, window minima, and the distinct
    * all run as array expressions inside the scan stage — a doc
    * never leaves its partition to be fingerprinted. Hashes are the
    * md5-derived 32-bit bucket every routing decision uses
    * (engine-portable; the oracle replays the whole selection).
    * Docs shorter than `w` grams yield their single global minimum
    * (the standard short-doc rule); gram-less docs yield nothing.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k and w=$w must be >= 1")
    val gh = col("__gh")
    val hash32 = (g: Column) =>
      conv(substring(md5(g), 1, 8), 16, 10)
        .cast(org.apache.spark.sql.types.LongType)
    val mins =
      when(size(gh) === 0, array().cast("array<bigint>"))
        .when(size(gh) < w, array(array_min(gh)))
        .otherwise(transform(sequence(lit(1), size(gh) - w + 1),
          i => array_min(slice(gh, i, lit(w)))))
    docs
      .select(col(idCol), tokens(col(textCol)).as("__tk"))
      .select(col(idCol),
        transform(wordNgramStrings(col("__tk"), k), hash32).as("__gh"))
      .select(col(idCol), explode(array_distinct(mins)).as("fp"))
  }

  /** Per-document unigram token entropy — the classic
    * information-density quality signal (near-zero entropy = keyboard
    * mash / repeated boilerplate; used alongside Gopher's repetition
    * rules). H = ln N − (Σ c·ln c)/N over per-doc token counts c.
    *
    * Determinism across engines: each distinct count's ln quantizes
    * to a BIGINT (`round(ln·1e6)`, the tfIdfTopK trick), the per-doc
    * Σ c·ln_q(c) is an exact integer sum (order-insensitive), and the
    * closing arithmetic is a fixed chain of double ops on exact
    * integers — portable. One explode + two hash-aggs with map-side
    * partials; token-less docs drop out (nothing to score), matching
    * [[perplexityBuckets]].
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(idCol, "tok").agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") *
          round(log(col("c").cast("double")) * 1e6).cast("long"))
          .as("s_q"))
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        round(log(col("n_tokens").cast("double")) -
          col("s_q").cast("double") / col("n_tokens") / 1e6, 6)
          .as("entropy"))

  /** Gopher's n-gram repetition signals (Rae et al. 2021 Table A1,
    * occurrence-fraction variant): per doc, the share of 2-gram
    * occurrences taken by the single most frequent 2-gram
    * (`top_2gram_share`) and the fraction of 3-gram occurrences that
    * are within-doc repeats (`dup_3gram_frac`) — the companions to
    * [[gopherReason]]'s token-level rules ([[tokens]]-based like the
    * rest of the Gopher suite; the paper weights by characters).
    *
    * Both gram sizes ride ONE explode (each gram tagged with its n),
    * then two hash-aggs with map-side partials — the corpus is
    * scanned once. Docs with a 2-gram but no 3-gram get a NULL
    * dup_3gram_frac; docs under 2 tokens drop out.
    *
    * Grams travel as xxhash64 fingerprints of the token-array slice,
    * never as strings (counting only needs identity; the string form
    * measured 5× slower at sf0.1 — [[Dedup.wordNgramHashes]]'s
    * trick), and tokens materialize ONCE behind a projection
    * boundary so the per-gram lambda never re-runs the tokenizer.
    */
  def repetitionNgrams(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val tk = col("__tk")
    // ONE windowing definition for the whole codebase: tag
    // wordNgramHashes' output rather than re-deriving the slices
    def tagged(n: Int) =
      transform(Dedup.wordNgramHashes(tk, n),
        h => struct(lit(n).as("gn"), h.as("gh")))
    docs.select(col(idCol), tokens(col(textCol)).as("__tk"))
      .select(col(idCol), explode(concat(tagged(2), tagged(3))).as("g"))
      .select(col(idCol), col("g.gn").as("gn"), col("g.gh").as("gh"))
      .groupBy(idCol, "gn", "gh").agg(count(lit(1)).as("c"))
      .groupBy(idCol, "gn").agg(
        max(col("c")).as("mx"), sum(col("c")).as("tot"),
        count(lit(1)).as("dst"))
      .groupBy(idCol).agg(
        max(when(col("gn") === 2,
          col("mx").cast("double") / col("tot"))).as("top_2gram_share"),
        max(when(col("gn") === 3,
          lit(1.0) - col("dst").cast("double") / col("tot")))
          .as("dup_3gram_frac"))
  }

  /** PMI collocation mining — the classic corpus-analysis tool for
    * multiword expressions ("new york", "machine learning"):
    * adjacent-token bigrams scored by pointwise mutual information
    * ln(p(a,b) / (p(a)·p(b))), high-PMI pairs co-occur far more than
    * their unigram frequencies predict. `minCount` floors the bigram
    * count (PMI is noise-maximal at count 1); top `k` by PMI.
    *
    * Engine-portable scoring: every ln quantizes to a BIGINT
    * (`round(ln·1e6)`) and PMI assembles as exact integer
    * addition — pmi_q = ln_q(c_ab) − ln_q(N_bi) − ln_q(c_a) −
    * ln_q(c_b) + 2·ln_q(N_uni) — so ranking never compares noisy
    * doubles. 100 TB shape: the corpus is scanned exactly TWICE —
    * once per explode path (unigrams, adjacent pairs), each a
    * hash-agg with map-side partials; both count frames are
    * VOCABULARY-sized and localCheckpoint once, so the count-attach
    * joins (both sides of the bigram), the scalar totals
    * (N_uni = Σ c, N_bi = Σ c_ab before the minCount filter), and
    * every other consumer read the materialized frames instead of
    * re-running corpus lineage (multi-consumer DataFrames re-execute
    * their whole lineage per consumer otherwise). Joins shuffle only
    * vocab-sized frames on the token (no small-vocab broadcast
    * assumption — same discipline as tfIdfTopK); the totals ride a
    * 1-row broadcast; the final top-k is TakeOrderedAndProject,
    * never a global sort.
    */
  def collocations(docs: DataFrame, textCol: String, minCount: Long,
                   k: Int): DataFrame = {
    val lnQ = (c: Column) => round(log(c.cast("double")) * 1e6).cast("long")
    val tk = col("__tk")
    val toks = docs.select(tokens(col(textCol)).as("__tk"))
    val uni = toks.select(explode(tk).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    // adjacent-token pairs: one transform over positions, map-only
    val pairs = toks.filter(size(tk) >= 2)
      .select(explode(transform(sequence(lit(1), size(tk) - 1),
        i => struct(element_at(tk, i).as("a"),
          element_at(tk, i + 1).as("b")))).as("g"))
      .select(col("g.a").as("a"), col("g.b").as("b"))
    val bi0 = pairs.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .localCheckpoint(eager = false)
    val bi = bi0.filter(col("c_ab") >= minCount)
    // scalar totals from the checkpointed frames: N_uni = Σ c over
    // uni, N_bi = Σ c_ab over the unfiltered bi0
    val totals = broadcast(
      uni.agg(lnQ(sum(col("c"))).as("ln_nu"))
        .crossJoin(bi0.agg(lnQ(sum(col("c_ab"))).as("ln_nb"))))
    bi
      .join(uni.select(col("t").as("a"), lnQ(col("c")).as("ln_ca")), "a")
      .join(uni.select(col("t").as("b"), lnQ(col("c")).as("ln_cb")), "b")
      .crossJoin(totals)
      .select(col("a"), col("b"), col("c_ab"),
        (lnQ(col("c_ab")) - col("ln_nb") - col("ln_ca") - col("ln_cb") +
          lit(2L) * col("ln_nu")).as("pmi_q"))
      .orderBy(col("pmi_q").desc, col("a"), col("b")).limit(k)
  }

  /** Zipf-law fit over the corpus vocabulary — the tokenizer/corpus
    * health diagnostic: least-squares slope of ln(frequency) against
    * ln(rank) for the top `k` terms (natural text ≈ −1; template spam
    * and mode-collapsed synthetic data bend it). Returns one row
    * (n_terms, zipf_slope).
    *
    * The corpus-wide work is explode → hash-agg → TakeOrdered(k);
    * regression inputs quantize to BIGINTs (x = round(ln rank·1e6),
    * y = round(ln count·1e6)) so all five regression sums are exact
    * integer math and the closing slope is one deterministic double
    * division — engine-portable, the tfIdfTopK trick applied to
    * least squares.
    */
  def zipfSlope(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(k)
    val w = Window.orderBy(col("n").desc, col("token"))
    top
      .select(round(log(row_number().over(w).cast("double")) * 1e6)
          .cast("long").as("x"),
        round(log(col("n").cast("double")) * 1e6).cast("long").as("y"))
      .agg(count(lit(1)).as("k"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("k").as("n_terms"),
        round((col("k") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (col("k") * col("sxx") - col("sx") * col("sx"))
            .cast("double"), 6).as("zipf_slope"))
  }
}
