package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for LLM-data pipelines (north-star,
  * BASELINE.json): exact hash dedup, MinHash+LSH near-dup, SimHash,
  * n-gram Jaccard. Designed for 100 TB:
  *  - exact: one hash-shuffle groupBy, no window over raw text;
  *  - minhash: signatures are fixed-width aggregates with map-side
  *    partial min (shuffle carries k longs per doc, not shingles);
  *  - candidate pairs come from LSH band equi-joins (linear), never
  *    an all-pairs product;
  *  - all hash seeds are fixed constants → deterministic re-runs.
  */
object Dedup {

  /** Lineage cut used by the iterative/multi-consumer operators.
    * Default is `localCheckpoint` (memory-backed — right for local and
    * test runs). At 100 TB pass `durableCut` (or any custom cut) so
    * intermediate state survives executor loss: with
    * `spark.sparkContext.setCheckpointDir` pointing at durable
    * storage, a lost executor replays from the checkpoint instead of
    * recomputing the full signature/edge lineage.
    */
  type Cut = DataFrame => DataFrame
  val localCut: Cut = _.localCheckpoint()
  val durableCut: Cut = _.checkpoint()

  /** Normalized-text hash for exact dedup. */
  def normHash(text: Column): Column = md5(lower(trim(text)))

  /** Exact dedup: one surviving (min) id per normalized-text hash.
    * groupBy(min) rather than window-rank: single shuffle, partial
    * aggregation map-side.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(normHash(col(textCol)).as("h"), col(idCol))
      .groupBy("h")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** Word n-grams of a text column: sliding windows of `n` tokens
    * joined by single spaces (the unit of benchmark decontamination).
    * Empty array when the doc has fewer than `n` tokens — `sequence`
    * must not see start > stop (it would count DOWN).
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val tk = TextAnalysis.tokens(text)
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - n + 1),
        i => concat_ws(" ", slice(tk, i, lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** xxhash64 fingerprints of word n-grams over an ALREADY-TOKENIZED
    * array column, WITHOUT materializing gram strings: each gram
    * hashes its token-array slice directly (xxhash64 folds over array
    * elements). Distinct token tuples ↔ distinct hashes (modulo
    * 64-bit collisions), same contract the string form had after
    * hashing. FORMAT NOTE: these values persist in decontaminateIndex
    * gram tables — changing the hashing invalidates existing tables,
    * so the format is stamped in a [[GramHashFormatVersion]] table
    * sidecar and readers fail loudly on mismatch (bump the version
    * whenever this function's output changes).
    *
    * Takes the TOKEN column, not the text: inlining `tokens(text)` (a
    * regex split) here would re-evaluate it inside the per-gram
    * lambda — O(tokens²) regex work per doc, measured 10× slower at
    * sf0.1. Callers materialize tokens once per row via a projection
    * boundary ([[gramHashFrame]]); Catalyst keeps it (CollapseProject
    * refuses to duplicate non-cheap multiply-referenced expressions).
    */
  def wordNgramHashes(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - n + 1),
        i => xxhash64(slice(tk, i, lit(n)))))
      .otherwise(array().cast(ArrayType(LongType)))

  /** (`id`,) `gh` — one row per word n-gram of `textCol` — the shared
    * gram-explode of the decontamination paths, with the
    * tokens-materialized-once structure described on
    * [[wordNgramHashes]].
    */
  private def gramHashFrame(df: DataFrame, textCol: String, n: Int,
      idCol: Option[String]): DataFrame = {
    val base = df.select(
      idCol.map(c => col(c).as("id")).toSeq :+
        TextAnalysis.tokens(col(textCol)).as("__tk"): _*)
    base.select(idCol.map(_ => col("id")).toSeq :+
      explode(wordNgramHashes(col("__tk"), n)).as("gh"): _*)
  }

  /** Benchmark decontamination (the GPT-3/Gopher n-gram overlap
    * check): a training doc is contaminated when it shares ≥1 word
    * n-gram with any benchmark doc. Returns one row per contaminated
    * doc: (id, n_shared distinct contaminated n-grams).
    *
    * 100 TB shape: the benchmark side is small by nature (eval sets,
    * not corpora), so its DISTINCT hashed n-gram set broadcasts; the
    * corpus side is a map-only explode → broadcast-semi-filter, and
    * only SURVIVING (contaminated) grams reach the distinct+count
    * shuffle — the corpus is never shuffled by raw text. Grams travel
    * as xxhash64 fingerprints, not strings. Production pipelines use
    * n=8..13 (13 in GPT-3's report); callers tune `n` to their doc
    * length.
    */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int): DataFrame = {
    val benchGrams =
      gramHashFrame(bench, textCol, n, None).distinct()
    gramHashFrame(train, textCol, n, Some(idCol))
      .join(broadcast(benchGrams), "gh") // map-only contamination filter
      .distinct()                        // tiny: contaminated grams only
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
  }

  /** [[decontaminate]] with a BLOOM pre-filter — the tier for when the
    * benchmark gram set outgrows a comfortable broadcast hash relation
    * (a hash set costs ~16+ bytes per distinct gram; a 1%-fpp bloom
    * filter ~1.2 bytes — at billions of eval-set grams that is the
    * difference between a 2 GB and a 150 MB broadcast). The filter is
    * built once on the driver (`stat.bloomFilter`, a distributed
    * aggregation), ships as a plan literal, and every exploded corpus
    * gram is membership-tested MAP-ONLY via the codegen'd
    * [[graft.functions.BloomMightContain]] before any join: only
    * bloom-hit grams reach the exact confirm join's hash probe. Bloom
    * filters have NO false negatives, so the result is exactly
    * [[decontaminate]]'s (same oracle); false positives only cost a
    * little extra confirm work (bounded by `fpp`).
    *
    * The filter sits AFTER the explode (per gram), not on the per-doc
    * gram array: an array-level `exists` prefilter references the
    * gram array from both the filter and the downstream explode,
    * and predicate pushdown inlines the gram computation into the
    * filter — re-running the tokenizer regex per doc twice and
    * defeating the tokens-materialized-once boundary (measured >10×
    * at sf0.1). Per-gram filtering keeps one linear computation and
    * the same no-false-negative guarantee.
    */
  def decontaminateBloom(train: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String, n: Int,
                         fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    graft.functions.BloomFunctions.register(train.sparkSession)
    val benchGrams = gramHashFrame(bench, textCol, n, None)
      .distinct().localCheckpoint(eager = false)
    val bf = benchGrams.stat.bloomFilter("gh",
      math.max(benchGrams.count(), 1L), fpp)
    val bytes = graft.functions.BloomFunctions.serialize(bf)
    gramHashFrame(train, textCol, n, Some(idCol))
      .filter(graft.functions.BloomFunctions.mightContain(col("gh"), bytes))
      .join(broadcast(benchGrams), "gh") // exact confirm: kills bloom FPs
      .distinct()
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
  }

  /** Seed or extend the persisted benchmark gram table that
    * `decontaminateIncremental` checks new corpus batches against.
    * Stores one row per DISTINCT xxhash64 gram fingerprint (`gh`);
    * re-registering an overlapping benchmark batch appends only the
    * grams not already present (anti-join), so the table stays a set.
    * The append is exactly-once per `batchId` via the storage layer.
    * Returns the rows appended.
    *
    * Benchmark sets are eval-sized, so this table is small by nature —
    * it broadcasts at check time and the anti-join here is cheap.
    */
  /** Version stamp of the persisted gram-hash format, stored as a
    * table sidecar: "2" = xxhash64 over the token-array slice (current
    * [[wordNgramHashes]]); "1" (or an unstamped pre-versioning table)
    * = xxhash64 over the space-joined gram STRING. The two produce
    * disjoint hash values for the same grams, so a format mismatch
    * would silently report ZERO contamination — a safety-relevant
    * false negative — which is why readers fail loudly instead.
    */
  val GramHashFormatVersion = "2"
  private val GramFormatKey = "gramhash_format"

  private def requireGramFormat(runner: graft.pipeline.PipelineRunner,
                                table: String): Unit =
    if (runner.tableExists(table)) {
      val got = runner.tableSidecar(table, GramFormatKey)
      require(got.contains(GramHashFormatVersion),
        s"gram table '$table' uses hash format " +
          s"${got.getOrElse("<unstamped: pre-v2 joined-string hashing>")} " +
          s"but this build produces format $GramHashFormatVersion — a " +
          "mismatched read would match NOTHING (silent decontamination " +
          "false negatives). Drop the table (PipelineRunner.dropTable) " +
          "and rebuild it with decontaminateIndex.")
    }

  def decontaminateIndex(runner: graft.pipeline.PipelineRunner,
                         table: String, bench: DataFrame, idCol: String,
                         textCol: String, n: Int, batchId: Long): Long = {
    requireGramFormat(runner, table)
    val grams = gramHashFrame(bench, textCol, n, None).distinct()
    val fresh =
      if (!runner.tableExists(table)) grams
      else grams.join(runner.readTable(table), Seq("gh"), "left_anti")
    runner.appendBatch(table, fresh, batchId,
      sidecars = Map(GramFormatKey -> GramHashFormatVersion))
  }

  /** Incremental benchmark decontamination: check a NEW training batch
    * against the persisted benchmark gram table (seeded by
    * `decontaminateIndex`) without recomputing benchmark grams.
    * Same contract as `decontaminate` — one (id, n_shared) row per
    * contaminated doc in THIS batch.
    *
    * Equivalence (oracle-checked via `llm_decontaminate_incremental`
    * and property-tested in DedupSpec): contamination is per-doc, so
    * union(incremental over batches) ≡ one-shot over the union —
    * for any batch split of the corpus AND any batch split of the
    * benchmark, since the gram table accumulates a set.
    *
    * 100 TB shape: per batch, a map-only explode of the NEW docs, a
    * broadcast semi-filter against the (small, persisted) gram set,
    * then distinct+count over surviving grams only. The corpus is
    * never rescanned and never shuffled by raw text.
    */
  def decontaminateIncremental(runner: graft.pipeline.PipelineRunner,
                               table: String, batch: DataFrame,
                               idCol: String, textCol: String,
                               n: Int): DataFrame = {
    requireGramFormat(runner, table)
    val benchGrams = runner.readTable(table).select("gh")
    gramHashFrame(batch, textCol, n, Some(idCol))
      .join(broadcast(benchGrams), "gh") // map-only contamination filter
      .distinct()                        // tiny: contaminated grams only
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
  }

  /** MinHash signatures: k seeded permutations over `shingleLen`-char
    * sliding windows, computed by the native single-pass
    * `graft_minhash_sig` expression (graft.functions) — a map-only
    * projection, vs the naive shingle-explode → distinct →
    * groupBy(min)×k which shuffles every shingle. Returns
    * (idCol, m0..mk) for API compatibility.
    */
  def minHashSignature(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 32, shingleLen: Int = 5): DataFrame = {
    graft.functions.TextSignatures.register(df.sparkSession)
    df.select(col(idCol),
      graft.functions.TextSignatures.minHashSig(col(textCol), k, shingleLen)
        .as("sig"))
      .select(col(idCol) +: (0 until k).map(i => col("sig")(i).as(s"m$i")): _*)
  }

  /** LSH band-join near-dup candidate pairs with MinHash-estimated
    * similarity. bands*rows must equal k. Returns (a, b, est_sim)
    * with a < b, est_sim >= threshold.
    *
    * Shuffle discipline: band collisions are deduped to bare (a, b)
    * pairs *before* signatures are joined back and scored — a pair
    * colliding in several bands is scored once, and the band join
    * never carries the k-long signature arrays on both sides.
    *
    * `maxBucket` is the 100 TB skew fence: a band bucket of m docs
    * emits m·(m−1)/2 pairs, so ONE giant duplicate cluster (the
    * boilerplate page repeated a million times) would quadratically
    * blow up a single join task. Buckets larger than `maxBucket`
    * switch to STAR pairing — every member pairs with the bucket's
    * min id only, linear in m. Connectivity (what `clusters` /
    * `greedyKeep` consume) is preserved exactly; the price is that
    * member↔member pairs of oversized buckets are not listed
    * individually (and a member scoring < threshold against the
    * representative drops out) — run exact dedup first so identical
    * payloads never form the giant bucket. Property-tested: capped
    * and uncapped pair sets yield identical connected components.
    */
  def minHashNearDups(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 32, bands: Int = 8, threshold: Double = 0.5,
                      shingleLen: Int = 5, cut: Cut = localCut,
                      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    require(maxBucket >= 2, "maxBucket must be >= 2")
    val rows = k / bands
    // signatures feed three consumers (band explode + both sides of
    // the score join) — materialize once instead of re-scanning the
    // text 3×; pass `cut = durableCut` at cluster scale
    graft.functions.TextSignatures.register(df.sparkSession)
    val sigs = cut(df.select(col(idCol).as("id"),
      graft.functions.TextSignatures.minHashSig(col(textCol), k, shingleLen)
        .as("sig")))
    val banded = sigs.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64((lit(b) +: (0 until rows).map(r => col(s"sig")(b * rows + r))): _*)): _*))
        .as(Seq("band", "bsig")))
    val pairs: DataFrame =
      if (maxBucket == Int.MaxValue) {
        val a = banded.select(col("band"), col("bsig"), col("id").as("a"))
        val b = banded.select(col("band"), col("bsig"), col("id").as("b"))
        a.join(b, Seq("band", "bsig")).filter(col("a") < col("b"))
          .select("a", "b").distinct()
      } else {
        // bucket stats ride the same (band, bsig) shuffle key as the
        // pair join, so AQE reuses the exchange
        val stats = banded.groupBy("band", "bsig")
          .agg(count(lit(1)).as("bsz"), min("id").as("minid"))
        val tagged = banded.join(stats, Seq("band", "bsig"))
        val small = tagged.filter(col("bsz") <= maxBucket)
        val a = small.select(col("band"), col("bsig"), col("id").as("a"))
        val b = small.select(col("band"), col("bsig"), col("id").as("b"))
        val allPairs = a.join(b, Seq("band", "bsig"))
          .filter(col("a") < col("b")).select("a", "b")
        val starPairs = tagged
          .filter(col("bsz") > maxBucket && col("id") =!= col("minid"))
          .select(col("minid").as("a"), col("id").as("b"))
        allPairs.union(starPairs).distinct()
      }
    pairs
      .join(sigs.select(col("id").as("a"), col("sig").as("siga")), "a")
      .join(sigs.select(col("id").as("b"), col("sig").as("sigb")), "b")
      .select(col("a"), col("b"),
        (aggregate(zip_with(col("siga"), col("sigb"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0),
          (acc, v) => acc + v).cast(DoubleType) / k).as("est_sim"))
      .filter(col("est_sim") >= threshold)
  }

  /** Cross-corpus RECORD LINKAGE: MinHash/LSH fuzzy join between TWO
    * document sets (dedup's self-join generalized — match news
    * articles to wiki pages, crawl snapshots to each other, vendor
    * catalogs to a master list). Each side is signed once (map-only
    * native expression, cut so the text is not re-scanned for
    * scoring), band buckets equi-join ACROSS the sides, and surviving
    * pairs are scored once. Returns (left_id, right_id, est_sim) with
    * est_sim >= threshold.
    *
    * 100 TB shape: identical to [[minHashNearDups]] — candidates only
    * ever come from band-bucket equi-joins, signatures travel as
    * k-int arrays, pairs are deduped to bare ids before the score
    * join. There is no a<b filter (the sides are distinct keyspaces);
    * linkage of a frame with itself returns both mirrors and the
    * diagonal, which the self-dedup form filters.
    */
  def minHashLinkage(left: DataFrame, right: DataFrame, idCol: String,
                     textCol: String, k: Int = 32, bands: Int = 8,
                     threshold: Double = 0.5, shingleLen: Int = 5,
                     cut: Cut = localCut): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    graft.functions.TextSignatures.register(left.sparkSession)
    def sigs(df: DataFrame) = cut(df.select(col(idCol).as("id"),
      graft.functions.TextSignatures.minHashSig(col(textCol), k, shingleLen)
        .as("sig")))
    def banded(s: DataFrame) = s.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64((lit(b) +: (0 until rows).map(r =>
          col("sig")(b * rows + r))): _*)): _*))
        .as(Seq("band", "bsig")))
    val (ls, rs) = (sigs(left), sigs(right))
    val pairs = banded(ls).withColumnRenamed("id", "left_id")
      .join(banded(rs).withColumnRenamed("id", "right_id"),
        Seq("band", "bsig"))
      .select("left_id", "right_id").distinct()
    pairs
      .join(ls.select(col("id").as("left_id"), col("sig").as("siga")),
        "left_id")
      .join(rs.select(col("id").as("right_id"), col("sig").as("sigb")),
        "right_id")
      .select(col("left_id"), col("right_id"),
        (aggregate(zip_with(col("siga"), col("sigb"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0),
          (acc, v) => acc + v).cast(DoubleType) / k).as("est_sim"))
      .filter(col("est_sim") >= threshold)
  }

  /** LSH band rows (id, band, bsig) — the blocking signature shared by
    * one-shot near-dup pairing and incremental corpus dedup. Map-only:
    * one native single-pass signature per doc, `bands` rows out.
    */
  def bandRows(df: DataFrame, idCol: String, textCol: String,
               k: Int = 32, bands: Int = 8,
               shingleLen: Int = 5): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    graft.functions.TextSignatures.register(df.sparkSession)
    df.select(col(idCol).as("id"),
      graft.functions.TextSignatures.minHashSig(col(textCol), k, shingleLen)
        .as("sig"))
      .select(col("id"),
        posexplode(array((0 until bands).map(b =>
          xxhash64((lit(b) +: (0 until rows).map(r =>
            col("sig")(b * rows + r))): _*)): _*))
          .as(Seq("band", "bsig")))
  }

  /** Greedy (lexicographically-first) dedup over band rows: a doc is
    * KEPT iff it shares no band bucket with any kept lower-id doc —
    * exactly the sequential "process docs in id order, drop anything
    * near-dup'ing the kept set" semantics, computed distributedly as
    * parallel first-MIS rounds: each round keeps the docs that are the
    * minimum of every bucket they occupy (no smaller undecided
    * neighbor), drops everything sharing a bucket with a new keeper,
    * and repeats on the rest. The global minimum always wins a round,
    * so progress is guaranteed; typical convergence is O(log) rounds.
    * Returns one `id` row per kept doc.
    */
  def greedyKeep(bands0: DataFrame, maxIter: Int = 50,
                 cut: Cut = localCut): DataFrame = {
    val sc = bands0.sparkSession.sparkContext
    val desc0 = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription("greedyKeep: band rows")
    try {
    var alive = cut(bands0.select("id", "band", "bsig"))
    var kept = alive.select("id").limit(0)
    var i = 0
    var done = alive.isEmpty
    while (!done && i < maxIter) {
      sc.setJobDescription(s"greedyKeep: MIS round $i")
      // One materialization per round carrying BOTH decisions as row
      // flags (was: separate winners + alive cuts, each a join chain —
      // 3 materializations and ~9 AQE query-stage jobs per round).
      // The round is a LINEAR pipeline of four alternating-key window
      // aggregates — zero joins, zero broadcast builds, 4 exchanges:
      //  - bmin: min id of the row's bucket;
      //  - win(id): the doc is the min of EVERY bucket it occupies
      //    (min over its rows of bmin == its own id);
      //  - bhw: the bucket contains a winner. A winner w occupying
      //    bucket b IS b's min, so "b contains a winner" ⟺ "bmin(b)
      //    is a winner" — read off the bucket's own min-id row (the
      //    one row with id == bmin), no winnerBuckets semi-join;
      //  - dom(id): some bucket of the doc contains a winner. Winners
      //    dominate themselves, so !dom ≡ the old anti-join survivors.
      import org.apache.spark.sql.expressions.Window
      val wBucket = Window.partitionBy("band", "bsig")
      val wDoc = Window.partitionBy("id")
      // the last window is ORDERED so the same exchange+sort also
      // yields a per-doc row number — the kept-set read below then
      // filters (win && rn = 1) with ZERO exchanges instead of a
      // distinct over the band-times-replicated winner ids
      val wDocO = Window.partitionBy("id").orderBy("band", "bsig")
      val ann = cut(alive
        .withColumn("bmin", min(col("id")).over(wBucket))
        .withColumn("win", min(col("bmin")).over(wDoc) === col("id"))
        .withColumn("bhw",
          max(when(col("id") === col("bmin"), col("win"))).over(wBucket))
        .withColumn("dom", max(col("bhw")).over(wDocO.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("rn", row_number().over(wDocO))
        .select(col("id"), col("band"), col("bsig"),
          col("win"), col("dom"), col("rn")))
      // a doc sharing ANY bucket with a new keeper is a duplicate —
      // drop ALL its band rows (not just the colliding ones), or it
      // could win a later round through its other buckets
      kept = kept.unionByName(
        ann.filter(col("win") && col("rn") === 1).select("id"))
      alive = ann.filter(!col("dom")).select("id", "band", "bsig")
      // single-job convergence probe over the checkpointed round (an
      // isEmpty/take would escalate through up to 4 sub-jobs on the
      // final, empty round)
      done = ann.agg(coalesce(max(when(!col("dom"), lit(1))), lit(0)))
        .head().getInt(0) == 0
      i += 1
    }
    require(done, s"greedyKeep: not converged after $maxIter rounds")
    kept
    // finally: a failed round (or the require) must not leave
    // "greedyKeep: MIS round N" stamped on later jobs of the session
    } finally sc.setJobDescription(desc0)
  }

  /** Incremental corpus dedup — the production shape of training-data
    * curation: dedup a NEW document batch against the existing corpus
    * WITHOUT rescanning it. The warehouse table `table` persists the
    * band signatures of every kept doc; a new doc colliding with any
    * stored band is dropped, the rest run `greedyKeep` within the
    * batch, and the survivors' bands are appended (atomically,
    * idempotent per `batchId` via the storage layer's exactly-once
    * append — though a replayed batch recomputes against the
    * already-updated corpus, so only the first run's return value is
    * the batch's kept set).
    *
    * Semantics equivalence (property-tested): processing batches in
    * id order, incremental(b1 then b2) ≡ greedyKeep(b1 ∪ b2) —
    * greedy decisions only ever look at lower-id kept docs, which is
    * exactly what the persisted band table holds.
    *
    * Scale shape: per batch, one map-only signature pass over the NEW
    * docs, one band anti-join against the corpus table (shuffle is
    * O(batch bands + corpus bands keys), the corpus text is never
    * re-read), the in-batch MIS rounds, and one O(batch) append.
    */
  def dedupIncremental(runner: graft.pipeline.PipelineRunner,
                       table: String, batch: DataFrame,
                       idCol: String, textCol: String, batchId: Long,
                       k: Int = 32, bands: Int = 8, shingleLen: Int = 5,
                       maxIter: Int = 50, cut: Cut = localCut): DataFrame = {
    val nb = cut(bandRows(batch, idCol, textCol, k, bands, shingleLen))
    val candidates =
      if (!runner.tableExists(table)) nb
      else {
        val corpus = runner.readTable(table).select("band", "bsig")
        val collide = nb.join(corpus, Seq("band", "bsig"), "left_semi")
          .select("id").distinct()
        nb.join(collide, Seq("id"), "left_anti")
      }
    val kept = greedyKeep(candidates, maxIter, cut)
    val keptBands = candidates.join(kept, Seq("id"), "left_semi")
    runner.appendBatch(table, keptBands, batchId)
    kept
  }

  /** 64-bit frequency-weighted SimHash over lowercase [a-z0-9] token
    * runs, computed by the native single-pass `graft_simhash`
    * expression — a map-only projection (no token explode, no
    * 64-column groupBy shuffle).
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.TextSignatures.register(df.sparkSession)
    df.select(col(idCol),
      graft.functions.TextSignatures.simHash(col(textCol)).as("simhash"))
  }

  /** SimHash near-dup pairs with a *guaranteed-recall* blocking scheme
    * (multi-index Hamming search): the 64-bit signature is split into
    * `maxDist + 2` chunks and candidates block on every PAIR of
    * chunks — at hamming distance ≤ maxDist at most maxDist chunks
    * are dirty, leaving ≥ 2 clean chunks, so every true pair agrees
    * on at least one whole chunk-pair key. Candidates come from the
    * chunk-pair equi-join, are verified by exact `bit_count(xor)`,
    * then deduped to bare pairs. 100 % recall within maxDist.
    *
    * Why pairs and not the classic single-chunk pigeonhole
    * (maxDist + 1 chunks, key = one chunk): single-chunk keys are
    * only 64/(d+1) bits wide — 8 bits at d=7 — so bucket occupancy
    * (and the candidate-pair quadratic) saturates at a few thousand
    * docs; the sf1 soak measured 105× wall growth for 10× docs.
    * Chunk-pair keys are twice as wide (14 bits at d=7) for a
    * C(d+2,2)/(d+1) ≈ 4.5× row-replication trade — candidate pairs
    * shrink ~14× at 50k docs and keep shrinking quadratically in the
    * key-width gain as the corpus grows.
    */
  def simHashNearDups(sigs: DataFrame, idCol: String,
                      maxDist: Int = 7, cut: Cut = localCut,
                      maxGroupPairs: Option[Long] = None): DataFrame = {
    require(maxDist >= 0 && maxDist < 32, "maxDist must be in [0, 31]")
    require(maxGroupPairs.forall(_ >= 1), "maxGroupPairs must be >= 1")
    val nChunks = maxDist + 2
    // chunk i covers bits [i*64/nChunks, (i+1)*64/nChunks)
    val bounds = (0 to nChunks).map(i => i * 64 / nChunks)
    def chunkExpr(c: Int): String = {
      val lo = bounds(c); val width = bounds(c + 1) - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      s"((simhash >> $lo) & $mask)"
    }
    val keys = for {
      i <- 0 until nChunks; j <- (i + 1) until nChunks
    } yield expr(s"(${chunkExpr(i)} << 32) | ${chunkExpr(j)}")
    // Collapse identical signatures FIRST: template-heavy corpora
    // carry huge identical-signature groups (boilerplate/empty docs —
    // the sf1 soak saw single signatures shared by 2,400 docs), and
    // running the chunk join over member ROWS is quadratic in group
    // size on top of the blocking scheme. The join instead runs over
    // DISTINCT signatures (each represented once); member ids are
    // re-attached by signature equi-joins only to EMIT pairs, so
    // everything above the final output is sized by distinct
    // signatures, and the output-expansion joins are output-bound by
    // definition (same histogram trick as the theta-range join).
    val members = cut(sigs.select(col(idCol).as("id"), col("simhash")))
    val distinctSigs = cut(members.groupBy("simhash")
      .agg(count(lit(1)).as("grp"), min(col("id")).as("rep")))
    val chunked = distinctSigs.select(col("simhash"),
      posexplode(array(keys: _*)).as(Seq("chunk", "cval")))
    val cap = maxGroupPairs.map(lit(_))
    // The SimHash signature is ONE long — carry it through the chunk
    // join and popcount-filter BEFORE deduplicating, so only true
    // near-dup signature pairs reach the distinct.
    val a = chunked.select(col("chunk"), col("cval"),
      col("simhash").as("sa"))
    val b = chunked.select(col("chunk"), col("cval"),
      col("simhash").as("sb"))
    val sigPairs = a.join(b, Seq("chunk", "cval"))
      .filter(col("sa") < col("sb"))
      .select(col("sa"), col("sb"),
        bit_count(expr("sa ^ sb")).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
    // cross-signature pairs: expand both sides by signature equi-join.
    // An id carrying TWO near signatures (or duplicated input rows)
    // would otherwise surface as a self-pair — filter (a = b) out; a
    // pair reachable through two signature pairs may still emit twice
    // (downstream `clusters` dedups edges; a strict-set consumer adds
    // its own distinct). With `maxGroupPairs`, signature pairs whose
    // member expansion exceeds the cap emit ONE representative pair
    // (min-id of each group) instead — the within-group star below
    // spans each capped group, so connected components are preserved
    // exactly while a pathological template corpus (one signature
    // shared by thousands of docs near another such group) stays
    // linear in members instead of O(n²) in pairs.
    def expand(sp: DataFrame): DataFrame = sp
      .join(members.select(col("simhash").as("sa"), col("id").as("ia")), "sa")
      .join(members.select(col("simhash").as("sb"), col("id").as("ib")), "sb")
      .select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"), col("dist"))
      .filter(col("a") =!= col("b"))
    val cross = cap match {
      case None => expand(sigPairs) // no cap → no group-size joins
      case Some(c) =>
        val spWide = sigPairs
          .join(distinctSigs.select(col("simhash").as("sa"),
            col("grp").as("ga"), col("rep").as("ra")), "sa")
          .join(distinctSigs.select(col("simhash").as("sb"),
            col("grp").as("gb"), col("rep").as("rb")), "sb")
        expand(spWide.filter(col("ga") * col("gb") <= c)).unionByName(
          spWide.filter(col("ga") * col("gb") > c)
            .select(least(col("ra"), col("rb")).as("a"),
              greatest(col("ra"), col("rb")).as("b"), col("dist"))
            .filter(col("a") =!= col("b")))
    }
    // within-group pairs (dist = 0): a signature equi-self-join over
    // only the signatures that HAVE ≥ 2 members; groups above the cap
    // emit a min-id STAR (n-1 edges, same component) instead of all
    // C(n,2) pairs
    val bigSel = cap.map(c =>
      (col("grp") * (col("grp") - 1)) / 2 > c).getOrElse(lit(false))
    val dup = members.join(
      distinctSigs.filter(col("grp") >= 2 && !bigSel).select("simhash"),
      "simhash")
    val within = dup.select(col("simhash"), col("id").as("a"))
      .join(dup.select(col("simhash"), col("id").as("b")), "simhash")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), lit(0).as("dist"))
    val starred = cap match {
      case None => within
      case Some(_) =>
        val bigs = distinctSigs.filter(col("grp") >= 2 && bigSel)
          .select(col("simhash"), col("rep"))
        within.unionByName(
          members.join(bigs, "simhash")
            .filter(col("id") =!= col("rep"))
            .select(col("rep").as("a"), col("id").as("b"),
              lit(0).as("dist")))
    }
    cross.unionByName(starred)
  }

  /** Connected components over near-dup candidate pairs → one
    * (id, cluster_id) row per node, cluster_id = min id in the
    * component. This is what a pipeline user actually consumes
    * ("which doc to keep per cluster"), not raw pairs: keep-rows are
    * `cluster_id == id`.
    *
    * Min-label propagation ACCELERATED by pointer jumping: each round
    * (1) takes the min over neighbors' labels (the plain propagation
    * step) and (2) shortcuts through the previous round's label map —
    * label := min(label, prevLabel(label)). Step (2) roughly doubles
    * the hop distance a label has travelled, so convergence is
    * O(log diameter) rounds instead of O(diameter) — a 60-node chain
    * converges in ~7 rounds, not 60. Labels only ever decrease and a
    * no-change round is a fixpoint of plain propagation, so the
    * result is the identical min-id-per-component labeling. ONE
    * materialization job per round — the changed-flag rides along as
    * a column of the materialized round result, so convergence
    * detection is a short scan of the just-checkpointed partitions
    * (no re-execution of the propagation shuffle). `cut` cuts lineage
    * each round so plans don't grow exponentially; pass `durableCut`
    * at 100 TB so rounds survive executor loss.
    */
  /** NOTE: rows whose id is NULL are dropped — the pointer-jump join
    * is inner on the label map (a NULL id has no label to propagate
    * and never equals a join key). Pair generators here never emit
    * NULL ids; clean them first if an external caller's might.
    */
  def clusters(pairs: DataFrame, idA: String = "a", idB: String = "b",
               maxIter: Int = 50, cut: Cut = localCut): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    val desc0 = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription("cc: edges")
    try {
    // edges are re-joined every iteration — materialize once so the
    // (possibly expensive) pair-generation lineage runs exactly once,
    // HASH-PARTITIONED ON THE JOIN KEY: the checkpointed LogicalRDD
    // retains its outputPartitioning, so no round re-shuffles the
    // edge set (the largest frame in the loop) — only the label side
    // of the propagation join moves
    val edges = cut(pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .unionByName(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .repartition(col("src")))
    var labels = cut(edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")))
    var converged = labels.isEmpty // no edges → nothing to propagate
    var i = 0
    while (!converged && i < maxIter) {
      sc.setJobDescription(s"cc: round $i")
      // Propagation is a UNION of two message streams folded by ONE
      // aggregation — no label-merge left join: neighbor labels
      // through the edge list, plus the node's own label (so
      // unreached nodes keep theirs, and the agg recovers the old
      // label for the change flag).
      val msgs = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("label"), lit(false).as("own"))
        .unionByName(labels
          .select(col("id"), col("label"), lit(true).as("own")))
      val stepped = msgs.groupBy("id")
        .agg(min(col("label")).as("__l1"),
          min(when(col("own"), col("label"))).as("__old"))
      // POINTER JUMP on the post-propagation label through the
      // PREVIOUS round's materialized map: a label is always some
      // node's id (initial labels are ids; every update takes a min
      // of existing labels), and that node's own label is ≤ it, so
      // one hop of the map compounds the propagation step's progress.
      // The join is inner — total by the same invariant.
      // Materialize label + changed-flag together: the eager cut runs
      // the round's shuffles once, then the convergence probe and the
      // next round's joins both read the cached/checkpointed result.
      val next = cut(stepped
        .join(labels.select(col("id").as("__jid"),
          col("label").as("__jl")), col("__l1") === col("__jid"))
        .select(col("id"),
          least(col("__l1"), col("__jl")).as("label"),
          (least(col("__l1"), col("__jl")) < col("__old")).as("chg")))
      // single-job probe: agg over the checkpointed partitions (an
      // isEmpty/take probe launches up to 4 escalating sub-jobs when
      // NO row matches — exactly the converged round)
      val changed = next.agg(max(col("chg"))).head().getBoolean(0)
      labels = next.drop("chg")
      converged = !changed
      i += 1
    }
    // silent partial convergence would split one component across
    // several cluster ids — a dedup keeping cluster_id==id rows would
    // then retain duplicates with no signal; fail loudly instead
    require(converged,
      s"clusters: component diameter exceeds $maxIter iterations; raise maxIter")
    labels.select(col("id"), col("label").as("cluster_id"))
    // finally: a failed round (or the require) must not leave
    // "cc: round N" stamped on every later job of the session
    } finally sc.setJobDescription(desc0)
  }

  /** Duplicated-line removal (the CCNet / Dolma paragraph-dedup step:
    * Wenzek et al. 2020 §3.1 dedup every corpus at the paragraph
    * level before LM filtering; Dolma mirrors it line-wise): split
    * each doc into lines on `sepRegex`, keep only the GLOBALLY FIRST
    * occurrence of every distinct line — first = smallest
    * (doc id, line position), so re-runs are deterministic and
    * within-doc repeats dedup too — and reassemble the surviving
    * lines in original order.
    *
    * Returns one row per doc: (idCol, n_lines, n_kept, text) where
    * `text` is the kept lines joined by `joinSep` (NULL when every
    * line of the doc occurred earlier — the exact-duplicate-doc
    * case).
    *
    * 100 TB shape: TWO shuffles total and the corpus text moves
    * through each exactly once — (1) a window partitioned by the line
    * to rank occurrences (partition by `xxhash64(line)` instead when
    * the exchange should carry 8 bytes per row, not the text; the
    * string form here is what a cross-engine oracle can replay), and
    * (2) the per-doc reassembly hash-agg. No join: the first-occurrence
    * flag rides the line row out of the window, so there is no
    * kept-set join-back. Line groups are tiny (occurrence counts), so
    * the window never sees a skewed single task the way a global
    * window would.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                sepRegex: String = "\n", joinSep: String = "\n"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), sepRegex))
        .as(Seq("pos", "line")))
      .filter(trim(col("line")) =!= "")
    val firstOcc = Window.partitionBy(col("line"))
      .orderBy(col(idCol), col("pos"))
    lines
      .withColumn("rk", row_number().over(firstOcc))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_kept"),
        // surviving lines back in document order; NULL (not "") when
        // nothing survives, matching SQL string_agg-over-empty
        nullif(
          array_join(
            transform(
              array_sort(collect_list(when(col("rk") === 1,
                struct(col("pos"), col("line"))))),
              x => x.getField("line")),
            joinSep),
          lit("")).as("text"))
  }

  /** Exact duplicated-substring spans (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * ExactSubstr signal, re-expressed relationally): a token position
    * is duplicated when some word `n`-gram covering it occurs more
    * than once in the corpus (any doc, including its own). Returns
    * the MAXIMAL contiguous duplicated regions per doc — one row per
    * span: (idCol, span_start, span_end, span_len, n_grams), token
    * positions 1-based inclusive, `n_grams` = duplicated gram starts
    * merged into the span. Lee et al. mine these spans with a suffix
    * array; the fixed-`n` gram formulation trades their
    * arbitrary-length matches for a pure dataflow plan (their own
    * production setting uses spans ≥ 50 tokens ≈ this with n=50).
    *
    * 100 TB shape: tokens materialize once per row, grams explode
    * map-only, then TWO shuffles — (1) a window partitioned by the
    * gram counts occurrences (at scale partition by the gram's
    * xxhash64 — [[wordNgramHashes]] — so the exchange carries a long;
    * the string form is what the oracle replays), and (2) the island
    * merge: the doc-partitioned running-max window and the
    * (doc, island) hash-agg share ONE exchange, because
    * HashPartitioning(doc) already satisfies the agg's clustering.
    * Only duplicated gram starts — not the corpus — reach shuffle (2).
    * Splitting on a single space (not the tokenizer regex) keeps
    * positions aligned with the raw token stream.
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
               n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 2, s"dupSpans: n must be >= 2, got $n")
    val grams = df
      .select(col(idCol), split(col(textCol), " ").as("__tk"))
      .select(col(idCol), posexplode(
        when(size(col("__tk")) >= n,
          transform(sequence(lit(1), size(col("__tk")) - n + 1),
            i => concat_ws(" ", slice(col("__tk"), i, lit(n)))))
          .otherwise(array().cast(ArrayType(StringType))))
        .as(Seq("p0", "gram")))
      .select(col(idCol), (col("p0") + 1).cast(LongType).as("p"), col("gram"))
    val occ = count(lit(1)).over(Window.partitionBy(col("gram")))
    val dup = grams.withColumn("cnt", occ).filter(col("cnt") > 1)
      .select(col(idCol), col("p"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("p"))
    val prevEnd = max(col("p") + lit(n - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    // gaps-and-islands: a new span starts when this gram's coverage
    // [p, p+n-1] neither overlaps nor abuts the running coverage end
    val brk = when(prevEnd.isNull || col("p") > prevEnd + 1, 1L)
      .otherwise(0L)
    dup
      .withColumn("island",
        sum(brk).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("p")).as("span_start"),
        (max(col("p")) + lit(n - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"),
        col("n_grams"))
  }

  /** APPLY the [[dupSpans]] signal (Lee et al. 2022's removal step):
    * drop every token covered by a corpus-duplicated span and
    * reassemble the document from the survivors. One row per doc:
    * (idCol, n_tokens, n_removed, text) — `text` is the kept tokens
    * joined by a single space, NULL when the whole doc was covered
    * (the fully-duplicated-document case). Docs with no duplicated
    * span pass through with n_removed = 0.
    *
    * Lee et al. keep one occurrence of each duplicated substring;
    * this removes EVERY covered region — the conservative form whose
    * output is a pure per-doc function of the span set, so re-runs
    * and the cross-engine oracle agree without a global
    * which-copy-wins tie-break.
    *
    * 100 TB shape: on top of dupSpans' two exchanges, the token
    * stream shuffles ONCE on the doc id — the span join
    * (sort-merge on idCol; spans are corpus-sized in the worst case,
    * so no broadcast assumption) and the per-doc reassembly hash-agg
    * share that one HashPartitioning(idCol) exchange. Spans are
    * maximal and disjoint per doc, so the range predicate matches
    * each token at most once — the join cannot fan out.
    */
  def dupSpanRemove(df: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    val spans = dupSpans(df, idCol, textCol, n)
      .select(col(idCol).as("__sid"), col("span_start"), col("span_end"))
    // split on the single space, positions 1-based — the exact token
    // frame dupSpans' grams were built from, so coverage aligns
    val toks = df
      .select(col(idCol), posexplode(split(col(textCol), " "))
        .as(Seq("p0", "tok")))
      .select(col(idCol), (col("p0") + 1).cast(LongType).as("p"),
        col("tok"))
    toks
      .join(spans, toks(idCol) === col("__sid") &&
        col("p") >= col("span_start") && col("p") <= col("span_end"),
        "left")
      .withColumn("__covered", col("span_start").isNotNull)
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__covered"), 1L).otherwise(0L)).as("n_removed"),
        // survivors back in token order; NULL (not "") when nothing
        // survives, matching SQL string_agg-over-empty
        nullif(
          array_join(
            transform(
              array_sort(collect_list(when(!col("__covered"),
                struct(col("p"), col("tok"))))),
              x => x.getField("tok")),
            " "),
          lit("")).as("text"))
  }

  /** Token-set Jaccard between doc pairs given a (docA, docB) pair
    * frame. Distinct-token frames joined per pair — linear in the
    * candidate pair count (callers supply blocked/LSH candidates, not
    * the full product).
    */
  /** Shared pair-overlap scaffolding: given a DISTINCT per-doc
    * feature frame (`id`, `f`) and a (doc_a, doc_b) candidate frame,
    * returns (doc_a, doc_b, common, n_a, n_b) — the raw counts every
    * set-overlap metric (Jaccard, containment, overlap coefficient)
    * derives from. Feature frames joined per pair — linear in the
    * candidate pair count, never a corpus product.
    */
  private def pairOverlapCounts(features: DataFrame,
                                pairs: DataFrame): DataFrame = {
    val counts = features.groupBy("id").agg(count(lit(1)).as("n"))
    val common = pairs
      .join(features.withColumnRenamed("id", "doc_a"), "doc_a")
      .join(features.withColumnRenamed("id", "doc_b"), Seq("doc_b", "f"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
    common
      .join(counts.withColumnRenamed("id", "doc_a")
        .withColumnRenamed("n", "n_a"), "doc_a")
      .join(counts.withColumnRenamed("id", "doc_b")
        .withColumnRenamed("n", "n_b"), "doc_b")
      .select("doc_a", "doc_b", "common", "n_a", "n_b")
  }

  def jaccardForPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("f"))
    pairOverlapCounts(toks, pairs)
      .withColumn("jaccard", col("common").cast(DoubleType) /
        (col("n_a") + col("n_b") - col("common")))
  }

  /** N-gram CONTAINMENT between doc pairs (Broder 1997's asymmetric
    * resemblance): `cont_ab` = |grams(A) ∩ grams(B)| / |grams(A)| —
    * near 1.0 when A is substantially contained IN B even when B is
    * much longer (the quote/boilerplate/doc-in-doc signal symmetric
    * Jaccard misses, since a big |B| dilutes the union). Returns both
    * directions plus the raw counts.
    *
    * Same scale shape as [[jaccardForPairs]]: distinct hashed-gram
    * frames joined per candidate pair — linear in the pair count, and
    * grams travel as xxhash64 longs ([[wordNgramHashes]]), never
    * strings. Docs with fewer than `n` tokens have no grams and drop
    * from the result (no 0/0 rows).
    */
  def containmentForPairs(docs: DataFrame, pairs: DataFrame,
                          idCol: String, textCol: String,
                          n: Int = 3): DataFrame = {
    val grams = gramHashFrame(docs, textCol, n, Some(idCol)).distinct()
      .withColumnRenamed("gh", "f")
    pairOverlapCounts(grams, pairs)
      .withColumn("cont_ab",
        col("common").cast(DoubleType) / col("n_a"))
      .withColumn("cont_ba",
        col("common").cast(DoubleType) / col("n_b"))
  }

  /** Levenshtein distance between doc pairs given a (docA, docB) pair
    * frame, on `prefixLen`-char prefixes — the title/head near-match
    * signal (edit distance is O(len²) per pair, so production use is
    * ALWAYS (a) on blocked candidate pairs, never the full product,
    * and (b) on bounded prefixes, never whole documents). Two id
    * equi-joins to attach prefixes, then a map-only codegen'd
    * `levenshtein`; sim = 1 − dist/maxlen.
    */
  def editDistanceForPairs(docs: DataFrame, pairs: DataFrame,
                           idCol: String, textCol: String,
                           prefixLen: Int = 64): DataFrame = {
    val pref = docs.select(col(idCol).as("id"),
      substring(col(textCol), 1, prefixLen).as("pref"))
    pairs
      .join(pref.withColumnRenamed("id", "doc_a")
        .withColumnRenamed("pref", "pref_a"), "doc_a")
      .join(pref.withColumnRenamed("id", "doc_b")
        .withColumnRenamed("pref", "pref_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("pref_a"), col("pref_b")).as("dist"),
        greatest(length(col("pref_a")), length(col("pref_b"))).as("maxlen"))
      .withColumn("sim",
        when(col("maxlen") === 0, 1.0)
          .otherwise(lit(1.0) - col("dist").cast(DoubleType) / col("maxlen")))
  }
}
