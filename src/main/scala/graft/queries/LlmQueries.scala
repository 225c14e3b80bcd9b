package graft.queries

import graft.{QueryGroup, Tables}
import graft.operators.{Curation, Dedup, Multimodal, QualityClassifier, Similarity, Sketches, TextAnalysis, VectorIndex}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.12 + BASELINE.json north-star: LLM-data-pipeline
  * operators over `documents` / `embeddings`. The heavy lifting lives
  * in graft.operators (Dedup / Similarity / TextAnalysis /
  * Multimodal); these register the driver-checkable query keys.
  */
object LlmOps extends QueryGroup {

  /** Scratch warehouse/fixture dir under target/ (git-ignored),
    * deleted at JVM exit — same pattern as PipelineOps; shared with
    * sibling query groups (BpeOps).
    */
  def scratchDir(key: String): String = freshDir(key)

  private def freshDir(key: String): String = {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch")
    java.nio.file.Files.createDirectories(base)
    val dir = java.nio.file.Files.createTempDirectory(base, key)
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(dir)
      val all = try s.iterator().asScala.toSeq finally s.close()
      all.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
    dir.toString
  }

  override def queries: Map[String, Q] = Map(
    "llm_exact_dedup" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")
        .orderBy("h")),

    // Dedup observability: cluster-size histogram over exact-dup
    // groups — duplicate-rate audit BEFORE committing to a dedup run
    // (how much volume dedup removes, and whether one giant cluster
    // dominates — the skew signal for minHashNearDups' maxBucket).
    // Two vocabulary-sized hash-aggs after the one corpus shuffle.
    "llm_dup_cluster_hist" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")
        .groupBy(col("n").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("n")).as("n_docs"))
        .orderBy("cluster_size")),

    // MinHash+LSH near-dup pairs — algorithmic (custom hash family),
    // no ANSI oracle; property-tested in the unit suite.
    "llm_minhash_neardup" -> ((s, d) =>
      Dedup.minHashNearDups(Tables.documents(s, d), "doc_id", "text",
        k = 32, bands = 8, threshold = 0.5)
        .orderBy("a", "b")),

    // maxDist=7 keeps the recall guarantee honest: the signature
    // splits into 9 (= maxDist+2) chunks and candidates block on
    // chunk PAIRS — ≤7 dirty chunks always leave ≥2 clean ones, so
    // any pair within hamming distance 7 shares a whole chunk-pair
    // key (multi-index pigeonhole; see Dedup.simHashNearDups).
    // Property-tested.
    "llm_simhash" -> ((s, d) => {
      val sigs = Dedup.simHash(Tables.documents(s, d), "doc_id", "text")
      Dedup.simHashNearDups(sigs, "doc_id", maxDist = 7)
        .orderBy("a", "b")
    }),

    // Pairs → connected components → keep-min-per-cluster: the shape a
    // dedup pipeline consumes. No oracle (depends on the MinHash
    // family); clustering itself is property-tested in DedupSpec.
    "llm_neardup_clusters" -> ((s, d) => {
      val pairs = Dedup.minHashNearDups(Tables.documents(s, d), "doc_id",
        "text", k = 32, bands = 8, threshold = 0.5)
      Dedup.clusters(pairs).orderBy("id")
    }),

    // Adjacent-id pair Jaccard keeps the oracle linear; the general
    // operator takes arbitrary (blocked) candidate pairs.
    "llm_ngram_jaccard" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = docs.select(col("doc_id").as("doc_a"),
        (col("doc_id") + 1).as("doc_b"))
      Dedup.jaccardForPairs(docs, pairs, "doc_id", "text")
        .orderBy("doc_a")
    }),

    // Asymmetric n-gram containment over the same blocked pairs —
    // the doc-contained-in-doc signal (quotes/boilerplate) symmetric
    // Jaccard dilutes. Grams travel hashed; counts compare exactly.
    "llm_containment" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = docs.select(col("doc_id").as("doc_a"),
        (col("doc_id") + 1).as("doc_b"))
      Dedup.containmentForPairs(docs, pairs, "doc_id", "text", n = 3)
        .orderBy("doc_a")
    }),

    // Cross-corpus record linkage: evens vs odds stand in for two
    // document sets; LSH bands equi-join ACROSS the sides. No oracle
    // (custom hash family); self-linkage ≡ near-dup pairs is
    // property-tested in DedupSpec.
    "llm_record_linkage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.minHashLinkage(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text", k = 32, bands = 8, threshold = 0.5)
        .orderBy("left_id", "right_id")
    }),

    // Edit-distance near-match on 64-char prefixes over blocked
    // (adjacent-id) pairs — the title/head fuzzy-dup signal. O(len²)
    // per pair bounded by the prefix cap; never the full product.
    "llm_edit_distance" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = docs.select(col("doc_id").as("doc_a"),
        (col("doc_id") + 1).as("doc_b"))
      Dedup.editDistanceForPairs(docs, pairs, "doc_id", "text")
        .orderBy("doc_a")
    }),

    // BLEU-2 components over the same blocked pairs — CLIPPED n-gram
    // precision (candidate grams credit only up to the reference's
    // multiplicity: the repetition fence). bleu2 = sqrt(p1·p2) is
    // engine-portable (sqrt IEEE-rounds exactly; the BP's exp would
    // not be, so the exponent inputs n_a/n_b ship instead).
    "llm_bleu_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = docs.select(col("doc_id").as("doc_a"),
        (col("doc_id") + 1).as("doc_b"))
      TextAnalysis.bleuForPairs(docs, pairs, "doc_id", "text")
        .orderBy("doc_a")
    }),

    // ROUGE-L F1 over the same blocked pairs — the sequence-aware
    // overlap (LCS credits in-order tokens only; a shuffled bag that
    // fools n-gram overlap scores low). No oracle (DuckDB has no LCS);
    // DP identities + bounds are unit-tested in CurationSpec.
    "llm_rouge_l" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = docs.select(col("doc_id").as("doc_a"),
        (col("doc_id") + 1).as("doc_b"))
      TextAnalysis.rougeLForPairs(docs, pairs, "doc_id", "text",
        maxTokens = 64)
        .orderBy("doc_a")
    }),

    // Benchmark decontamination: docs with doc_id % 20 == 0 stand in
    // for the held-out eval set, the rest are the training corpus.
    // n=3 because the synthetic docs are short random-vocab strings;
    // real pipelines use n=8..13 (see Dedup.decontaminate).
    "llm_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.decontaminate(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Incremental decontamination: the benchmark gram table is seeded
    // in TWO overlapping-free batches, then the training corpus is
    // checked in TWO batches against the persisted table — no
    // benchmark re-gramming, no corpus rescan. Union of batch results
    // must hash-match the one-shot oracle (same SQL as
    // llm_decontaminate), proving incremental ≡ one-shot.
    "llm_decontaminate_incremental" -> ((s, d) => {
      import graft.pipeline.{PipelineRunner, PipelineSpec}
      val r = new PipelineRunner(s, PipelineSpec(Nil), freshDir("inc_decon"))
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") % 20 === 0)
      val train = docs.filter(col("doc_id") % 20 =!= 0)
      val split = 250L // both halves non-empty at every fixture SF
      Dedup.decontaminateIndex(r, "bench_grams",
        bench.filter(col("doc_id") < split), "doc_id", "text", n = 3,
        batchId = 0L)
      Dedup.decontaminateIndex(r, "bench_grams",
        bench.filter(col("doc_id") >= split), "doc_id", "text", n = 3,
        batchId = 1L)
      val c1 = Dedup.decontaminateIncremental(r, "bench_grams",
        train.filter(col("doc_id") < split), "doc_id", "text", n = 3)
      val c2 = Dedup.decontaminateIncremental(r, "bench_grams",
        train.filter(col("doc_id") >= split), "doc_id", "text", n = 3)
      c1.unionByName(c2)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Bloom-prefilter decontamination tier: the benchmark gram set
    // ships as a ~1.2-byte-per-gram bloom literal instead of a hash
    // relation, clean docs drop map-only inside the scan stage, and
    // only bloom-hit docs reach the exact confirm join. Blooms have no
    // false negatives and the confirm join kills false positives, so
    // the result — and the oracle — are exactly llm_decontaminate's.
    "llm_decontaminate_bloom" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.decontaminateBloom(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // integer-quantized exact form: cross-engine bit-identical with no
    // round() (the rounded-DECIMAL form flipped a 6th-decimal boundary
    // row at sf0.1)
    "llm_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopKExact(emb.filter(col("vec_id") < 5), emb, k = 5)
        .select("qid", "cid", "cos", "rn")
        .orderBy("qid", "rn")
    }),

    // METADATA-FILTERED vector search (the vector-db `filter=` knob):
    // the corpus predicate applies BEFORE scoring — pushed into the
    // parquet scan, so at 100 TB only matching rows are even read
    // (with a partitioned/clustered corpus the filter prunes files).
    // Exact tier for the oracle; the same filter composes with the
    // LSH/IVF keys for the ANN path.
    "llm_ann_filtered" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopKExact(
        emb.filter(col("vec_id") < 5),
        emb.filter(col("label") === 3), k = 5)
        .select("qid", "cid", "cos", "rn")
        .orderBy("qid", "rn")
    }),

    // Hard-negative mining (DPR, Karpukhin et al. 2020): per query,
    // top-5 most-similar WRONG-label candidates — the confusable
    // negatives contrastive training needs. Label inequality lives in
    // the join filter (per-query predicate); exact-integer oracle
    // tier, LSH/IVF compose the same predicate at 100 TB.
    "llm_hard_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.hardNegatives(emb.filter(col("vec_id") < 5), emb, k = 5)
        .select("qid", "qlabel", "cid", "neg_label", "cos", "rn")
        .orderBy("qid", "rn")
    }),

    // kNN label vote — the standard embedding-space eval/labeling
    // step (classify held-out vectors by their neighbors' labels).
    // Reuses the exact brute-force tier (the declared oracle tier;
    // llm_ann_lsh / llm_ann_ivf are the 100 TB path for the same
    // neighbor search): queries vec_id<50 broadcast against the rest
    // of the corpus, top-5 neighbors vote, ties break to the smaller
    // label so the prediction is deterministic cross-engine. The
    // label join-back broadcasts the tiny top-k frame, never
    // shuffling the corpus.
    "llm_knn_classify" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val top = Similarity.bruteForceTopKExact(
        emb.filter(col("vec_id") < 50),
        emb.filter(col("vec_id") >= 50), k = 5)
      emb.select(col("vec_id").as("cid"), col("label"))
        .join(broadcast(top), "cid")
        .groupBy("qid", "label").agg(count(lit(1)).as("votes"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("qid")
            .orderBy(col("votes").desc, col("label"))))
        .filter(col("rk") === 1)
        .select(col("qid"), col("label").as("pred_label"), col("votes"))
        .orderBy("qid")
    }),

    // ANN paths score with the native codegen'd VecDot expression
    // (graft.functions) — a tight primitive loop in WholeStageCodegen
    // instead of per-element lambda dispatch.
    "llm_ann_lsh" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb.filter(col("vec_id") < 5), emb,
        dims = 64, planes = 8, k = 5,
        cosFn = graft.functions.GraftFunctions.vecCosine)
        .select("qid", "cid", "cos", "rn")
        .orderBy("qid", "rn")
    }),

    // SQ8 compressed-vector tier: byte codes (4× smaller than
    // float32), per-vector scale, approximate-cosine ranking on
    // exact integer byte-dots — the one ANN compression whose entire
    // pipeline is engine-portable, hence a full hash-checked oracle.
    "llm_ann_sq8" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.sq8TopK(emb.filter(col("vec_id") < 5), emb, k = 5)
        .select("qid", "cid", "acos", "rn")
        .orderBy("qid", "rn")
    }),

    // Coarse quantizer trained by deterministic seeded k-means
    // (Similarity.kmeansCentroids) — recall@k vs brute force is
    // asserted in SimilaritySpec; nprobe=nlist ≡ brute force remains
    // the exactness backstop.
    // SemDeDup (Abbas et al. 2023): k-means cluster the embeddings,
    // within-cluster cosine ≥ tau pairs are semantic duplicates, keep
    // the min-id representative per duplicate component. No oracle
    // (seeded k-means is engine-specific); invariants — one keeper
    // per group, identical vectors always co-group, tau monotonicity
    // — are property-tested in SimilaritySpec. Production tau is
    // ≈0.95+; the synthetic embeddings are uniform-random (max
    // pairwise cosine ≈0.51), so the demo threshold sits below that
    // to exercise non-trivial grouping.
    "llm_semdedup" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      // nlist=16 bounds the within-cluster pair quadratic at
      // (corpus/16)² per cluster (SemDeDup's knob — more clusters =
      // less pair work, slightly coarser cross-cluster recall);
      // k-means trains on a ~25% hash-sample, the 100 TB practice
      Similarity.semDedup(Tables.embeddings(s, d), nlist = 16,
        tau = 0.40, iters = 3, sampleFraction = 0.25,
        cosFn = graft.functions.GraftFunctions.vecCosine)
        .orderBy("vec_id")
    }),

    "llm_ann_ivf" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      // the quantizer needs the density shape, not every row: train on
      // a deterministic ~10% hash-sample (the 100 TB practice; at
      // sf0.001 the table is small enough that the sample is it)
      val trainSet = emb.filter(
        pmod(xxhash64(col("vec_id")), lit(10)) === 0)
      val cents = Similarity.kmeansCentroids(
        if (trainSet.isEmpty) emb else trainSet, k = 16, iters = 5)
      Similarity.ivfTopK(emb.filter(col("vec_id") < 5), emb,
        centroids = cents, nprobe = 4, k = 5,
        cosFn = graft.functions.GraftFunctions.vecCosine)
        .select("qid", "cid", "cos", "rn")
        .orderBy("qid", "rn")
    }),

    // PQ (Jégou et al. 2011): m=8 subspaces × ksub=16 codes — vectors
    // compress 64×float32 → 8 code ids; search is ADC lookups over the
    // code column only. No oracle (L2 k-means codebooks are
    // engine-specific); exactness under a perfect codebook, recall vs
    // exact L2, determinism, and the map-only encode plan are
    // property-tested in SimilaritySpec.
    "llm_ann_pq" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      // codebooks train on a ~25% deterministic hash-sample — they
      // need the density shape, not every row (the 100 TB practice,
      // same as the persisted-IVF key); encode/search still cover the
      // full corpus
      val books = Similarity.pqTrain(emb, m = 8, ksub = 16, iters = 3,
        sampleFraction = 0.25)
      Similarity.pqTopK(emb.filter(col("vec_id") < 5), emb, books, k = 5)
        .select("qid", "cid", "adist", "rn")
        .orderBy("qid", "rn")
    }),

    // PERSISTED IVF index — the production ANN shape: the quantizer is
    // trained once and stored as warehouse tables (centroids +
    // inverted lists); a later batch of vectors is assigned MAP-ONLY
    // against the stored centroids and appended (the existing corpus
    // is never re-read, no k-means reruns); search probes the stored
    // lists. No oracle (custom index); reuse + from-scratch
    // equivalence unit-tested in SimilaritySpec.
    "llm_ann_ivf_persisted" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      import graft.pipeline.{PipelineRunner, PipelineSpec}
      val r = new PipelineRunner(s, PipelineSpec(Nil), freshDir("ivf_idx"))
      val emb = Tables.embeddings(s, d)
      val cosFn = graft.functions.GraftFunctions.vecCosine(_, _)
      // initial corpus → train + assign; later arrivals → incremental.
      // Training samples ~20% (deterministic hash-sample): the coarse
      // quantizer needs the density shape, not every row — the 100 TB
      // practice, and the fixture is big enough for 16 centroids.
      VectorIndex.ensureIvf(r, "ivx", emb.filter(col("vec_id") % 10 =!= 0),
        nlist = 16, iters = 3, sampleFraction = 0.2, cosFn = cosFn)
      VectorIndex.appendVectors(r, "ivx",
        emb.filter(col("vec_id") % 10 === 0), batchId = 1L, cosFn)
      VectorIndex.search(r, "ivx", emb.filter(col("vec_id") < 5),
        nprobe = 4, k = 5, cosFn)
        .select("qid", "cid", "cos", "rn")
        .orderBy("qid", "rn")
    }),

    // Persisted inverted index (WIMBD corpus-search infra): postings
    // appended per ingest batch exactly-once, then an AND-query for
    // the corpus's two most frequent tokens — text never rescanned at
    // query time, the term predicate pushes into the postings scan.
    // The query terms derive deterministically from the corpus (top-2
    // by count, ties lexical), so the oracle replays end-to-end.
    "llm_inverted_index" -> ((s, d) => {
      import graft.pipeline.{PipelineRunner, PipelineSpec}
      val r = new PipelineRunner(s, PipelineSpec(Nil), freshDir("inv_idx"))
      val docs = Tables.documents(s, d)
      TextAnalysis.invertedIndexAppend(r, "postings",
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", 0L): Unit
      TextAnalysis.invertedIndexAppend(r, "postings",
        docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", 1L): Unit
      val top2 = docs
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(2)
        .collect().map(_.getString(0)).toSeq
      TextAnalysis.invertedIndexSearch(r, "postings", top2)
        .orderBy("doc_id")
    }),

    // Incremental corpus dedup — dedup a NEW batch against the
    // existing corpus via the persisted band-signature table, without
    // rescanning corpus text. Returns every kept doc across both
    // batches. No oracle (custom hash family); the batch-split ≡
    // one-shot equivalence is property-tested in DedupSpec.
    "llm_incremental_dedup" -> ((s, d) => {
      import graft.pipeline.{PipelineRunner, PipelineSpec}
      val r = new PipelineRunner(s, PipelineSpec(Nil), freshDir("inc_dedup"))
      val docs = Tables.documents(s, d)
      // 250 keeps BOTH batches non-empty at every fixture SF
      // (documents has 500 rows at sf≤0.01, 5000 at sf0.1)
      val split = 250L
      val kept1 = Dedup.dedupIncremental(r, "corpus_bands",
        docs.filter(col("doc_id") < split), "doc_id", "text", batchId = 0L)
      val kept2 = Dedup.dedupIncremental(r, "corpus_bands",
        docs.filter(col("doc_id") >= split), "doc_id", "text", batchId = 1L)
      kept1.unionByName(kept2).orderBy("id")
    }),

    // Real-file multimodal ingestion: fixture bytes land as one file
    // per doc, `binaryFile` reads them back (path/length/content), the
    // id is parsed from the file name, and the decoder seam runs over
    // the content column. Content derives from documents.text, so the
    // whole read path is hash-checkable against the oracle.
    "mm_binaryfile_source" -> ((s, d) => {
      val dir = java.nio.file.Paths.get(freshDir("binfiles"))
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select("doc_id", "text").collect()
        .foreach { r0 =>
          java.nio.file.Files.write(
            dir.resolve(f"doc_${r0.getLong(0)}%06d.bin"),
            r0.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      val files = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin").load(dir.toString)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
            .cast("long").as("doc_id"),
          col("content"))
      Multimodal.decodeMeta(files, "doc_id", "content",
          Multimodal.StubDecoder)
        .select(col("doc_id"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.format").as("format"))
        .orderBy("doc_id")
    }),

    // SEMANTIC decontamination — the embedding-space companion to the
    // n-gram suite (paraphrased eval leakage that shares no 8-gram):
    // a training vector is contaminated when its cosine to ANY
    // benchmark embedding reaches tau. Per train vec: hit count +
    // first hit id. Exact integer quantization (llm_embed_neardup's
    // trick: round(x·10⁷) values; products/sums stay < 2^53 so the
    // codegen'd vecDot on those doubles is EXACT integer arithmetic,
    // engine-portable). Norms precompute per side — one dot per
    // pair. Bench side broadcasts (eval sets are small); only hits
    // reach the shuffle. Declared brute-force tier; the unbounded
    // scale path is LSH bucketing (Similarity.cosineNearDupPairs).
    "llm_decontaminate_semantic" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val dot = graft.functions.GraftFunctions.vecDot(_, _)
      def q(v: org.apache.spark.sql.Column) =
        transform(v, x => round(x.cast(DoubleType) * 1e7))
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), q(col("embedding")).as("qv"))
      val bench = emb.filter(col("vec_id") % 200 === 0)
        .select(col("vec_id").as("b"), col("qv").as("vb"),
          dot(col("qv"), col("qv")).as("n2b"))
      val train = emb.filter(col("vec_id") % 200 =!= 0)
        .select(col("vec_id"), col("qv").as("va"),
          dot(col("qv"), col("qv")).as("n2a"))
      train.crossJoin(broadcast(bench))
        .select(col("vec_id"), col("b"), dot(col("va"), col("vb")).as("d"),
          col("n2a"), col("n2b"))
        // parenthesization mirrors the oracle's 0.04*(n2a*n2b) — IEEE
        // association matters at the tau boundary (llm_embed_neardup's
        // convention)
        .filter(col("d") > 0 &&
          col("d") * col("d") >= lit(0.04) * (col("n2a") * col("n2b")))
        .groupBy("vec_id")
        .agg(count(lit(1)).as("n_bench_hits"),
          min(col("b")).as("first_bench_id"))
        .orderBy("vec_id")
    }),

    // Embedding-cosine near-dup on a bounded id range, fully integer-
    // exact for the oracle: each float is quantized to a scaled BIGINT
    // (round(x·10⁷) — float→double is exact binary on both engines and
    // half-up rounding agrees), so the dot/norms are pure integer sums
    // with zero cross-engine float drift. (DECIMAL casts of floats are
    // NOT engine-portable: shortest-repr vs exact-binary rounding
    // disagree in the last place.) Threshold cos ≥ 0.2 becomes
    // dot > 0 ∧ dot² ≥ 0.04·|a|²·|b|² on doubles derived from those
    // integers. Unbounded scale path: Similarity.cosineNearDupPairs.
    "llm_embed_neardup" -> ((s, d) => {
      def q(v: org.apache.spark.sql.Column) =
        transform(v, x => round(x.cast(DoubleType) * 1e7).cast(LongType))
      def idot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (a, b) => a * b), lit(0L), (acc, v) => acc + v)
      val emb = Tables.embeddings(s, d).filter(col("vec_id") < 200)
        .select(col("vec_id"), q(col("embedding")).as("qv"))
      val a = emb.select(col("vec_id").as("a"), col("qv").as("va"))
      val b = emb.select(col("vec_id").as("b"), col("qv").as("vb"))
      a.crossJoin(b).filter(col("a") < col("b"))
        .select(col("a"), col("b"),
          idot(col("va"), col("vb")).as("dot"),
          idot(col("va"), col("va")).as("n2a"),
          idot(col("vb"), col("vb")).as("n2b"))
        .filter(col("dot") > 0 &&
          col("dot").cast(DoubleType) * col("dot").cast(DoubleType) >=
            lit(0.04) * (col("n2a").cast(DoubleType) * col("n2b").cast(DoubleType)))
        .select("a", "b", "dot")
        .orderBy("a", "b")
    }),

    // Per-label centroid of the embedding column in exact fixed
    // point: elements quantized to 1e-7 BIGINTs, then INTEGER sums —
    // order-insensitive, so the result is engine-portable
    // (llm_embed_neardup's trick) and, at scale, never depends on
    // which executor added first. posexplode is map-only; ONE
    // hash-agg on (label, pos) with map-side partials; the division
    // to DOUBLE happens on exact integer inputs, deterministic under
    // IEEE754. This is the semantic-clustering primitive (per-class
    // mean vector) used for embedding-space diagnostics and IVF-style
    // seeding.
    "llm_embed_centroid" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")))
        .select(col("label"), col("pos").cast(LongType).as("pos"),
          round(col("col").cast(DoubleType) * 1e7).cast(LongType).as("q"))
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n_vecs"), sum(col("q")).as("sum_q"))
        .withColumn("centroid",
          col("sum_q").cast(DoubleType) / col("n_vecs").cast(DoubleType)
            / lit(1e7))
        .orderBy("label", "pos")),

    "llm_text_stats" -> ((s, d) => {
      val t = TextAnalysis.tokens(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        length(col("text")).as("n_chars_calc"),
        size(t).as("n_words"),
        (length(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
          .cast(DoubleType) / nullif(size(t), lit(0))).as("avg_wlen"),
        (size(filter(t, x => x.isin(TextAnalysis.stopEn.map(lit): _*)))
          .cast(DoubleType) / nullif(size(t), lit(0))).as("stop_ratio"))
        .orderBy("doc_id")
    }),

    "llm_tokenize_explode" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok"))
        .limit(100)),

    "llm_langid" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_guess"))
        .orderBy("doc_id")),

    // Rank-profile language ID (Cavnar–Trenkle 1994) — the trainable
    // trigram classifier behind the stopword heuristic: per-language
    // top-40 trigram rank profiles, docs classified by out-of-place
    // distance. Exact integer ranks/distances with lexical
    // tie-breaks; the oracle replays train + classify end-to-end.
    "llm_langid_ngram" -> ((s, d) =>
      TextAnalysis.langIdNgram(Tables.documents(s, d), "doc_id", "lang",
        "text", topP = 40)
        .orderBy("doc_id")),

    // top-5 TF-IDF terms per document; integer-quantized idf keeps
    // the ranking engine-portable (see TextAnalysis.tfIdfTopK)
    "llm_tfidf_topk" -> ((s, d) =>
      TextAnalysis.tfIdfTopK(Tables.documents(s, d), "doc_id", "text", 5)
        .orderBy(col("doc_id"), col("score_q").desc, col("term"))),

    "llm_quality_score" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("score"))
        .orderBy("doc_id")),

    // Gopher-style rule filter (Rae et al. 2021 §A1.1 shape): keep a
    // doc unless a rule trips, and say WHICH rule — the audit trail a
    // curation pipeline needs. Rules here: word count in [30, 100k],
    // mean word length in [3, 10], ≥2 stopwords. Entirely map-only
    // codegen'd expressions; every signal divides exact integers, so
    // the doubles compare identically cross-engine.
    "llm_gopher_filter" -> ((s, d) =>
      Tables.documents(s, d).select(
          col("doc_id"),
          TextAnalysis.gopherNWords(col("text")).as("n_words"),
          TextAnalysis.gopherMeanWlen(col("text")).as("mean_wlen"),
          TextAnalysis.gopherStopCount(col("text")).as("stop_count"))
        .withColumn("reason", TextAnalysis.gopherReason(
          col("n_words"), col("mean_wlen"), col("stop_count")))
        .withColumn("keep", col("reason") === "pass")
        .orderBy("doc_id")),

    "llm_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // Multimodal: opaque binary payload + typed metadata. The decode
    // is a deterministic stub (no codecs in this container); the
    // mapPartitions batch plumbing is the real deliverable.
    "mm_binary_meta" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("payload", col("text").cast(BinaryType))
        .select(col("doc_id"),
          length(col("payload")).as("byte_len"),
          lower(hex(substring(col("payload"), 1, 8))).as("head_hex"),
          md5(col("payload")).as("payload_md5"))
        .orderBy("doc_id")),

    // resize seam: per-partition binary→binary transform (stub keeps
    // every second byte so the oracle replays it); derived columns
    // only — raw blobs never reach the compare
    "mm_resize_stub" -> ((s, d) =>
      Multimodal.transformBinary(
        Tables.documents(s, d)
          .withColumn("payload", col("text").cast(BinaryType)),
        "doc_id", "payload", Multimodal.StubHalve)
        .select(col("doc_id"),
          length(col("payload_out")).as("n_bytes_out"),
          lower(hex(substring(col("payload_out"), 1, 4))).as("head_hex"))
        .orderBy("doc_id")),

    // feature-extraction seam: byte-histogram features as exact
    // integer counts (the embedding-model stand-in), CSV-serialized
    "mm_feature_stub" -> ((s, d) =>
      Multimodal.byteHistogramFeatures(
        Tables.documents(s, d)
          .withColumn("payload", col("text").cast(BinaryType)),
        "doc_id", "payload", dims = 8)
        .orderBy("doc_id")),

    "mm_decode_stub" -> ((s, d) =>
      Multimodal.decodeMeta(
        Tables.documents(s, d)
          .withColumn("payload", col("text").cast(BinaryType)),
        "doc_id", "payload", Multimodal.StubDecoder)
        .select(col("doc_id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.n_bytes").as("n_bytes"),
          col("meta.format").as("format"))
        .orderBy("doc_id")),

    // REAL image decode behind the same seam: per-document
    // deterministic checkerboard PNGs (synthesized in executors —
    // javax.imageio ships with the JDK) decode back through ImageIO
    // per partition; width/height/band-0 pixel sum prove the BYTES
    // decoded, and every quantity is closed-form from doc_id so the
    // oracle replays the pixel arithmetic without decoding anything.
    "mm_image_decode" -> ((s, d) =>
      Multimodal.decodeImage(
        Multimodal.synthCheckerboardPng(
          Tables.documents(s, d).select(col("doc_id")), "doc_id"),
        "doc_id", "png")
        .orderBy("doc_id")),

    // Frame-sampling plan shape for a (stub) video column: one row per
    // sampled frame index — the explode side of a frame-extraction
    // pipeline, fully oracle-checkable since the stub is arithmetic.
    "mm_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(
        Tables.documents(s, d)
          .withColumn("payload", col("text").cast(BinaryType)),
        "doc_id", "payload", everyNBytes = 100)
        .orderBy("doc_id", "frame_idx")),

    // Multi-volume shard packing: writer routing is map-only, the
    // only shuffle is the per-writer layout window (corpus/writers per
    // task — never a global sort). file_seq/offset = which fixed-size
    // volume each payload's first byte falls in and where.
    "mm_shard_pack" -> ((s, d) =>
      Multimodal.packShards(
        Tables.documents(s, d)
          .withColumn("payload", col("text").cast(BinaryType)),
        "doc_id", "payload", writers = 4, maxBytes = 4096L)
        .orderBy("doc_id")),

    // BPE-ish token-count approximation (words + punctuation runs).
    "llm_token_count" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens_approx"))
        .orderBy("doc_id")),

    // Repetition signals (Gopher-style quality rules): duplicate-token
    // ratio and top-token share per doc. One explode + two hash-aggs,
    // map-side partials throughout; docs with zero tokens drop out on
    // both engines identically.
    "llm_repetition" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
        .groupBy("doc_id").agg(
          ((sum("n") - count(lit(1))).cast(DoubleType) /
            sum("n").cast(DoubleType)).as("dup_token_ratio"),
          (max("n").cast(DoubleType) / sum("n").cast(DoubleType))
            .as("top_token_share"))
        .orderBy("doc_id")),

    // Corpus duplication report — the pre-dedup audit: per source,
    // what fraction of 8-gram occurrences are repeats (the number
    // near-dedup could reclaim). Tokens materialize once per row,
    // grams explode map-only, then ONE hash-agg with map-side
    // partials; at 100 TB swap the gram string for xxhash64(gram)
    // before the distinct (the llm_decontaminate trick) — the string
    // form here is what the cross-engine oracle can state.
    "llm_dup_gram_rate" -> ((s, d) => {
      val n = 8
      Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("__toks"))
        .select(col("source"), explode(expr(
          s"CASE WHEN size(__toks) >= $n THEN " +
            s"transform(sequence(1, size(__toks) - ${n - 1}), " +
            s"i -> array_join(slice(__toks, i, $n), ' ')) " +
            "ELSE array() END")).as("gram"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_grams"),
          countDistinct(col("gram")).as("n_distinct"))
        .withColumn("dup_rate",
          lit(1.0) - col("n_distinct").cast(DoubleType) / col("n_grams"))
        .orderBy("source")
    }),

    // CCNet/Dolma paragraph-level dedup: keep the globally-first
    // occurrence of every distinct line, reassemble docs from the
    // survivors. The testdata has no newlines, so the key FIRST
    // re-chunks each doc into 4-token pseudo-lines (the oracle
    // replays the chunking) and then runs the real operator with its
    // '\n' separator — lineDedup itself is the generic corpus form.
    "llm_line_dedup" -> ((s, d) => {
      val L = 4
      val chunked = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("__tk"))
        .select(col("doc_id"),
          array_join(
            when(size(col("__tk")) > 0,
              transform(sequence(lit(1), expr(s"(size(__tk) + ${L - 1}) div $L")),
                i => concat_ws(" ", slice(col("__tk"), (i - 1) * L + 1, lit(L)))))
              .otherwise(array().cast(ArrayType(StringType))),
            "\n").as("text"))
      Dedup.lineDedup(chunked, "doc_id", "text").orderBy("doc_id")
    }),

    // Lee et al. exact duplicated-substring spans: the maximal
    // contiguous token regions covered by a corpus-duplicated 8-gram
    // (n=8 matches llm_dup_gram_rate's audit unit), one row per span.
    "llm_substring_dedup" -> ((s, d) =>
      Dedup.dupSpans(Tables.documents(s, d), "doc_id", "text", n = 8)
        .orderBy("doc_id", "span_start")),

    // Lee et al.'s REMOVAL step applied to the spans above: drop
    // every token covered by a corpus-duplicated 8-gram span,
    // reassemble the survivors (text NULL for fully-covered docs).
    "llm_substring_remove" -> ((s, d) =>
      Dedup.dupSpanRemove(Tables.documents(s, d), "doc_id", "text", n = 8)
        .orderBy("doc_id")),

    // Training-mixture weighting: per source (domain), document and
    // token totals plus the share of the corpus' token mass — the
    // numbers a data-mixture plan (e.g. domain upsampling weights)
    // starts from. Per-doc token counts are computed map-only
    // (size(split), no explode), then ONE hash-agg to #sources rows.
    // The global total is a window over that ALREADY-AGGREGATED
    // frame — #sources rows, so the unpartitioned window is a
    // trivial single task and the corpus is scanned exactly once.
    // token_share divides exact integers, so the double is
    // engine-portable.
    "llm_domain_mix" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("source"),
          size(TextAnalysis.tokens(col("text"))).cast(LongType).as("toks"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        .withColumn("token_share",
          col("n_tokens").cast(DoubleType) /
            sum(col("n_tokens")).over(Window.partitionBy())
              .cast(DoubleType))
        .select("source", "n_docs", "n_tokens", "token_share")
        .orderBy("source")),

    // Vocabulary coverage — the tokenizer-design analysis: top-100
    // terms by occurrence with the CUMULATIVE share of all token
    // occurrences they cover. The corpus-wide work is explode →
    // hash-agg (map-side partials) → TakeOrdered(100); only the
    // 100-row result sees a window, so the single-task running sum
    // is bounded by the limit, not the corpus. Ties break by token
    // so ranks are deterministic cross-engine. The counts frame
    // feeds BOTH the top-100 and the global total, so it is
    // checkpointed: the corpus is read once, and the re-read is of
    // the vocabulary (≪ corpus at any scale).
    "llm_vocab_coverage" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        // lazy: materializes on the query's FIRST action (then both
        // the top-100 and the total reuse it) — eager would run a
        // corpus scan as a construction-time side effect, e.g. when
        // a caller only wants the plan
        .groupBy("token").agg(count(lit(1)).as("n"))
        .localCheckpoint(eager = false)
      val top = counts.orderBy(col("n").desc, col("token")).limit(100)
      val w = Window.orderBy(col("n").desc, col("token"))
      top.crossJoin(broadcast(counts.agg(sum(col("n")).as("total"))))
        .withColumn("rank", row_number().over(w).cast(LongType))
        .withColumn("cum_share",
          sum(col("n")).over(w).cast(DoubleType) /
            col("total").cast(DoubleType))
        .select("rank", "token", "n", "cum_share")
        .orderBy("rank")
    }),

    // WIMBD-style corpus n-gram report (Elazar et al. 2023): the 20
    // most frequent word 3-grams with occurrence + document-frequency
    // counts — the boilerplate/template-spam detector run over a new
    // crawl. Explode → two hash-aggs → TakeOrderedAndProject
    // (plan-asserted); only the 20-row result sees a window.
    "llm_ngram_topk" -> ((s, d) =>
      TextAnalysis.ngramTopK(Tables.documents(s, d), "doc_id", "text",
        n = 3, k = 20).orderBy("rank")),

    // Per-doc unigram token entropy — the information-density quality
    // signal. Exact-integer formulation (quantized ln, BIGINT sums)
    // so the doubles are engine-portable; token-less docs drop out.
    "llm_token_entropy" -> ((s, d) =>
      TextAnalysis.tokenEntropy(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Gopher's n-gram repetition companions to llm_repetition: per
    // doc top-2-gram occurrence share and duplicated-3-gram fraction.
    // Both gram sizes ride one explode; docs under 2 tokens drop out.
    "llm_repetition_ngram" -> ((s, d) =>
      TextAnalysis.repetitionNgrams(
        Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Winnowing fingerprints (MOSS): distinct minima of 4-windows of
    // 3-gram hashes — guaranteed shared-fingerprint for any shared
    // run of ≥ 6 tokens at ~2/(w+1) the gram-index size. Map-only
    // (plan-asserted); md5-derived hashes replayed by the oracle.
    "llm_winnow_fingerprint" -> ((s, d) =>
      TextAnalysis.winnowFingerprints(Tables.documents(s, d),
        "doc_id", "text", k = 3, w = 4)
        .orderBy("doc_id", "fp")),

    // PMI collocation mining: adjacent-token bigrams scored by
    // pointwise mutual information — multiword-expression discovery.
    // Quantized-ln integer scoring (engine-portable ranking); top-50
    // via TakeOrderedAndProject; count-attach joins shuffle only
    // vocabulary-sized frames.
    "llm_collocations" -> ((s, d) =>
      TextAnalysis.collocations(Tables.documents(s, d), "text",
        minCount = 5, k = 50)
        .orderBy(col("pmi_q").desc, col("a"), col("b"))),

    // Zipf-law fit over the top-100 vocabulary: least-squares slope
    // of ln(freq) vs ln(rank) — tokenizer/corpus health in one
    // number (natural text ≈ −1). All regression sums are exact
    // integer math on quantized logs.
    "llm_zipf_fit" -> ((s, d) =>
      TextAnalysis.zipfSlope(Tables.documents(s, d), "text", k = 100)),

    // Stratified sampling — per-language quotas, the standard rebalance
    // step in training-data curation. sampleBy is a map-only seeded
    // Bernoulli filter per stratum: no shuffle, scales linearly. No
    // oracle (Spark's sampler seed semantics); proportions + seed
    // determinism unit-tested in ApproxAndSampleSpec.
    "llm_stratified_sample" -> ((s, d) =>
      Tables.documents(s, d).stat.sampleBy("lang",
        Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.25, "fr" -> 1.0), 42L)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // Per-source distinct-token cardinality via MERGEABLE HLL
    // sketches — the incremental form of count distinct: the corpus
    // arrives as batches (simulated by an id-parity split), each
    // batch aggregates to a few-KB sketch per source, and the merge
    // runs on sketch rows only. Register-wise union is exact, so the
    // merged estimate ≡ the one-shot estimate (property-tested in
    // ApproxAndSampleSpec along with a rel-err bound vs exact). No
    // oracle (DataSketches HLL state is engine-specific).
    "llm_cardinality_sketch" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val batches = (0 to 1).map(i =>
        Sketches.tokenCardinality(
          docs.filter(pmod(col("doc_id"), lit(2)) === i),
          "source", "text"))
      Sketches.estimateCardinality(batches.reduce(_.union(_)))
        .withColumnRenamed("grp", "source")
        .orderBy("source")
    }),

    // Dataset-card summary: the one-row corpus observability report a
    // curation run publishes — exact integer stats only (counts,
    // token totals, length extremes, per-source spread), single scan
    // with map-side partial aggregation.
    "llm_corpus_summary" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokens(col("text")).as("tk"),
          length(col("text")).as("chars"))
      docs.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(size(col("tk")).cast("long")).as("total_tokens"),
        sum(col("chars").cast("long")).as("total_chars"),
        min(size(col("tk"))).as("min_tokens"),
        max(size(col("tk"))).as("max_tokens"),
        sum(when(size(col("tk")) < 5, 1L).otherwise(0L))
          .as("n_short_docs"))
    }),

    // BM25 retrieval for a fixed 3-term query — the ranking the
    // inverted index serves. Rational-idf variant: every factor is an
    // IEEE-exact rational of integer counts, and per-doc totals fold
    // in sorted term order, so scores are BIT-identical cross-engine
    // with no quantization.
    "llm_bm25_topk" -> ((s, d) =>
      TextAnalysis.bm25TopK(Tables.documents(s, d), "doc_id", "text",
        queryTerms = Seq("hash", "join", "scan"), k = 20)),

    // EXACT heavy hitters (tokens with > N/ratio of all occurrences)
    // via the two-pass Misra–Gries pattern: a mergeable capacity-2k
    // summary finds candidates (no-false-negative guarantee), an
    // exact count over ONLY those candidates confirms — never a
    // vocabulary-wide shuffle. Oracle replays the exact definition.
    "llm_heavy_hitters" -> ((s, d) =>
      Sketches.heavyHitters(Tables.documents(s, d), "text",
        ratio = 200)),

    // Sliding-window chunking with overlap — RAG / long-doc-training
    // prep: windows of up to 8 tokens stepping by 6, so consecutive
    // chunks share 2 boundary tokens. Map-only (plan-asserted in
    // CurationSpec); chunk boundaries are exact integer arithmetic
    // the oracle replays verbatim.
    "llm_chunk_sliding" -> ((s, d) =>
      Curation.chunkSliding(Tables.documents(s, d), "doc_id", "text",
        chunkSize = 8, stride = 6)
        .orderBy("doc_id", "chunk_id")),

    // Sequence packing — contiguous docs binned into ~512-token packs,
    // the step before training-batch assembly. Shards (doc_id ranges)
    // pack independently, so the running-sum window is per-shard and
    // fully parallel (never one global single-task sort); a straddling
    // doc opens the next bin (contiguous approximation, documented).
    "llm_pack_chunks" -> ((s, d) => {
      val budget = 512
      val w = Window.partitionBy("shard").orderBy("doc_id")
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("toks"))
        .withColumn("shard", floor(col("doc_id") / 100).cast("long"))
        .withColumn("cum", sum(col("toks")).over(w))
        .select(col("doc_id"), col("toks"),
          (col("shard") * 1000 +
            floor((col("cum") - col("toks")) /
              lit(budget).cast(DoubleType)).cast("long")).as("pack_id"))
        .orderBy("doc_id")
    }),

    // PII scrubbing — email/phone redaction before training. Pure
    // codegen'd regexp_replace, map-only. Patterns kept to the
    // Java/RE2-common dialect so the oracle replays them verbatim.
    // URL-domain blocklist filtering (the UT1-blocklist stage of
    // RefinedWeb/FineWeb §3.1): each doc's host checked against a
    // blocklist, keep/drop audit per doc. Hosts are synthesized
    // deterministically from `source` (testdata has no URL column) so
    // the oracle replays the decision; the Spark-side plumbing —
    // parse-host, broadcast the blocklist, left-join + null-test — is
    // the production shape. 100 TB note: UT1 is ~4M domains ≈ tens of
    // MB, comfortably broadcastable; a blocklist past ~1 GB switches
    // to a shuffled left join on host with the identical plan text.
    "llm_url_filter" -> ((s, d) => {
      import s.implicits._
      val blocked = Seq("www.src3.example.com", "www.src7.example.com",
        "www.src12.example.com").toDF("blocked_host")
      Tables.documents(s, d)
        .withColumn("url",
          concat(lit("https://www."), col("source"),
            lit(".example.com/doc-"), col("doc_id")))
        .withColumn("host", expr("parse_url(url, 'HOST')"))
        .join(broadcast(blocked), col("host") === col("blocked_host"),
          "left")
        .select(col("doc_id"), col("host"),
          col("blocked_host").isNull.as("keep"))
        .orderBy("doc_id")
    }),

    // Link-graph centrality for crawl-seed quality (what Common
    // Crawl publishes as host-level PageRank): a deterministic
    // citation graph over sources (doc i "cites" doc (31i+7) mod N —
    // testdata has no link column; the mapping replays in the
    // oracle), then 3 exact-integer power iterations. Ranks in 1e-9
    // units; every division a pinned floor, so the unrolled-CTE
    // oracle replays the run bit-for-bit.
    "llm_pagerank" -> ((s, d) => {
      // the 2-column doc slice feeds three consumers (the count and
      // both sides of the citation join) — pin it once
      val docs = Tables.documents(s, d).select("doc_id", "source")
        .localCheckpoint(eager = false)
      val total = docs.count()
      val cited = docs.select(col("doc_id").as("cid"),
        col("source").as("dst"))
      val edges = docs
        .withColumn("cite", (col("doc_id") * 31 + 7) % lit(total))
        .join(cited, col("cite") === col("cid"))
        .select(col("source").as("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
      graft.operators.Graphs.pageRank(edges, iters = 3)
        .select(col("node"), col("rq").as("rank_q"))
        .orderBy("node")
    }),

    "llm_pii_scrub" -> ((s, d) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"
      val scrubbed = regexp_replace(
        regexp_replace(col("text"), email, "<EMAIL>"),
        phone, "<PHONE>")
      Tables.documents(s, d).select(
        col("doc_id"),
        scrubbed.as("scrubbed"),
        (scrubbed =!= col("text")).as("redacted"))
        .orderBy("doc_id")
    }),

    // Token-BUDGET mixture sampling: pretraining mixtures are
    // specified in tokens, not docs — per source, take docs in a
    // stable pseudo-random order (md5 of the id: reproducible across
    // runs AND engines) until the source's token budget is filled.
    // One (source) shuffle; per-source window size bounded by the
    // source's docs.
    "llm_token_budget_sample" -> ((s, d) => {
      val budget = 800L
      val ord = md5(col("doc_id").cast(StringType).cast(BinaryType))
      val w = Window.partitionBy("source").orderBy("ord", "doc_id")
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).as("toks"), ord.as("ord"))
        .withColumn("cum", sum(col("toks")).over(w))
        .filter(col("cum") <= budget)
        .select("doc_id", "source", "toks", "cum")
        .orderBy("doc_id")
    }),

    // Deterministic holdout split — hash-routed on the stable doc_id
    // (md5 bucket, not row sampling), so corpus growth and backfill
    // re-runs never move a doc across train/val/test: the property
    // that keeps eval sets uncontaminated over a pipeline's
    // lifetime. Map-only.
    "llm_split_holdout" -> ((s, d) =>
      Curation.holdoutSplit(
        Tables.documents(s, d).select("doc_id"), "doc_id")
        .orderBy("doc_id")),

    // Deterministic shard assignment + stable pseudo-random
    // within-shard order (sorting by an id-hash IS the corpus
    // shuffle, reproducibly). Map-only; the writer's partitionBy
    // is the only exchange.
    "llm_shard_assign" -> ((s, d) =>
      Curation.shardAssign(
        Tables.documents(s, d).select("doc_id"), "doc_id", 8)
        .orderBy("doc_id")),

    // Domain-mixture rates — the data-mixing step: per-source
    // downsampling rate toward a UNIFORM token mixture (the binding
    // domain keeps rate 1.0). One corpus scan + one hash-agg to
    // #domains rows; see Curation.mixtureRates for the budget math.
    "llm_mixture_weights" -> ((s, d) =>
      Curation.mixtureRates(Tables.documents(s, d), "source", "text")
        .orderBy("domain")),

    // Temperature-smoothed mixture at α=0.5 (mBERT/XLM-R
    // exponentiated smoothing): √-weights upweight low-resource
    // domains; α pinned at 0.5 because sqrt is the one
    // IEEE-correctly-rounded exponent, making the quantized weights
    // and floor-div rates engine-portable.
    "llm_temperature_mix" -> ((s, d) =>
      Curation.temperatureRates(Tables.documents(s, d), "source", "text")
        .orderBy("domain")),

    // UniMax (Chung et al. 2023): epoch-capped language sampling —
    // ascending-size walk gives every language min(cap·mass, fair
    // share of what's left). One corpus hash-agg to #langs rows; the
    // sequential walk is exact Long math on the driver (nlist ≪ N
    // pattern), so the oracle replays it with a recursive CTE.
    "llm_unimax_alloc" -> ((s, d) =>
      Curation.unimaxAllocation(Tables.documents(s, d), "lang", "text",
        maxEpochs = 3)),

    // Token-length histogram per source (power-of-2 caps) — the
    // doc-length diagnostic behind packing budgets and truncation
    // policy. Integer CASE buckets, one map pass + one hash-agg.
    "llm_length_histogram" -> ((s, d) =>
      Curation.lengthHistogram(Tables.documents(s, d), "text", "source")
        .orderBy("source", "len_cap")),

    // CCNet-style normalization + canonical fingerprint — the
    // normalize-then-hash step ahead of exact dedup. Map-only
    // codegen'd expressions.
    // C4 cleaning rules (Raffel et al. 2020 §2.2) over 6-token
    // pseudo-lines (testdata has no newlines or punctuation, so the
    // key chunks tokens and disables the terminal-punctuation rule —
    // both stand-ins replayed by the oracle; CurationSpec exercises
    // every rule, including punctuation, on structured fixtures).
    "llm_c4_filter" -> ((s, d) => {
      val L = 6
      val chunked = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("__tk"))
        .select(col("doc_id"),
          array_join(
            when(size(col("__tk")) > 0,
              transform(sequence(lit(1), expr(s"(size(__tk) + ${L - 1}) div $L")),
                i => concat_ws(" ", slice(col("__tk"), (i - 1) * L + 1, lit(L)))))
              .otherwise(array().cast(ArrayType(StringType))),
            "\n").as("text"))
      Curation.c4Filter(chunked, "doc_id", "text",
        requireTerminalPunct = false).orderBy("doc_id")
    }),

    "llm_normalize_text" -> ((s, d) => {
      val norm = Curation.normalize(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"),
        norm.as("norm"),
        md5(norm).as("fp"),
        (norm =!= col("text")).as("changed"))
        .orderBy("doc_id")
    }),

    // Mixture APPLICATION — the sampling step the rates feed:
    // deterministic hash-routed Bernoulli per doc (no RNG: re-runs
    // keep the same docs, the oracle replays the exact decision).
    // Rates broadcast (#domains rows); the corpus side is map-only.
    "llm_mixture_sample" -> ((s, d) =>
      Curation.mixtureSample(
        Tables.documents(s, d).select("doc_id", "source", "text"),
        "source", "text", "doc_id")
        .select("doc_id", "source")
        .orderBy("doc_id")),

    // Classifier-based quality filter (the GPT-3/CCNet LR step):
    // train on a weakly-supervised label (Gopher pass/fail standing
    // in for the curated positive set), then score the corpus as ONE
    // map-only codegen'd projection — the weights inline as plan
    // literals, no ML runtime on executors. No oracle (LBFGS weights
    // are engine-specific); agreement with the teacher rule is
    // property-tested in CurationSpec.
    // DSIR (Xie et al. 2023): hashed-n-gram importance weights
    // toward a target slice (here lang='en' stands in for the
    // curated target corpus). k=64 keeps the weight table readable;
    // production k is 10k+ — still broadcast-sized either way.
    "llm_dsir_weights" -> ((s, d) =>
      Curation.dsirWeights(Tables.documents(s, d), "text",
        col("lang") === "en", k = 64).orderBy("bucket")),

    // Per-doc DSIR importance score: sum of the doc's hashed-feature
    // log-weights — the ranking importance resampling draws from.
    "llm_dsir_score" -> ((s, d) =>
      Curation.dsirScore(Tables.documents(s, d), "doc_id", "text",
        col("lang") === "en", k = 64).orderBy("doc_id")),

    // DSIR importance RESAMPLING via deterministic Gumbel-top-k:
    // keep=100 drawn without replacement w.p. ∝ importance weight;
    // the Gumbel noise derives from the salted md5 route (no engine
    // RNG) so the oracle replays the draw exactly.
    "llm_dsir_resample" -> ((s, d) =>
      Curation.dsirResample(Tables.documents(s, d), "doc_id", "text",
        col("lang") === "en", k = 64, keep = 100)
        .orderBy(col("key_q").desc, col("doc_id"))),

    // CCNet-style perplexity scoring: corpus unigram LM, mean
    // per-token NLL per doc, head/middle/tail terciles per language.
    "llm_perplexity" -> ((s, d) =>
      TextAnalysis.perplexityBuckets(Tables.documents(s, d), "doc_id",
        "text", "lang").orderBy("doc_id")),

    // Add-one-smoothed bigram LM scoring (one conditional step past
    // the unigram stand-in toward CCNet's KenLM): exact quantized
    // integer NLL per doc, map-only bigram derivation.
    "llm_perplexity_bigram" -> ((s, d) =>
      TextAnalysis.bigramNll(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Per-source curation pre-flight report — the audit a pipeline
    // runs BEFORE committing to a filter/dedup configuration: doc and
    // token volume, Gopher pass rate, and exact-dup rate (by the
    // normalized fingerprint) in ONE corpus scan + one hash-agg
    // (count distinct expands inside the same agg). All rates are
    // exact integer ratios — engine-portable.
    "llm_curation_report" -> ((s, d) => {
      val sig = Tables.documents(s, d).select(
        col("source"),
        TextAnalysis.gopherNWords(col("text")).as("nw"),
        TextAnalysis.gopherMeanWlen(col("text")).as("mw"),
        TextAnalysis.gopherStopCount(col("text")).as("sc"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      sig
        .withColumn("pass",
          TextAnalysis.gopherReason(col("nw"), col("mw"), col("sc"))
            === "pass")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nw")).as("n_tokens"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_gopher_pass"),
          countDistinct(col("fp")).as("n_distinct"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_gopher_pass"),
          (col("n_gopher_pass").cast(DoubleType) / col("n_docs"))
            .as("gopher_pass_rate"),
          col("n_distinct"),
          (lit(1.0) - col("n_distinct").cast(DoubleType) / col("n_docs"))
            .as("dup_rate"))
        .orderBy("source")
    }),

    "llm_quality_classifier" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // train on a DETERMINISTIC 1/4 hash-sample — the 100 TB recipe
      // the scaladoc prescribes (training touches a sample, scoring
      // is the full-corpus map-only pass); the sample is keyed on
      // doc_id so it is stable across runs and engines
      val labeled = docs
        .filter(pmod(xxhash64(col("doc_id")), lit(4)) === 0)
        .withColumn("label",
          TextAnalysis.gopherReason(
            TextAnalysis.gopherNWords(col("text")),
            TextAnalysis.gopherMeanWlen(col("text")),
            TextAnalysis.gopherStopCount(col("text"))) === "pass")
      // 20 LBFGS iterations converge for a 6-feature LR (each
      // iteration is one treeAggregate job — the key's cost is job
      // count, not data volume; the sample cuts the per-job scan)
      val w = QualityClassifier.train(labeled, "text", "label",
        maxIter = 20)
      QualityClassifier.score(docs, "text", w)
        .select(col("doc_id"), col("quality_prob"),
          (col("quality_prob") > 0.5).as("keep"))
        .orderBy("doc_id")
    }),

    // END-TO-END curation: Gopher quality filter → normalize →
    // exact dedup (keep min id per canonical fingerprint) → holdout
    // split + shard assignment — the composed pipeline a curation
    // run actually executes, as ONE declarative plan. 100 TB shape:
    // the filter and normalization are map-only over the scan, dedup
    // is the single shuffle (hash-agg on fp with map-side partials),
    // and split/shard routing is map-only arithmetic on the
    // surviving keys — Catalyst fuses the whole pre-shuffle stage
    // into one codegen'd pass over the corpus.
    "llm_curation_pipeline" -> ((s, d) => {
      val filtered = Tables.documents(s, d)
        .withColumn("n_words", TextAnalysis.gopherNWords(col("text")))
        .withColumn("mean_wlen", TextAnalysis.gopherMeanWlen(col("text")))
        .withColumn("stop_count", TextAnalysis.gopherStopCount(col("text")))
        .filter(TextAnalysis.gopherReason(
          col("n_words"), col("mean_wlen"), col("stop_count")) === "pass")
      val deduped = filtered
        .withColumn("fp", md5(Curation.normalize(col("text"))))
        .groupBy("fp").agg(min("doc_id").as("doc_id"))
      Curation.shardAssign(
        Curation.holdoutSplit(deduped, "doc_id"), "doc_id", 8)
        .select("doc_id", "fp", "split", "shard")
        .orderBy("doc_id")
    })
  )

  /** DuckDB replica of [[graft.operators.TextAnalysis.tokens]] — the
    * ONE oracle-side tokenizer definition; shared with BpeOps (and in
    * lockstep with Bpe.BpeFormatVersion's normalization stamp).
    */
  private[queries] val toks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
  private val stopEnList =
    TextAnalysis.stopEn.map(w => s"'$w'").mkString("(", ",", ")")

  // shared Gopher oracle fragments — ONE definition feeding both the
  // standalone llm_gopher_filter key and the composed
  // llm_curation_pipeline, mirroring TextAnalysis.gopher* on the
  // Spark side (a threshold tweak lands in exactly two places: the
  // Scala helper and this pair)
  private val gopherSignalsSql =
    s"""SELECT doc_id, source, text,
       |    CAST(len($toks) AS BIGINT) AS n_words,
       |    CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
       |        AS DOUBLE) /
       |      nullif(CAST(len($toks) AS INTEGER), 0) AS mean_wlen,
       |    CAST(len(list_filter($toks, x -> x IN $stopEnList))
       |      AS BIGINT) AS stop_count
       |  FROM documents""".stripMargin
  private val gopherReasonSql =
    """CASE WHEN n_words < 30 THEN 'too_short'
      |       WHEN n_words > 100000 THEN 'too_long'
      |       WHEN mean_wlen < 3.0 OR mean_wlen > 10.0 THEN 'word_length'
      |       WHEN stop_count < 2 THEN 'stopwords'
      |       ELSE 'pass' END""".stripMargin

  override def oracles: Map[String, String] = Map(
    "llm_exact_dedup" ->
      """SELECT md5(lower(trim(text))) AS h, min(doc_id) AS keep_id,
        |  count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,

    "llm_edit_distance" ->
      """WITH pref AS (
        |  SELECT doc_id, substring(text, 1, 64) AS pref FROM documents),
        |pairs AS (
        |  SELECT doc_id AS doc_a, doc_id + 1 AS doc_b FROM documents)
        |SELECT p.doc_a, p.doc_b,
        |  CAST(levenshtein(a.pref, b.pref) AS INTEGER) AS dist,
        |  CAST(greatest(length(a.pref), length(b.pref)) AS INTEGER)
        |    AS maxlen,
        |  CASE WHEN greatest(length(a.pref), length(b.pref)) = 0 THEN 1.0
        |       ELSE 1.0 - CAST(levenshtein(a.pref, b.pref) AS DOUBLE)
        |              / greatest(length(a.pref), length(b.pref))
        |  END AS sim
        |FROM pairs p
        |JOIN pref a ON p.doc_a = a.doc_id
        |JOIN pref b ON p.doc_b = b.doc_id
        |ORDER BY doc_a""".stripMargin,

    "llm_dup_cluster_hist" ->
      """WITH g AS (
        |  SELECT md5(lower(trim(text))) AS h, count(*) AS n
        |  FROM documents GROUP BY 1)
        |SELECT n AS cluster_size, count(*) AS n_clusters,
        |  CAST(sum(n) AS BIGINT) AS n_docs
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "llm_ngram_jaccard" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, tok
         |  FROM (SELECT doc_id, unnest($toks) AS tok FROM documents) raw),
         |cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         |com AS (
         |  SELECT a.doc_id AS doc_a, count(*) AS common
         |  FROM tok a JOIN tok b
         |    ON b.doc_id = a.doc_id + 1 AND b.tok = a.tok
         |  GROUP BY 1)
         |SELECT doc_a, doc_a + 1 AS doc_b, common, na.n AS n_a, nb.n AS n_b,
         |  CAST(common AS DOUBLE) / (na.n + nb.n - common) AS jaccard
         |FROM com
         |JOIN cnt na ON na.doc_id = doc_a
         |JOIN cnt nb ON nb.doc_id = doc_a + 1
         |ORDER BY doc_a""".stripMargin,

    "llm_decontaminate" ->
      s"""WITH grams AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk) - 3 + 2),
         |      i -> array_to_string(tk[i:i+2], ' '))) AS gram
         |  FROM (SELECT doc_id, $toks AS tk FROM documents) t
         |  WHERE len(tk) >= 3),
         |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0),
         |train AS (
         |  SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 20 <> 0)
         |SELECT t.doc_id, count(*) AS n_shared
         |FROM train t JOIN bench b USING (gram)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "llm_bleu_pairs" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS tk FROM documents),
         |c1 AS (
         |  SELECT doc_id, gram, count(*) AS cnt
         |  FROM (SELECT doc_id, unnest(tk) AS gram FROM tk) g
         |  GROUP BY 1, 2),
         |c2 AS (
         |  SELECT doc_id, gram, count(*) AS cnt
         |  FROM (SELECT doc_id,
         |      unnest(list_transform(range(1, len(tk)),
         |        i -> array_to_string(tk[i:i+1], ' '))) AS gram
         |    FROM tk WHERE len(tk) >= 2) g
         |  GROUP BY 1, 2),
         |lens AS (SELECT doc_id, CAST(len(tk) AS INTEGER) AS len FROM tk),
         |pairs AS (SELECT doc_id AS doc_a, doc_id + 1 AS doc_b
         |  FROM documents),
         |k1 AS (
         |  SELECT p.doc_a, p.doc_b,
         |    CAST(sum(least(a.cnt, b.cnt)) AS BIGINT) AS clip
         |  FROM pairs p
         |  JOIN c1 a ON a.doc_id = p.doc_a
         |  JOIN c1 b ON b.doc_id = p.doc_b AND b.gram = a.gram
         |  GROUP BY 1, 2),
         |k2 AS (
         |  SELECT p.doc_a, p.doc_b,
         |    CAST(sum(least(a.cnt, b.cnt)) AS BIGINT) AS clip
         |  FROM pairs p
         |  JOIN c2 a ON a.doc_id = p.doc_a
         |  JOIN c2 b ON b.doc_id = p.doc_b AND b.gram = a.gram
         |  GROUP BY 1, 2)
         |SELECT p.doc_a, p.doc_b,
         |  coalesce(k1.clip, 0) AS clip1,
         |  CAST(greatest(lb.len, 0) AS BIGINT) AS tot1,
         |  coalesce(k2.clip, 0) AS clip2,
         |  CAST(greatest(lb.len - 1, 0) AS BIGINT) AS tot2,
         |  la.len AS n_a, lb.len AS n_b,
         |  CASE WHEN lb.len <= 1
         |         OR coalesce(k1.clip, 0) = 0 OR coalesce(k2.clip, 0) = 0
         |    THEN 0.0
         |    ELSE sqrt((CAST(k1.clip AS DOUBLE) / lb.len) *
         |              (CAST(k2.clip AS DOUBLE) / (lb.len - 1))) END AS bleu2
         |FROM pairs p
         |JOIN lens la ON la.doc_id = p.doc_a
         |JOIN lens lb ON lb.doc_id = p.doc_b
         |LEFT JOIN k1 ON k1.doc_a = p.doc_a AND k1.doc_b = p.doc_b
         |LEFT JOIN k2 ON k2.doc_a = p.doc_a AND k2.doc_b = p.doc_b
         |ORDER BY p.doc_a""".stripMargin,

    "llm_containment" ->
      s"""WITH grams AS (
         |  SELECT DISTINCT doc_id, gram FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(tk) - 3 + 2),
         |        i -> array_to_string(tk[i:i+2], ' '))) AS gram
         |    FROM (SELECT doc_id, $toks AS tk FROM documents) t
         |    WHERE len(tk) >= 3) g),
         |cnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
         |com AS (
         |  SELECT a.doc_id AS doc_a, count(*) AS common
         |  FROM grams a JOIN grams b
         |    ON b.doc_id = a.doc_id + 1 AND b.gram = a.gram
         |  GROUP BY 1)
         |SELECT doc_a, doc_a + 1 AS doc_b, common, na.n AS n_a, nb.n AS n_b,
         |  CAST(common AS DOUBLE) / na.n AS cont_ab,
         |  CAST(common AS DOUBLE) / nb.n AS cont_ba
         |FROM com
         |JOIN cnt na ON na.doc_id = doc_a
         |JOIN cnt nb ON nb.doc_id = doc_a + 1
         |ORDER BY doc_a""".stripMargin,

    // bloom prefilter ≡ exact: no false negatives, FPs confirmed away
    "llm_decontaminate_bloom" ->
      s"""WITH grams AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk) - 3 + 2),
         |      i -> array_to_string(tk[i:i+2], ' '))) AS gram
         |  FROM (SELECT doc_id, $toks AS tk FROM documents) t
         |  WHERE len(tk) >= 3),
         |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0),
         |train AS (
         |  SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 20 <> 0)
         |SELECT t.doc_id, count(*) AS n_shared
         |FROM train t JOIN bench b USING (gram)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // incremental ≡ one-shot: the batched path must reproduce the
    // exact one-shot decontamination result
    "llm_decontaminate_incremental" ->
      s"""WITH grams AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk) - 3 + 2),
         |      i -> array_to_string(tk[i:i+2], ' '))) AS gram
         |  FROM (SELECT doc_id, $toks AS tk FROM documents) t
         |  WHERE len(tk) >= 3),
         |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0),
         |train AS (
         |  SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 20 <> 0)
         |SELECT t.doc_id, count(*) AS n_shared
         |FROM train t JOIN bench b USING (gram)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "llm_cosine_topk" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid, q.qv AS qvec, c.qv AS cvec
        |  FROM e q CROSS JOIN e c
        |  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
        |sums AS (
        |  SELECT qid, cid,
        |    CAST(SUM(z[1] * z[2]) AS BIGINT) AS dot,
        |    CAST(SUM(z[1] * z[1]) AS BIGINT) AS n2q,
        |    CAST(SUM(z[2] * z[2]) AS BIGINT) AS n2c
        |  FROM (SELECT qid, cid, unnest(list_zip(qvec, cvec)) AS z FROM pairs) t
        |  GROUP BY qid, cid),
        |scored AS (
        |  SELECT qid, cid,
        |    CAST(dot AS DOUBLE) /
        |      (sqrt(CAST(n2q AS DOUBLE)) * sqrt(CAST(n2c AS DOUBLE))) AS cos
        |  FROM sums),
        |ranked AS (
        |  SELECT qid, cid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
        |  FROM scored)
        |SELECT qid, cid, cos, rn FROM ranked WHERE rn <= 5
        |ORDER BY qid, rn""".stripMargin,

    "llm_ann_filtered" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid, q.qv AS qvec, c.qv AS cvec
        |  FROM e q CROSS JOIN e c
        |  WHERE q.vec_id < 5 AND c.label = 3 AND c.vec_id <> q.vec_id),
        |sums AS (
        |  SELECT qid, cid,
        |    CAST(SUM(z[1] * z[2]) AS BIGINT) AS dot,
        |    CAST(SUM(z[1] * z[1]) AS BIGINT) AS n2q,
        |    CAST(SUM(z[2] * z[2]) AS BIGINT) AS n2c
        |  FROM (SELECT qid, cid, unnest(list_zip(qvec, cvec)) AS z FROM pairs) t
        |  GROUP BY qid, cid),
        |scored AS (
        |  SELECT qid, cid,
        |    CAST(dot AS DOUBLE) /
        |      (sqrt(CAST(n2q AS DOUBLE)) * sqrt(CAST(n2c AS DOUBLE))) AS cos
        |  FROM sums),
        |ranked AS (
        |  SELECT qid, cid, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
        |  FROM scored)
        |SELECT qid, cid, cos, rn FROM ranked WHERE rn <= 5
        |ORDER BY qid, rn""".stripMargin,

    // ann_filtered's quantized replay with the label-inequality
    // predicate and labels carried through.
    "llm_hard_negatives" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS qid, q.label AS qlabel,
        |    c.vec_id AS cid, c.label AS neg_label,
        |    q.qv AS qvec, c.qv AS cvec
        |  FROM e q CROSS JOIN e c
        |  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
        |    AND c.label <> q.label),
        |sums AS (
        |  SELECT qid, qlabel, cid, neg_label,
        |    CAST(SUM(z[1] * z[2]) AS BIGINT) AS dot,
        |    CAST(SUM(z[1] * z[1]) AS BIGINT) AS n2q,
        |    CAST(SUM(z[2] * z[2]) AS BIGINT) AS n2c
        |  FROM (SELECT qid, qlabel, cid, neg_label,
        |          unnest(list_zip(qvec, cvec)) AS z FROM pairs) t
        |  GROUP BY qid, qlabel, cid, neg_label),
        |scored AS (
        |  SELECT qid, qlabel, cid, neg_label,
        |    CAST(dot AS DOUBLE) /
        |      (sqrt(CAST(n2q AS DOUBLE)) * sqrt(CAST(n2c AS DOUBLE))) AS cos
        |  FROM sums),
        |ranked AS (
        |  SELECT qid, qlabel, cid, neg_label, cos,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
        |  FROM scored)
        |SELECT qid, qlabel, cid, neg_label, cos, rn
        |FROM ranked WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,

    "llm_ann_sq8" ->
      """WITH q0 AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS q
        |  FROM embeddings),
        |enc AS (
        |  SELECT vec_id,
        |    list_transform(q, v -> CASE WHEN v < 0
        |      THEN -CAST(floor(CAST((-v)*254 + qmax AS DOUBLE)
        |                       / (2.0*qmax)) AS BIGINT)
        |      ELSE CAST(floor(CAST(v*254 + qmax AS DOUBLE)
        |                      / (2.0*qmax)) AS BIGINT) END) AS code
        |  FROM (SELECT vec_id, q,
        |          greatest(list_max(q), -list_min(q), 1) AS qmax
        |        FROM q0) t),
        |pairs AS (
        |  SELECT qe.vec_id AS qid, c.vec_id AS cid,
        |    qe.code AS qc, c.code AS cc
        |  FROM enc qe CROSS JOIN enc c
        |  WHERE qe.vec_id < 5 AND c.vec_id <> qe.vec_id),
        |sums AS (
        |  SELECT qid, cid,
        |    CAST(SUM(z[1] * z[2]) AS BIGINT) AS dot,
        |    CAST(SUM(z[1] * z[1]) AS BIGINT) AS n2q,
        |    CAST(SUM(z[2] * z[2]) AS BIGINT) AS n2c
        |  FROM (SELECT qid, cid, unnest(list_zip(qc, cc)) AS z FROM pairs) t
        |  GROUP BY qid, cid),
        |ranked AS (
        |  SELECT qid, cid,
        |    CAST(dot AS DOUBLE) /
        |      (sqrt(CAST(n2q AS DOUBLE)) * sqrt(CAST(n2c AS DOUBLE))) AS acos,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dot AS DOUBLE) /
        |        (sqrt(CAST(n2q AS DOUBLE)) * sqrt(CAST(n2c AS DOUBLE))) DESC,
        |      cid) AS rn
        |  FROM sums)
        |SELECT qid, cid, acos, rn FROM ranked WHERE rn <= 5
        |ORDER BY qid, rn""".stripMargin,

    // hits are integer-exact (sums < 2^53); the comparison squares
    // mirror Spark's IEEE double multiplies via explicit DOUBLE casts
    "llm_decontaminate_semantic" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |pairs AS (
        |  SELECT t.vec_id, b.vec_id AS b, t.qv AS qa, b.qv AS qb
        |  FROM e t JOIN e b ON t.vec_id % 200 <> 0 AND b.vec_id % 200 = 0),
        |scored AS (
        |  SELECT vec_id, b,
        |    CAST(SUM(z[1] * z[2]) AS BIGINT) AS dot,
        |    CAST(SUM(z[1] * z[1]) AS BIGINT) AS n2a,
        |    CAST(SUM(z[2] * z[2]) AS BIGINT) AS n2b
        |  FROM (SELECT vec_id, b, unnest(list_zip(qa, qb)) AS z FROM pairs) t
        |  GROUP BY vec_id, b)
        |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_bench_hits,
        |  min(b) AS first_bench_id
        |FROM scored
        |WHERE dot > 0
        |  AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE) >=
        |      0.04 * (CAST(n2a AS DOUBLE) * CAST(n2b AS DOUBLE))
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "llm_embed_neardup" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id < 200),
        |pairs AS (
        |  SELECT x.vec_id AS a, y.vec_id AS b, x.qv AS qa, y.qv AS qb
        |  FROM e x JOIN e y ON x.vec_id < y.vec_id),
        |scored AS (
        |  SELECT a, b,
        |    CAST(SUM(z[1] * z[2]) AS BIGINT) AS dot,
        |    CAST(SUM(z[1] * z[1]) AS BIGINT) AS n2a,
        |    CAST(SUM(z[2] * z[2]) AS BIGINT) AS n2b
        |  FROM (SELECT a, b, unnest(list_zip(qa, qb)) AS z FROM pairs) t
        |  GROUP BY a, b)
        |SELECT a, b, dot FROM scored
        |WHERE dot > 0
        |  AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE) >=
        |      0.04 * (CAST(n2a AS DOUBLE) * CAST(n2b AS DOUBLE))
        |ORDER BY a, b""".stripMargin,

    "llm_text_stats" ->
      s"""SELECT doc_id, lang,
         |  CAST(length(text) AS INTEGER) AS n_chars_calc,
         |  CAST(len($toks) AS INTEGER) AS n_words,
         |  CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE)
         |    / nullif(CAST(len($toks) AS INTEGER), 0) AS avg_wlen,
         |  CAST(len(list_filter($toks, x -> x IN $stopEnList)) AS DOUBLE)
         |    / nullif(CAST(len($toks) AS INTEGER), 0) AS stop_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,

    "llm_knn_classify" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid, c.label AS clabel,
        |    q.qv AS qvec, c.qv AS cvec
        |  FROM e q CROSS JOIN e c
        |  WHERE q.vec_id < 50 AND c.vec_id >= 50),
        |sums AS (
        |  SELECT qid, cid, clabel,
        |    CAST(SUM(z[1] * z[2]) AS BIGINT) AS dot,
        |    CAST(SUM(z[1] * z[1]) AS BIGINT) AS n2q,
        |    CAST(SUM(z[2] * z[2]) AS BIGINT) AS n2c
        |  FROM (SELECT qid, cid, clabel, unnest(list_zip(qvec, cvec)) AS z
        |        FROM pairs) t
        |  GROUP BY qid, cid, clabel),
        |ranked AS (
        |  SELECT qid, cid, clabel,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      CAST(dot AS DOUBLE) /
        |        (sqrt(CAST(n2q AS DOUBLE)) * sqrt(CAST(n2c AS DOUBLE)))
        |      DESC, cid) AS rn
        |  FROM sums),
        |votes AS (
        |  SELECT qid, clabel, count(*) AS votes
        |  FROM ranked WHERE rn <= 5 GROUP BY qid, clabel)
        |SELECT qid, clabel AS pred_label, votes FROM (
        |  SELECT qid, clabel, votes,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY votes DESC, clabel) AS rk
        |  FROM votes) v
        |WHERE rk = 1 ORDER BY qid""".stripMargin,

    "llm_gopher_filter" ->
      s"""WITH f AS (
         |  $gopherSignalsSql),
         |r AS (
         |  SELECT doc_id, n_words, mean_wlen, stop_count,
         |    $gopherReasonSql AS reason
         |  FROM f)
         |SELECT doc_id, n_words, mean_wlen, stop_count, reason,
         |  reason = 'pass' AS keep
         |FROM r ORDER BY doc_id""".stripMargin,

    "llm_curation_report" ->
      s"""WITH f AS (
         |  $gopherSignalsSql),
         |r AS (
         |  SELECT source, text, n_words,
         |    $gopherReasonSql AS reason
         |  FROM f),
         |g AS (
         |  SELECT source,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_words) AS BIGINT) AS n_tokens,
         |    CAST(count(*) FILTER (WHERE reason = 'pass') AS BIGINT)
         |      AS n_gopher_pass,
         |    CAST(count(DISTINCT substring(md5(trim(regexp_replace(
         |      lower(text), '\\s+', ' ', 'g'))), 1, 16)) AS BIGINT)
         |      AS n_distinct
         |  FROM r GROUP BY source)
         |SELECT source, n_docs, n_tokens, n_gopher_pass,
         |  CAST(n_gopher_pass AS DOUBLE) / n_docs AS gopher_pass_rate,
         |  n_distinct,
         |  1.0 - CAST(n_distinct AS DOUBLE) / n_docs AS dup_rate
         |FROM g ORDER BY source""".stripMargin,

    "llm_embed_centroid" ->
      """WITH q AS (
        |  SELECT label, u.i - 1 AS pos,
        |    CAST(round(CAST(embedding[u.i] AS DOUBLE) * 10000000)
        |      AS BIGINT) AS q
        |  FROM embeddings,
        |    UNNEST(range(1, len(embedding) + 1)) AS u(i))
        |SELECT label, pos, count(*) AS n_vecs,
        |  CAST(sum(q) AS BIGINT) AS sum_q,
        |  CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 10000000.0
        |    AS centroid
        |FROM q GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "llm_domain_mix" ->
      s"""WITH per AS (
         |  SELECT source, CAST(len($toks) AS BIGINT) AS toks
         |  FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens,
         |  CAST(sum(toks) AS DOUBLE) /
         |    (SELECT CAST(sum(toks) AS DOUBLE) FROM per) AS token_share
         |FROM per GROUP BY source ORDER BY source""".stripMargin,

    "llm_vocab_coverage" ->
      s"""WITH counts AS (
         |  SELECT token, count(*) AS n
         |  FROM (SELECT unnest($toks) AS token FROM documents) t
         |  GROUP BY token),
         |top AS (
         |  SELECT token, n,
         |    CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT)
         |      AS rank
         |  FROM counts ORDER BY n DESC, token LIMIT 100)
         |SELECT rank, token, n,
         |  CAST(sum(n) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)
         |      AS DOUBLE) /
         |    (SELECT CAST(sum(n) AS DOUBLE) FROM counts) AS cum_share
         |FROM top ORDER BY rank""".stripMargin,

    "llm_tokenize_explode" ->
      s"""SELECT tok, count(*) AS n
         |FROM (SELECT unnest($toks) AS tok FROM documents) t
         |GROUP BY tok ORDER BY n DESC, tok LIMIT 100""".stripMargin,

    // postings + top-2-term AND-query replay straight off the text —
    // agreement proves the persisted index returns exactly what a
    // fresh corpus scan would.
    "llm_inverted_index" ->
      s"""WITH top2 AS (
         |  SELECT token FROM (
         |    SELECT token, count(*) AS n FROM (
         |      SELECT unnest($toks) AS token FROM documents) t
         |    GROUP BY token)
         |  ORDER BY n DESC, token LIMIT 2),
         |posting AS (
         |  SELECT DISTINCT doc_id, token FROM (
         |    SELECT doc_id, unnest($toks) AS token FROM documents) t)
         |SELECT doc_id FROM posting
         |WHERE token IN (SELECT token FROM top2)
         |GROUP BY doc_id
         |HAVING count(DISTINCT token) = 2
         |ORDER BY doc_id""".stripMargin,

    "llm_tfidf_topk" ->
      s"""WITH terms AS (
         |  SELECT doc_id, unnest($toks) AS term FROM documents
         |), tf AS (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM terms GROUP BY doc_id, term
         |), dft AS (
         |  SELECT term,
         |    CAST(round(ln(CAST((SELECT count(DISTINCT doc_id)
         |                        FROM documents) AS DOUBLE)
         |                  / count(*)) * 1e6) AS BIGINT) AS idf_q
         |  FROM tf GROUP BY term
         |), scored AS (
         |  SELECT tf.doc_id, tf.term, tf.tf,
         |    tf.tf * dft.idf_q AS score_q
         |  FROM tf JOIN dft ON tf.term = dft.term
         |)
         |SELECT doc_id, term, tf, score_q FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score_q DESC, term) AS rk
         |  FROM scored) WHERE rk <= 5
         |ORDER BY doc_id, score_q DESC, term""".stripMargin,

    "llm_langid" -> {
      def h(words: Seq[String]) =
        s"len(list_filter($toks, x -> x IN ${words.map(w => s"'$w'").mkString("(", ",", ")")}))"
      val (en, es, de, fr) = (h(TextAnalysis.stopEn), h(TextAnalysis.stopEs),
        h(TextAnalysis.stopDe), h(TextAnalysis.stopFr))
      s"""SELECT doc_id,
         |  CASE WHEN $en >= $es AND $en >= $de AND $en >= $fr AND $en > 0 THEN 'en'
         |       WHEN $es >= $de AND $es >= $fr AND $es > 0 THEN 'es'
         |       WHEN $de >= $fr AND $de > 0 THEN 'de'
         |       WHEN $fr > 0 THEN 'fr'
         |       ELSE 'und' END AS lang_guess
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // full train+classify replay: normalize → trigrams → per-lang and
    // per-doc rank windows (count DESC, gram — lexical ties) →
    // out-of-place distance with topP penalty → per-doc argmin.
    "llm_langid_ngram" ->
      """WITH norm AS (
        |  SELECT doc_id, lang,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9]', ' ', 'g'), ' +', ' ', 'g')) AS nt
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(
        |      generate_series(1, greatest(length(nt) - 2, 0)),
        |      i -> substring(nt, CAST(i AS INTEGER), 3))) AS g
        |  FROM norm),
        |prof AS (
        |  SELECT * FROM (
        |    SELECT lang AS plang, g,
        |      CAST(row_number() OVER (PARTITION BY lang
        |        ORDER BY count(*) DESC, g) AS BIGINT) AS rl
        |    FROM grams GROUP BY lang, g) WHERE rl <= 40),
        |docg AS (
        |  SELECT * FROM (
        |    SELECT doc_id, g,
        |      CAST(row_number() OVER (PARTITION BY doc_id
        |        ORDER BY count(*) DESC, g) AS BIGINT) AS rd
        |    FROM grams GROUP BY doc_id, g) WHERE rd <= 40),
        |present AS (
        |  SELECT d.doc_id, p.plang,
        |    CAST(sum(abs(d.rd - p.rl)) AS BIGINT) AS s,
        |    count(*) AS c
        |  FROM docg d JOIN prof p USING (g) GROUP BY 1, 2),
        |dist AS (
        |  SELECT n.doc_id, l.plang,
        |    coalesce(p.s, 0) + (n.ng - coalesce(p.c, 0)) * 40 AS dist
        |  FROM (SELECT doc_id, count(*) AS ng FROM docg GROUP BY 1) n
        |  CROSS JOIN (SELECT DISTINCT plang FROM prof) l
        |  LEFT JOIN present p
        |    ON p.doc_id = n.doc_id AND p.plang = l.plang)
        |SELECT doc_id, plang AS pred_lang, CAST(dist AS BIGINT) AS dist
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY dist, plang) AS rn FROM dist)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "llm_quality_score" ->
      s"""SELECT doc_id,
         |  round(
         |    CAST(least(length(text), 500) AS DOUBLE) / 500.0 * 0.5 +
         |    CAST(len(list_distinct($toks)) AS DOUBLE)
         |      / nullif(CAST(len($toks) AS INTEGER), 0) * 0.4 -
         |    CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
         |      / nullif(CAST(length(text) AS INTEGER), 0) * 0.1, 6) AS score
         |FROM documents ORDER BY doc_id""".stripMargin,

    "llm_fingerprint" ->
      """SELECT doc_id,
        |  substring(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 16) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        |  lower(hex(encode(left(text, 8)))) AS head_hex,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // every-second-byte stub resize: ascii text ⇒ byte i = char i
    "mm_resize_stub" ->
      """SELECT doc_id,
        |  CAST((octet_length(encode(text)) + 1) // 2 AS INTEGER)
        |    AS n_bytes_out,
        |  lower(hex(encode(
        |    substring(text, 1, 1) || substring(text, 3, 1) ||
        |    substring(text, 5, 1) || substring(text, 7, 1)))) AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_feature_stub" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  array_to_string(
        |    list_transform(range(0, 8), b ->
        |      len(list_filter(range(1, length(text) + 1),
        |        i -> ord(substring(text, i, 1)) % 8 = b))), ',')
        |    AS feat_csv
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_shard_pack" ->
      """WITH sized AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |    doc_id % 4 AS writer
        |  FROM documents
        |), laid AS (
        |  SELECT *, sum(byte_len) OVER (PARTITION BY writer
        |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM sized)
        |SELECT doc_id, writer, byte_len,
        |  CAST(floor((cum - byte_len) / 4096.0) AS BIGINT) AS file_seq,
        |  CAST(cum - byte_len -
        |    CAST(floor((cum - byte_len) / 4096.0) AS BIGINT) * 4096
        |    AS BIGINT) AS offset
        |FROM laid ORDER BY doc_id""".stripMargin,

    // the binaryFile content IS documents.text as UTF-8 bytes, so the
    // whole write-files → binaryFile-scan → decode path is hash-checked
    "mm_binaryfile_source" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CASE WHEN octet_length(encode(text)) % 2 = 0
        |       THEN 'png' ELSE 'jpeg' END AS format
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    // the stub decoder's metadata is pure arithmetic on byte length —
    // fully oracle-able, so the mapPartitions plumbing is hash-checked
    "mm_decode_stub" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CASE WHEN octet_length(encode(text)) % 2 = 0
        |       THEN 'png' ELSE 'jpeg' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the checkerboard PNG's geometry and pixel sum are closed-form
    // in doc_id (see Multimodal.synthCheckerboardPng): the oracle
    // replays the arithmetic, the key replays the DECODE — a
    // hash-match proves ImageIO reproduced every pixel
    "mm_image_decode" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    8 + doc_id % 16 AS w,
        |    8 + (3 * doc_id) % 16 AS h,
        |    doc_id % 251 AS v
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, w, h, v,
        |    (w * h + (w % 2) * (h % 2)) // 2 AS n_even
        |  FROM g)
        |SELECT doc_id,
        |  CAST(w AS INTEGER) AS width,
        |  CAST(h AS INTEGER) AS height,
        |  CAST(n_even * v + (w * h - n_even) * (255 - v) AS BIGINT)
        |    AS px_sum,
        |  'png' AS format
        |FROM e ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST(unnest(generate_series(0, octet_length(encode(text)) // 100))
        |    AS INTEGER) AS frame_idx
        |FROM documents ORDER BY doc_id, frame_idx""".stripMargin,

    "llm_repetition" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
         |cnt AS (SELECT doc_id, tok, count(*) AS n FROM tok GROUP BY 1, 2)
         |SELECT doc_id,
         |  CAST(SUM(n) - COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
         |    AS dup_token_ratio,
         |  CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS top_token_share
         |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "llm_dup_gram_rate" ->
      """WITH toks AS (
        |  SELECT source, string_split(text, ' ') AS t FROM documents
        |), grams AS (
        |  SELECT source, array_to_string(t[i:i+7], ' ') AS gram
        |  FROM toks, UNNEST(CASE WHEN len(t) >= 8 THEN range(1, len(t)-8+2)
        |                         ELSE CAST([] AS BIGINT[]) END) AS u(i)
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
        |  1.0 - CAST(count(DISTINCT gram) AS DOUBLE) / count(*) AS dup_rate
        |FROM grams GROUP BY source ORDER BY source""".stripMargin,

    "llm_ngram_topk" ->
      s"""WITH toks AS (SELECT doc_id, $toks AS t FROM documents),
         |grams AS (
         |  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS gram
         |  FROM toks, UNNEST(CASE WHEN len(t) >= 3 THEN range(1, len(t)-3+2)
         |                         ELSE CAST([] AS BIGINT[]) END) AS u(i)
         |), agg AS (
         |  SELECT gram, CAST(count(*) AS BIGINT) AS n_occurrences,
         |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |  FROM grams GROUP BY gram
         |), top AS (
         |  SELECT * FROM agg ORDER BY n_occurrences DESC, gram LIMIT 20
         |)
         |SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, gram)
         |    AS BIGINT) AS rank, gram, n_occurrences, n_docs
         |FROM top ORDER BY rank""".stripMargin,

    "llm_token_entropy" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
         |cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
         |agg AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_distinct,
         |    CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT))
         |      AS BIGINT) AS s_q
         |  FROM cnt GROUP BY doc_id
         |)
         |SELECT doc_id, n_tokens, n_distinct,
         |  round(ln(CAST(n_tokens AS DOUBLE))
         |    - CAST(s_q AS DOUBLE) / n_tokens / 1e6, 6) AS entropy
         |FROM agg ORDER BY doc_id""".stripMargin,

    "llm_repetition_ngram" ->
      s"""WITH toks AS (SELECT doc_id, $toks AS t FROM documents),
         |grams AS (
         |  SELECT doc_id, 2 AS gn, array_to_string(t[i:i+1], ' ') AS gram
         |  FROM toks, UNNEST(CASE WHEN len(t) >= 2 THEN range(1, len(t)-2+2)
         |                         ELSE CAST([] AS BIGINT[]) END) AS u(i)
         |  UNION ALL
         |  SELECT doc_id, 3 AS gn, array_to_string(t[i:i+2], ' ') AS gram
         |  FROM toks, UNNEST(CASE WHEN len(t) >= 3 THEN range(1, len(t)-3+2)
         |                         ELSE CAST([] AS BIGINT[]) END) AS u(i)
         |), cnt AS (
         |  SELECT doc_id, gn, gram, count(*) AS c FROM grams GROUP BY 1, 2, 3
         |), per AS (
         |  SELECT doc_id, gn, max(c) AS mx, sum(c) AS tot, count(*) AS dst
         |  FROM cnt GROUP BY 1, 2
         |)
         |SELECT doc_id,
         |  max(CASE WHEN gn = 2 THEN CAST(mx AS DOUBLE) / tot END)
         |    AS top_2gram_share,
         |  max(CASE WHEN gn = 3 THEN 1.0 - CAST(dst AS DOUBLE) / tot END)
         |    AS dup_3gram_frac
         |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "llm_winnow_fingerprint" ->
      s"""WITH toks AS (SELECT doc_id, $toks AS t FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(t) >= 3 THEN
         |      list_transform(range(1, len(t) - 3 + 2),
         |        i -> ('0x' || substr(md5(array_to_string(t[i:i+2], ' ')),
         |              1, 8))::BIGINT)
         |    ELSE CAST([] AS BIGINT[]) END AS gh
         |  FROM toks),
         |m AS (
         |  SELECT doc_id,
         |    CASE WHEN len(gh) = 0 THEN CAST([] AS BIGINT[])
         |         WHEN len(gh) < 4 THEN [list_aggregate(gh, 'min')]
         |         ELSE list_transform(range(1, len(gh) - 4 + 2),
         |                i -> list_aggregate(gh[i:i+3], 'min'))
         |    END AS mins
         |  FROM g)
         |SELECT DISTINCT doc_id, u.fp
         |FROM m, UNNEST(list_distinct(mins)) AS u(fp)
         |ORDER BY doc_id, fp""".stripMargin,

    "llm_collocations" ->
      s"""WITH toks AS (SELECT $toks AS t FROM documents),
         |uni AS (SELECT u.t AS tok, count(*) AS c
         |        FROM toks, UNNEST(t) AS u(t) GROUP BY 1),
         |p AS (SELECT t[i] AS a, t[i+1] AS b
         |      FROM toks, UNNEST(range(1, len(t))) AS u(i)),
         |bi AS (SELECT a, b, count(*) AS c_ab FROM p GROUP BY 1, 2
         |       HAVING count(*) >= 5),
         |tot AS (SELECT
         |  CAST(round(ln(sum(len(t))) * 1e6) AS BIGINT) AS ln_nu,
         |  CAST(round(ln(sum(GREATEST(len(t) - 1, 0))) * 1e6) AS BIGINT)
         |    AS ln_nb
         |  FROM toks),
         |s AS (
         |  SELECT bi.a, bi.b, bi.c_ab,
         |    CAST(round(ln(bi.c_ab) * 1e6) AS BIGINT) - tot.ln_nb
         |      - CAST(round(ln(ua.c) * 1e6) AS BIGINT)
         |      - CAST(round(ln(ub.c) * 1e6) AS BIGINT)
         |      + 2 * tot.ln_nu AS pmi_q
         |  FROM bi JOIN uni ua ON ua.tok = bi.a
         |           JOIN uni ub ON ub.tok = bi.b, tot)
         |SELECT a, b, c_ab, pmi_q FROM s
         |ORDER BY pmi_q DESC, a, b LIMIT 50""".stripMargin,

    "llm_zipf_fit" ->
      s"""WITH tok AS (SELECT unnest($toks) AS token FROM documents),
         |cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n
         |        FROM tok GROUP BY token),
         |top AS (SELECT * FROM cnt ORDER BY n DESC, token LIMIT 100),
         |xy AS (
         |  SELECT
         |    CAST(round(ln(CAST(row_number()
         |        OVER (ORDER BY n DESC, token) AS DOUBLE)) * 1e6) AS BIGINT)
         |      AS x,
         |    CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS y
         |  FROM top
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_terms,
         |  round(CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS DOUBLE) /
         |        CAST(count(*) * sum(x*x) - sum(x) * sum(x) AS DOUBLE), 6)
         |    AS zipf_slope
         |FROM xy""".stripMargin,

    "llm_line_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), lines AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |    array_to_string(t[(i-1)*4+1:(i-1)*4+4], ' ') AS line
        |  FROM toks, UNNEST(CASE WHEN len(t) > 0
        |      THEN range(1, (len(t)+3)//4 + 1)
        |      ELSE CAST([] AS BIGINT[]) END) AS u(i)
        |  WHERE trim(array_to_string(t[(i-1)*4+1:(i-1)*4+4], ' ')) <> ''
        |), rk AS (
        |  SELECT doc_id, pos, line,
        |    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rk
        |  FROM lines
        |)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(count(*) FILTER (WHERE rk = 1) AS BIGINT) AS n_kept,
        |  string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE rk = 1) AS text
        |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "llm_substring_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), grams AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS p,
        |    array_to_string(t[i:i+7], ' ') AS gram
        |  FROM toks, UNNEST(CASE WHEN len(t) >= 8 THEN range(1, len(t)-8+2)
        |                         ELSE CAST([] AS BIGINT[]) END) AS u(i)
        |), dup AS (
        |  SELECT doc_id, p FROM (
        |    SELECT doc_id, p, count(*) OVER (PARTITION BY gram) AS cnt
        |    FROM grams)
        |  WHERE cnt > 1
        |), isl AS (
        |  SELECT doc_id, p,
        |    CASE WHEN max(p + 7) OVER (PARTITION BY doc_id ORDER BY p
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |           OR p > max(p + 7) OVER (PARTITION BY doc_id ORDER BY p
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
        |      THEN 1 ELSE 0 END AS brk
        |  FROM dup
        |), grp AS (
        |  SELECT doc_id, p,
        |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl
        |)
        |SELECT doc_id, MIN(p) AS span_start, MAX(p) + 7 AS span_end,
        |  MAX(p) + 7 - MIN(p) + 1 AS span_len,
        |  CAST(count(*) AS BIGINT) AS n_grams
        |FROM grp GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin,

    "llm_substring_remove" ->
      """WITH toksrc AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), grams AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS p,
        |    array_to_string(t[i:i+7], ' ') AS gram
        |  FROM toksrc, UNNEST(CASE WHEN len(t) >= 8 THEN range(1, len(t)-8+2)
        |                         ELSE CAST([] AS BIGINT[]) END) AS u(i)
        |), dup AS (
        |  SELECT doc_id, p FROM (
        |    SELECT doc_id, p, count(*) OVER (PARTITION BY gram) AS cnt
        |    FROM grams)
        |  WHERE cnt > 1
        |), isl AS (
        |  SELECT doc_id, p,
        |    CASE WHEN max(p + 7) OVER (PARTITION BY doc_id ORDER BY p
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |           OR p > max(p + 7) OVER (PARTITION BY doc_id ORDER BY p
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
        |      THEN 1 ELSE 0 END AS brk
        |  FROM dup
        |), grp AS (
        |  SELECT doc_id, p,
        |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl
        |), spans AS (
        |  SELECT doc_id, MIN(p) AS s, MAX(p) + 7 AS e
        |  FROM grp GROUP BY doc_id, island
        |), tk AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS p, t[i] AS tok
        |  FROM toksrc, UNNEST(CASE WHEN len(t) > 0 THEN range(1, len(t)+1)
        |                        ELSE CAST([] AS BIGINT[]) END) AS u(i)
        |)
        |SELECT tk.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(s.s) AS BIGINT) AS n_removed,
        |  nullif(string_agg(CASE WHEN s.s IS NULL THEN tok END, ' '
        |    ORDER BY tk.p), '') AS text
        |FROM tk LEFT JOIN spans s
        |  ON tk.doc_id = s.doc_id AND tk.p BETWEEN s.s AND s.e
        |GROUP BY tk.doc_id ORDER BY tk.doc_id""".stripMargin,

    "llm_dsir_weights" ->
      s"""WITH t AS (
         |  SELECT lang = 'en' AS tgt, $toks AS tk FROM documents
         |), f AS (
         |  SELECT tgt, x AS feat FROM t, UNNEST(tk) AS u(x)
         |  UNION ALL
         |  SELECT tgt, tk[i] || ' ' || tk[i+1] AS feat
         |  FROM t, UNNEST(CASE WHEN len(tk) >= 2 THEN range(1, len(tk))
         |                      ELSE CAST([] AS BIGINT[]) END) AS u(i)
         |), b AS (
         |  SELECT ('0x' || substr(md5(feat), 1, 8))::BIGINT % 64 AS bucket,
         |    CAST(count(*) FILTER (WHERE tgt) AS BIGINT) AS n_target,
         |    CAST(count(*) AS BIGINT) AS n_raw
         |  FROM f GROUP BY 1
         |), tot AS (
         |  SELECT sum(n_target) AS nt, sum(n_raw) AS nr FROM b
         |)
         |SELECT bucket, n_target, n_raw,
         |  CAST(round((ln(CAST(n_target + 1 AS DOUBLE)
         |                 / CAST(nt + 64 AS DOUBLE))
         |            - ln(CAST(n_raw + 1 AS DOUBLE)
         |                 / CAST(nr + 64 AS DOUBLE))) * 1e6) AS BIGINT)
         |    AS logw_q
         |FROM b, tot ORDER BY bucket""".stripMargin,

    "llm_dsir_score" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang = 'en' AS tgt, $toks AS tk FROM documents
         |), f AS (
         |  SELECT doc_id, tgt, x AS feat FROM t, UNNEST(tk) AS u(x)
         |  UNION ALL
         |  SELECT doc_id, tgt, tk[i] || ' ' || tk[i+1] AS feat
         |  FROM t, UNNEST(CASE WHEN len(tk) >= 2 THEN range(1, len(tk))
         |                      ELSE CAST([] AS BIGINT[]) END) AS u(i)
         |), fb AS (
         |  SELECT doc_id, tgt,
         |    ('0x' || substr(md5(feat), 1, 8))::BIGINT % 64 AS bucket
         |  FROM f
         |), b AS (
         |  SELECT bucket,
         |    CAST(count(*) FILTER (WHERE tgt) AS BIGINT) AS n_target,
         |    CAST(count(*) AS BIGINT) AS n_raw
         |  FROM fb GROUP BY 1
         |), tot AS (
         |  SELECT sum(n_target) AS nt, sum(n_raw) AS nr FROM b
         |), w AS (
         |  SELECT bucket,
         |    CAST(round((ln(CAST(n_target + 1 AS DOUBLE)
         |                   / CAST(nt + 64 AS DOUBLE))
         |              - ln(CAST(n_raw + 1 AS DOUBLE)
         |                   / CAST(nr + 64 AS DOUBLE))) * 1e6) AS BIGINT)
         |      AS logw_q
         |  FROM b, tot
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |  CAST(sum(w.logw_q) AS BIGINT) AS dsir_logw_q
         |FROM fb JOIN w USING (bucket)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // dsir_score's pipeline + the deterministic Gumbel draw
    "llm_dsir_resample" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang = 'en' AS tgt, $toks AS tk FROM documents
         |), f AS (
         |  SELECT doc_id, tgt, x AS feat FROM t, UNNEST(tk) AS u(x)
         |  UNION ALL
         |  SELECT doc_id, tgt, tk[i] || ' ' || tk[i+1] AS feat
         |  FROM t, UNNEST(CASE WHEN len(tk) >= 2 THEN range(1, len(tk))
         |                      ELSE CAST([] AS BIGINT[]) END) AS u(i)
         |), fb AS (
         |  SELECT doc_id, tgt,
         |    ('0x' || substr(md5(feat), 1, 8))::BIGINT % 64 AS bucket
         |  FROM f
         |), b AS (
         |  SELECT bucket,
         |    CAST(count(*) FILTER (WHERE tgt) AS BIGINT) AS n_target,
         |    CAST(count(*) AS BIGINT) AS n_raw
         |  FROM fb GROUP BY 1
         |), tot AS (
         |  SELECT sum(n_target) AS nt, sum(n_raw) AS nr FROM b
         |), w AS (
         |  SELECT bucket,
         |    CAST(round((ln(CAST(n_target + 1 AS DOUBLE)
         |                   / CAST(nt + 64 AS DOUBLE))
         |              - ln(CAST(n_raw + 1 AS DOUBLE)
         |                   / CAST(nr + 64 AS DOUBLE))) * 1e6) AS BIGINT)
         |      AS logw_q
         |  FROM b, tot
         |), sc AS (
         |  SELECT doc_id, CAST(sum(w.logw_q) AS BIGINT) AS dsir_logw_q
         |  FROM fb JOIN w USING (bucket) GROUP BY doc_id
         |), g AS (
         |  SELECT doc_id, dsir_logw_q,
         |    CAST(round(-ln(-ln(
         |      ((('0x' || substr(md5(doc_id::VARCHAR || '|dsir-gumbel'),
         |          1, 8))::BIGINT) + 0.5) / 4294967296.0)) * 1e6) AS BIGINT)
         |      AS gumbel_q
         |  FROM sc
         |)
         |SELECT doc_id, dsir_logw_q, gumbel_q,
         |  dsir_logw_q + gumbel_q AS key_q
         |FROM g ORDER BY key_q DESC, doc_id LIMIT 100""".stripMargin,

    "llm_perplexity" ->
      s"""WITH tok AS (
         |  SELECT doc_id, lang, unnest($toks) AS token FROM documents
         |), cnt AS (
         |  SELECT token, count(*) AS cnt FROM tok GROUP BY 1
         |), tot AS (
         |  SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM cnt
         |), lp AS (
         |  SELECT token,
         |    CAST(round(ln(CAST(cnt AS DOUBLE) / total) * 1e6) AS BIGINT)
         |      AS lp_q
         |  FROM cnt, tot
         |), doc AS (
         |  SELECT t.doc_id, t.lang, CAST(count(*) AS BIGINT) AS n_toks,
         |    CAST(sum(-lp_q) AS BIGINT) AS nll_q
         |  FROM tok t JOIN lp USING (token) GROUP BY 1, 2
         |), b AS (
         |  SELECT *, CAST(nll_q AS DOUBLE) / n_toks / 1e6 AS nll_mean,
         |    ntile(3) OVER (PARTITION BY lang
         |      ORDER BY CAST(nll_q AS DOUBLE) / n_toks / 1e6, doc_id) AS nt
         |  FROM doc
         |)
         |SELECT doc_id, lang, n_toks, nll_q, nll_mean,
         |  CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
         |  END AS ppl_bucket
         |FROM b ORDER BY doc_id""".stripMargin,

    "llm_perplexity_bigram" ->
      s"""WITH tok AS (
         |  SELECT doc_id, $toks AS ts FROM documents
         |), bg AS (
         |  SELECT doc_id, ts[CAST(i AS INT)] AS u,
         |         ts[CAST(i AS INT) + 1] AS v
         |  FROM tok, unnest(generate_series(1, len(ts) - 1)) AS t(i)
         |  WHERE len(ts) >= 2
         |), cuv AS (
         |  SELECT u, v, count(*) AS c FROM bg GROUP BY u, v
         |), cu AS (
         |  SELECT u, CAST(sum(c) AS BIGINT) AS cn FROM cuv GROUP BY u
         |), vc AS (
         |  SELECT count(DISTINCT w) AS vsz
         |  FROM (SELECT unnest($toks) AS w FROM documents)
         |), lp AS (
         |  SELECT cuv.u, cuv.v,
         |    CAST(round(ln((cuv.c + 1.0) / (cu.cn + vc.vsz)) * 1e6)
         |      AS BIGINT) AS lp_q
         |  FROM cuv JOIN cu ON cuv.u = cu.u CROSS JOIN vc
         |)
         |SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(-lp.lp_q) AS BIGINT) AS nll_q
         |FROM bg JOIN lp ON bg.u = lp.u AND bg.v = lp.v
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "llm_corpus_summary" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |  CAST(sum(len(tk)) AS BIGINT) AS total_tokens,
         |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
         |  CAST(min(len(tk)) AS INTEGER) AS min_tokens,
         |  CAST(max(len(tk)) AS INTEGER) AS max_tokens,
         |  CAST(sum(CASE WHEN len(tk) < 5 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_short_docs
         |FROM (SELECT doc_id, source, text, $toks AS tk
         |      FROM documents) t""".stripMargin,

    // constants appear as the same source literals Spark bakes
    // ((1.2 + 1), 0.25, 0.75) and the expression tree mirrors the
    // Spark parenthesization exactly — IEEE ops on identical inputs
    // in identical order ⇒ bit-identical scores, no quantization
    "llm_bm25_topk" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS tk FROM documents),
         |lens AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM tk),
         |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl
         |  FROM lens),
         |tf AS (
         |  SELECT doc_id, tok AS term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(tk) AS tok FROM tk) t
         |  WHERE tok IN ('hash', 'join', 'scan') GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |part AS (
         |  -- every constant CAST to DOUBLE: DuckDB otherwise parses
         |  -- 1.2 as DECIMAL and folds (1.2+1)*tf in exact decimal,
         |  -- drifting one ulp from Spark's float literals
         |  SELECT f.doc_id, f.term,
         |    ((s.n_docs - d.df + CAST(0.5 AS DOUBLE))
         |       / (d.df + CAST(0.5 AS DOUBLE))
         |       * (f.tf * (CAST(1.2 AS DOUBLE) + 1)))
         |      / (f.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
         |          + CAST(0.75 AS DOUBLE) * l.dl /
         |          (CAST(s.sum_dl AS DOUBLE) / s.n_docs))) AS part
         |  FROM tf f JOIN df d USING (term) JOIN lens l USING (doc_id),
         |    stats s),
         |agg AS (
         |  SELECT doc_id,
         |    coalesce(max(CASE WHEN term = 'hash' THEN part END), 0.0)
         |      AS ph,
         |    coalesce(max(CASE WHEN term = 'join' THEN part END), 0.0)
         |      AS pj,
         |    coalesce(max(CASE WHEN term = 'scan' THEN part END), 0.0)
         |      AS ps
         |  FROM part GROUP BY 1)
         |SELECT doc_id, ((0.0 + ph) + pj) + ps AS bm25
         |FROM agg ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    "llm_heavy_hitters" ->
      s"""WITH t AS (SELECT unnest($toks) AS token FROM documents),
         |tot AS (SELECT count(*) AS n FROM t)
         |SELECT token, CAST(count(*) AS BIGINT) AS cnt
         |FROM t, tot
         |GROUP BY token, tot.n
         |HAVING count(*) * 200 > tot.n
         |ORDER BY token""".stripMargin,

    "llm_chunk_sliding" ->
      s"""WITH toks AS (SELECT doc_id, $toks AS t FROM documents),
         |st AS (
         |  SELECT doc_id, t, u.s FROM toks,
         |  UNNEST(range(0, len(t), 6)) AS u(s)
         |)
         |SELECT doc_id, CAST(s // 6 AS BIGINT) AS chunk_id,
         |  CAST(s AS BIGINT) AS start_tok,
         |  CAST(LEAST(8, len(t) - s) AS BIGINT) AS n_chunk_tokens,
         |  array_to_string(t[s+1:s+8], ' ') AS chunk_text
         |FROM st ORDER BY doc_id, chunk_id""".stripMargin,

    "llm_token_budget_sample" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |           x -> x <> '')) AS INTEGER)
        |    + CAST(len(list_filter(string_split_regex(lower(text), '[a-z0-9\s]+'),
        |           x -> x <> '')) AS INTEGER) AS toks,
        |    md5(CAST(doc_id AS VARCHAR)) AS ord
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, toks,
        |    SUM(toks) OVER (PARTITION BY source ORDER BY ord, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT doc_id, source, toks, CAST(cum AS BIGINT) AS cum
        |FROM c WHERE cum <= 800 ORDER BY doc_id""".stripMargin,

    "llm_pack_chunks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |           x -> x <> '')) AS INTEGER)
        |    + CAST(len(list_filter(string_split_regex(lower(text), '[a-z0-9\s]+'),
        |           x -> x <> '')) AS INTEGER) AS toks,
        |    doc_id // 100 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks, shard,
        |    SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT doc_id, toks,
        |  shard * 1000 +
        |    CAST(FLOOR((cum - toks) / CAST(512 AS DOUBLE)) AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,

    // full replay: same edge synthesis, then the 3 power iterations
    // UNROLLED as CTE layers (standard SQL forbids aggregation over a
    // recursive reference; a fixed iteration count needs no
    // recursion). Every op BIGINT floor math — bit-exact compare.
    "llm_pagerank" -> {
      def iter(prev: String, name: String) =
        s"""$name AS (
           |  SELECT nd.node,
           |    (15 * CAST(1000000000 AS BIGINT))
           |      // (100 * (SELECT c FROM n)) +
           |    (85 * coalesce(s.t, 0)) // 100 AS rq
           |  FROM nodes nd LEFT JOIN (
           |    SELECT e.dst, CAST(sum(r.rq // o.deg) AS BIGINT) AS t
           |    FROM edges e JOIN $prev r ON r.node = e.src
           |    JOIN outdeg o ON o.src = e.src GROUP BY e.dst) s
           |  ON s.dst = nd.node)"""
      s"""WITH d AS (SELECT doc_id, source FROM documents),
         |tot AS (SELECT count(*) AS c FROM d),
         |edges AS (
         |  SELECT DISTINCT a.source AS src, b.source AS dst
         |  FROM d a CROSS JOIN tot t
         |  JOIN d b ON b.doc_id = (a.doc_id * 31 + 7) % t.c
         |  WHERE a.source <> b.source),
         |nodes AS (
         |  SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |n AS (SELECT count(*) AS c FROM nodes),
         |outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |r0 AS (
         |  SELECT node, 1000000000 // (SELECT c FROM n) AS rq FROM nodes),
         |${iter("r0", "i1")},
         |${iter("i1", "i2")},
         |${iter("i2", "i3")}
         |SELECT node, CAST(rq AS BIGINT) AS rank_q
         |FROM i3 ORDER BY node""".stripMargin
    },

    // host replay + NOT IN over the blocked sources — agreement
    // proves the parse + broadcast-left-join + null-test decision.
    "llm_url_filter" ->
      """SELECT doc_id,
        |  'www.' || source || '.example.com' AS host,
        |  source NOT IN ('src3', 'src7', 'src12') AS keep
        |FROM documents ORDER BY doc_id""".stripMargin,

    "llm_pii_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed,
        |  regexp_replace(
        |    regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g') <> text AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,

    // md5-hex → unsigned-int bucket: Spark conv(hex,16,10) ≡ DuckDB
    // ('0x'||hex)::BIGINT over the identical md5 string
    "llm_split_holdout" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8))::BIGINT
        |    % 100 AS split_bucket,
        |  CASE
        |    WHEN ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8))
        |      ::BIGINT % 100 < 90 THEN 'train'
        |    WHEN ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8))
        |      ::BIGINT % 100 < 95 THEN 'val'
        |    ELSE 'test'
        |  END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "llm_shard_assign" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5(doc_id::VARCHAR || 'shard'), 1, 8))::BIGINT
        |    % 8 AS shard,
        |  ('0x' || substr(md5(doc_id::VARCHAR || 'shard.order'), 1, 8))
        |    ::BIGINT AS shard_order
        |FROM documents ORDER BY doc_id""".stripMargin,

    "llm_mixture_weights" ->
      s"""WITH per AS (
         |  SELECT source AS domain, count(*) AS n_docs,
         |    CAST(sum(CAST(len($toks) AS BIGINT)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |t AS (
         |  SELECT *, 1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM per)
         |    AS target_share
         |  FROM per)
         |SELECT domain, n_docs, n_tokens, target_share,
         |  target_share *
         |    (SELECT min(CAST(n_tokens AS DOUBLE) / target_share) FROM t)
         |    / CAST(n_tokens AS DOUBLE) AS rate
         |FROM t ORDER BY domain""".stripMargin,

    // √-weight replay: sqrt is IEEE-correctly-rounded in both
    // engines, so the 1e6-quantized weights and floor-div ppm rates
    // compare exactly.
    "llm_temperature_mix" ->
      s"""WITH per AS (
         |  SELECT source AS domain, count(*) AS n_docs,
         |    CAST(sum(CAST(len($toks) AS BIGINT)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1
         |  HAVING sum(CAST(len($toks) AS BIGINT)) > 0),
         |w AS (
         |  SELECT *,
         |    CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000)
         |      AS BIGINT) AS weight_q
         |  FROM per)
         |SELECT domain, n_docs, n_tokens, weight_q,
         |  (weight_q * 1000000) //
         |    (SELECT CAST(sum(weight_q) AS BIGINT) FROM w) AS rate_ppm
         |FROM w ORDER BY domain""".stripMargin,

    // full replay of the UniMax walk: the recursive CTE steps
    // through languages in ascending (n_tokens, lang) order carrying
    // the remaining budget; every step is BIGINT floor-division, so
    // the compare is exact.
    "llm_unimax_alloc" ->
      s"""WITH RECURSIVE per AS (
         |  SELECT lang, count(*) AS n_docs,
         |    CAST(sum(CAST(len($toks) AS BIGINT)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1
         |  HAVING sum(CAST(len($toks) AS BIGINT)) > 0),
         |ranked AS (
         |  SELECT p.*, t.nl, t.total,
         |    CAST(row_number() OVER (ORDER BY p.n_tokens, p.lang) AS BIGINT)
         |      AS rk
         |  FROM per p CROSS JOIN
         |    (SELECT count(*) AS nl, CAST(sum(n_tokens) AS BIGINT) AS total
         |     FROM per) t),
         |walk AS (
         |  SELECT CAST(0 AS BIGINT) AS rk, total * 1 // 2 AS remaining,
         |    CAST(0 AS BIGINT) AS alloc
         |  FROM ranked WHERE rk = 1
         |  UNION ALL
         |  SELECT r.rk,
         |    w.remaining - least(r.n_tokens * 3, w.remaining // (r.nl - w.rk)),
         |    least(r.n_tokens * 3, w.remaining // (r.nl - w.rk))
         |  FROM walk w JOIN ranked r ON r.rk = w.rk + 1),
         |alloc AS (
         |  SELECT r.lang, r.n_docs, r.n_tokens, w.alloc AS alloc_tokens
         |  FROM walk w JOIN ranked r ON r.rk = w.rk WHERE w.rk > 0)
         |SELECT lang, n_docs, n_tokens, alloc_tokens,
         |  alloc_tokens * 1000000 // n_tokens AS epochs_ppm,
         |  alloc_tokens * 1000000 //
         |    (SELECT CAST(sum(alloc_tokens) AS BIGINT) FROM alloc)
         |    AS rate_ppm
         |FROM alloc ORDER BY lang""".stripMargin,

    "llm_length_histogram" ->
      s"""SELECT source,
         |  CASE
         |    WHEN len($toks) <= 16 THEN 16
         |    WHEN len($toks) <= 32 THEN 32
         |    WHEN len($toks) <= 64 THEN 64
         |    WHEN len($toks) <= 128 THEN 128
         |    WHEN len($toks) <= 256 THEN 256
         |    WHEN len($toks) <= 512 THEN 512
         |    ELSE 9223372036854775807
         |  END AS len_cap,
         |  count(*) AS n_docs
         |FROM documents GROUP BY source, len_cap
         |ORDER BY source, len_cap""".stripMargin,

    "llm_c4_filter" ->
      """WITH toks AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
        |), ls AS (
        |  SELECT doc_id, text,
        |    CASE WHEN len(t) > 0 THEN
        |      list_transform(range(1, (len(t)+5)//6 + 1),
        |        i -> array_to_string(t[(i-1)*6+1:(i-1)*6+6], ' '))
        |    ELSE CAST([] AS VARCHAR[]) END AS lines
        |  FROM toks
        |), f AS (
        |  SELECT doc_id, text, lines,
        |    list_filter(lines, l ->
        |      len(list_filter(string_split_regex(trim(l), '\s+'),
        |        w -> w <> '')) >= 5) AS kept
        |  FROM ls
        |)
        |SELECT doc_id,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  NOT (contains(lower(text), 'lorem ipsum')
        |       OR contains(lower(text), 'javascript')
        |       OR contains(text, '{') OR len(kept) < 3) AS keep,
        |  CASE WHEN contains(lower(text), 'lorem ipsum')
        |         OR contains(lower(text), 'javascript') THEN 'bad_word'
        |       WHEN contains(text, '{') THEN 'brace'
        |       WHEN len(kept) < 3 THEN 'too_few_lines'
        |       ELSE 'kept' END AS reason,
        |  nullif(array_to_string(kept, chr(10)), '') AS text
        |FROM f ORDER BY doc_id""".stripMargin,

    "llm_normalize_text" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(
        |      regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g'),
        |      ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, norm, md5(norm) AS fp, norm <> text AS changed
        |FROM n ORDER BY doc_id""".stripMargin,

    "llm_mixture_sample" ->
      s"""WITH per AS (
         |  SELECT source AS domain, count(*) AS n_docs,
         |    CAST(sum(CAST(len($toks) AS BIGINT)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |t AS (
         |  SELECT *, 1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM per)
         |    AS target_share
         |  FROM per),
         |r AS (
         |  SELECT domain,
         |    target_share *
         |      (SELECT min(CAST(n_tokens AS DOUBLE) / target_share) FROM t)
         |      / CAST(n_tokens AS DOUBLE) AS rate
         |  FROM t)
         |SELECT doc_id, source
         |FROM documents d JOIN r ON d.source = r.domain
         |WHERE CAST(('0x' || substr(md5(doc_id::VARCHAR || 'mix'), 1, 8))
         |    ::BIGINT AS DOUBLE) < rate * 4294967296.0
         |ORDER BY doc_id""".stripMargin,

    "llm_curation_pipeline" ->
      s"""WITH f AS (
         |  $gopherSignalsSql),
         |kept AS (
         |  SELECT doc_id, text FROM f
         |  WHERE ($gopherReasonSql) = 'pass'),
         |dd AS (
         |  SELECT md5(trim(regexp_replace(
         |      regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g'),
         |      ' +', ' ', 'g'))) AS fp,
         |    min(doc_id) AS doc_id
         |  FROM kept GROUP BY 1)
         |SELECT doc_id, fp,
         |  CASE
         |    WHEN ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8))
         |      ::BIGINT % 100 < 90 THEN 'train'
         |    WHEN ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8))
         |      ::BIGINT % 100 < 95 THEN 'val'
         |    ELSE 'test'
         |  END AS split,
         |  ('0x' || substr(md5(doc_id::VARCHAR || 'shard'), 1, 8))::BIGINT
         |    % 8 AS shard
         |FROM dd ORDER BY doc_id""".stripMargin,

    "llm_token_count" ->
      s"""SELECT doc_id,
         |  CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
         |         x -> x <> '')) AS INTEGER)
         |  + CAST(len(list_filter(string_split_regex(lower(text), '[a-z0-9\\s]+'),
         |         x -> x <> '')) AS INTEGER) AS n_tokens_approx
         |FROM documents ORDER BY doc_id""".stripMargin
  )
}
