package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (north-star,
  * BASELINE.json; `embeddings.embedding` is ArrayType(FloatType)).
  *
  * Three tiers:
  *  - brute-force cosine top-k (baseline; broadcast the query set,
  *    scan candidates once — at 100 TB this is queries × scan, fine
  *    for small query batches);
  *  - LSH (random hyperplanes) bucketed top-k — candidates shrink by
  *    ~2^planes, one equi-join on the bucket signature;
  *  - IVF (centroid partitions + nprobe) — the classic ANN scale path:
  *    assignment is a broadcast argmin, search touches nprobe/nlist of
  *    the data.
  * All randomness is seeded hash-derived → deterministic re-runs.
  */
object Similarity {

  /** Exact-decimal dot product: each float is cast to DECIMAL(10,7)
    * (correctly rounded on any engine), products/sums are exact — the
    * resulting double is bit-identical regardless of summation order,
    * which makes cosine oracle-checkable across engines.
    */
  def dotDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        x.cast(DecimalType(10, 7)) * y.cast(DecimalType(10, 7))),
      lit(0).cast(DecimalType(35, 14)),
      // re-cast each step: (35,14)+(21,14) → (36,14) under Spark's
      // result-type rules; casting back is lossless (|dot| ≪ 10^21)
      // and keeps the accumulator type fixed as aggregate() requires
      (acc, v) => (acc + v).cast(DecimalType(35, 14))).cast(DoubleType)

  /** Fast double dot product (sequential fold — deterministic within
    * Spark, used where no cross-engine oracle applies).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Double-precision cosine, rounded to 6 dp. ~7× cheaper than
    * `cosineDec` (no per-element DECIMAL casts); deterministic within
    * Spark because the fold order is the array order. Used for every
    * path that is *not* hash-compared against the DuckDB oracle
    * (LSH/IVF assignment and ranking).
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast(ArrayType(DoubleType)); val bd = b.cast(ArrayType(DoubleType))
    round(dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd))), 6)
  }

  def norm2Dec(a: Column): Column = dotDec(a, a)

  /** cosine rounded to 6 dp (rounding absorbs engine-level float
    * noise; ranking uses the rounded value + id tiebreak).
    */
  def cosineDec(a: Column, b: Column): Column =
    round(dotDec(a, b) / (sqrt(norm2Dec(a)) * sqrt(norm2Dec(b))), 6)

  /** Cross-engine-exact brute-force cosine top-k: embeddings quantize
    * per element to round(x·1e7) BIGINT (float→double is exact binary
    * and half-up rounding agrees on both engines), dot/norms are pure
    * integer sums, and the cosine is raw IEEE division/sqrt on
    * identical integer-derived doubles — bit-identical across engines
    * with NO round() anywhere (round()'s decimal conversion differs
    * between engines near x.xxxxx5 boundaries, and DECIMAL casts of
    * floats differ in the last place). Quantization error ~1e-7.
    */
  def bruteForceTopKExact(queries: DataFrame, candidates: DataFrame,
                          k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    // The quantized values stay in the DOUBLE domain: every product
    // (≤1e14) and running 64-term sum (≤6.4e15) sits below 2^53, so
    // the native single-pass VecDot computes EXACTLY the integers the
    // former BIGINT aggregate(zip_with) fold did — same values, same
    // IEEE division — without dispatching a lambda per element (the
    // per-pair bottleneck: ~3× on the knn key). Norms precompute once
    // per SIDE instead of once per pair (one dot per pair, not three).
    def quant(v: Column): Column =
      transform(v, x => round(x.cast(DoubleType) * 1e7))
    val dot = graft.functions.GraftFunctions.vecDot(_, _)
    val q = queries.select(col("vec_id").as("qid"),
      quant(col("embedding")).as("qvec"))
      .withColumn("qnorm", sqrt(dot(col("qvec"), col("qvec"))))
    val c = candidates.select(col("vec_id").as("cid"),
      quant(col("embedding")).as("cvec"))
      .withColumn("cnorm", sqrt(dot(col("cvec"), col("cvec"))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        (dot(col("qvec"), col("cvec")) /
          (col("qnorm") * col("cnorm"))).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Hard-negative mining for contrastive training (Karpukhin et al.
    * 2020, DPR; the standard embedding-model training-data step):
    * for each query vector, the top-k most-similar candidates whose
    * label DIFFERS from the query's — maximally-confusable wrong
    * answers, the negatives that actually teach the model. The label
    * inequality is a per-query predicate, so it lives in the join
    * filter (a pre-filter of the candidate side cannot express it).
    *
    * Same exact-integer tier as [[bruteForceTopKExact]] (quantized
    * BIGINT dots, IEEE-mirrored sqrt/divide — oracle replays in
    * full); the LSH/IVF keys are the 100 TB path and compose the same
    * label predicate post-bucketing. Query side broadcasts.
    *
    * Returns (qid, qlabel, cid, neg_label, cos, rn), rn ≤ k ranked
    * (cos desc, cid).
    */
  def hardNegatives(queries: DataFrame, candidates: DataFrame,
                    k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    // same native-VecDot / per-side-norm shape as
    // [[bruteForceTopKExact]] — see the exactness argument there
    def quant(v: Column): Column =
      transform(v, x => round(x.cast(DoubleType) * 1e7))
    val dot = graft.functions.GraftFunctions.vecDot(_, _)
    val q = queries.select(col("vec_id").as("qid"),
      col("label").as("qlabel"), quant(col("embedding")).as("qvec"))
      .withColumn("qnorm", sqrt(dot(col("qvec"), col("qvec"))))
    val c = candidates.select(col("vec_id").as("cid"),
      col("label").as("neg_label"), quant(col("embedding")).as("cvec"))
      .withColumn("cnorm", sqrt(dot(col("cvec"), col("cvec"))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid") &&
        col("neg_label") =!= col("qlabel"))
      .select(col("qid"), col("qlabel"), col("cid"), col("neg_label"),
        (dot(col("qvec"), col("cvec")) /
          (col("qnorm") * col("cnorm"))).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Scalar 8-bit quantization (SQ8) — the classic compressed-vector
    * tier (Faiss `SQ8` / Milvus `IVF_SQ8` shape): each vector stores a
    * per-vector scale plus one signed byte per dimension, 4× smaller
    * than float32 (28× smaller than the oracle's quantized-BIGINT
    * form). At 100 TB of embeddings the code table is what makes the
    * candidate scan cache-resident.
    *
    * Returns (idCol, qmax, code) where `code[i] ∈ [-127, 127]` (stored
    * as TINYINT — the actual byte layout) and `qmax` is the per-vector
    * scale (max |round(x·1e7)|). The whole encode is EXACT integer
    * math — floats lift to `round(x·1e7)` BIGINTs (float→double is
    * exact binary, half-up agrees cross-engine), and the byte code is
    * an integer rounding `sign(q)·⌊(|q|·254 + qmax) / (2·qmax)⌋`
    * (round-half-away-from-zero without ever rounding a noisy double)
    * — so encode, and everything ranked on it, is engine-portable and
    * oracle-checkable, unlike float k-means codebooks. Map-only: three
    * stacked projections, no exchange (plan-asserted in
    * SimilaritySpec).
    */
  def sq8Encode(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = transform(col(vecCol), x =>
      round(x.cast(DoubleType) * 1e7).cast(LongType))
    df.select(col(idCol), q.as("__q"))
      .select(col(idCol), col("__q"),
        greatest(array_max(col("__q")), -array_min(col("__q")), lit(1L))
          .as("qmax"))
      .select(col(idCol), col("qmax"),
        transform(col("__q"), qi => {
          // numerator ≤ ~2.5e9 — exact in double, division correctly
          // rounded, floor of positives == truncation on every engine
          val mag = floor((abs(qi) * 254 + col("qmax")).cast(DoubleType) /
            (col("qmax") * 2).cast(DoubleType)).cast(LongType)
          when(qi < 0, -mag).otherwise(mag).cast(ByteType)
        }).as("code"))
  }

  /** SQ8 approximate cosine top-k (asymmetric ranking on the byte
    * codes): score = byte-dot / (√byte-norm² · √byte-norm²). The
    * per-vector scales CANCEL out of the cosine — code_i ≈
    * q_i·127/qmax, so (qmaxA·qmaxB) appears in both numerator and
    * denominator — which keeps the whole score a function of exact
    * integers (the final IEEE division of identical integers is
    * bit-identical cross-engine, the `bruteForceTopKExact` argument).
    * Approximation error comes only from the 8-bit rounding.
    *
    * 100 TB shape: candidates scan their (1 byte/dim) codes once,
    * query codes broadcast; one window per query partition keeps k.
    * Embeddings must be non-zero (zero-norm → NaN, as in the exact
    * tier).
    */
  def sq8TopK(queries: DataFrame, candidates: DataFrame,
              k: Int): DataFrame = {
    def idot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y,
        (a, b) => a.cast(LongType) * b.cast(LongType)),
        lit(0L), (acc, v) => acc + v)
    val q = sq8Encode(queries, "vec_id", "embedding")
      .select(col("vec_id").as("qid"), col("code").as("qc"))
    val c = sq8Encode(candidates, "vec_id", "embedding")
      .select(col("vec_id").as("cid"), col("code").as("cc"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        (idot(col("qc"), col("cc")).cast(DoubleType) /
          (sqrt(idot(col("qc"), col("qc")).cast(DoubleType)) *
            sqrt(idot(col("cc"), col("cc")).cast(DoubleType)))).as("acos"))
    val w = Window.partitionBy("qid").orderBy(col("acos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Brute-force cosine top-k: query rows broadcast against the
    * candidate scan; per-query window keeps k.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
                     k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = candidates.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), cosineDec(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Deterministic pseudo-random hyperplane component: hash(plane,dim)
    * mapped to [-0.5, 0.5).
    */
  private def planeComponent(plane: Int, dim: Int): Double =
    (java.lang.Long.hashCode(
      scala.util.hashing.byteswap64(plane.toLong * 131071L + dim.toLong))
      % 100000) / 200000.0

  /** Signs of projections onto `planes` hyperplanes → bucket id. */
  def lshBucket(v: Column, dims: Int, planes: Int): Column =
    (0 until planes).map { p =>
      val hp = array((0 until dims).map(j => lit(planeComponent(p, j))): _*)
      when(dot(v.cast(ArrayType(DoubleType)), hp) > 0,
        expr(s"shiftleft(1L, $p)")).otherwise(0L)
    }.reduce(_ + _)

  /** LSH-bucketed ANN top-k: equi-join on bucket signature. Recall is
    * tunable via `planes` (fewer planes → bigger buckets → higher
    * recall & cost). `cosFn` defaults to the higher-order double
    * cosine; pass `GraftFunctions.vecCosine` (after registering) for
    * the native codegen'd expression.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, dims: Int,
              planes: Int, k: Int,
              cosFn: (Column, Column) => Column = cosine): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), dims, planes))
    val c = candidates.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), dims, planes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), cosFn(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Embedding-cosine near-dup pairs (the dedup-by-embedding member
    * of the dedup family): candidate pairs come from an LSH bucket
    * equi-join (linear — never the all-pairs product), then exact
    * cosine filters at `threshold`. Same recall trade-off as lshTopK:
    * fewer planes → bigger buckets → higher recall & cost. For the
    * oracle-checked exact form on a bounded subset see
    * `llm_embed_neardup`.
    */
  def cosineNearDupPairs(emb: DataFrame, dims: Int, planes: Int,
                         threshold: Double,
                         cosFn: (Column, Column) => Column = cosine): DataFrame = {
    val withBucket = emb.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", lshBucket(col("embedding"), dims, planes))
    val a = withBucket.select(col("bucket"), col("vec_id").as("a"),
      col("embedding").as("va"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("b"),
      col("embedding").as("vb"))
    a.join(b, Seq("bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), cosFn(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select("a", "b", "cos").distinct()
  }

  /** Deterministic seeded k-means for IVF coarse-quantizer training
    * (spherical variant: max-cosine assignment, per-dimension mean
    * update — matches `ivfTopK`'s cosine assignment; cosine is
    * scale-invariant so the un-normalized mean is a valid centroid).
    *
    * Determinism — bit-exact across runs AND cluster layouts: init
    * picks the k vectors with the smallest `xxhash64(vec_id)` (a
    * seeded pseudo-random draw, identical on every run), runs a FIXED
    * `iters` Lloyd iterations, and the per-dimension mean aggregates
    * component SUMS as fixed-scale DECIMALs (exact, associative —
    * independent of shuffle merge order) before one final division; a
    * plain double `avg` depends on partial-merge order and could
    * drift in the low bits between runs, flipping near-tie
    * assignments.
    *
    * `sampleFraction` trains on a deterministic hash-sample of the
    * input (`xxhash64(vec_id)` bucketing, so the SAME rows are chosen
    * every run) — the typed form of the 100 TB guidance: the coarse
    * quantizer needs the density shape, not every row, so train on a
    * sample and ship the centroids; assignment of the full corpus
    * stays map-only.
    *
    * Scale shape: per iteration the centroids are plan literals
    * (k·dims doubles), so assignment is MAP-ONLY (argmax over an array
    * of structs — no crossJoin, no window shuffle); the only shuffle
    * is the (cid, dim) partial-sum aggregation, k·dims rows to the
    * driver. The data never moves.
    */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int = 5,
                      sampleFraction: Double = 1.0): DataFrame = {
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1]: $sampleFraction")
    val spark = emb.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val training =
      if (sampleFraction >= 1.0) emb
      else emb.filter(pmod(xxhash64(col("vec_id")), lit(1000000L)) <
        lit((sampleFraction * 1000000L).toLong))
    // keep math on the native codegen'd expressions — the
    // higher-order aggregate(zip_with(...)) form dispatches a lambda
    // per element and made training ~50× slower at sf0.1
    val vecs = training.select(col("vec_id"), col("embedding")
      .cast(ArrayType(DoubleType)).as("v"))
      .localCheckpoint(eager = false)
    var cents: Seq[Seq[Double]] = vecs
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h", "vec_id").limit(k)
      .select("v").collect().map(_.getSeq[Double](0)).toSeq
    require(cents.nonEmpty, "kmeansCentroids: no input vectors " +
      "(empty input or sampleFraction too small)")
    for (_ <- 0 until iters) {
      // fused native argmax (norm + k dots + first-max-wins argmax in
      // one pass); the centroid matrix rides the plan as a LITERAL
      // reaching generated code via `references`, so every Lloyd
      // iteration produces byte-identical codegen source and reuses
      // the iteration-1 compiled class instead of recompiling — the
      // dominant per-iteration cost of the old k-unrolled
      // array(vecDot(v, array(lit…))/…) form
      val cid = graft.functions.GraftFunctions.vecCosArgmax(col("v"),
        typedLit(cents))
      val means = vecs
        .select(cid.as("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        // exact fixed-scale decimal sum: associative/commutative, so
        // the result is identical under any shuffle merge order
        .groupBy("cid", "pos").agg(
          (sum(col("x").cast(DecimalType(32, 14))) /
            count(lit(1))).cast(DoubleType).as("m"))
        .collect()
        .groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, i) =>
        means.get(i) match {
          case Some(rows) =>
            rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
          case None => old // empty cluster keeps its centroid
        }
      }
    }
    cents.zipWithIndex
      .map { case (cv, i) => (i.toLong, cv) }
      .toDF("vec_id", "embedding")
  }

  /** IVF ANN: assign every vector to its nearest of `centroids`, probe
    * the `nprobe` nearest lists per query. A coarse quantizer is small
    * by definition (nlist ≪ N), so the centroids are collected once
    * and baked into the plan as literals: candidate assignment is then
    * MAP-ONLY (argmax over a scored array — no crossJoin, no
    * 1-row-per-centroid window shuffle of the full candidate set,
    * which at 100 TB would be the dominant cost). Queries are a small
    * batch; their top-nprobe lists use a posexplode + window over
    * |Q|·nlist rows. Both sides join on the centroid INDEX (1-based,
    * centroids ordered by id, ties to the lowest id). All math is
    * double precision — exact-DECIMAL cosine is reserved for
    * oracle-checked outputs (`bruteForceTopK`).
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame,
              centroids: DataFrame, nprobe: Int, k: Int,
              cosFn: (Column, Column) => Column = cosine): DataFrame = {
    val centRows: Seq[(Long, Seq[Double])] = centroids
      .select(col("vec_id").cast(LongType),
        col("embedding").cast(ArrayType(DoubleType)))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      .sortBy(_._1)
    require(centRows.nonEmpty, "ivfTopK: no centroids")
    def scoreArr(vc: Column) = array(centRows.map { case (_, cv) =>
      cosFn(vc, array(cv.map(lit): _*))
    }: _*)
    val c = candidates
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .withColumn("sc", scoreArr(col("cv")))
      // first occurrence of the max = lowest centroid id (sorted above)
      .withColumn("cidx",
        array_position(col("sc"), array_max(col("sc"))).cast("int"))
      .drop("sc")
    val wq = Window.partitionBy("qid").orderBy(col("ccos").desc, col("ci"))
    val q = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .select(col("qid"), col("qv"),
        posexplode(scoreArr(col("qv"))).as(Seq("ci0", "ccos")))
      .select(col("qid"), col("qv"), (col("ci0") + 1).as("ci"), col("ccos"))
      .withColumn("crn", row_number().over(wq))
      .filter(col("crn") <= nprobe)
      .select(col("qid"), col("qv"), col("ci").as("cidx"))
    val scored = c.join(broadcast(q), Seq("cidx"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), cosFn(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Product-quantization codebooks (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): the embedding space
    * splits into `m` contiguous subspaces of dims/m dimensions; each
    * subspace gets its own `ksub`-centroid L2 k-means codebook. A
    * vector then stores just `m` small code ids ([[pqEncode]]) —
    * m·log2(ksub) bits instead of dims·32 — the compression that makes
    * a 100 TB corpus searchable from memory.
    *
    * Training mirrors [[kmeansCentroids]]' determinism contract
    * (hash-seeded init, fixed Lloyd iterations, order-insensitive
    * DECIMAL mean sums, `sampleFraction` hash-sampling) but runs ALL
    * m subspaces JOINTLY: subvectors explode to (sub, sv) rows once,
    * every iteration is ONE assignment pass + ONE (sub, cid, pos)
    * hash-agg — m× fewer jobs than looping k-means per subspace, and
    * the only driver traffic is the m·ksub·dsub centroid means.
    * Assignment is argmin ‖sv−c‖² ≡ argmin(|c|²−2·sv·c) over literal
    * centroids — map-only, native codegen'd VecDot. Empty clusters
    * keep their previous centroid. Returns codebooks(s)(j) = centroid
    * j of subspace s (j < min(ksub, n_train)).
    */
  def pqTrain(emb: DataFrame, m: Int, ksub: Int, iters: Int = 5,
              sampleFraction: Double = 1.0): Seq[Seq[Seq[Double]]] = {
    require(m > 0 && ksub > 0, s"m=$m, ksub=$ksub must be positive")
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1]: $sampleFraction")
    val spark = emb.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val training =
      if (sampleFraction >= 1.0) emb
      else emb.filter(pmod(xxhash64(col("vec_id")), lit(1000000L)) <
        lit((sampleFraction * 1000000L).toLong))
    val dims = training.select(size(col("embedding"))).head().getInt(0)
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val dsub = dims / m
    val svArr = array((0 until m).map(s =>
      slice(col("embedding").cast(ArrayType(DoubleType)),
        s * dsub + 1, dsub)): _*)
    val subs = training
      .select(col("vec_id"), posexplode(svArr).as(Seq("sub", "sv")))
      .localCheckpoint(eager = false)
    // init: per subspace the ksub subvectors with the smallest seeded
    // hash — same deterministic draw as kmeansCentroids
    val wi = Window.partitionBy("sub").orderBy(col("h"), col("vec_id"))
    val initRows = subs.withColumn("h", xxhash64(col("vec_id")))
      .withColumn("rk", row_number().over(wi)).filter(col("rk") <= ksub)
      .select("sub", "rk", "sv").collect()
    require(initRows.nonEmpty, "pqTrain: no training vectors")
    var books: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
      initRows.filter(_.getInt(0) == s).sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toSeq).toSeq
    }
    // fused native argmin ‖c‖²−2·sv·c with the codebook as a
    // references-loaded literal — codegen source is iteration-stable,
    // so the m-subspace assignment stage compiles once (see
    // kmeansCentroids)
    def argminExpr(s: Int): Column =
      graft.functions.GraftFunctions.vecL2Argmin(col("sv"),
        typedLit(books(s)))
    for (_ <- 0 until iters) {
      val cid = (0 until m).foldLeft(lit(-1): Column) { (acc, s) =>
        when(col("sub") === s, argminExpr(s)).otherwise(acc)
      }
      val means = subs
        .select(col("sub"), cid.as("cid"),
          posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("sub", "cid", "pos").agg(
          (sum(col("x").cast(DecimalType(32, 14))) /
            count(lit(1))).cast(DoubleType).as("mean"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
      books = books.zipWithIndex.map { case (book, s) =>
        book.zipWithIndex.map { case (old, j) =>
          means.get((s, j)) match {
            case Some(rows) =>
              rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
            case None => old // empty cluster keeps its centroid
          }
        }
      }
    }
    books
  }

  /** PQ encode: each vector → `m` code ids, the argmin-L2 centroid of
    * each subspace's codebook. Centroids are plan LITERALS, so this is
    * MAP-ONLY (plan-asserted) — the 100 TB corpus is encoded in one
    * scan with no shuffle, and the stored `codes` column is
    * m·log2(ksub) bits of the original vector.
    */
  def pqEncode(emb: DataFrame, codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    val v = col("embedding").cast(ArrayType(DoubleType))
    val codes = array((0 until m).map { s =>
      graft.functions.GraftFunctions.vecL2Argmin(
        slice(v, s * dsub + 1, dsub), typedLit(codebooks(s)))
    }: _*)
    emb.select(col("vec_id"), codes.as("codes"))
  }

  /** PQ ADC top-k (asymmetric distance computation): each query
    * precomputes its m×ksub lookup table of exact subspace distances
    * ‖qsub_s − c_{s,j}‖²; a candidate's approximate distance is then m
    * table lookups summed over its codes — no candidate vector is ever
    * decoded. Ranked ascending (L2), ties to the lower id.
    *
    * 100 TB shape: the LUT rides the broadcast query frame (|Q|·m·ksub
    * doubles); candidates scan only their code column — the scored
    * side never touches float vectors, and the whole score is
    * expression-level (zip codes with 1..m, element_at into the LUT)
    * inside whole-stage codegen.
    */
  def pqTopK(queries: DataFrame, candidates: DataFrame,
             codebooks: Seq[Seq[Seq[Double]]], k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    val qv = col("embedding").cast(ArrayType(DoubleType))
    val lut = array((0 until m).map { s =>
      val sv = slice(qv, s * dsub + 1, dsub)
      array(codebooks(s).map { cv =>
        graft.functions.GraftFunctions.vecDot(sv, sv) - lit(2.0) *
          graft.functions.GraftFunctions.vecDot(sv, array(cv.map(lit): _*)) +
          lit(cv.map(x => x * x).sum)
      }: _*)
    }: _*)
    val q = queries.select(col("vec_id").as("qid"), lut.as("lut"))
    val c = pqEncode(candidates, codebooks)
      .select(col("vec_id").as("cid"), col("codes"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        aggregate(
          zip_with(col("codes"), sequence(lit(1), lit(m)),
            (code, s) => element_at(element_at(col("lut"), s), code + 1)),
          lit(0.0), (acc, v) => acc + v).as("adist"))
    val w = Window.partitionBy("qid").orderBy(col("adist"), col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): semantic dedup of
    * an embedding corpus. Vectors are k-means-clustered; within each
    * cluster, pairs with cosine ≥ `tau` are semantic duplicates;
    * duplicate groups are their connected components and the kept
    * representative is the group's min id (the paper keeps one
    * arbitrary item per group — min id makes re-runs deterministic).
    *
    * Returns one row per vector: (vec_id, cid — the k-means cluster,
    * dup_group — min id of the vector's duplicate component, itself
    * when it has no duplicate, keep — dup_group == vec_id).
    *
    * 100 TB shape (the paper's own argument): all-pairs cosine is
    * quadratic, but WITHIN-cluster pairs are quadratic only in the
    * cluster size (corpus/nlist on average) — so candidate pairs come
    * from a cid equi-join, never a cross product. The trained
    * centroids are plan LITERALS ([[kmeansCentroids]] — train on a
    * hash-sample via `sampleFraction` at scale), so cluster
    * assignment is map-only: the corpus reaches its first shuffle
    * already bucketed by cid. Component labeling runs on the pair
    * set only (near-dups, ≪ corpus).
    */
  def semDedup(emb: DataFrame, nlist: Int, tau: Double,
               iters: Int = 5, sampleFraction: Double = 1.0,
               cosFn: (Column, Column) => Column = cosine): DataFrame = {
    val centRows: Seq[Seq[Double]] =
      kmeansCentroids(emb, nlist, iters, sampleFraction)
        .select(col("vec_id").cast(LongType),
          col("embedding").cast(ArrayType(DoubleType)))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
        .sortBy(_._1).map(_._2)
    val scoreArr = (vc: Column) => array(centRows.map { cv =>
      cosFn(vc, array(cv.map(lit): _*))
    }: _*)
    // consumed 3× (both pair-join sides + the final join-back) —
    // materialize once or the whole assignment lineage (scan + k-wide
    // scored projection) re-runs and re-codegens per consumer
    val assigned = emb
      .select(col("vec_id"), col("embedding"))
      .withColumn("sc", scoreArr(col("embedding")))
      .withColumn("cid",
        array_position(col("sc"), array_max(col("sc"))).cast("int"))
      .drop("sc")
      .localCheckpoint(eager = false)
    val a = assigned.select(col("cid"), col("vec_id").as("a"),
      col("embedding").as("va"))
    val b = assigned.select(col("cid"), col("vec_id").as("b"),
      col("embedding").as("vb"))
    val pairs = a.join(b, Seq("cid")).filter(col("a") < col("b"))
      .filter(cosFn(col("va"), col("vb")) >= tau)
      .select("a", "b")
    val comps = graft.operators.Dedup.clusters(pairs)
    assigned.select(col("vec_id"), col("cid"))
      .join(comps.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(col("cluster_id"), col("vec_id")).as("dup_group"))
      .withColumn("keep", col("dup_group") === col("vec_id"))
  }
}
