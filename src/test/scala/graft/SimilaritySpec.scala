package graft

import graft.operators.{Similarity, VectorIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN verification (SURVEY §5.3): brute-force correctness on known
  * vectors, LSH bucket guarantee for identical vectors, and IVF ≡
  * brute force when probing every list — the no-oracle keys'
  * verification.
  */
class SimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dims = 16
  private val rnd = new scala.util.Random(7)
  private val vecs: Seq[(Long, Seq[Float])] =
    (0L until 40L).map(i => (i, Seq.fill(dims)(rnd.nextFloat() - 0.5f)))
  private def emb: DataFrame = vecs.toDF("vec_id", "embedding")

  private def cosRef(a: Seq[Float], b: Seq[Float]): Double = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val d = ad.zip(bd).map { case (x, y) => x * y }.sum
    d / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
  }

  test("brute-force top-k ranks by true cosine") {
    val q = emb.filter(col("vec_id") === 0L)
    val top = Similarity.bruteForceTopK(q, emb, k = 3)
      .orderBy("rn").collect()
    val expected = vecs.tail
      .map { case (id, v) => (id, cosRef(vecs.head._2, v)) }
      .sortBy { case (id, c) => (-math.round(c * 1e6) / 1e6, id) }
      .take(3).map(_._1)
    assert(top.map(_.getAs[Long]("cid")).toSeq == expected)
  }

  test("a candidate identical to the query ranks first with cos 1.0") {
    val withClone = emb.unionByName(
      Seq((99L, vecs.head._2)).toDF("vec_id", "embedding"))
    val top = Similarity.bruteForceTopK(
      withClone.filter(col("vec_id") === 0L), withClone, k = 1).head()
    assert(top.getAs[Long]("cid") == 99L)
    assert(top.getAs[Double]("cos") == 1.0)
  }

  test("hardNegatives: wrong-label only, ranked like the exact tier") {
    val labeled = emb.withColumn("label", pmod(col("vec_id"), lit(3)))
    val q = labeled.filter(col("vec_id") < 3)
    val out = Similarity.hardNegatives(q, labeled, k = 5).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("neg_label") != r.getAs[Long]("qlabel"),
        s"negative shares the query's label: $r")
      assert(r.getAs[Long]("cid") != r.getAs[Long]("qid"))
    }
    assert(out.groupBy(_.getAs[Long]("qid")).forall(_._2.length == 5))
    // agreement with the unrestricted exact tier: hardNegatives(q) ==
    // bruteForceTopKExact(q, candidates-with-other-labels) per query
    for (qid <- 0L until 3L) {
      val ql = qid % 3
      val ref = Similarity.bruteForceTopKExact(
        labeled.filter(col("vec_id") === qid),
        labeled.filter(col("label") =!= ql), k = 5)
        .collect().map(r => (r.getAs[Long]("cid"), r.getAs[Int]("rn"))).toSet
      val got = out.filter(_.getAs[Long]("qid") == qid)
        .map(r => (r.getAs[Long]("cid"), r.getAs[Int]("rn"))).toSet
      assert(got == ref, s"qid=$qid: $got vs $ref")
    }
  }

  test("lsh: identical vectors always share a bucket and are found") {
    val withClone = emb.unionByName(
      Seq((99L, vecs.head._2)).toDF("vec_id", "embedding"))
    val top = Similarity.lshTopK(withClone.filter(col("vec_id") === 0L),
      withClone, dims = dims, planes = 8, k = 1).head()
    assert(top.getAs[Long]("cid") == 99L)
    assert(top.getAs[Double]("cos") == 1.0)
  }

  test("ivf with nprobe = nlist reproduces brute-force top-k") {
    val queries = emb.filter(col("vec_id") < 3L)
    val centroids = emb.filter(col("vec_id") >= 30L) // 10 lists
    val ivf = Similarity.ivfTopK(queries, emb, centroids,
      nprobe = 10, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf == brute)
  }

  test("kmeans centroids are deterministic across runs") {
    val a = Similarity.kmeansCentroids(emb, k = 4, iters = 3)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    val b = Similarity.kmeansCentroids(emb, k = 4, iters = 3)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    assert(a.length == 4)
    a.zip(b).foreach { case (x, y) =>
      x.zip(y).foreach { case (xi, yi) => assert(math.abs(xi - yi) < 1e-9) }
    }
  }

  test("ivf with trained centroids: nprobe=nlist ≡ brute force, and " +
    "partial probing keeps recall") {
    val queries = emb.filter(col("vec_id") < 3L)
    val cents = Similarity.kmeansCentroids(emb, k = 8, iters = 5)
    // full probing touches every list → must equal brute force
    val full = Similarity.ivfTopK(queries, emb, cents, nprobe = 8, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(full == brute)
    // partial probing (half the lists): trained centroids must keep
    // recall@5 ≥ 0.6 on the fixture — untrained/arbitrary centroids
    // give no such guarantee, which is the point of training
    val half = Similarity.ivfTopK(queries, emb, cents, nprobe = 4, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.map { case (q, want) =>
      val got = half.getOrElse(q, Set.empty)
      got.intersect(want).size.toDouble / want.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.6, s"mean recall@5 = $meanRecall < 0.6")
  }

  test("quantized-exact top-k agrees with the decimal brute force") {
    val queries = emb.filter(col("vec_id") < 3L)
    val a = Similarity.bruteForceTopKExact(queries, emb, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val b = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(a == b)
  }

  test("cosineNearDupPairs finds identical vectors (same bucket, cos 1.0)") {
    val withClones = emb.unionByName(
      Seq((100L, vecs(3)._2), (101L, vecs(7)._2)).toDF("vec_id", "embedding"))
    val pairs = Similarity.cosineNearDupPairs(withClones, dims = dims,
      planes = 8, threshold = 0.999)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 100L)), s"clone pair missed: $pairs")
    assert(pairs.contains((7L, 101L)))
    // a < b invariant, no self-pairs
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("kmeans centroids are bit-identical across runs at sampleFraction < 1") {
    def run() = Similarity
      .kmeansCentroids(emb, k = 4, iters = 3, sampleFraction = 0.5)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1).toSeq).toSeq
    val a = run(); val b = run()
    assert(a.length == 4)
    // the decimal-sum mean is order-insensitive → EXACT equality, not
    // an epsilon — and the hash-sample picks the same rows every run
    assert(a == b)
    // the sample is a strict subset: training on it differs from the
    // full-corpus quantizer (proves the fraction actually applies)
    val full = Similarity.kmeansCentroids(emb, k = 4, iters = 3)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1).toSeq).toSeq
    assert(a != full)
  }

  test("persisted IVF index: reuse skips training, search ≡ from-scratch") {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    val wh = java.nio.file.Files.createTempDirectory(base, "ivf").toString
    val r = new graft.pipeline.PipelineRunner(spark,
      graft.pipeline.PipelineSpec(Nil), wh)
    val oldVecs = emb.filter(col("vec_id") < 30)
    val newVecs = emb.filter(col("vec_id") >= 30)
    assert(VectorIndex.ensureIvf(r, "ix", oldVecs, nlist = 4, iters = 3),
      "first call must train")
    assert(!VectorIndex.ensureIvf(r, "ix", oldVecs, nlist = 4, iters = 3),
      "second call must reuse the stored index (no k-means jobs)")
    // incremental arrival: only the new batch is assigned + appended
    assert(VectorIndex.appendVectors(r, "ix", newVecs, batchId = 1L) ==
      newVecs.count())
    // replayed batch id → exactly-once no-op
    assert(VectorIndex.appendVectors(r, "ix", newVecs, batchId = 1L) == 0L)
    val queries = emb.filter(col("vec_id") < 3)
    val persisted = VectorIndex.search(r, "ix", queries, nprobe = 2, k = 3)
      .select("qid", "cid", "rn").as[(Long, Long, Int)]
      .collect().toSet
    // from-scratch over the FULL corpus with the same stored centroids
    // (assignment expression is identical → same lists → same top-k)
    val cents = r.readTable(VectorIndex.centroidsTable("ix"))
      .select(col("cid").as("vec_id"), col("centroid").as("embedding"))
    val scratch = Similarity.ivfTopK(queries, emb, cents, nprobe = 2, k = 3)
      .select("qid", "cid", "rn").as[(Long, Long, Int)]
      .collect().toSet
    assert(persisted == scratch && persisted.nonEmpty)
  }

  test("IVF rebuild retrains on the grown corpus; search ≡ from-scratch") {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    val wh = java.nio.file.Files.createTempDirectory(base, "ivfrb").toString
    val r = new graft.pipeline.PipelineRunner(spark,
      graft.pipeline.PipelineSpec(Nil), wh)
    // train on a skewed slice, then drift the corpus well past it
    val oldVecs = emb.filter(col("vec_id") < 20)
    val newVecs = emb.filter(col("vec_id") >= 20)
    assert(VectorIndex.ensureIvf(r, "rb", oldVecs, nlist = 4, iters = 3))
    assert(VectorIndex.appendVectors(r, "rb", newVecs, batchId = 1L) ==
      newVecs.count())
    val centsTable = VectorIndex.centroidsTable("rb")
    val preGen = r.generations(centsTable).last
    val preCents = r.readTable(centsTable).orderBy("cid")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    VectorIndex.rebuild(r, "rb", nlist = 4, iters = 3)
    // retraining on the grown corpus must move the quantizer...
    val postCents = r.readTable(centsTable).orderBy("cid")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    assert(postCents != preCents, "rebuild must retrain, not reuse")
    // ...while the pre-rebuild generation stays time-travelable
    assert(r.readTableAt(centsTable, preGen).orderBy("cid")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq == preCents)
    // post-rebuild persisted search ≡ from-scratch ivfTopK over the
    // grown corpus with the SAME (deterministic) retrained quantizer
    val queries = emb.filter(col("vec_id") < 3)
    val persisted = VectorIndex.search(r, "rb", queries, nprobe = 2, k = 3)
      .select("qid", "cid", "rn").as[(Long, Long, Int)].collect().toSet
    val scratchCents = r.readTable(centsTable)
      .select(col("cid").as("vec_id"), col("centroid").as("embedding"))
    val scratch = Similarity
      .ivfTopK(queries, emb, scratchCents, nprobe = 2, k = 3)
      .select("qid", "cid", "rn").as[(Long, Long, Int)].collect().toSet
    assert(persisted == scratch && persisted.nonEmpty)
    // pre-rebuild batch ids stay exactly-once after the swap
    assert(VectorIndex.appendVectors(r, "rb", newVecs, batchId = 1L) == 0L)
  }

  test("double cosine agrees with decimal cosine to 1e-6") {
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .filter(col("a") < col("b")).limit(50)
      .select(
        Similarity.cosine(col("va"), col("vb")).as("cd"),
        Similarity.cosineDec(col("va"), col("vb")).cast("double").as("cx"))
      .collect()
    pairs.foreach { r =>
      assert(math.abs(r.getAs[Double]("cd") - r.getAs[Double]("cx")) <= 2e-6)
    }
  }

  test("semDedup: identical vectors co-group, exactly one keeper each") {
    // clone vectors 0 and 1 under fresh ids: {0,100,101} and {1,102}
    // are identical groups; everything else is random and far apart
    val clones = Seq(
      (100L, vecs(0)._2), (101L, vecs(0)._2), (102L, vecs(1)._2))
    val df = (vecs ++ clones).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(df, nlist = 4, tau = 0.999999)
      .collect()
    assert(out.length == vecs.length + clones.length) // one row per vector
    val byId = out.map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[Long]("dup_group"), r.getAs[Boolean]("keep"))).toMap
    assert(byId(0L) == (0L, true))
    assert(byId(100L) == (0L, false) && byId(101L) == (0L, false))
    assert(byId(1L) == (1L, true) && byId(102L) == (1L, false))
    // every group keeps exactly its min id
    out.groupBy(_.getAs[Long]("dup_group")).foreach { case (g, rows) =>
      assert(rows.map(_.getAs[Long]("vec_id")).min == g)
      assert(rows.count(_.getAs[Boolean]("keep")) == 1)
    }
  }

  test("semDedup: tau above any cosine keeps everything; dedup is " +
      "monotone in tau") {
    val all = Similarity.semDedup(emb, nlist = 4, tau = 1.1).collect()
    assert(all.forall(_.getAs[Boolean]("keep")))
    val loose = Similarity.semDedup(emb, nlist = 1, tau = -1.0)
    // tau = -1 with one cluster pairs everything: single survivor
    assert(loose.filter(col("keep")).count() == 1L)
  }

  test("semDedup is deterministic across runs") {
    def run() = Similarity.semDedup(emb, nlist = 4, tau = 0.5)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getAs[Int]("cid"),
        r.getAs[Long]("dup_group"))).toSeq
    assert(run() == run())
  }

  test("sq8Encode: byte codes, full-scale max element, map-only plan") {
    import org.apache.spark.sql.types.{ArrayType, ByteType}
    val enc = Similarity.sq8Encode(emb, "vec_id", "embedding")
    assert(enc.schema("code").dataType == ArrayType(ByteType))
    val rows = enc.collect()
    assert(rows.length == vecs.length)
    rows.foreach { r =>
      val code = r.getSeq[Byte](r.fieldIndex("code")).map(_.toInt)
      assert(code.forall(c => c >= -127 && c <= 127))
      // the max-|q| element must hit full scale exactly:
      // |q|=qmax → ⌊(qmax·254 + qmax)/(2·qmax)⌋ = ⌊127.5⌋ = 127
      assert(code.map(math.abs).max == 127,
        s"vec ${r.getLong(0)} not full-scale: $code")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"),
      "sq8Encode must be map-only")
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("sq8: an identical candidate ranks first; encode+rank deterministic") {
    val withClone = emb.unionByName(
      Seq((99L, vecs.head._2)).toDF("vec_id", "embedding"))
    def run() = Similarity.sq8TopK(
      withClone.filter(col("vec_id") === 0L), withClone, k = 3)
      .orderBy("rn").collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[Double]("acos"))).toSeq
    val top = run()
    // identical vector → identical codes → acos = n/(√n·√n) ≈ 1
    assert(top.head._1 == 99L)
    assert(top.head._2 > 0.9999)
    assert(run() == top)
  }

  test("pq with a perfect codebook is exact: ADC ≡ true L2 ranking") {
    // every subspace draws from 4 known subvectors → a codebook that
    // contains them reconstructs exactly, so ADC = exact distance
    val dsub = 4; val m = 4
    val parts = Seq(
      Seq(0.1f, 0.2f, 0.3f, 0.4f), Seq(-0.5f, 0.1f, 0.0f, 0.2f),
      Seq(0.9f, -0.3f, 0.5f, -0.1f), Seq(0.0f, 0.0f, 1.0f, 0.0f))
    val r = new scala.util.Random(11)
    val data = (0L until 30L).map(i =>
      (i, (0 until m).flatMap(_ => parts(r.nextInt(4)))))
    val df = data.toDF("vec_id", "embedding")
    val books: Seq[Seq[Seq[Double]]] =
      Seq.fill(m)(parts.map(_.map(_.toDouble)))
    val got = Similarity.pqTopK(df.filter(col("vec_id") < 3L), df, books, k = 5)
      .select("qid", "cid", "rn").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    def l2sq(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => val d = x.toDouble - y; d * d }.sum
    data.take(3).foreach { case (qid, qvec) =>
      val want = data.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, l2sq(qvec, cv)) }
        .sortBy { case (cid, dist) => (dist, cid) }.take(5).map(_._1)
      assert(got(qid) == want, s"query $qid: ${got(qid)} != $want")
    }
  }

  test("pqTrain is deterministic; pqEncode is map-only with in-range codes") {
    val books = Similarity.pqTrain(emb, m = 4, ksub = 8, iters = 3)
    assert(books.length == 4)
    assert(books.forall(b => b.length == 8 && b.forall(_.length == dims / 4)))
    assert(Similarity.pqTrain(emb, m = 4, ksub = 8, iters = 3) == books)
    val enc = Similarity.pqEncode(emb, books)
    val codes = enc.collect().map(_.getSeq[Int](1))
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"),
      "pqEncode must be map-only")
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("pq recall against the exact L2 ranking on trained codebooks") {
    val books = Similarity.pqTrain(emb, m = 8, ksub = 16, iters = 5)
    val got = Similarity.pqTopK(emb.filter(col("vec_id") < 8L), emb, books, 5)
      .select("qid", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def l2sq(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => val d = x.toDouble - y; d * d }.sum
    val recalls = vecs.take(8).map { case (qid, qvec) =>
      val want = vecs.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, l2sq(qvec, cv)) }
        .sortBy { case (cid, dist) => (dist, cid) }.take(5).map(_._1).toSet
      got.getOrElse(qid, Set.empty).intersect(want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean pq recall@5 = $mean < 0.5")
  }

  test("sq8 top-k recall vs the exact brute force") {
    val queries = emb.filter(col("vec_id") < 8L)
    val exact = Similarity.bruteForceTopKExact(queries, emb, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sq = Similarity.sq8TopK(queries, emb, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, want) =>
      sq.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    // 8-bit rounding perturbs cosines by ~1e-2 relative; on 16-dim
    // random vectors the top-5 sets stay largely stable
    assert(mean >= 0.8, s"mean sq8 recall@5 = $mean < 0.8")
  }
}
