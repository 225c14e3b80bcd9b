package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** BPE induction/application (SURVEY §2.12): the distributed trainer
  * must equal an independently-written single-node reference BPE on
  * arbitrary corpora, and encode() must be lossless (concatenating a
  * word's subwords reproduces the word).
  */
class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  /** Independent single-node greedy BPE: same (count DESC, left ASC,
    * right ASC) argmax and left-to-right non-overlapping replacement,
    * written against Sennrich et al. 2016 directly — NOT by calling
    * the operator under test.
    */
  private def referenceBpe(corpus: Seq[String],
                           numMerges: Int): Seq[(String, String, Long)] = {
    val words: Map[String, Long] = corpus
      .flatMap(_.toLowerCase.split("[^a-z0-9]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    var vocab: Map[Vector[String], Long] =
      words.groupBy { case (w, _) => w.map(_.toString).toVector }
        .map { case (syms, g) => syms -> g.values.sum }
    val out = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var stop = false
    while (i < numMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b2), n) => (-n, a, b2) }
        out += ((l, r, c))
        vocab = vocab.groupBy { case (syms, _) =>
          val b = Vector.newBuilder[String]; var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
              b += (l + r); j += 2
            } else { b += syms(j); j += 1 }
          }
          b.result()
        }.map { case (syms, g) => syms -> g.values.sum }
        i += 1
      }
    }
    out.result()
  }

  private val wordGen = Gen.nonEmptyListOf(
    Gen.frequency(8 -> Gen.alphaLowerChar, 2 -> Gen.oneOf('a', 'b', 'c')))
    .map(_.mkString.take(8))
  private val docGen =
    Gen.listOfN(6, wordGen).map(_.mkString(" "))
  private val corpusGen = Gen.listOfN(8, docGen)

  test("train equals the reference single-node BPE on random corpora") {
    sample(corpusGen, 8, seed = 77L).foreach { corpus =>
      val df = corpus.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Bpe.train(df, "text", numMerges = 6)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val want = referenceBpe(corpus, numMerges = 6)
      assert(got == want)
    }
  }

  test("train is deterministic and merge counts are non-increasing " +
      "only when tie order allows (counts are positive, ranks dense)") {
    val corpus = Seq("low lower lowest", "new newer newest",
      "wide wider widest", "low low low new new wide")
    val df = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val a = Bpe.train(df, "text", 10).orderBy("rank").collect().toSeq
    val b = Bpe.train(df, "text", 10).orderBy("rank").collect().toSeq
    assert(a == b)
    assert(a.map(_.getInt(0)) == (0 until a.length))
    assert(a.forall(_.getLong(3) > 0))
  }

  test("charPairCounts matches brute-force pair counting") {
    val corpus = Seq("abab abc", "abab", "xyz xyz xyz")
    val df = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.charPairCounts(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // abab freq 2: pairs ab,ba,ab → ab:4, ba:2 ; abc freq 1: ab,bc
    // xyz freq 3: xy,yz → xy:3, yz:3
    assert(got == Map("ab" -> 5L, "ba" -> 2L, "bc" -> 1L,
      "xy" -> 3L, "yz" -> 3L))
  }

  test("encode is lossless: concatenated subwords rebuild each word") {
    sample(corpusGen, 6, seed = 99L).foreach { corpus =>
      val df = corpus.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val merges = Bpe.train(df, "text", 8).orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val enc = Bpe.encode(df, "doc_id", "text", merges)
        .select("doc_id", "tokens").as[(Long, Seq[String])]
        .collect().toMap
      corpus.zipWithIndex.foreach { case (t, i) =>
        val words = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        assert(enc(i.toLong).mkString == words.mkString,
          s"doc $i round-trip")
      }
    }
  }

  test("encode with zero merges is character tokenization") {
    val df = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val out = Bpe.encode(df, "doc_id", "text", Nil)
      .select("tokens").as[Seq[String]].head()
    assert(out == Seq("a", "b", "c", "d"))
  }

  private def freshRunner(tag: String): graft.pipeline.PipelineRunner = {
    val base = java.nio.file.Paths.get("/root/repo/target/scratch-test")
    java.nio.file.Files.createDirectories(base)
    val wh = java.nio.file.Files.createTempDirectory(base, tag).toString
    new graft.pipeline.PipelineRunner(spark,
      graft.pipeline.PipelineSpec(Nil), wh)
  }

  test("persisted tokenizer: reuse skips training; encodeWithIndex ≡ " +
      "encode with the in-memory merge list") {
    val r = freshRunner("bpe")
    val corpus = Seq((1L, "low lower lowest"), (2L, "new newer newest"),
      (3L, "low low new new")).toDF("doc_id", "text")
    val batch = Seq((10L, "lower newest unseen"), (11L, "low new"))
      .toDF("doc_id", "text")
    assert(Bpe.ensureIndex(r, "tok", corpus, "text", 8),
      "first call must train")
    assert(!Bpe.ensureIndex(r, "tok", corpus, "text", 8),
      "second call must reuse the stored merges")
    val inMem = Bpe.train(corpus, "text", 8).orderBy("rank").collect()
      .map(x => (x.getString(1), x.getString(2))).toSeq
    assert(Bpe.storedMerges(r, "tok") == inMem)
    val a = Bpe.encodeWithIndex(r, "tok", batch, "doc_id", "text")
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    val b = Bpe.encode(batch, "doc_id", "text", inMem)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    assert(a == b)
  }

  test("persisted tokenizer: an unstamped or mismatched merge table " +
      "fails loudly instead of silently mis-tokenizing") {
    val corpus = Seq((1L, "aa bb aa")).toDF("doc_id", "text")
    // a merge table that EXISTS but carries no format stamp (written
    // by some other path / an older build) must be rejected by every
    // consumer — ensureIndex, storedMerges, encodeWithIndex
    val r = freshRunner("bpefmt")
    r.replaceTable(Bpe.mergesTable("tok"), Bpe.train(corpus, "text", 2))
    val e = intercept[IllegalArgumentException] {
      Bpe.storedMerges(r, "tok")
    }
    assert(e.getMessage.contains("tokenizer format"))
    val e2 = intercept[IllegalArgumentException] {
      Bpe.ensureIndex(r, "tok", corpus, "text", 2)
    }
    assert(e2.getMessage.contains("tokenizer format"))
  }

  test("mergeOnce handles overlapping runs left-to-right") {
    assert(Bpe.mergeOnce(Vector("a", "a", "a"), "a", "a") ==
      Vector("aa", "a"))
    assert(Bpe.mergeOnce(Vector("a", "a", "a", "a"), "a", "a") ==
      Vector("aa", "aa"))
    assert(Bpe.mergeOnce(Vector("x"), "a", "a") == Vector("x"))
  }
}
