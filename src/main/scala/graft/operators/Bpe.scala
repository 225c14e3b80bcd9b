package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the tokenizer-training step of an LLM data pipeline, re-expressed
  * for Spark's execution model.
  *
  * Scale shape (the part that must survive 100 TB): the corpus is
  * compressed to its word-frequency table in ONE shuffle
  * ([[wordFreq]]: explode → hash-agg with map-side partials). Every
  * merge round after that iterates over the VOCABULARY (millions of
  * rows, ≪ corpus) — pair counting is a map-only flatMap over symbol
  * arrays plus one vocab-sized hash-agg, and the driver collects
  * exactly ONE winning pair per round. The corpus text is never
  * rescanned after round 0. Production tokenizer training
  * (SentencePiece, GPT-2's BPE) additionally samples the corpus before
  * counting; compose with a seeded `sample` upstream for that.
  *
  * Determinism: the winning pair each round is max by
  * (count DESC, left ASC, right ASC) — a total order, so training is
  * reproducible run-to-run and engine-to-engine.
  *
  * The per-round symbol rewrite is a typed `Dataset.map` (not
  * codegen): the left-to-right greedy merge needs lookahead state that
  * SQL array lambdas can't express cleanly, and the frame it runs on
  * is vocab-sized, not corpus-sized, so codegen does not matter here.
  * Basis: the reference pins dbt models on Spark (`dbtoperator.py:273`)
  * with no tokenizer op — this is north-star surface (SURVEY §2.12).
  */
object Bpe {

  /** Corpus → (word, freq): the one corpus-wide shuffle. Words come
    * from the shared curation tokenizer (lowercase alnum runs) so BPE
    * statistics line up with the rest of the text-analysis surface.
    */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Round-0 BPE statistics: adjacent CHARACTER-pair counts weighted
    * by word frequency. Map-only over the vocab after the wordFreq
    * shuffle: each word of length L contributes its L-1 overlapping
    * 2-char substrings. Oracle-checkable (pure ANSI arithmetic).
    */
  def charPairCounts(df: DataFrame, textCol: String): DataFrame =
    wordFreq(df, textCol)
      .filter(length(col("word")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => col("word").substr(i, lit(2)))).as("pair"),
        col("freq"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))

  /** One greedy merge applied to a symbol sequence, left to right:
    * every non-overlapping (l, r) adjacency becomes the fused symbol.
    * Exactly Sennrich's replacement rule.
    */
  private[graft] def mergeOnce(syms: IndexedSeq[String], l: String,
                               r: String): IndexedSeq[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Vocabularies past this size refuse loudly rather than silently
    * overloading the driver — the same bounded-collect stance as the
    * capped MERGE delete-key collect. 20M words × ~40 bytes ≈ 800 MB
    * peak, the practical ceiling for an 8 GB driver; real corpora
    * (GPT-2's WebText, C4) sit far below it after tokenization.
    */
  private[graft] val MaxTrainVocab = 20000000

  /** BYTE budget for the collected vocabulary — the row cap alone
    * assumes ~40 B/word, which a pathological long-word corpus can
    * blow long before 20M rows. Checked on the collected rows (the
    * transfer itself is backstopped by spark.driver.maxResultSize)
    * BEFORE the per-word symbol expansion multiplies the footprint.
    */
  private[graft] val MaxTrainVocabBytes = 800L << 20

  /** Greedy BPE training: `numMerges` rounds of count-adjacent-pairs →
    * merge-the-argmax. Returns the learned merge table
    * (rank, left, right, cnt) in merge order — the artifact a
    * tokenizer ships. Stops early if no pair is left (fully merged
    * vocab).
    *
    * Execution shape (the one production BPE trainers use —
    * SentencePiece, GPT-2's encoder training): ONE corpus-wide shuffle
    * compresses the corpus to its word-frequency table ([[wordFreq]]),
    * the vocabulary is collected (bounded — [[MaxTrainVocab]], loud
    * refusal above), and every greedy round runs in-process on the
    * driver. The previous form ran 3 Spark jobs PER ROUND (vocab-sized
    * pair-count agg + argmax collect + checkpointed rewrite) — ~50
    * scheduler round-trips for 16 merges; rounds over an in-memory
    * hash map are microseconds at any corpus size because the frame
    * iterated is the VOCABULARY, never the corpus.
    *
    * Determinism: argmax by (count DESC, left ASC, right ASC) — words
    * are `[a-z0-9]+` by construction ([[TextAnalysis.tokens]]), where
    * Java string order ≡ Spark's UTF8 binary order, so the driver-side
    * tie-break is bit-identical to the previous distributed one
    * (BpeSpec's reference-equivalence property pins it).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    val vocab = wordFreq(df, textCol).collect()
    require(vocab.length <= MaxTrainVocab,
      s"BPE training vocabulary has ${vocab.length} distinct words " +
        s"(cap $MaxTrainVocab) — sample the corpus upstream " +
        "(seeded `sample`) the way production tokenizer training does")
    val vocabBytes = vocab.iterator
      .map(r => 40L + 2L * r.getString(0).length).sum
    require(vocabBytes <= MaxTrainVocabBytes,
      s"BPE training vocabulary is ~$vocabBytes bytes " +
        s"(cap $MaxTrainVocabBytes) — long-word corpora blow the " +
        "per-row estimate; normalize/sample upstream first")
    var words: Array[(IndexedSeq[String], Long)] = vocab.map { row =>
      (row.getString(0).map(_.toString): IndexedSeq[String],
        row.getLong(1))
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, freq) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + freq)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((l0, r0), c) =>
          (-c, l0, r0)
        }
        merges += ((rank, l, r, cnt))
        words = words.map { case (syms, freq) =>
          (if (syms.length > 1) mergeOnce(syms, l, r) else syms, freq)
        }
        rank += 1
      }
    }
    spark.createDataFrame(merges.result())
      .toDF("rank", "left", "right", "cnt")
  }

  def mergesTable(name: String): String = s"${name}_merges"

  /** Version stamp of the persisted merge-table layout + tokenizer
    * normalization. A tokenizer trained under one normalization MUST
    * NOT silently encode text normalized differently — bump on any
    * change to [[TextAnalysis.tokens]]/merge semantics and retrain
    * (same stance as Dedup's gram-format stamp).
    */
  private[graft] val BpeFormatVersion = "bpe-v1:chars-xxlower-alnum"
  private val BpeFormatKey = "bpe_format"

  private def requireFormat(runner: graft.pipeline.PipelineRunner,
                            name: String): Unit =
    if (runner.tableExists(mergesTable(name))) {
      val got = runner.tableSidecar(mergesTable(name), BpeFormatKey)
      require(got.contains(BpeFormatVersion),
        s"merge table '${mergesTable(name)}' uses tokenizer format " +
          s"${got.getOrElse("<unstamped>")}, this build expects " +
          s"'$BpeFormatVersion' — encoding with it would silently " +
          "mis-tokenize. dropTable the index and retrain with " +
          "ensureIndex.")
    }

  /** Train-or-reuse: trains `numMerges` merges and persists them as a
    * warehouse table on first call (atomic generation commit,
    * format-stamped); later calls run NO training jobs — the reuse
    * path a scheduled pipeline takes every run. Returns whether
    * training happened. The tokenizer artifact then outlives the
    * corpus scan that produced it, exactly like the persisted IVF
    * index (`VectorIndex.ensureIvf`).
    */
  def ensureIndex(runner: graft.pipeline.PipelineRunner, name: String,
                  docs: DataFrame, textCol: String,
                  numMerges: Int): Boolean = {
    requireFormat(runner, name)
    if (runner.tableExists(mergesTable(name))) false
    else {
      runner.appendBatch(mergesTable(name),
        train(docs, textCol, numMerges), 0L,
        sidecars = Map(BpeFormatKey -> BpeFormatVersion))
      true
    }
  }

  /** The persisted merge list, in merge order — the driver-side vocab
    * artifact (numMerges rows by construction; never corpus-sized).
    */
  def storedMerges(runner: graft.pipeline.PipelineRunner,
                   name: String): Seq[(String, String)] = {
    requireFormat(runner, name)
    runner.readTable(mergesTable(name)).orderBy("rank")
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
  }

  /** Encode a (new) doc batch with the PERSISTED tokenizer: no
    * training jobs, no read of the original training corpus — one
    * vocab-artifact read plus a map-only encode pass. The incremental
    * path a production pipeline runs per arriving batch.
    */
  def encodeWithIndex(runner: graft.pipeline.PipelineRunner,
                      name: String, docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    encode(docs, idCol, textCol, storedMerges(runner, name))

  /** Apply a learned merge table to a corpus: per-doc tokenization
    * into BPE subwords. The merge list is driver-side (vocab artifact,
    * thousands of rows) and travels in the closure — the corpus pass
    * is map-only, the 100 TB shape of tokenizer application. Returns
    * (idCol, n_tokens, tokens).
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mergeList = merges.toIndexedSeq
    val tokenized = df
      .select(col(idCol).cast(LongType).as("id"),
        TextAnalysis.tokens(col(textCol)).as("words"))
      .as[(Long, Seq[String])]
      .map { case (id, ws) =>
        val toks = ws.flatMap { w =>
          var syms: IndexedSeq[String] = w.map(_.toString)
          mergeList.foreach { case (l, r) =>
            if (syms.length > 1) syms = mergeOnce(syms, l, r)
          }
          syms
        }
        (id, toks.length.toLong, toks)
      }
    tokenized.toDF("id", "n_tokens", "tokens")
      .withColumnRenamed("id", idCol)
  }
}
