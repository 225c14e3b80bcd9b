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

  /** Adjacent-pair explode over a (syms array, freq) frame — map-only
    * codegen'd array expressions, then one vocab-sized hash-agg.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("syms")) - 2),
        i => struct(element_at(col("syms"), i + 1).as("l"),
          element_at(col("syms"), i + 2).as("r")))).as("p"),
        col("freq"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("cnt"))

  /** [[mergeOnce]] as a codegen'd expression: a left fold over the
    * symbol indices carrying (rebuilt array, consumed-next flag) —
    * the lookahead state that lets every non-overlapping (l, r)
    * adjacency fuse left-to-right, without leaving WholeStageCodegen.
    */
  private def mergeExpr(syms: Column, l: String, r: String): Column = {
    val n = size(syms)
    aggregate(
      sequence(lit(0), n - 1),
      struct(array().cast("array<string>").as("out"),
        lit(false).as("skip")),
      (acc, i) => {
        val out = acc.getField("out")
        val skip = acc.getField("skip")
        val cur = element_at(syms, i + 1)
        val nxt = element_at(syms, i + 2) // null past the end
        val isPair = coalesce(
          !skip && (i < n - 1) && cur === lit(l) && nxt === lit(r),
          lit(false))
        struct(
          when(skip, out)
            .when(isPair, concat(out, array(lit(l + r))))
            .otherwise(concat(out, array(cur))).as("out"),
          isPair.as("skip"))
      },
      acc => acc.getField("out"))
  }

  /** Greedy BPE training: `numMerges` rounds of count-adjacent-pairs →
    * merge-the-argmax. Returns the learned merge table
    * (rank, left, right, cnt) in merge order — the artifact a
    * tokenizer ships. Stops early if no pair is left (fully merged
    * vocab).
    *
    * Each round is one vocab-sized job + a 1-row collect, and the
    * rewritten vocab is `localCheckpoint`ed so the plan stays
    * CONSTANT-depth across rounds — chaining 16 generations of
    * transforms would otherwise grow analysis cost per round (at
    * cluster scale swap in a durable `checkpoint`).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var words: DataFrame = wordFreq(df, textCol)
      .select(transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1))).as("syms"),
        col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val h = top.head
        val (l, r, cnt) = (h.getString(0), h.getString(1), h.getLong(2))
        merges += ((rank, l, r, cnt))
        words = words
          .select(mergeExpr(col("syms"), l, r).as("syms"), col("freq"))
          .localCheckpoint()
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
