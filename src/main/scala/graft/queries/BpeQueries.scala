package graft.queries

import graft.{QueryGroup, Tables}
import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** SURVEY §2.12 north-star: BPE tokenizer induction + application over
  * the `documents` table. Round-0 pair statistics are pure ANSI
  * arithmetic and oracle-checked; the greedy merge loop and its
  * application are iterative (not ANSI-expressible) and are
  * property-tested against an independent single-node BPE in BpeSpec.
  */
object BpeOps extends QueryGroup {

  override def queries: Map[String, Q] = Map(
    // Round-0 BPE statistics: corpus → wordFreq (one shuffle) →
    // map-only char-pair explode → vocab-sized hash-agg → top-100.
    "llm_bpe_pairs" -> ((s, d) =>
      Bpe.charPairCounts(Tables.documents(s, d), "text")
        .orderBy(col("cnt").desc, col("pair"))
        .limit(100)),

    // Greedy merge table, 16 rounds. Deterministic (total tie order);
    // equivalence with a reference single-node BPE is property-tested.
    "llm_bpe_train" -> ((s, d) =>
      Bpe.train(Tables.documents(s, d), "text", numMerges = 16)
        .orderBy("rank")),

    // Tokenizer application: train on the corpus, then a map-only
    // encode pass with the merge table in the closure (the 100 TB
    // shape — the corpus is read once for training stats and once for
    // encoding, never joined against itself).
    "llm_bpe_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(docs, "text", numMerges = 16)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.encode(docs, "doc_id", "text", merges)
        .select(col("doc_id"), col("n_tokens"))
        .orderBy("doc_id")
    }),

    // PERSISTED tokenizer: train once on the head of the corpus into
    // a format-stamped warehouse table (atomic generation commit),
    // then encode a later batch with the stored merges — no training
    // jobs, no re-read of the training corpus. The per-batch
    // production path (same shape as llm_ann_ivf_persisted).
    "llm_bpe_persisted" -> ((s, d) => {
      import graft.pipeline.{PipelineRunner, PipelineSpec}
      val r = new PipelineRunner(s, PipelineSpec(Nil),
        graft.queries.LlmOps.scratchDir("bpe_idx"))
      val docs = Tables.documents(s, d)
      Bpe.ensureIndex(r, "tok", docs.filter(col("doc_id") % 10 =!= 0),
        "text", numMerges = 16)
      Bpe.encodeWithIndex(r, "tok",
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"))
        .orderBy("doc_id")
    })
  )

  private def toks = LlmOps.toks // the one oracle-side tokenizer

  override def oracles: Map[String, String] = Map(
    "llm_bpe_pairs" ->
      s"""WITH words AS (
         |  SELECT w AS word, count(*) AS freq
         |  FROM (SELECT unnest($toks) AS w FROM documents) GROUP BY 1
         |), pairs AS (
         |  SELECT substr(word, CAST(i AS INT), 2) AS pair,
         |         CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM words, unnest(generate_series(1, length(word) - 1)) AS t(i)
         |  WHERE length(word) >= 2
         |  GROUP BY 1)
         |SELECT pair, cnt FROM pairs
         |ORDER BY cnt DESC, pair LIMIT 100""".stripMargin
  )
}
