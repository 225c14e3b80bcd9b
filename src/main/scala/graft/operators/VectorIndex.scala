package graft.operators

import graft.pipeline.PipelineRunner
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A PERSISTED IVF ANN index in the warehouse — the production shape
  * of `Similarity.ivfTopK` (reference intent: the north-star
  * similarity-search pipeline; at 100 TB nobody retrains the coarse
  * quantizer and reassigns the whole corpus per query).
  *
  * Two warehouse tables per index `name`:
  *  - `<name>_centroids` (cid, centroid): the trained coarse
  *    quantizer, written ONCE;
  *  - `<name>_lists` (cidx, vec_id, embedding): the inverted lists —
  *    every corpus vector under its nearest centroid's index.
  *
  * Both are committed through `PipelineRunner.appendBatch`, so index
  * maintenance inherits the storage layer's write-audit-publish
  * atomicity AND exactly-once batch idempotence: re-running a batch id
  * is a no-op, and a crash mid-append leaves the previous index
  * generation live.
  *
  * Incremental path: `appendVectors` assigns ONLY the new batch —
  * map-only against the stored centroid literals (no shuffle of the
  * existing corpus, which is never re-read). Search reads the stored
  * lists and probes nprobe of them per query.
  */
object VectorIndex {

  def centroidsTable(name: String): String = s"${name}_centroids"
  def listsTable(name: String): String = s"${name}_lists"

  /** Train-or-reuse: trains the quantizer and assigns the initial
    * corpus on first call; a later call with the index already
    * present is a cheap no-op (no k-means jobs run — the reuse path a
    * scheduled pipeline takes every run). Returns whether training
    * happened.
    */
  def ensureIvf(runner: PipelineRunner, name: String, emb: DataFrame,
                nlist: Int, iters: Int = 5,
                sampleFraction: Double = 1.0,
                cosFn: (Column, Column) => Column =
                  Similarity.cosine): Boolean =
    if (runner.tableExists(centroidsTable(name))) false
    else {
      val cents = Similarity
        .kmeansCentroids(emb, nlist, iters, sampleFraction)
        .select(col("vec_id").as("cid"),
          col("embedding").as("centroid"))
      runner.appendBatch(centroidsTable(name), cents, 0L)
      appendVectors(runner, name, emb, 0L, cosFn)
      true
    }

  /** Stored centroids as driver-side literals, ordered by cid — small
    * by definition (nlist ≪ N), and baking them into the plan keeps
    * assignment map-only (the documented broadcast-ANN design).
    */
  private def centroidLiterals(runner: PipelineRunner,
      name: String): Seq[(Long, Seq[Double])] = {
    val rows = runner.readTable(centroidsTable(name))
      .select(col("cid").cast(LongType),
        col("centroid").cast(ArrayType(DoubleType)))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      .sortBy(_._1)
    require(rows.nonEmpty, s"index $name has no centroids")
    rows
  }

  private def scoreArr(cents: Seq[(Long, Seq[Double])], vc: Column,
      cosFn: (Column, Column) => Column): Column =
    array(cents.map { case (_, cv) => cosFn(vc, array(cv.map(lit): _*)) }: _*)

  /** Assign a (new) vector batch against the STORED centroids and
    * append it to the inverted lists — map-only, idempotent per
    * `batchId` (a replayed batch appends nothing). Returns rows
    * appended.
    */
  def appendVectors(runner: PipelineRunner, name: String, emb: DataFrame,
                    batchId: Long,
                    cosFn: (Column, Column) => Column =
                      Similarity.cosine): Long = {
    val cents = centroidLiterals(runner, name)
    val assigned = emb
      .select(col("vec_id"), col("embedding"))
      .withColumn("sc", scoreArr(cents, col("embedding"), cosFn))
      // first occurrence of the max = lowest centroid id (sorted)
      .withColumn("cidx",
        array_position(col("sc"), array_max(col("sc"))).cast("int"))
      .select("cidx", "vec_id", "embedding")
    runner.appendBatch(listsTable(name), assigned, batchId)
  }

  /** Retrain the coarse quantizer on the CURRENT corpus and reassign
    * every vector — the answer to centroid drift after many
    * `appendVectors` batches (recall decays once the corpus outgrows
    * the quantizer trained on the original vectors). Each table swap
    * is an atomic generation commit; superseded generations stay
    * readable via `readTableAt` until `vacuum`, and the exactly-once
    * append ledger carries forward, so replayed pre-rebuild batch ids
    * remain no-ops. A crash between the centroid swap and the list
    * swap leaves lists assigned under the old quantizer — searches
    * stay well-formed (probe + rank still work), recall is degraded
    * until `rebuild` is re-run. O(corpus) by nature: schedule it like
    * OPTIMIZE, never per batch.
    */
  def rebuild(runner: PipelineRunner, name: String, nlist: Int,
              iters: Int = 5, sampleFraction: Double = 1.0,
              cosFn: (Column, Column) => Column = Similarity.cosine)
      : Unit = {
    val corpus = runner.readTable(listsTable(name))
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity
      .kmeansCentroids(corpus, nlist, iters, sampleFraction)
      .select(col("vec_id").as("cid"), col("embedding").as("centroid"))
    runner.replaceTable(centroidsTable(name), cents)
    val fresh = centroidLiterals(runner, name)
    val assigned = corpus
      .withColumn("sc", scoreArr(fresh, col("embedding"), cosFn))
      .withColumn("cidx",
        array_position(col("sc"), array_max(col("sc"))).cast("int"))
      .select("cidx", "vec_id", "embedding")
    runner.replaceTable(listsTable(name), assigned): Unit
  }

  /** ANN top-k over the persisted lists: queries probe their `nprobe`
    * nearest centroids (|Q|·nlist scoring rows — small), then join the
    * stored lists on the centroid index and rank. The corpus is
    * touched only for the probed lists' members.
    */
  def search(runner: PipelineRunner, name: String, queries: DataFrame,
             nprobe: Int, k: Int,
             cosFn: (Column, Column) => Column =
               Similarity.cosine): DataFrame = {
    val cents = centroidLiterals(runner, name)
    val lists = runner.readTable(listsTable(name))
      .select(col("cidx"), col("vec_id").as("cid"),
        col("embedding").as("cv"))
    val wq = Window.partitionBy("qid").orderBy(col("ccos").desc, col("ci"))
    val q = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .select(col("qid"), col("qv"),
        posexplode(scoreArr(cents, col("qv"), cosFn))
          .as(Seq("ci0", "ccos")))
      .select(col("qid"), col("qv"), (col("ci0") + 1).as("ci"), col("ccos"))
      .withColumn("crn", row_number().over(wq))
      .filter(col("crn") <= nprobe)
      .select(col("qid"), col("qv"), col("ci").as("cidx"))
    val scored = lists.join(broadcast(q), Seq("cidx"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"), cosFn(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
