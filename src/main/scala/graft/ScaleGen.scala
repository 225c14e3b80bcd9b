package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Synthetic scale-up of a driver test-data dir: replicates every
  * fact table `factor`× with key-remapped replicas so the soak data
  * stresses the same plans at N× the rows WITHOUT changing workload
  * statistics:
  *
  *  - every surrogate/foreign key gets `+ replica · STRIDE`, so join
  *    fan-outs (orders↔lineitem, customer↔orders, part/supplier↔
  *    lineitem, events.user_id) scale linearly and never collide;
  *  - `region`/`nation` are fixed dimensions and copy as-is —
  *    dimension joins fan out factor× exactly as a bigger corpus
  *    against the same reference data would;
  *  - `documents.text` deterministically rewrites ~half the words per
  *    replica (hash-picked), so the per-replica duplicate/near-dup
  *    rate matches the source but replicas do NOT alias each other —
  *    a naive 10× copy would multiply every MinHash/SimHash bucket by
  *    10 and grow pair work quadratically, benchmarking the data
  *    trick instead of the engine;
  *  - `embeddings.embedding` gets a per-replica ORTHOGONAL transform
  *    (rotate by 7·replica positions + hash-picked sign flips):
  *    within-replica pairwise cosines are bit-preserved (same ANN /
  *    near-dup workload per replica), cross-replica cosines are ~0 —
  *    replicas don't collapse into dup clusters.
  *
  * Usage: `graft.ScaleGen <srcDir> <dstDir> <factor>` (e.g.
  * `/root/testdata/sf0.1 /tmp/sf1 10`). Output layout matches the
  * driver's (`<table>.parquet`), so `SPARK_GRAFT_SF_DIR=<dstDir>
  * graft.Bench` runs the full key sweep on it unchanged.
  */
object ScaleGen {

  /** Key stride between replicas — far above any source key. */
  val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleGen <srcDir> <dstDir> <factor>")
    val Array(src, dst, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1: $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, dst, factor)
    spark.stop()
  }

  def scale(spark: SparkSession, src: String, dst: String,
            factor: Int): Unit = {
    def out(name: String, df: DataFrame, files: Int): Unit =
      df.repartition(files).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")

    // fixed dimensions: byte-for-byte content copy
    out("region", Tables.region(spark, src), 1)
    out("nation", Tables.nation(spark, src), 1)

    /** Replicate with the given per-replica column rewrites. Columns
      * not named keep their source values; replica 0 is ALWAYS the
      * untouched source (so key-hardcoded bench filters, e.g.
      * `vec_id < 5` query sets, still select real rows).
      */
    def replicate(df: DataFrame)(
        rewrite: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(r => if (r == 0) df else rewrite(df, r))
        .reduce(_.unionByName(_)) // out() repartitions the union
    def shiftKeys(keys: String*)(df: DataFrame, r: Int): DataFrame =
      keys.foldLeft(df)((d, k) =>
        d.withColumn(k, col(k) + lit(r * Stride)))

    out("customer", replicate(Tables.customer(spark, src))(
      shiftKeys("c_custkey")), 2)
    out("supplier", replicate(Tables.supplier(spark, src))(
      shiftKeys("s_suppkey")), 1)
    out("part", replicate(Tables.part(spark, src))(
      shiftKeys("p_partkey")), 2)
    out("orders", replicate(Tables.orders(spark, src))(
      shiftKeys("o_orderkey", "o_custkey")), 4)
    out("lineitem", replicate(Tables.lineitem(spark, src))(
      shiftKeys("l_orderkey", "l_partkey", "l_suppkey")), 8)
    // events: besides key strides, replicas TILE along the timeline
    // (+replica × (span + 1h)): N× events over an N×-longer history,
    // the way real scale accrues. Piling replicas into the SAME
    // window instead would multiply event DENSITY — interval-join
    // outputs then grow ~quadratically (pairs ∝ density²) and the
    // soak measures the data artifact, not the engine.
    val evSrc = Tables.events(spark, src)
    val Seq(tsMin, tsMax) = evSrc
      .select(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head().toSeq.map(_.asInstanceOf[Long]).toSeq
    val tileMicros = tsMax - tsMin + 3600L * 1000000L
    out("events", replicate(evSrc) { (df, r) =>
      shiftKeys("event_id", "user_id")(df, r)
        .withColumn("ts", timestamp_micros(
          unix_micros(col("ts")) + lit(r * tileMicros)))
    }, 4)

    // documents: shift the key and decorrelate the text per replica —
    // each word is kept or suffixed by a seeded hash of (word,
    // replica); ~half the vocabulary changes, so cross-replica
    // shingle overlap collapses while within-replica dup/near-dup
    // structure is preserved (a consistent dictionary substitution).
    // n_chars tracks the rewritten text.
    out("documents", replicate(Tables.documents(spark, src)) {
      (df, r) =>
        val words = split(col("text"), " ")
        // unconditional replica-tag word: short/empty docs have no
        // words to rewrite and would otherwise stay byte-identical
        // ACROSS replicas, merging their dup groups 10× (the sf1 soak
        // saw 2,400-doc identical-signature groups from exactly this)
        // ALPHANUMERIC suffixes: analysis tokenizers split on
        // [a-z0-9] runs, so a punctuation marker ("w~3") would leave
        // the original token intact and replicas correlated under
        // token-level signatures (SimHash et al.)
        // keyed on the WORD alone (not its position): a consistent
        // per-replica dictionary substitution, so within-replica
        // near-dup structure is preserved (shared words stay shared)
        // while replicas still diverge on ~half their vocabulary
        val rewritten = concat(array_join(
          transform(words, w =>
            when(pmod(xxhash64(w, lit(r)), lit(2)) === 0,
              concat(w, lit("x" + r))).otherwise(w)),
          " "), lit(" xx" + r))
        df.withColumn("doc_id", col("doc_id") + lit(r * Stride))
          .withColumn("text", rewritten)
          .withColumn("n_chars", length(col("text")).cast("long"))
    }, 4)

    // embeddings: orthogonal per-replica transform (see scaladoc);
    // dims is a constant — computed ONCE, not per replica closure
    val emb = Tables.embeddings(spark, src)
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    out("embeddings", replicate(emb) {
      (df, r) =>
        val rot = (r * 7) % dims
        val signs: Seq[Column] = (0 until dims).map(i =>
          if (java.lang.Long.remainderUnsigned(
            scala.util.hashing.MurmurHash3.stringHash(s"$i:$r").toLong,
            2L) == 0L) lit(1.0f) else lit(-1.0f))
        val transformed = array((0 until dims).map { i =>
          (element_at(col("embedding"), ((i + rot) % dims) + 1) *
            signs(i)).cast(FloatType)
        }: _*)
        df.withColumn("vec_id", col("vec_id") + lit(r * Stride))
          .withColumn("embedding", transformed)
    }, 2)
  }
}
