package graft

import graft.plans.PlanAudit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.plans.PlanAudit — the structured plan report must agree with
  * what `.explain` shows for known plan shapes.
  */
class PlanAuditSpec extends AnyFunSuite with SparkTestBase {

  test("counts shuffles, broadcast joins, pushed filters on a known " +
      "star-join plan") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") > 10)
    val nat = spark.read.parquet(s"$sf/nation.parquet")
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
    val df = li
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
    val rep = PlanAudit.audit(df)
    assert(rep.noNestedLoops)
    assert(rep.broadcastHashJoins >= 1, rep.summary)
    assert(rep.scans == 3, rep.summary)
    assert(rep.scansWithPushedFilters >= 1,
      s"l_quantity > 10 must reach the scan: ${rep.summary}")
    assert(rep.shuffles >= 1, rep.summary) // the groupBy at minimum
    // codegen stages exist only after AQE materializes them — execute
    // THIS QueryExecution (df.count() would build a different one),
    // then audit the final plan for coverage
    df.queryExecution.toRdd.count()
    assert(PlanAudit.audit(df).codegenCoverage > 0.3,
      PlanAudit.audit(df).summary)
  }

  test("flags a nested-loop join, and noNestedLoops gates on it") {
    val a = spark.range(10).toDF("a")
    val b = spark.range(10).toDF("b")
    val rep = PlanAudit.audit(a.join(b, col("a") < col("b")))
    assert(!rep.noNestedLoops, rep.summary)
    assert(rep.nestedLoopJoins + rep.cartesianProducts >= 1, rep.summary)
  }

  test("counts generates and map-only plans (zero shuffles)") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val rep = PlanAudit.audit(df)
    assert(rep.generates == 1, rep.summary)
    assert(rep.shuffles == 0, rep.summary)
  }

  test("exchanges and AQE stage wrappers stay out of the operators " +
      "denominator") {
    // final AQE plan: WSCG(2){HashAggregate} ← AQEShuffleRead ←
    // ShuffleQueryStage ← Exchange ← WSCG(1){HashAggregate,
    // ColumnarToRow} ← FileScan. Real operators = 5 (2 aggs, C2R,
    // scan, AQEShuffleRead); in-codegen = 3. The Exchange and the
    // QueryStage wrappers must NOT inflate the denominator (3/6 or
    // worse would misreport the honest 3/5)
    val df = spark.read.parquet(s"$sf/nation.parquet")
      .groupBy("n_regionkey").agg(count(lit(1)).as("n"))
    df.queryExecution.toRdd.count() // materialize AQE stages
    val rep = PlanAudit.audit(df)
    assert(rep.shuffles == 1, rep.summary)
    assert(rep.codegenOperators == 3, rep.summary)
    assert(rep.operators == 5,
      s"exchange/wrapper leaked into the denominator: ${rep.summary}")
  }

  test("every registered query key passes the nested-loop gate except " +
      "the declared brute-force tiers") {
    // the declared exceptions: oracle-exactness brute-force tiers and
    // deliberate tiny-literal cross joins (see VERDICT r8 §wrong.4)
    val allowed = Set(
      // declared brute-force / oracle-exactness tiers
      "join_cross", "join_theta_range", "llm_cosine_topk",
      "llm_embed_neardup", "llm_knn_classify", "llm_embed_centroid",
      "llm_decontaminate_semantic", "llm_hard_negatives",
      "win_ntile_approx", "llm_semdedup", "llm_dsir_score",
      "llm_dsir_resample", "llm_dsir_weights", "fn_date_spine",
      "win_cohort_retention", "llm_langid_ngram", "llm_ann_pq",
      "llm_ann_sq8",
      // 1-row scalar-normalizer broadcast crossjoins — O(N), the
      // legitimate "broadcast a global constant" shape
      "llm_ann_filtered", "llm_bm25_topk", "llm_collocations",
      "llm_ngram_topk", "llm_perplexity", "llm_perplexity_bigram",
      "llm_tfidf_topk", "llm_vocab_coverage")
    val bad = scala.collection.mutable.Buffer.empty[String]
    val unauditable = scala.collection.mutable.Buffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (k, _) => allowed(k) }
      .foreach { case (name, fn) =>
        // eager pipeline keys EXECUTE here and return their final
        // read frame — that read plan is audited like any other, so
        // a BNLJ behind a materializing key cannot hide
        try {
          val rep = PlanAudit.audit(fn(spark, sf))
          if (!rep.noNestedLoops) bad += s"$name: ${rep.summary}"
        } catch {
          case e: Throwable =>
            unauditable += s"$name: ${e.getClass.getSimpleName} " +
              String.valueOf(e.getMessage).linesIterator
                .take(1).mkString.take(160)
        }
      }
    assert(bad.isEmpty, "unexpected nested-loop plans:\n" +
      bad.mkString("\n"))
    // the gate is CLOSED: a key that cannot be audited is a gate
    // escape, not a pass — fix the key or declare it in `allowed`
    // with a reason
    assert(unauditable.isEmpty,
      "keys whose plans could not be audited (BNLJ-gate escape):\n" +
        unauditable.mkString("\n"))
  }
}
