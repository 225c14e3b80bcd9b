package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Classifier-based quality filtering — the GPT-3/CCNet curation step
  * where a small trained model (there: LR / fastText over reference
  * vs. crawl text) scores every document and low scorers are dropped
  * or downsampled. Feature extraction and SCORING are pure codegen'd
  * Column arithmetic (map-only, no UDF, no MLlib on the hot path);
  * only TRAINING touches Spark ML, and at 100 TB training runs on a
  * sample while the fitted weights broadcast as plan literals.
  *
  * Reference basis: GPT-3 (Brown et al. 2020, Appendix A) trains a
  * quality LR against WebText as positives; CCNet uses an LM filter
  * the same way. This is the engine-side plumbing for that recipe
  * with weak supervision from rule filters (e.g. Gopher pass/fail)
  * standing in for the curated positive set.
  */
object QualityClassifier {

  /** Fitted weights, detached from MLlib so scoring needs no ML
    * runtime: score = sigmoid(intercept + w · features).
    */
  final case class Weights(names: Seq[String], coefficients: Seq[Double],
                           intercept: Double) {
    require(names.size == coefficients.size)
  }

  /** The per-doc feature columns, all exact-integer-derived doubles
    * (engine-portable, codegen'd, no shuffle): doc length, word
    * count, mean word length, stopword ratio, duplicate-token ratio,
    * punctuation density.
    */
  def featureCols(text: Column): Seq[(String, Column)] = {
    val tk = TextAnalysis.tokens(text)
    val nWords = size(tk).cast(DoubleType)
    Seq(
      "n_chars" -> length(text).cast(DoubleType),
      "n_words" -> nWords,
      "mean_wlen" ->
        coalesce(length(regexp_replace(lower(text), "[^a-z0-9]", ""))
          .cast(DoubleType) / nullif(size(tk), lit(0)), lit(0.0)),
      "stop_ratio" ->
        coalesce(size(filter(tk,
          x => x.isin(TextAnalysis.stopEn.map(lit): _*))).cast(DoubleType)
          / nullif(size(tk), lit(0)), lit(0.0)),
      "dup_ratio" ->
        coalesce(lit(1.0) -
          size(array_distinct(tk)).cast(DoubleType)
            / nullif(size(tk), lit(0)), lit(0.0)),
      "punct_density" ->
        coalesce(
          (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", "")))
            .cast(DoubleType) / nullif(length(text), lit(0)), lit(0.0)))
  }

  /** Train a logistic-regression quality model on `df` (typically a
    * SAMPLE at scale) against a boolean `labelCol`. Deterministic
    * given fixed input partitioning: no row sampling inside, fixed
    * iteration budget, L2 reg for a unique optimum.
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
            maxIter: Int = 50, reg: Double = 0.01): Weights = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val feats = featureCols(col(textCol))
    val names = feats.map(_._1)
    val prepared = df.select(
      (feats.map { case (n, c) => c.as(n) } :+
        col(labelCol).cast(DoubleType).as("label")): _*)
    val assembled = new VectorAssembler()
      .setInputCols(names.toArray).setOutputCol("features")
      .transform(prepared)
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(reg)
      .setStandardization(true)
      .fit(assembled)
    Weights(names, model.coefficients.toArray.toSeq, model.intercept)
  }

  /** Map-only scoring: the fitted weights inline as plan LITERALS, so
    * the whole corpus pass is one codegen'd projection — the shape
    * that scores 100 TB without a single shuffle or ML-runtime
    * dependency on executors. Returns `df` + a `quality_prob` column
    * in (0, 1).
    */
  def score(df: DataFrame, textCol: String, w: Weights): DataFrame = {
    val feats = featureCols(col(textCol)).toMap
    val z = w.names.zip(w.coefficients)
      .map { case (n, c) => feats(n) * lit(c) }
      .foldLeft(lit(w.intercept): Column)(_ + _)
    df.withColumn("quality_prob", lit(1.0) / (lit(1.0) + exp(-z)))
  }
}
