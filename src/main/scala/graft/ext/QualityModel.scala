package graft.ext

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weak-label LOGISTIC quality classifier — the fasttext-style learned
  * quality gate of a production curation pipeline (CCNet/GPT-3 lineage:
  * train a cheap linear classifier on weak labels, gate the corpus on
  * its score), as the classification sibling of the OLS fit (q153) and
  * the calibrated LM gate (q139).
  *
  * The classic distributed-ML split (the q172 PCA discipline): the FIT
  * is data-parallel MLlib over deterministic integer features; the
  * learned (weights, intercept) — a kilobyte — then scores the corpus as
  * ONE broadcast-literal codegen expression, never a model object per
  * row. Parity: scoring is a FIXED left-associated dot of recorded
  * doubles against exact integer features — both engines execute the
  * identical IEEE sequence, so the logit is bit-equal and `round6z` /
  * the admit comparison introduce no drift. The certificate oracle
  * records the fitted parameters and re-scores independently.
  */
object QualityModel {

  case class LrModel(weights: Array[Double], intercept: Double)

  /** Deterministic integer features per document: token count, distinct
    * token count, character count. Integer-exact on both engines.
    */
  def features(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"),
      size(array_distinct(Dedup.tokens(col(textCol)))).cast("long")
        .as("n_distinct"),
      length(col(textCol)).cast("long").as("n_chars"))

  /** Fit the gate on weak labels (`labelCol` ∈ {0, 1}). Returns the
    * coefficient vector in feature order (n_tokens, n_distinct,
    * n_chars) plus the intercept.
    */
  def fit(df: DataFrame, idCol: String, textCol: String,
      label: org.apache.spark.sql.Column, maxIter: Int = 50,
      regParam: Double = 0.01): LrModel = {
    val data = df.select(
      array_to_vector(array(
        size(Dedup.tokens(col(textCol))).cast("double"),
        size(array_distinct(Dedup.tokens(col(textCol)))).cast("double"),
        length(col(textCol)).cast("double"))).as("features"),
      label.cast("double").as("label"))
    val m = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).fit(data)
    LrModel(m.coefficients.toArray, m.intercept)
  }

  /** Score every document with a FITTED model: logit = w·x + b in fixed
    * left-to-right association over broadcast literals, admit = logit
    * strictly positive (decided on the UNROUNDED logit). Output
    * (idCol, logit, admit).
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: LrModel): DataFrame = {
    val f = features(df, idCol, textCol)
    val Array(w1, w2, w3) = model.weights
    val lg = col("n_tokens").cast("double") * w1 +
      col("n_distinct").cast("double") * w2 +
      col("n_chars").cast("double") * w3 + model.intercept
    f.select(col(idCol),
      graft.syntax.round6z(lg).as("logit"),
      when(lg > 0d, 1).otherwise(0).as("admit"))
  }
}
