package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repetition-based quality metrics in the style of the Gopher corpus
  * rules (Rae et al. 2021, appendix A): documents dominated by a few
  * repeated tokens or n-grams are boilerplate/spam and get filtered
  * before training. Extension surface [X] over `documents`
  * (reference has no text ops; cf. `/root/reference/README.md` scope).
  *
  * Relational formulation only — one posexplode + per-doc aggregates.
  * Per-token lambdas (higher-order functions) are interpreted and
  * re-inline their argument subtree per element, so at corpus scale they
  * ARE the runtime; the explode/window/groupBy shape below stays inside
  * whole-stage codegen and shuffles once per aggregate on the doc id.
  */
object Repetition {

  /** Per-document repetition profile:
    * `n_tok` (whitespace tokens), `uniq_frac` (distinct/total tokens),
    * `top_bigram_frac` (count of the most frequent bigram / all bigrams;
    * 0.0 for documents with fewer than two tokens).
    * All fractions rounded to 6 — they feed threshold filters, and raw
    * double division differs in the last ulp across engines.
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "w")))
    val tokStats = tok.groupBy(idCol).agg(
      count(lit(1)).as("n_tok"),
      round(countDistinct(col("w")).cast("double") / count(lit(1)), 6)
        .as("uniq_frac"))
    val w = Window.partitionBy(idCol).orderBy("pos")
    val bigrams = tok
      .withColumn("w1", lead(col("w"), 1).over(w))
      .filter(col("w1").isNotNull)
      .select(col(idCol), concat_ws(" ", col("w"), col("w1")).as("g"))
    val bigramStats = bigrams
      .groupBy(idCol, "g").agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(
        round(max(col("c")).cast("double") / sum(col("c")), 6)
          .as("top_bigram_frac"))
    // Both aggregates are keyed by the doc id, so the final join reuses
    // the same hash partitioning — no extra exchange.
    tokStats.join(bigramStats, Seq(idCol), "left")
      .withColumn("top_bigram_frac", coalesce(col("top_bigram_frac"), lit(0.0)))
  }
}
