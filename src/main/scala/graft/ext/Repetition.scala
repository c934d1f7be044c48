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

  /** The full Gopher duplicated-n-gram profile (Rae et al. 2021, Table A1):
    * for each requested n, the fraction of the document's characters
    * attributable to (a) its single MOST FREQUENT n-gram
    * (`top_frac` — the 2–4-gram rules; count-argmax with a longer-gram
    * tiebreak, selected via a packed-long `max(cnt·2²¹ + glen)` so both
    * engines pick the identical gram without struct aggregates — glen is
    * bounded by doc length ≪ 2²¹) and (b) ALL n-grams occurring more
    * than once (`dup_frac` — the 5–10-gram rules). Character mass of a
    * gram occurrence is the gram's own length (token chars + joining
    * spaces); overlapping occurrences each count, so `dup_frac` can
    * exceed 1 on degenerate documents — the thresholds are calibrated on
    * that convention, not a deduplicated cover.
    *
    * One token explode; ONE window pass builds all `max(ns)−1` lead
    * columns (a single partition-local sort serves every n); grams for
    * all n flow through one union → one (doc, n, gram) aggregate — no
    * per-n re-shuffle of the token stream, no per-token lambdas. Output:
    * (idCol, n, top_frac, dup_frac), one row per n the document has at
    * least one n-gram for; fractions rounded at 6 from exact integers.
    */
  def dupNgramProfile(df: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 2), "dupNgramProfile: every n >= 2")
    val maxN = ns.max
    val tok = df.select(col(idCol), length(col(textCol)).as("doc_len"),
      posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "w")))
    val w = Window.partitionBy(idCol).orderBy("pos")
    val withLeads = (1 until maxN).foldLeft(tok) { (d, i) =>
      d.withColumn(s"w$i", lead(col("w"), i).over(w))
    }
    val grams = ns.map { n =>
      val parts = col("w") +: (1 until n).map(i => col(s"w$i"))
      withLeads.filter(col(s"w${n - 1}").isNotNull)
        .select(col(idCol), col("doc_len"), lit(n).as("n"),
          concat_ws(" ", parts: _*).as("g"))
    }.reduce(_ unionByName _)
    grams
      .groupBy(idCol, "doc_len", "n", "g")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("glen", length(col("g")).cast("long"))
      .groupBy(idCol, "n")
      .agg(
        max(col("cnt") * lit(1L << 21) + col("glen")).as("__p"),
        first(col("doc_len")).as("__dl"),
        coalesce(sum(when(col("cnt") >= 2, col("cnt") * col("glen"))),
          lit(0L)).as("__dup"))
      .select(col(idCol), col("n"),
        round((shiftright(col("__p"), 21) *
          col("__p").bitwiseAND(lit((1L << 21) - 1))).cast("double") /
          col("__dl"), 6).as("top_frac"),
        round(col("__dup").cast("double") / col("__dl"), 6).as("dup_frac"))
  }
}
