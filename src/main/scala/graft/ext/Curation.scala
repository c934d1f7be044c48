package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The curation capstone: the end-to-end pass a training-data pipeline
  * runs between "raw crawl" and "training mixture", composed from the
  * engine's own operators — rule-based quality filtering
  * ([[TextAnalysis.qualityFlags]]), exact deduplication (corpus-wide min-id
  * keeper per text), and the leakage-free near-dup-aware split
  * ([[DedupCluster.leakageFreeSplit]]) — reduced to the report that gets
  * reviewed before a training run: documents and tokens per (split,
  * source).
  */
object Curation {

  /** Per-(split, source) curated-corpus report: documents surviving the
    * quality rules AND exact dedup, split-assigned by near-dup cluster so
    * families never straddle train/test. Output: (split, sourceCol,
    * n_docs, n_tokens), n_tokens = whitespace token count.
    *
    * Scale: the near-dup clustering dominates and runs once; the quality
    * rules are a codegen'd projection on the scan, exact dedup is one
    * row_number window on the text (high-cardinality key), and the final
    * aggregate is |splits|·|sources| rows. Split labels are computed over
    * the FULL corpus (assignment independent of filtering — re-running
    * with different quality rules never reshuffles the fence).
    */
  def curatedReport(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val kept = docs
      .select(col(idCol), col(sourceCol), col(textCol))
      .filter(TextAnalysis.qualityFlags(col(textCol)) === "---")
    val firstW = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    val deduped = kept
      .withColumn("__rn", row_number().over(firstW))
      .filter(col("__rn") === 1)
    val split = DedupCluster.leakageFreeSplit(docs, idCol, textCol)
      .select(col(idCol), col("split"))
    deduped
      .join(split, idCol)
      .groupBy(col("split"), col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))).as("n_tokens"))
  }
}
