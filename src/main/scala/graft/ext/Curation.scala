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

  /** Registrable host of a URL column — `scheme://host[:port]/…` →
    * `host` (port stripped, lower-cased). Codegen'd regexp; empty string
    * for non-URL garbage (a loud null would poison the cap's partition
    * key — garbage groups together and gets capped like any other host,
    * which is exactly the crawl posture).
    */
  def urlHost(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))

  /** PER-HOST DOCUMENT CAP — the crawl-curation primitive between dedup
    * and mixture: keep at most `cap` documents per host, smallest
    * `orderCol` first (a deterministic total order — pass the doc id).
    * One window whose `row_number ≤ cap` plans a partial
    * `WindowGroupLimit` BEFORE the exchange (the q14/q208 rule), so only
    * cap·hosts rows shuffle — a mega-host contributes cap rows to the
    * exchange no matter how many billions it crawled.
    */
  def perHostCap(docs: DataFrame, urlCol: String, orderCol: String,
      cap: Int): DataFrame = {
    require(cap >= 1, s"perHostCap: cap=$cap")
    val w = Window.partitionBy(urlHost(col(urlCol))).orderBy(col(orderCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }
}
