package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two cohorts of one table —
  * per-bucket Population Stability Index (PSI) terms, the standard check
  * that a new ingest / new snapshot still "looks like" the corpus before
  * it is allowed into a training mix (reference analog: the snapshot
  * freshness checks around `update_ways_metadata.py`'s re-enrichment).
  *
  * Scale design: the bucket is an integer CASE ladder over literal
  * thresholds (pure codegen'd map work — no global sort, no quantile
  * state), so the only shuffle is one tiny groupBy on the bucket id; the
  * cohort totals broadcast back. PSI terms are emitted PER BUCKET with the
  * float math done once per bucket row — no cross-row float accumulation,
  * so there is no aggregation-order drift to reconcile across engines
  * (sum the rounded terms for the scalar PSI).
  */
object Drift {

  /** Integer ladder bucket: number of `thresholds` ≤ value (monotone, so
    * bucket b covers [t_{b-1}, t_b)). Integer comparisons only — no float
    * boundaries to disagree on.
    */
  def bucketOf(c: Column, thresholds: Seq[Long]): Column =
    thresholds.map(t => when(c >= t, 1L).otherwise(0L))
      .reduce(_ + _)

  /** DuckDB twin of [[bucketOf]] — the same ladder, textually. */
  def bucketSql(e: String, thresholds: Seq[Long]): String =
    thresholds.map(t => s"(CASE WHEN $e >= $t THEN 1 ELSE 0 END)")
      .mkString("CAST(", " + ", " AS BIGINT)")

  /** Per-bucket PSI terms between cohort A (`isA`) and cohort B (the
    * rest): `(p_a - p_b) · ln(p_a / p_b)` where p is the bucket's share of
    * its cohort. Buckets empty on either side are omitted (their
    * unsmoothed term is undefined); emit counts so callers can see them
    * coming. Output: bucket, n_a, n_b, psi_term (rounded 6).
    */
  def psiTerms(df: DataFrame, isA: Column, bucket: Column): DataFrame = {
    val counts = df
      .select(bucket.as("bucket"), isA.as("__a"))
      .groupBy("bucket")
      .agg(
        sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__a"), 0L).otherwise(1L)).as("n_b"))
    val totals = counts.agg(sum("n_a").as("__t_a"), sum("n_b").as("__t_b"))
    val pa = col("n_a").cast("double") / col("__t_a")
    val pb = col("n_b").cast("double") / col("__t_b")
    counts.crossJoin(broadcast(totals))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col("bucket"), col("n_a"), col("n_b"),
        round((pa - pb) * log(pa / pb), 6).as("psi_term"))
  }
}
