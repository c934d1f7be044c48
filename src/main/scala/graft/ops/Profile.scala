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

  /** Robust per-group outlier profile via MAD (median absolute deviation):
    * per group the exact median m, MAD = median(|x − m|), and the count of
    * rows with |x − m| > k·MAD — the robust z-score monitor (mean/stddev
    * break under the very outliers they are meant to find; median/MAD have
    * a 50% breakdown point). Two grouped exact-percentile passes (groups ≪
    * rows, bounds broadcast back — the [[winsorize]] shape); both engines
    * interpolate the even-count median identically on integer inputs, and
    * every derived float op (subtract, abs, one multiply, compares) is a
    * single IEEE op — no parity surface. A degenerate group (≥ half the
    * values identical) has MAD 0: every other value counts as an outlier,
    * the documented MAD edge. Output: (groupCol, med, mad, n, n_out).
    */
  def madOutlierProfile(df: DataFrame, groupCol: String, valCol: String,
      k: Double = 3.0): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(percentile(col(valCol).cast("double"), lit(0.5)).as("med"))
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("__adev", abs(col(valCol).cast("double") - col("med")))
    val mad = dev.groupBy(groupCol)
      .agg(percentile(col("__adev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), groupCol)
      .groupBy(groupCol)
      .agg(first(col("med")).as("med"), first(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("__adev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_out"))
  }

  /** Per-group simple linear regression (OLS) of `yCol` on `xCol`, both
    * integer by contract: slope, intercept, and r² from the five
    * sufficient sums (n, Σx, Σy, Σxy, Σx², Σy²) — the drift/scaling-law
    * profile (e.g. tokens-vs-chars per source; a slope break flags a
    * tokenizer or encoding change).
    *
    * Scale + parity shape: ONE aggregation pass; every sufficient sum is
    * exact DECIMAL(38,0) integer arithmetic (order-free, overflow-safe to
    * ~10³⁸ where long products at corpus scale overflow), and the
    * numerator/denominator combinations stay in DECIMAL until a final
    * cast-to-double + single division/multiply chain, then round(6) (the
    * q72 discipline applied to second moments). Degenerate groups
    * (constant x → zero variance) emit null slope/intercept/r². Output:
    * (groupCol, n, slope, intercept, r2).
    */
  def groupOls(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(38,0)")
    val y = col(yCol).cast("decimal(38,0)")
    val sums = df.groupBy(groupCol).agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    // exact DECIMAL combinations; doubles only at the final ops. Guards,
    // not NaN filtering: ANSI mode raises DIVIDE_BY_ZERO even for doubles.
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val denx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val deny = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    sums.select(col(groupCol), col("n").cast("long").as("n"),
      when(denx > 0, round(num / denx, 6)).as("slope"),
      when(denx > 0,
        round((col("sy").cast("double") - (num / denx) * col("sx").cast("double"))
          / col("n").cast("double"), 6)).as("intercept"),
      when(denx > 0 && deny > 0,
        round(num * num / (denx * deny), 6)).as("r2"))
  }

  /** 2-D PARETO FRONT (skyline): every row not dominated under
    * (maximize `maxCol`, minimize `minCol`) — dominance = ≥ on the max
    * axis, ≤ on the min axis, strict somewhere. The multi-criteria
    * selection query (e.g. highest-quality-per-length documents) that a
    * naive formulation writes as an O(n²) NOT EXISTS self-join.
    *
    * Scale shape: a front row must attain the minimum `minCol` within
    * its `maxCol` value, so the skyline structure lives entirely on the
    * per-value aggregate — groupBy(maxCol).min (parallel, map-side
    * combinable), then the strict-prefix running min over the
    * VALUE-DISTINCT table (the q65 vocab-window discipline: the ordered
    * window sees |distinct maxCol| rows — a value-domain bound, never
    * the corpus), then one semi-join back. Ties on both axes are
    * mutually non-dominating and all kept.
    *
    * @return the input rows on the front
    */
  def paretoFront2D(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agg = df.groupBy(maxCol).agg(min(col(minCol)).as("__m"))
    val w = Window.orderBy(col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = agg
      .withColumn("__hmin", min(col("__m")).over(w))
      .filter(col("__hmin").isNull || col("__m") < col("__hmin"))
      .select(col(maxCol), col("__m").as(minCol))
    df.join(front, Seq(maxCol, minCol), "left_semi")
  }

  /** Gini concentration index of an integer-valued column per group —
    * the corpus-skew read ("how unevenly is volume spread over docs /
    * shards / sources"): `G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx)` over
    * the ascending sort, ∈ [0, 1−1/n]. Every aggregate is an exact
    * long — rank-position times value, group sums — and ties need NO
    * tiebreak: equal values contribute the same Σ i·x under any
    * permutation of their positions, so the per-group rank window is
    * deterministic where it matters. One shuffle (the rank window =
    * the group-by), single final division; exact below ~2^63 / x_max
    * rank-weighted mass per group (the kappa-class bound). Zero-sum
    * groups drop (G undefined).
    */
  def giniIndex(df: DataFrame, groupCol: String,
      value: org.apache.spark.sql.Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("__x")
    df.select(col(groupCol), value.cast("long").as("__x"))
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum("__x").as("__sx"),
        sum(col("__i") * col("__x")).as("__six"))
      .filter(col("__sx") > 0)
      .select(col(groupCol), col("n"),
        graft.syntax.round6z(
          (lit(2L) * col("__six") - (col("n") + 1L) * col("__sx"))
            .cast("double") /
            (col("n") * col("__sx")).cast("double")).as("gini"))
  }

  /** DuckDB twin of [[giniIndex]] over `FROM $from`. */
  def giniIndexSql(from: String, groupExpr: String, groupName: String,
      valueExpr: String): String =
    s"""WITH b AS (SELECT $groupExpr AS g, CAST(trunc($valueExpr) AS BIGINT) AS x
            FROM $from),
          r AS (SELECT g, x, CAST(row_number() OVER (PARTITION BY g
                  ORDER BY x) AS BIGINT) AS i FROM b),
          a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS sx,
                  CAST(sum(i * x) AS BIGINT) AS six
                FROM r GROUP BY 1 HAVING sum(x) > 0)
       SELECT g AS $groupName, n,
              round(CAST(2 * six - (n + 1) * sx AS DOUBLE) /
                    CAST(n * sx AS DOUBLE), 6) + 0.0 AS gini
       FROM a"""
}
