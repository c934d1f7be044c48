package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-rater agreement: Cohen's kappa (Cohen 1960) between two binary
  * raters, per group. The labeling-pipeline QA primitive: when two
  * annotators (or a model and a human, or two heuristic gates) label the
  * same corpus, raw percent-agreement overstates consistency on skewed
  * label distributions — kappa subtracts the chance-agreement floor.
  *
  * Scale shape: one scan → four codegen'd indicator sums per group; the
  * doubles are formed only at the very end as SINGLE divisions of exact
  * integer cross-products (`po = (n11+n00)/n`, `pe = [(n11+n10)(n11+n01) +
  * (n01+n00)(n10+n00)]/n²`, `kappa = (n·(n11+n00) − pe_num)/(n² −
  * pe_num)`), so both engines perform the identical one float operation
  * per output — cross-engine bit parity by construction. Integer
  * cross-products stay below 2^63 to ~3e9 rows per group.
  */
object Agreement {

  /** Per-`groupCol` Cohen's kappa between boolean columns `raterA` and
    * `raterB`: contingency counts, observed/expected agreement, kappa
    * (NULL for the degenerate chance-agreement-1 group).
    */
  def cohenKappa(df: DataFrame, groupCol: String, raterA: Column,
      raterB: Column): DataFrame = {
    def cnt(c: Column, name: String) = sum(c.cast("long")).as(name)
    val base = df.select(
      col(groupCol),
      raterA.cast("boolean").as("__a"),
      raterB.cast("boolean").as("__b"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        cnt(col("__a") && col("__b"), "n11"),
        cnt(col("__a") && !col("__b"), "n10"),
        cnt(!col("__a") && col("__b"), "n01"),
        cnt(!col("__a") && !col("__b"), "n00"))
    val peNum = (col("n11") + col("n10")) * (col("n11") + col("n01")) +
      (col("n01") + col("n00")) * (col("n10") + col("n00"))
    val n2 = col("n") * col("n")
    base.select(
      col(groupCol), col("n"), col("n11"), col("n10"), col("n01"),
      col("n00"),
      graft.syntax.round6z(
        (col("n11") + col("n00")).cast("double") / col("n").cast("double"))
        .as("po"),
      graft.syntax.round6z(peNum.cast("double") / n2.cast("double"))
        .as("pe"),
      graft.syntax.round6z(
        when(n2 === peNum, lit(null).cast("double"))
          .otherwise(
            (col("n") * (col("n11") + col("n00")) - peNum).cast("double") /
              (n2 - peNum).cast("double"))).as("kappa"))
  }

  /** DuckDB twin of [[cohenKappa]]: `aExpr`/`bExpr` are boolean SQL
    * expressions over `table`'s columns.
    */
  def cohenKappaSql(table: String, groupExpr: String, groupAlias: String,
      aExpr: String, bExpr: String): String =
    s"""WITH c AS (
          SELECT $groupExpr AS $groupAlias,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN ($aExpr) AND ($bExpr) THEN 1 ELSE 0 END) AS BIGINT) AS n11,
                 CAST(sum(CASE WHEN ($aExpr) AND NOT ($bExpr) THEN 1 ELSE 0 END) AS BIGINT) AS n10,
                 CAST(sum(CASE WHEN NOT ($aExpr) AND ($bExpr) THEN 1 ELSE 0 END) AS BIGINT) AS n01,
                 CAST(sum(CASE WHEN NOT ($aExpr) AND NOT ($bExpr) THEN 1 ELSE 0 END) AS BIGINT) AS n00
          FROM $table GROUP BY 1)
        SELECT $groupAlias, n, n11, n10, n01, n00,
               round(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS po,
               round(CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS DOUBLE)
                     / CAST(n * n AS DOUBLE), 6) + 0.0 AS pe,
               round(CASE WHEN n * n = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
                          THEN NULL
                          ELSE CAST(n * (n11 + n00) - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) AS DOUBLE)
                               / CAST(n * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) AS DOUBLE)
                     END, 6) + 0.0 AS kappa
        FROM c"""
}
