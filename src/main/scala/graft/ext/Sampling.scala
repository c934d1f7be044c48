package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines: hash-bucket
  * sampling, train/val/test splits, and per-stratum (source/language)
  * rate control — the standard way to cut a reproducible slice of a
  * 100 TB corpus without a global sort or a stored assignment table.
  *
  * Every assignment is a pure function of the row's id (an
  * engine-portable md5-digit hash, TextHash), so it is stable across
  * runs, partitionings, and engines; sampling is a codegen'd filter that
  * reaches the parquet scan — no shuffle, no state.
  */
object Sampling {

  /** Deterministic bucket in [0, buckets): digit-hash of the id rendered
    * as a string. Uniform enough for rate control (md5 avalanche).
    */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(TextHash.tokenHash(id.cast("string")), lit(buckets.toLong))

  /** DuckDB twin of [[hashBucket]] (hash is non-negative, so plain `%`
    * matches `pmod`).
    */
  def hashBucketSql(e: String, buckets: Int = 100): String =
    s"${TextHash.tokenHashSql(s"CAST($e AS VARCHAR)")} % $buckets"

  /** Deterministic train/val/test assignment by bucket thresholds. */
  def splitAssign(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(id)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic per-stratum cap: keep the `n` rows with the smallest
    * id-hash in each stratum (fixed-size quota per source/language).
    * Ranking by (hash, id) is engine- and run-stable — a reproducible
    * "random" quota, unlike reservoir sampling. One window shuffle on the
    * stratum key; strata cap in parallel.
    */
  def capPerStratum(df: DataFrame, idCol: String, strataCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(hashBucket(col(idCol), 1000000), col(idCol))
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= n)
  }

  /** Mixture rebalancing: deterministically resample each stratum toward a
    * target mixture. A stratum with target share `w` (relative to the sum
    * of all shares = 1) keeps `min(1, w·N / n_s)` of its rows, decided per
    * row by the portable id hash — the data-recipe primitive that turns
    * "whatever the crawl gave us" into "60% src0-3, 40% the rest" without
    * a global sort or stored assignments. Over-represented strata are
    * downsampled; under-represented ones pass through whole (no
    * upsampling: rates cap at 1).
    *
    * Scale: one tiny per-stratum count aggregate broadcast back onto the
    * corpus scan, then a codegen'd filter — the corpus itself never
    * shuffles. Adds a `keep_rate` column (the stratum's rate, unrounded).
    */
  def mixtureKeep(df: DataFrame, idCol: String, stratumCol: String,
      targets: Map[String, Double], defaultShare: Double): DataFrame = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("__n_s"))
    val total = counts.agg(sum("__n_s").as("__n_tot"))
    val share = targets.toSeq.sortBy(_._1).foldLeft(lit(defaultShare)) {
      case (els, (k, w)) => when(col(stratumCol) === k, lit(w)).otherwise(els)
    }
    df.join(broadcast(counts), stratumCol)
      .crossJoin(broadcast(total))
      // (share · N) / n_s, in exactly this association — the DuckDB twin
      // must state the same order so the doubles agree bit-for-bit.
      .withColumn("keep_rate",
        least(lit(1.0), share * col("__n_tot") / col("__n_s")))
      .filter(TextHash.tokenHash(col(idCol).cast("string")).cast("double")
        / 1e8 < col("keep_rate"))
      .drop("__n_s", "__n_tot")
  }

  /** Keep-predicate for stratified sampling: each stratum value keeps
    * `rates(stratum)` percent of its rows (default `defaultPct`).
    * Composable with any filter; rows are kept or dropped consistently
    * across every query that uses the same id.
    */
  def stratifiedKeep(id: Column, stratum: Column, rates: Map[String, Int],
      defaultPct: Int = 100): Column = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (els, (k, p)) =>
      when(stratum === k, lit(p)).otherwise(els)
    }
    hashBucket(id) < rate
  }

  /** EXACT-SIZE weighted sampling without replacement (the
    * Efraimidis–Spirakis exponential-clock scheme, deterministic variant):
    * per stratum, keep the `n` rows with the smallest key
    * `−ln(u)/weight`, u the portable id hash mapped into (0, 1] — an
    * Exp(weight) clock, so heavier rows ring earlier and the n smallest
    * clocks ARE a weighted sample without replacement. Closes the
    * sampling family: [[capPerStratum]] = uniform quota, [[mixtureKeep]]/
    * [[stratifiedKeep]] = rate control (Bernoulli, size varies), this =
    * exact-size weighted quota.
    *
    * Deterministic and engine-portable: u is the md5-digit hash (stable
    * everywhere), and the ranking orders by the key ROUNDED to 9 decimals
    * with the id tiebreak — `ln` differs in the last ulp across libm
    * implementations, and the round-then-tiebreak discipline (q47/q48) is
    * what keeps the sample identical on any engine. One window shuffle on
    * the stratum key (the q14 partial-WindowGroupLimit shape: only
    * n·strata rows cross the exchange).
    *
    * Contract (enforced, not just documented): the input must not already
    * carry the appended `skey`/`rnk` columns (the op would silently
    * shadow them), ids must be distinct per stratum for the tiebreak to be
    * total, and weights must be strictly positive — a non-positive weight
    * fails the job loudly via `raise_error` instead of producing a
    * NaN/−Inf clock that quietly wins every sample.
    *
    * @param weight strictly positive weight expression
    */
  def weightedSample(df: DataFrame, idCol: String, strataCol: String,
      weight: Column, n: Int): DataFrame = {
    require(!df.columns.contains("skey") && !df.columns.contains("rnk"),
      "weightedSample appends columns `skey` and `rnk`; the input already " +
        s"has one of them (columns: ${df.columns.mkString(", ")})")
    val u = (TextHash.tokenHash(col(idCol).cast("string")).cast("double")
      + 1.0) / 1e8
    val wd = weight.cast("double")
    val wchecked = when(wd > 0.0, wd).otherwise(raise_error(concat(
      lit("weightedSample: non-positive weight for id "),
      col(idCol).cast("string"))))
    val key = round(-log(u) / wchecked, 9)
    val w = Window.partitionBy(strataCol).orderBy(col("skey"), col(idCol))
    df.withColumn("skey", key)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= n)
  }

  /** Per-stratum DYNAMIC quota sampling: like [[capPerStratum]] but the
    * quota comes from a relation (stratumCol, quotaCol) instead of one
    * constant — the executor of a mixture plan ([[temperatureShares]]
    * decides how many, this picks WHICH, deterministically by the
    * portable id hash). Strata missing from `quotas` contribute nothing.
    *
    * Scale: the quota table is tiny (one row per stratum) and broadcasts;
    * the rank window is the one corpus shuffle. A 1-row `agg(max)`
    * collect turns the dynamic bound into a LITERAL rank conjunct so
    * Spark 4 still plans the partial WindowGroupLimit — only
    * maxQuota·strata rows cross the exchange, the q14 shape (bounded
    * driver work: one long).
    */
  def quotaSample(df: DataFrame, idCol: String, strataCol: String,
      quotas: DataFrame, quotaCol: String): DataFrame = {
    val maxQ = quotas.agg(max(col(quotaCol).cast("long"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val w = Window.partitionBy(strataCol)
      .orderBy(hashBucket(col(idCol), 1000000), col(idCol))
    df.join(broadcast(quotas.select(col(strataCol),
        col(quotaCol).cast("long").as("__q"))), strataCol)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= maxQ && col("rnk") <= col("__q"))
      .drop("__q")
  }

  /** Temperature-scaled mixture shares (the multilingual/domain-balance
    * recipe: sampling share ∝ n_s^alpha, alpha < 1 flattens the head and
    * lifts the tail). Returns one row per stratum: (stratumCol, n_s,
    * share, expected_n) where `expected_n` = the stratum's row budget out
    * of `budget` total.
    *
    * Cross-engine float discipline: the per-stratum weight n^alpha is
    * rounded to 9 decimals, the normalizing sum runs in DECIMAL(38,9)
    * (order-free exact — Spark's partial aggregation order differs from
    * the oracle's single pass), the share divides double-by-double once,
    * and `expected_n` uses floor(x+0.5) (engine rounding modes differ at
    * .5 — CLAUDE.md q72/q47 lessons).
    *
    * Scale: a groupBy on the stratum key down to |strata| rows, then
    * arithmetic on the tiny aggregate — the corpus is read once.
    */
  def temperatureShares(df: DataFrame, stratumCol: String, alpha: Double,
      budget: Long): DataFrame = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n_s"))
    val weighted = counts.withColumn("__w",
      round(pow(col("n_s").cast("double"), alpha), 9))
    val total = weighted
      .agg(sum(col("__w").cast("decimal(38,9)")).as("__tot"))
    weighted.crossJoin(broadcast(total))
      .select(col(stratumCol), col("n_s"),
        round(col("__w") / col("__tot").cast("double"), 6).as("share"),
        floor(round(col("__w") / col("__tot").cast("double"), 6)
          * budget + 0.5).cast("long").as("expected_n"))
  }

  /** EPOCH-weighted mixture materialization — the executor of a data
    * recipe with per-source epoch counts (wiki ×2.5, web ×0.3 …): emit
    * each document `floor(e)` times plus one more for a deterministic
    * `frac(e)` share of its stratum, as `(id, stratum, copy)` rows with
    * `copy` in 1..n. The fractional copy is decided by a SALTED portable
    * id hash (salt "#em") so it is independent of [[splitAssign]] and
    * [[hashBucket]] decisions on the same ids — an unsalted reuse would
    * correlate "gets the extra epoch" with "lands in train". Strata
    * absent from `epochs` contribute nothing.
    *
    * Fractions are snapped to 1/`granularity` (default ‰) so the
    * keep-decision is an exact integer compare — no float boundary to
    * disagree across engines.
    *
    * Scale: pure map-side — a CASE ladder over |strata| literals, one
    * hash, one bounded `sequence` explode. Output size is the recipe's
    * token multiple of the input; nothing shuffles.
    */
  def epochMix(df: DataFrame, idCol: String, stratumCol: String,
      epochs: Map[String, Double], granularity: Int = 1000): DataFrame = {
    require(epochs.values.forall(e => e >= 0 && e <= 100),
      "epochMix: epochs must be in [0, 100]")
    // granularity 0 would make pmod(salted, 0) null (non-ANSI) — silently
    // dropping every fractional epoch — or throw under ANSI.
    require(granularity >= 1, s"epochMix: granularity >= 1, got $granularity")
    val whole = epochs.map { case (k, e) => k -> math.floor(e).toLong }
    val fracG = epochs.map { case (k, e) =>
      k -> math.round((e - math.floor(e)) * granularity) }
    def ladder(m: Map[String, Long]): Column =
      m.foldLeft(lit(0L)) { case (acc, (k, v)) =>
        when(col(stratumCol) === lit(k), lit(v)).otherwise(acc) }
    val salted = TextHash.tokenHash(
      concat(col(idCol).cast("string"), lit("#em")))
    val copies = ladder(whole) +
      when(pmod(salted, lit(granularity.toLong)) < ladder(fracG), lit(1L))
        .otherwise(lit(0L))
    df.select(col(idCol), col(stratumCol), copies.as("__n"))
      .filter(col("__n") >= 1L)
      .select(col(idCol), col(stratumCol),
        explode(sequence(lit(1L), col("__n"))).as("copy"))
  }
}
