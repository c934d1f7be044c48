package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.TextHash

/** Bottom-k (k-minimum-values) sketches: the k smallest DISTINCT portable
  * hashes of a group's elements (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM 2002; Beyer et al., SIGMOD 2007 for
  * the unbiased KMV estimator).
  *
  * Why this next to the HLL distinct count (q24): bottom-k is the
  * DETERMINISTIC mergeable sketch — `bottomK(A ∪ B) =
  * bottomK(bottomK(A) ∪ bottomK(B))` holds exactly (taking the k smallest
  * of two k-smallest lists is the k smallest of the union), so a frozen
  * corpus sketch absorbs a batch sketch in O(k) per group without
  * re-reading the corpus: the incremental-family contract (q112…q214),
  * and — unlike HLL register unions — the merged result is bit-equal to a
  * full recompute, which is what lets the driver's DuckDB twin check it.
  *
  * Scale shape: one hash projection + distinct (map-side combinable) +
  * one per-group window over ≤ corpus-distinct rows, output k rows per
  * group. The window partitions by the group key — no single-partition
  * stage. Estimator: with h uniform on [0, SPACE), E[(k-1)·SPACE / h_(k)]
  * is the distinct count; below k distinct values the sketch IS the set
  * and the count is exact.
  */
object Sketches {

  /** tokenHash's range: hashes are uniform-ish on [0, 1e8). Fine for the
    * oracle-twin form ([[bottomK]]), but a KMV estimator over a 1e8
    * space accrues ~5% downward collision bias by 1e7 distinct per group
    * and saturates entirely near 1e8 — [[bottomK64]] is the
    * production-width variant.
    */
  val Space: Long = 100000000L

  /** tokenHash63's range, 2^63, as an EXACT double (power of two): the
    * hash space of [[bottomK64]] — wide enough that collision bias is
    * negligible at any real-world cardinality (~5e8 expected collisions
    * only by ~3e13 distinct).
    */
  val Space63: Double = 9.223372036854775808e18 // = 2^63 exactly (representable)

  /** Distinct hashes ranked per group, k smallest kept — the shared
    * sketch shape of both hash widths. Collisions collapse BEFORE
    * ranking (distinct on (group, h)) so the rank order is total and
    * engine-independent.
    */
  private def rankBottom(hashed: DataFrame, groupCol: String, k: Int)
      : DataFrame =
    hashed.distinct()
      .withColumn("rn",
        row_number().over(Window.partitionBy(groupCol).orderBy("h")))
      .filter(col("rn") <= k)
      .select(col(groupCol), col("rn"), col("h"))

  /** The bottom-k sketch of `elemCol` per `groupCol`: rows
    * (group, rn, h) with rn = 1..k over the k smallest distinct hashes.
    */
  def bottomK(df: DataFrame, groupCol: String, elemCol: String, k: Int)
      : DataFrame = {
    require(k > 0, s"bottomK: k=$k must be positive")
    rankBottom(
      df.select(col(groupCol), TextHash.tokenHash(col(elemCol)).as("h")),
      groupCol, k)
  }

  /** [[bottomK]] over the 63-BIT portable hash
    * ([[graft.ext.TextHash.tokenHash63]]) — the PRODUCTION-width sketch:
    * same shape, same merge law ([[merge]] is hash-width-agnostic), but
    * the estimator stays unbiased at cardinalities where the 1e8 space
    * visibly under-counts. Summarize with [[distinctEstimate64]].
    */
  def bottomK64(df: DataFrame, groupCol: String, elemCol: String, k: Int)
      : DataFrame = {
    require(k > 0, s"bottomK64: k=$k must be positive")
    rankBottom(
      df.select(col(groupCol), TextHash.tokenHash63(col(elemCol)).as("h")),
      groupCol, k)
  }

  /** Merge two bottom-k sketch tables (same k) into the sketch of the
    * union: union, re-distinct on (group, h), re-rank, keep k. O(k) rows
    * per group per side — never touches the underlying corpora.
    */
  def merge(a: DataFrame, b: DataFrame, groupCol: String, k: Int)
      : DataFrame = {
    require(k > 0, s"merge: k=$k must be positive")
    a.select(col(groupCol), col("h"))
      .union(b.select(col(groupCol), col("h")))
      .distinct()
      .withColumn("rn",
        row_number().over(Window.partitionBy(groupCol).orderBy("h")))
      .filter(col("rn") <= k)
      .select(col(groupCol), col("rn"), col("h"))
  }

  /** KMV distinct-count summary of a sketch table: per group the sketch
    * size, the kth-smallest hash, and the estimate — exact `n_sketch`
    * when the group has fewer than k distinct hashes, else
    * `(k-1)·SPACE / h_(k)` (unbiased for the uniform hash). Deterministic
    * double math, 6-dp signed-zero-safe.
    */
  def distinctEstimate(sketch: DataFrame, groupCol: String, k: Int)
      : DataFrame =
    estimateWith(sketch, groupCol, k, Space.toDouble)

  /** [[distinctEstimate]] for a [[bottomK64]] sketch — same unbiased KMV
    * estimator over the 2^63 hash space ((k−1)·2^63 is exact in a
    * double for any k ≤ 2^46, so the numerator constant is identical on
    * both engines).
    */
  def distinctEstimate64(sketch: DataFrame, groupCol: String, k: Int)
      : DataFrame =
    estimateWith(sketch, groupCol, k, Space63)

  private def estimateWith(sketch: DataFrame, groupCol: String, k: Int,
      space: Double): DataFrame = {
    require(k > 0, s"distinctEstimate: k=$k must be positive")
    sketch.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("h_k"))
      .select(
        col(groupCol), col("n_sketch"), col("h_k"),
        graft.syntax.round6z(
          when(col("n_sketch") < k, col("n_sketch").cast("double"))
            .otherwise(lit((k - 1).toDouble * space) /
              col("h_k").cast("double"))).as("est_distinct"))
  }

  // -------------------------------------------------- rank/quantile KMV

  /** GRID-FREE mergeable rank sketch: the bottom-k VALUE sample with
    * EXACT counts — k distinct values with the smallest 63-bit portable
    * hash per group, each carrying its exact total multiplicity
    * (distinct-value sampling: Gibbons, VLDB 2001, with the KMV
    * adaptive rate of Bar-Yossef et al. 2002). Quantiles read off the
    * sampled cumulative mass ([[quantilesFromRankSketch]]) with NO
    * pre-declared grid, range, or step — the case the quantized-ECDF
    * family ([[Drift.quantizedEcdfTable]]) leaves open.
    *
    * Why this and not KLL/t-digest: their compactions are
    * order-dependent (a merge tree and a cold rebuild retain different
    * items even with de-randomized coins), so "merge ≡ cold rebuild"
    * could only be asserted approximately. This sketch is a pure
    * FUNCTION OF THE MULTISET: the kept value set is {k smallest
    * hashes} and the counts are linear sums, so
    * `merge(sketch(A), sketch(B)) == sketch(A ∪ B)` holds BIT-FOR-BIT
    * (proof in [[rankSketchMerge]]) — the property that lets the q242
    * certificate and the merge-law spec check it exactly, the same
    * contract as every other member of the incremental family.
    *
    * Accuracy contract (documented, by design): values are sampled
    * uniformly over the DISTINCT-value set, so rank estimates are
    * self-normalized ratio estimates with error O(1/√k) in sampled-mass
    * share — tight for continuous/high-cardinality columns (every cnt
    * small), DEGRADED when single values carry large mass shares (a
    * missed heavy value shifts all ranks by its share). Low-cardinality
    * or heavy-hitter domains belong to the exact grid family instead;
    * this sketch's domain is the "continuous values, unknown range" one.
    *
    * Scale shape: one (group, value) count aggregate (map-side
    * combinable), one per-group window over distinct values, k rows per
    * group FOREVER. Values hash via their canonical string form, so any
    * orderable atomic type rides.
    */
  def rankSketch(df: DataFrame, groupCol: String, valueCol: String, k: Int)
      : DataFrame = {
    // rank order is (h, v) — the v tiebreak makes the kept set a total
    // order even under a hash collision at the k boundary (the
    // no-tiebreak-no-determinism rule); the merge-law proof needs the
    // kept set to be a pure function of the multiset, which (h, v) is.
    require(k > 0, s"rankSketch: k=$k must be positive")
    df.select(col(groupCol), col(valueCol).as("v"))
      .groupBy(col(groupCol), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", TextHash.tokenHash63(col("v").cast("string")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(col("h"), col("v"))))
      .filter(col("rn") <= k)
      .select(col(groupCol), col("v"), col("cnt"), col("h"))
  }

  /** Merge two rank sketches (same k) into the sketch of the union —
    * O(k) per group per side, bit-equal to a cold rebuild. Proof: a
    * value in the union's k smallest hashes is in the top-k of EVERY
    * shard it occurs in (a shard's distinct set is a subset of the
    * union's, so k smaller hashes in the shard would be k smaller
    * hashes in the union), hence its shard counts all survive and sum
    * to the exact global count; values outside the union's top-k are
    * dropped by the re-rank regardless of their counts. ∎
    */
  def rankSketchMerge(a: DataFrame, b: DataFrame, groupCol: String, k: Int)
      : DataFrame = {
    require(k > 0, s"rankSketchMerge: k=$k must be positive")
    val cols = Seq(col(groupCol), col("v"), col("cnt"), col("h"))
    a.select(cols: _*).unionByName(b.select(cols: _*))
      .groupBy(col(groupCol), col("v"), col("h"))
      .agg(sum("cnt").as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(col("h"), col("v"))))
      .filter(col("rn") <= k)
      .select(col(groupCol), col("v"), col("cnt"), col("h"))
  }

  /** Percentile ladder from a rank sketch: per group, order the SAMPLED
    * values, cumulative-sum their exact counts, and return for each
    * percentile the smallest sampled value whose cumulative sampled
    * mass reaches ceil(p/100 · sampled total) — the
    * [[Drift.quantilesFromEcdf]] left-continuous inverse applied to the
    * sample (self-normalized: no distinct-count estimate enters).
    * O(k · |pcts|) per group; the window is grid-free but k-bounded by
    * construction.
    */
  def quantilesFromRankSketch(sketch: DataFrame, groupCol: String,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"quantilesFromRankSketch: percentiles must be in [1,100], got $pcts")
    val spark = sketch.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(groupCol).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sketch.select(col(groupCol), col("v"), col("cnt"))
      .withColumn("cum", sum("cnt").over(w))
      .join(sketch.groupBy(groupCol).agg(sum("cnt").as("tot")), groupCol)
    cum.crossJoin(broadcast(pcts.toDF("pct")))
      .withColumn("r", greatest(lit(1L),
        ceil(col("pct").cast("double") / 100.0 * col("tot").cast("double"))
          .cast("long")))
      .filter(col("cum") >= col("r"))
      .groupBy(col(groupCol), col("pct"))
      .agg(min(col("v")).as("v_q"))
  }
}
