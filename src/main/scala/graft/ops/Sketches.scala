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
}
