package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distance-bounded join (the 1-D analog of RoutingGraph.snapPois's grid
  * join, SURVEY §2.4 J3): all pairs with |left.v − right.v| ≤ width.
  *
  * A naive band predicate plans as BroadcastNestedLoopJoin — O(n·m) pair
  * evaluations, a non-starter at scale. Here both sides are keyed to
  * floor(v/width) cells and the right side is exploded to its 3 neighbor
  * cells: any qualifying pair lands in the same cell (|Δv| ≤ width bounds
  * the cell delta to ±1), so ONE hash equi-join on the cell id finds every
  * candidate, and the exact predicate filters the survivors. Shuffle cost
  * is O(n + 3m) rows on a dense integer key — sort-merge/broadcast chosen
  * by AQE; results are identical to the nested-loop plan.
  */
object RangeJoin {

  def banded(left: DataFrame, right: DataFrame,
      leftVal: String, rightVal: String, width: Double): DataFrame = {
    require(width > 0, "band width must be positive")
    val l = left.withColumn("_cell",
      floor(col(leftVal) / lit(width)).cast("long"))
    val r = right
      .withColumn("_rcell", floor(col(rightVal) / lit(width)).cast("long"))
      .withColumn("_cell",
        explode(array(col("_rcell") - 1, col("_rcell"), col("_rcell") + 1)))
      .drop("_rcell")
    l.join(r, Seq("_cell"))
      .filter(abs(col(leftVal) - col(rightVal)) <= lit(width))
      .drop("_cell")
  }

  /** Interval-overlap join: all pairs whose closed intervals
    * [lStart, lEnd] and [rStart, rEnd] intersect, equi-restricted by
    * `keys` (temporal/genomic overlap, the 2-endpoint generalization of
    * [[banded]]).
    *
    * Each interval explodes to the `cellWidth`-sized cells it spans, so
    * overlapping intervals share ≥1 cell and one hash equi-join on
    * (keys, cell) finds every candidate. A pair sharing several cells
    * would surface once per cell; instead of a dedup shuffle, each pair
    * is attributed to exactly ONE canonical cell — the cell containing
    * the later of the two starts (which both intervals provably span).
    * Shuffle cost: O(rows · interval/cellWidth) on dense integer keys;
    * pick cellWidth near the typical interval length so the explode
    * factor stays ~2.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      keys: Seq[String], cellWidth: Long): DataFrame = {
    require(cellWidth > 0, "cell width must be positive")
    def cellOf(c: org.apache.spark.sql.Column) =
      floor(c / lit(cellWidth.toDouble)).cast("long")
    val l = left.withColumn("_cell",
      explode(sequence(cellOf(col(lStart)), cellOf(col(lEnd)))))
    val r = right.withColumn("_cell",
      explode(sequence(cellOf(col(rStart)), cellOf(col(rEnd)))))
    l.join(r, keys :+ "_cell")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_cell") === cellOf(greatest(col(lStart), col(rStart))))
      .drop("_cell")
  }
}
