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
}
