package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row — the one with
  * the greatest `rightTime` ≤ `leftTime` — within the same key. The
  * time-series "latest quote for each trade" operator.
  *
  * Plan shape (the 100 TB design): tag and UNION the two inputs, shuffle
  * ONCE on the key, sort each key group by (time, side), and carry the
  * last non-null right payload forward with an `ignoreNulls` running
  * window. Left rows then read their matched payload off the carried
  * columns. Cost: one exchange + one sort per side — never the
  * O(|L|·|R|) range cross-join a naive `l.time >= r.time` predicate
  * plans to, and never a per-row probe loop.
  *
  * Ties: a right row at exactly leftTime matches (≤); among right rows
  * sharing (key, time) the last in (time, tiebreak-free) order wins —
  * callers needing total determinism give right unique (key, time).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String,
      rightPrefix: String = "r_"): DataFrame = {
    val rightPayload = right.columns.filterNot(c => c == keyCol || c == rightTime)
    val leftCols = left.columns

    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(
        Seq(col(keyCol), col("_t"), col("_side")) ++
          leftCols.filterNot(_ == keyCol).map(col) ++
          rightPayload.map(c => lit(null).cast(right.schema(c).dataType)
            .as(s"$rightPrefix$c")): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(
        Seq(col(keyCol), col("_t"), col("_side")) ++
          leftCols.filterNot(_ == keyCol).map(c =>
            lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightPayload.map(c => col(c).as(s"$rightPrefix$c")): _*)

    // Right rows sort before left rows at equal time (side 0 < 1), so an
    // exactly-simultaneous right row is visible to the left row.
    val w = Window.partitionBy(keyCol).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(l.unionByName(r)) { (acc, c) =>
      acc.withColumn(s"$rightPrefix$c",
        last(col(s"$rightPrefix$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"$rightPrefix$c")): _*)
  }
}
