package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the closest right row within the same
  * key — `backward` (greatest rightTime ≤ leftTime, the "latest quote for
  * each trade" default), `forward` (smallest rightTime ≥ leftTime), or
  * `nearest` (closer of the two; exact tie → backward, pandas
  * `merge_asof` convention).
  *
  * Plan shape (the 100 TB design): tag and UNION the two inputs, shuffle
  * ONCE on the key, sort each key group by (time, side), and carry the
  * last non-null right payload forward with an `ignoreNulls` running
  * window. Left rows then read their matched payload off the carried
  * columns. Cost: one exchange plus one sort per direction — never the
  * O(|L|·|R|) range cross-join a naive `l.time >= r.time` predicate
  * plans to, and never a per-row probe loop. `forward` is `backward` on
  * the time axis reversed (same frame, descending sort); `nearest` runs
  * both window chains over the single exchange and picks per row.
  *
  * Ties: a right row at exactly leftTime matches in every direction
  * (side orders right before left at equal time under either sort);
  * among right rows sharing (key, time) the last in traversal order
  * wins — callers needing total determinism give right unique
  * (key, time). Time may be any numeric or timestamp type (nearest
  * compares distances via subtraction, so both operands must subtract).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String,
      rightPrefix: String = "r_",
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"asOf: direction must be backward|forward|nearest, got '$direction'")
    val rightPayload = right.columns.filterNot(c => c == keyCol || c == rightTime)
    val leftCols = left.columns

    // Unioned frame: left rows carry their own columns and nulls for the
    // right payload (plus the matched-time slot "__rt"); right rows the
    // reverse. One exchange on the key serves every direction.
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(
        Seq(col(keyCol), col("_t"), col("_side"),
          lit(null).cast(right.schema(rightTime).dataType).as("__rt")) ++
          leftCols.filterNot(_ == keyCol).map(col) ++
          rightPayload.map(c => lit(null).cast(right.schema(c).dataType)
            .as(s"$rightPrefix$c")): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(
        Seq(col(keyCol), col("_t"), col("_side"), col(rightTime).as("__rt")) ++
          leftCols.filterNot(_ == keyCol).map(c =>
            lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightPayload.map(c => col(c).as(s"$rightPrefix$c")): _*)
    val base = l.unionByName(r)
    val carrySlots = "__rt" +: rightPayload.map(c => s"$rightPrefix$c")

    // Right rows sort before left rows at equal time under BOTH sorts
    // (side 0 < 1), so an exactly-simultaneous right row is visible to
    // the left row in either direction.
    def carry(df: DataFrame, descTime: Boolean, suffix: String): DataFrame = {
      val ord: Seq[Column] =
        if (descTime) Seq(col("_t").desc, col("_side")) else Seq(col("_t"), col("_side"))
      val w = Window.partitionBy(keyCol).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      carrySlots.foldLeft(df) { (acc, c) =>
        acc.withColumn(s"$c$suffix", last(col(c), ignoreNulls = true).over(w))
      }
    }

    val out = direction match {
      case "backward" =>
        carry(base, descTime = false, "_b").filter(col("_side") === 1)
          .select(leftCols.map(col) ++
            rightPayload.map(c => col(s"$rightPrefix${c}_b").as(s"$rightPrefix$c")): _*)
      case "forward" =>
        carry(base, descTime = true, "_f").filter(col("_side") === 1)
          .select(leftCols.map(col) ++
            rightPayload.map(c => col(s"$rightPrefix${c}_f").as(s"$rightPrefix$c")): _*)
      case "nearest" =>
        val both = carry(carry(base, descTime = false, "_b"), descTime = true, "_f")
          .filter(col("_side") === 1)
        // Distances compare via subtraction oriented non-negative on both
        // sides (numeric difference or day-time interval alike); a missing
        // side loses automatically, an exact tie keeps backward.
        val takeForward = col("__rt_b").isNull ||
          (col("__rt_f").isNotNull &&
            (col("__rt_f") - col("_t")) < (col("_t") - col("__rt_b")))
        both.select(leftCols.map(col) ++
          rightPayload.map(c =>
            when(takeForward, col(s"$rightPrefix${c}_f"))
              .otherwise(col(s"$rightPrefix${c}_b")).as(s"$rightPrefix$c")): _*)
    }
    out
  }
}
