package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension build: turn a keyed, timestamped
  * change log into validity intervals — one row per state episode with
  * `eff_from` / `eff_to` (exclusive, NULL while current) and
  * `is_current`. The temporal complement of the CDC surface: [[Cdc]]
  * derives WHAT changed between two snapshots, this derives WHEN each
  * state held across the whole history — the dimension shape that lets a
  * 100 TB fact table join "as of" any point in time ([[AsOfJoin]] against
  * the interval table is the companion read path).
  *
  * Scale shape: two stacked windows over ONE key-partitioned sort (change
  * detection via null-safe `lag`, interval close via `lead` on the
  * surviving rows) — Spark plans a single exchange + sort per key, and
  * the second window re-sorts only the collapsed episode rows. Consecutive
  * duplicate states collapse into the earliest row of their run, so the
  * output is bounded by the number of true state transitions, not log
  * length.
  *
  * `orderCols` must make the per-key ordering total (pass a unique
  * tiebreaker after the timestamp) — with ordering ties, which duplicate
  * survives is undefined and cross-run determinism is lost.
  */
object Scd {

  def scd2(log: DataFrame, keyCol: String, orderCols: Seq[String],
      stateCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty && stateCols.nonEmpty,
      "scd2: need at least one order column and one state column")
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val tsCol = orderCols.head
    // A row opens a new episode when any state column differs (null-safe)
    // from the previous row. The first row of a key is tested explicitly
    // (row_number = 1): `state <=> lag(state)` is never NULL, and for an
    // all-NULL first state it is TRUE — a coalesce-on-null guard would
    // silently drop that key's opening episode.
    val changed: Column = stateCols
      .map(c => not(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val episodes = log
      .withColumn("__open", row_number().over(w) === 1 || changed)
      .filter(col("__open"))
    val w2 = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    episodes
      .withColumn("eff_from", col(tsCol))
      .withColumn("eff_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("eff_to").isNull)
      .drop("__open")
  }
}
