package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot change-data-capture: classify every key of two table
  * snapshots as inserted / deleted / updated / unchanged. The batch
  * complement of the join-upsert sink ([[Upsert]]): upsert *applies*
  * changes, this *derives* them — the pattern feeding incremental
  * downstream recomputation at 100 TB (process only `change != 'same'`).
  *
  * One full-outer sort-merge join on the key (both sides shuffle once);
  * column comparison is null-safe (`<=>`) so a value moving to/from NULL
  * counts as an update.
  */
object Cdc {

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    val o = oldDf.alias("o")
    val n = newDf.alias("n")
    val changed: Column = compareCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, col(s"o.$key") === col(s"n.$key"), "full_outer")
      .select(
        coalesce(col(s"n.$key"), col(s"o.$key")).as(key),
        when(col(s"o.$key").isNull, "insert")
          .when(col(s"n.$key").isNull, "delete")
          .when(changed, "update")
          .otherwise("same").as("change"))
  }
}
