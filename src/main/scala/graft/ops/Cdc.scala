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
  *
  * PRECONDITION: `key` must be unique within each snapshot (same
  * single-row-per-key contract as [[Upsert]]). With duplicate keys the
  * full-outer join fans out and one key is emitted multiple times with
  * possibly contradictory labels. Dedup upstream
  * (`df.dropDuplicates(key)` or a last-writer-wins window) if the
  * snapshots can carry duplicates; [[assertUniqueKey]] is the cheap
  * debug-mode check and `CdcSpec` asserts both the guard and the
  * fan-out it protects against.
  */
object Cdc {

  /** Cheap precondition check for [[snapshotDiff]]/[[Upsert]]: one
    * aggregation pass; throws with the worst offender if any key is
    * duplicated. Run it in tests / debug pipelines, not per production
    * batch (it is a full extra scan of the snapshot).
    */
  def assertUniqueKey(df: DataFrame, key: String): Unit = {
    val dup = df.groupBy(key).count().filter(col("count") > 1)
      .orderBy(col("count").desc).limit(1).collect()
    require(dup.isEmpty,
      s"snapshot key '$key' is not unique: key ${dup.head.get(0)} has " +
        s"${dup.head.getLong(1)} rows (snapshotDiff/upsert require one)")
  }

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
