package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-based upsert: the Spark re-expression of the reference's
  * `INSERT … ON CONFLICT (gid) DO UPDATE SET col = excluded.col`
  * (`update_ways_metadata.py:50-54`). No MERGE on OSS parquet, so:
  * full-outer join on the key + per-column `coalesce(new, old)`.
  *
  * Scale notes: both sides shuffle on the key once (sort-merge); if
  * `updates` is small relative to `base`, callers can `broadcast(updates)`.
  * Writing is staged (write temp, swap) by [[Upsert.writeAtomic]].
  */
object Upsert {

  /** Upsert `updates` into `base` by `key`. Columns present only in one
    * side are carried through (null elsewhere). Update wins on conflict.
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val b = base.alias("b")
    val u = updates.alias("u")
    val joined = b.join(u, col(s"b.$key") === col(s"u.$key"), "full_outer")
    val baseCols = base.columns.toSet
    val updCols = updates.columns.toSet
    val outCols = (base.columns ++ updates.columns.filterNot(baseCols)).toSeq
    val projected = outCols.map {
      case k if k == key => coalesce(col(s"u.$key"), col(s"b.$key")).as(key)
      case c if baseCols(c) && updCols(c) => coalesce(col(s"u.$c"), col(s"b.$c")).as(c)
      case c if updCols(c) => col(s"u.$c").as(c)
      case c => col(s"b.$c").as(c)
    }
    joined.select(projected: _*)
  }

  /** Atomic-as-possible overwrite: write to `<path>.staging`, rename the
    * old table aside to `<path>.old`, swap the staging dir in, then drop
    * the old copy. Readers never observe a *partial* table; on a local or
    * HDFS filesystem (atomic directory rename, single writer) the target
    * either holds the old or the new complete table at every instant, and
    * a crash mid-swap leaves `<path>.old` for manual recovery instead of
    * losing data. Object stores without atomic rename need a manifest
    * commit protocol instead — out of scope here; this helper is for the
    * local/HDFS single-writer case.
    */
  def writeAtomic(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
    val staging = new org.apache.hadoop.fs.Path(path + ".staging")
    val target = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    df.write.mode("overwrite").parquet(staging.toString)
    if (fs.exists(old)) fs.delete(old, true)
    val hadPrior = fs.exists(target)
    if (hadPrior && !fs.rename(target, old))
      throw new java.io.IOException(s"writeAtomic: could not move $target aside")
    if (!fs.rename(staging, target)) {
      // Swap failed: put the previous table back before erroring out.
      if (hadPrior) fs.rename(old, target)
      throw new java.io.IOException(s"writeAtomic: could not move $staging into place")
    }
    if (hadPrior) fs.delete(old, true)
  }
}
