package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional storage clustering: Morton (Z-order) values and a
  * z-clustered parquet writer.
  *
  * Why at 100 TB: partitioning prunes ONE dimension; a z-clustered layout
  * makes parquet min/max stats tight on BOTH key columns at once, so scans
  * filtering either (or both) keys skip most files/row-groups. This is the
  * quadkey ordering of the reference's tile pyramid (interleaving tile
  * x/y bits — `dataproviders.py:15`'s zoom-12 grid) generalized to any
  * two integer keys.
  *
  * The interleave is the magic-mask bit-spread — five shift/or/and rounds,
  * all built-in column ops, so it stays inside whole-stage codegen and has
  * an exact DuckDB twin ([[StorageLayout.spreadSql]]). Precondition:
  * inputs in [0, 2^31) (sufficient for tile coords to zoom 15 and for all
  * synthetic keys); out-of-range inputs interleave garbage, they don't
  * throw.
  */
object StorageLayout {

  private val masks: Seq[(Int, Long)] = Seq(
    (16, 0x0000FFFF0000FFFFL),
    (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL),
    (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** Spread the low 32 bits of `c` so bit i lands at position 2i. */
  def spread(c: Column): Column =
    masks.foldLeft(c.cast("long")) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** Morton z-value: x's bits at even positions, y's at odd. */
  def zValue(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** The identical spread chain as DuckDB SQL text (for oracle twins). */
  def spreadSql(e: String): String =
    masks.foldLeft(s"CAST(($e) AS BIGINT)") { case (acc, (s, m)) =>
      s"((($acc) | (($acc) << $s)) & $m)"
    }

  def zValueSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Write `df` as parquet z-clustered on (`xCol`, `yCol`): range-partition
    * by z-value into `files` output files and sort inside each — one pass,
    * one shuffle, no global sort. Range boundaries come from Spark's
    * reservoir sample of z-values, so file sizes stay balanced even when
    * the key distribution is skewed.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
      files: Int): Unit = {
    df.withColumn("__z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert curve index of (`x`, `y`) at `order` bits per axis — the
    * locality-preserving upgrade over [[zValue]]: consecutive indices
    * are always Manhattan-adjacent cells, so a 2-D range scan over a
    * Hilbert-clustered layout touches fewer files than over the Z
    * curve's power-of-two diagonal jumps. A codegen'd native expression
    * ([[graft.functions.HilbertIndex]]) — `order` integer iterations
    * inside whole-stage codegen, no per-row object.
    */
  def hilbertValue(x: Column, y: Column, order: Int = 16): Column =
    graft.functions.HilbertIndex(x.cast("long"), y.cast("long"), order)

  /** Write `df` parquet Hilbert-clustered on (`xCol`, `yCol`) — same
    * one-shuffle range-partition + in-file sort shape as [[zorderWrite]],
    * on the better curve.
    */
  def hilbertWrite(df: DataFrame, xCol: String, yCol: String, path: String,
      files: Int, order: Int = 16): Unit = {
    df.withColumn("__h", hilbertValue(col(xCol), col(yCol), order))
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** Rendezvous (highest-random-weight) shard assignment: a row's shard is
    * `argmax_s hash(id, s)`. The property modulo hashing can't give:
    * growing `shards` → `shards+1` moves only ~1/(shards+1) of rows (each
    * row moves only if the NEW shard wins its argmax), where `pmod(hash,
    * shards)` reshuffles essentially everything. That is the difference
    * between re-encoding an exabyte corpus and topping up one shard when
    * a dataset outgrows its file count.
    *
    * All codegen'd column math: `shards` (hash, shard) structs in an
    * `array_max` (lexicographic struct compare; the shard id tiebreak is
    * deterministic). The portable md5-digit hash keeps the DuckDB twin
    * exact; a production deployment swaps in xxhash64 for throughput —
    * same argmax shape. Cost is O(shards) hashes per row, the standard
    * rendezvous trade; for file-count-scale fan-outs (tens to hundreds)
    * that is a handful of ns-scale hashes inside the scan.
    */
  def rendezvousShard(id: Column, shards: Int): Column = {
    require(shards > 0 && shards <= 1024,
      s"rendezvousShard: shards=$shards outside (0, 1024]")
    val entries = (0 until shards).map { s =>
      struct(
        graft.ext.TextHash.tokenHash(
          concat(id.cast("string"), lit("#"), lit(s.toString))).as("h"),
        lit(s.toLong).as("s"))
    }
    array_max(array(entries: _*)).getField("s")
  }

  /** DuckDB twin of [[rendezvousShard]]. */
  def rendezvousShardSql(e: String, shards: Int): String = {
    val items = (0 until shards).map { s =>
      val h = graft.ext.TextHash.tokenHashSql(
        s"CAST($e AS VARCHAR) || '#' || '$s'")
      s"{'h': $h, 's': CAST($s AS BIGINT)}"
    }.mkString(", ")
    s"list_max([$items])['s']"
  }
}
