package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextHash

/** Shard manifests: the dataset-card side of the sharded-writer family
  * (q43 pack shards, q133 rendezvous shards). A training corpus that ships
  * as N shard files needs a reproducible per-shard manifest — row count,
  * token and char totals, id range, and an ORDER-FREE content checksum —
  * so a consumer can verify a shard without re-reading its neighbors and
  * a re-run of the pipeline can prove it produced the same bytes.
  *
  * The checksum is a sum of per-row fingerprints mod P (1e9+7): addition
  * commutes, so the checksum is independent of row order within the shard
  * (shard files are written by parallel tasks — order is NOT stable) and
  * map-side combinable. Per-row fingerprint `(tokenHash(text) · 2654435761
  * + doc_id) mod P` keeps every intermediate below 2^63 (1e8 · 2.7e9 ≈
  * 2.7e17), so the arithmetic is plain BIGINT on both engines — no
  * wrapping tricks; the mod-P residue sum stays exact to ~9e9 rows per
  * shard. Everything is codegen'd column math over one scan + one
  * group-by.
  */
object Manifest {

  val P: Long = TextHash.P // 1e9+7
  private val Mix = 2654435761L // Knuth multiplicative constant

  /** Per-row order-free fingerprint residue in [0, P). */
  private def rowFp(idCol: String, textCol: String) =
    (TextHash.tokenHash(col(textCol)) * lit(Mix) + col(idCol)) % lit(P)

  /** The manifest of `df` sharded by rendezvous assignment of `idCol`
    * into `shards`: one row per shard with counts, totals, id range and
    * the order-free checksum.
    */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
      shards: Int): DataFrame =
    df.select(
      StorageLayout.rendezvousShard(col(idCol), shards).as("shard"),
      col(idCol).as("__id"),
      size(split(col(textCol), " ")).cast("long").as("__tok"),
      length(col(textCol)).cast("long").as("__chr"),
      rowFp(idCol, textCol).as("__fp"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__tok").as("n_tokens"),
        sum("__chr").as("n_chars"),
        min("__id").as("min_id"),
        max("__id").as("max_id"),
        (sum("__fp") % lit(P)).as("checksum"))

  /** Merge two manifest tables into the manifest of the combined data —
    * the INCREMENTAL member the additive design was built for: counts
    * and totals add, id ranges combine, and the mod-P checksum ADDS
    * (the per-row fingerprint sum commutes and associates), so
    * `merge(manifest(A), manifest(B)) == manifest(A ∪ B)` EXACTLY (the
    * q217 certificate) and an appended batch costs O(batch + shards),
    * never a corpus re-read. Caller contract: both sides sharded by the
    * same `shards` count and disjoint row sets (a replayed row would
    * double-count — the ST26 sink guards replays by batch id).
    * Residues stay in [0, P) so the summed residues of any practical
    * number of shards/merges fit a long with room to spare.
    */
  def mergeManifests(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("shard")
      .agg(
        sum("n_docs").as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        min("min_id").as("min_id"),
        max("max_id").as("max_id"),
        (sum("checksum") % lit(P)).as("checksum"))

  /** DuckDB twin of [[shardManifest]] over the `documents` table. */
  def shardManifestSql(shards: Int): String = {
    val fp =
      s"(${TextHash.tokenHashSql("text")} * $Mix + doc_id) % $P"
    s"""SELECT ${StorageLayout.rendezvousShardSql("doc_id", shards)} AS shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               CAST(sum(length(text)) AS BIGINT) AS n_chars,
               min(doc_id) AS min_id,
               max(doc_id) AS max_id,
               CAST(sum($fp) % $P AS BIGINT) AS checksum
        FROM documents GROUP BY 1"""
  }
}
