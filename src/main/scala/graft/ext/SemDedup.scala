package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication, SemDeDup-style: cluster the
  * corpus around centroids, then deduplicate WITHIN each cluster — near
  * neighbors in embedding space land in the same cluster, so the O(n²)
  * all-pairs comparison shrinks to O(Σ n_c²) ≈ n²/k without losing the
  * high-similarity pairs the global scan would find.
  *
  * That restriction is the whole 100 TB story: global [[Similarity
  * .nearDupPairs]] is quadratic in the corpus; cluster-local pairs are
  * quadratic only in the cluster, the clusters compare in parallel, and
  * the self-join's shuffle is keyed by the (tiny) cluster id. Centroids
  * come from the caller — [[IvfIndex.build]]'s k-means for real corpora, a
  * deterministic seed set for oracle-checked tests.
  *
  * All vector math runs through the native codegen'd dot product; scores
  * are rounded to 6 before every comparison/ordering so results are
  * engine-stable (the q47/q48 ulp lesson).
  */
object SemDedup {

  /** Nearest-centroid assignment by rounded cosine (centroid id as
    * tiebreak). `centroids` must have columns `cid`, `cv` (array<double>)
    * and is broadcast — assignment is one codegen'd pass over the corpus
    * plus a per-vector window over k candidate rows (shuffle keyed by the
    * vector id, each group exactly k rows). Output: vid, v, nrm, cid.
    */
  def assign(emb: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame): DataFrame = {
    val e = emb
      .select(col(idCol).as("vid"), Similarity.asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    val c = centroids
      .withColumn("cnrm", sqrt(Similarity.dot(col("cv"), col("cv"))))
    val w = Window.partitionBy("vid").orderBy(desc("cs"), col("cid"))
    e.crossJoin(broadcast(c))
      .select(col("vid"), col("v"), col("nrm"), col("cid"),
        round(Similarity.dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")),
          6).as("cs"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("vid", "v", "nrm", "cid")
  }

  /** SemDeDup drop list over an [[assign]]ed corpus: vector `b` is dropped
    * when some same-cluster vector `a < b` has rounded cosine ≥
    * `threshold` (keep-lowest-id, the deterministic keeper rule). Output
    * per dropped id: its keeper (smallest qualifying `a`) and how many
    * near-duplicates implicated it.
    */
  def dropList(assigned: DataFrame, threshold: Double): DataFrame =
    assigned.alias("x")
      .join(assigned.alias("y"),
        col("x.cid") === col("y.cid") && col("x.vid") < col("y.vid"))
      .select(col("y.vid").as("dropped"), col("x.vid").as("a_id"),
        round(Similarity.dot(col("x.v"), col("y.v")) /
          (col("x.nrm") * col("y.nrm")), 6).as("cos_r"))
      .filter(col("cos_r") >= threshold)
      .groupBy("dropped")
      .agg(min(col("a_id")).as("keeper"), count(lit(1)).as("n_sim"))

  /** INCREMENTAL SemDeDup — the semantic member of the incremental-ingest
    * family (exact Jaccard [[Dedup.incrementalJaccardJoin]], simhash
    * [[Dedup.incrementalSimHash64Pairs]], chunk
    * [[Chunker.incrementalDedupChunks]]): an arriving batch is scored
    * against a FROZEN corpus in embedding space, O(batch · n/k), with no
    * corpus rescan and no retraining.
    *
    * `corpusAssigned` is the persisted output of [[assign]] over the
    * corpus (vid, v, nrm, cid — the at-rest form; centroids stay frozen,
    * same contract as [[IvfPq.encodeBatch]]). The batch assigns against
    * the SAME broadcast centroids, then one equi-join on `cid` compares
    * each batch vector only with its cluster's corpus members. A batch
    * vector is dropped when ANY corpus member reaches rounded cosine ≥
    * `threshold` — no id ordering (the corpus is always the keeper side,
    * arrival order wins, exactly the [[Chunker.incrementalDedupChunks]]
    * rule). Output per dropped batch id: the smallest qualifying corpus
    * id and the number of corpus near-duplicates.
    *
    * At 100 TB the corpus side is hive-partitioned by `cid` (the
    * [[IndexStore]] IVF pattern), so the join's shuffle prunes to the
    * cells the batch actually touches; the batch side carries k rows per
    * vector through one broadcast cross + window, never a corpus scan.
    */
  def incrementalDropList(corpusAssigned: DataFrame, batch: DataFrame,
      vecCol: String, idCol: String, centroids: DataFrame,
      threshold: Double): DataFrame =
    assign(batch, vecCol, idCol, centroids).alias("x")
      .join(corpusAssigned.alias("y"), col("x.cid") === col("y.cid"))
      .select(col("x.vid").as("dropped"), col("y.vid").as("c_id"),
        round(Similarity.dot(col("x.v"), col("y.v")) /
          (col("x.nrm") * col("y.nrm")), 6).as("cos_r"))
      .filter(col("cos_r") >= threshold)
      .groupBy("dropped")
      .agg(min(col("c_id")).as("keeper"), count(lit(1)).as("n_sim"))
}
