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
  * WHY FIXED-k CELLS, not density clustering (HDBSCAN-family), at
  * 100 TB — the deliberate production shape, not an omission:
  *  1. The dedup decision is a LOCAL τ-ball question ("is any neighbor
  *     within cosine ≥ τ"), not a cluster-shape question. Any partition
  *     whose cells are larger than the τ-ball answers it exactly for
  *     in-cell pairs; density estimation buys recall only at CELL
  *     BOUNDARIES, which is a probe-width question (IVF nprobe > 1 /
  *     multi-assignment), not a clustering-algorithm question.
  *  2. Density methods need the k-NN graph — itself the O(n²)-ish
  *     computation this operator exists to avoid; at 1000 executors the
  *     mutual-reachability construction is the bottleneck, and its own
  *     ANN approximation reintroduces exactly the cell structure used
  *     here.
  *  3. Fixed centroids make the at-rest form FROZEN: the incremental
  *     member scores a batch in O(batch · n/k) against persisted cells
  *     with bit-stable semantics (the whole incremental-family
  *     contract). Density re-clustering re-labels the corpus on every
  *     refresh — nothing downstream can be incremental against it.
  *
  * The real operational risk of fixed k is MIS-SIZED CELLS (k too small
  * → a cell's n_c² blows up; k too large → τ-balls straddle borders).
  * That is made observable rather than guessed: [[cellSizeAudit]]
  * reports the exact quadratic cost and the skew BEFORE the self-join
  * runs, and the remedies are both inside the same fixed-k design —
  * raise k / re-fit centroids on a sample (cheap: one IvfIndex.build),
  * or recurse: run [[assign]]+[[dropList]] within an oversized cell with
  * sub-centroids, which composes because the keeper rule (lowest id)
  * is order- and partition-free.
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

  /** Cell-size audit for an [[assign]]ed corpus — the mischosen-k
    * detector (see the object scaladoc): per-cell member counts plus the
    * corpus-level facts a partition planner reads BEFORE paying for the
    * cluster-local self-join: total pair count Σ n_c·(n_c−1)/2 (the
    * exact [[dropList]] join size), the largest cell (the straggler
    * task), and the largest cell's share of all pairs (the skew ratio —
    * near 1.0 means one task IS the job and k must rise or that cell
    * must recurse). One aggregate over n rows; output k+1 rows.
    */
  def cellSizeAudit(assigned: DataFrame): DataFrame =
    assigned.groupBy("cid").agg(count(lit(1)).as("n_c"))
      .select(col("cid"), col("n_c"),
        (col("n_c") * (col("n_c") - 1) / lit(2)).cast("long")
          .as("cell_pairs"))

  /** One-row skew summary of a [[cellSizeAudit]]: the exact total
    * self-join size, the straggler cell, and its share of all pairs.
    */
  def cellSkewSummary(audit: DataFrame): DataFrame =
    audit.agg(
      sum(col("cell_pairs")).as("total_pairs"),
      max(col("n_c")).as("max_cell"),
      graft.syntax.round6z(max(col("cell_pairs")).cast("double") /
        greatest(sum(col("cell_pairs")), lit(1L)).cast("double"))
        .as("max_pair_share"))

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
