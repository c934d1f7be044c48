package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative breadth-first search over an edge DataFrame: minimum hop
  * count from a seed set, bounded by `maxHops`. The graph-traversal
  * operator the reference's routable `ways`/`ways_vertices_pgr` tables
  * exist to serve (`README.md:44-47` builds the graph; traversal is the
  * downstream query) — re-expressed as level-synchronous frontier joins,
  * the standard distributed-BFS shape (Pregel supersteps as DataFrame
  * ops).
  *
  * Scale shape: each level is ONE equi-join of the current frontier
  * against the edge list (shuffle keyed on the node id — at 100 TB,
  * pre-bucket the edges by `src` and every level's join co-locates with
  * zero edge re-shuffle), followed by an anti-join against the visited
  * set so the frontier only ever carries NEW nodes (frontiers shrink as
  * the search saturates; without the anti-join a dense graph re-expands
  * visited nodes every level). The loop carries the DedupCluster
  * checkpoint discipline: the edge list is checkpointed ONCE before the
  * loop (cuts upstream lineage from every level), each level's frontier
  * and visited set are lazily checkpointed (plans stay constant-size;
  * exactly one materializing job per level), and the level-emptiness test
  * rides the same job that materializes the frontier.
  */
object Graph {

  /** @param edges directed edge list; pass both directions for an
    *              undirected graph
    * @return (node, hop) — minimum number of edges from any seed,
    *         seeds at hop 0; nodes unreached within `maxHops` absent
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Seq[Long], maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint()
    var visited = seeds.toDF("node")
      .withColumn("hop", lit(0)).localCheckpoint()
    var frontier = visited
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      frontier = frontier
        .join(e, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("hop", lit(hop))
        .localCheckpoint() // materializes: the loop's one job per level
      visited = visited.union(frontier).localCheckpoint(eager = false)
    }
    visited
  }

  /** Weighted single-source shortest path, bounded to `maxHops` edges —
    * the query the reference builds `ways`/`ways_vertices_pgr` FOR
    * (`README.md:44-47`: the tables exist so pgRouting can run Dijkstra
    * over them). Re-expressed as level-synchronous Bellman-Ford
    * relaxation: after round h, `dist(v)` is exactly the minimum total
    * weight over paths of at most h edges (the classic invariant), so a
    * bounded run is a well-defined operator in itself and an unbounded
    * `maxHops ≥ |V|−1` run converges to true SSSP (the loop exits early
    * the first round nothing improves).
    *
    * Scale shape (same discipline as [[bfsHops]]): one frontier-edges
    * equi-join per round keyed on the node id (pre-bucket edges by `src`
    * at 100 TB for zero edge re-shuffle), a map-side-combinable min per
    * destination, and a min-merge into the running distance table. The
    * frontier carries ONLY improved nodes, so saturated regions drop out
    * of later rounds. Edges are checkpointed once before the loop; each
    * round's frontier is the round's one materializing job (the emptiness
    * test rides it) and the distance table checkpoints lazily.
    *
    * Weights are integer (`long`) by contract: distances stay exact under
    * min/sum on any engine — no float accumulation-order drift between
    * this and a SQL twin (the q72/q47 parity lesson applied to graphs).
    *
    * @param edges directed weighted edge list; pass both directions for
    *              an undirected graph
    * @return (node, dist) — minimum path weight from any seed over paths
    *         of ≤ `maxHops` edges; seeds at 0; unreachable nodes absent
    */
  def weightedSssp(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, seeds: Seq[Long], maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"),
      col(weightCol).cast("long").as("w")).localCheckpoint()
    var dist = seeds.toDF("node")
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = dist
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      // Relax every edge out of the frontier; keep only strict improvements
      // (or first arrivals) so the next frontier shrinks as paths saturate.
      val cand = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("cand"))
        .groupBy("node").agg(min("cand").as("cand"))
      frontier = cand
        .join(dist.withColumnRenamed("dist", "cur"), Seq("node"), "left")
        .filter(col("cur").isNull || col("cand") < col("cur"))
        .select(col("node"), col("cand").as("dist"))
        .localCheckpoint() // materializes: the round's one job
      dist = dist.union(frontier)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(eager = false)
    }
    dist
  }
}
