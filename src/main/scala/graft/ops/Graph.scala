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
}
