package graft
import org.apache.spark.sql.SparkSession

/** Shared session tuning for the runtime mains (Bench / QBench / Verify /
  * PlanDump / Soak). One knob, scale-neutral, env-parameterised:
  *
  * `spark.sql.adaptive.coalescePartitions.minPartitionSize` (default 1m)
  * is lowered to 64k (`SPARK_GRAFT_AQE_MIN_PARTITION` overrides). With
  * `parallelismFirst` (the AQE default) the post-shuffle coalesce target is
  * `max(totalShuffleBytes / parallelism, minPartitionSize)`, so on BIG
  * shuffles the first term dominates and this floor is inert — at 100 TB
  * the setting changes nothing. It binds only when a shuffle's compressed
  * bytes are small (< parallelism · 1 MB): exactly the register's
  * candidate-pair / distinct exchanges, whose 16-byte long-pair rows
  * compress so well that AQE's 1 MB floor coalesced CPU-bound aggregation
  * stages down to a handful of tasks on a 32-core box. Measured (sf0.1,
  * min-of-2 noop runs, Profile16 A/B in-session):
  *
  *   - candidate distinct (5.9 M raw → 3.5 M pairs): 4.3 s → 0.87 s
  *     (identical to coalescing disabled outright — the floor IS the
  *     mechanism, nothing else in AQE was hurting)
  *   - jaccardSimilarityJoin from built index:       4.8 s → 1.9 s
  *   - cosineSimilarityJoin from built index:        7.0 s → 3.4 s
  *
  * Coalescing itself stays ON (disabling it is the local-only hack this
  * deliberately is not): small-file writes, skew splitting, and the big-
  * shuffle behaviour are untouched.
  */
object Sessions {
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
}
