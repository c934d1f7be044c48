package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, IntegerType, StringType}

/** Semi-join reduction with a Bloom filter (SURVEY §4 shuffle-minimization):
  * when joining a huge probe side against a selective build side, first
  * drop probe rows whose key cannot possibly match, using a broadcast
  * Bloom filter of the build keys — the probe shuffle then carries only
  * (matches + fpp·misses) instead of everything. At 100 TB this is the
  * difference between shuffling a full fact table and shuffling the ~1%
  * that survives.
  *
  * (Spark's AQE has an injected-bloom variant for some shapes —
  * spark.sql.optimizer.runtimeFilter.bloomFilter.enabled — this operator
  * makes the reduction explicit and composable with any downstream join.)
  */
object BloomJoin {

  /** `probe ⋈ build` on `key`, probe pre-filtered by a Bloom filter of
    * build's keys. Result is row-identical to the plain join (Bloom has
    * no false negatives; false positives are removed by the join itself).
    */
  def bloomFilteredJoin(probe: DataFrame, build: DataFrame, key: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(key, expectedKeys, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bf)
    val keep = probe.schema(key).dataType match {
      case LongType | IntegerType =>
        udf((k: Long) => bc.value.mightContainLong(k))
      case StringType =>
        udf((k: String) => k != null && bc.value.mightContainString(k))
      case other =>
        throw new IllegalArgumentException(s"bloom key type $other")
    }
    probe.filter(keep(col(key))).join(build, Seq(key))
  }
}
