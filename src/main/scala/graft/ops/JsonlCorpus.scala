package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL corpus interchange — the lingua franca of LLM training data
  * (one JSON object per line, gzip-splittable at the file level, the
  * format crawl dumps and curation handoffs actually ship in).
  *
  * Scale rules baked in rather than documented-and-forgotten:
  * - Reads take an EXPLICIT schema. Schema inference is a full extra
  *   pass over 100 TB before the first real job; with a schema the scan
  *   is single-pass and malformed lines land in the standard
  *   `_corrupt_record` / PERMISSIVE behavior instead of poisoning
  *   inference.
  * - Writes shard explicitly (`repartition(shards)`) so file count is a
  *   stated choice (downstream loaders parallelize by file), not
  *   whatever the upstream partitioning happened to be.
  */
object JsonlCorpus {

  /** Write `df` as `shards` JSONL part-files under `path`. */
  def write(df: DataFrame, path: String, shards: Int): Unit =
    df.repartition(shards).write.mode("overwrite").json(path)

  /** Read a JSONL corpus with an explicit schema (never inference). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
