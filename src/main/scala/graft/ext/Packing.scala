package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing: assign documents to fixed-budget training
  * shards in a deterministic order. A document's shard is
  * `floor(starting_token_offset / budget)` where the starting offset is
  * the running token total of all earlier documents in its group — i.e.
  * documents are laid end-to-end and cut every `budget` tokens
  * (offset-based sharding; a document may straddle a cut, which the
  * training-time chunker resolves).
  *
  * Scale design: packing is one window aggregate partitioned by the group
  * column (source/language shard family) — a single shuffle on the group
  * key, each group packed independently in parallel. A global (ungrouped)
  * pack would serialize 100 TB through one partition; per-group packing is
  * the distributed formulation, and group boundaries are also the natural
  * mixture boundaries for training-data recipes.
  */
object Packing {

  /** Adds `n_tok` and `shard` to `df`. Order within a group is by `idCol`
    * (must be unique per group for determinism).
    */
  def packShards(df: DataFrame, idCol: String, groupCol: String,
      nTok: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tok", nTok)
      .withColumn("shard",
        ((sum(col("n_tok")).over(w) - col("n_tok")) / lit(budget))
          .cast("long"))
  }

  /** Rank-ordered top-k concatenation per group — the context-assembly
    * step of a retrieval (RAG) pipeline: the k best payloads of each
    * group, joined in rank order into one string. `order` must end in a
    * total-order tiebreak (engine-stable ranking).
    *
    * Scale: `row_number() <= k` plans a partial WindowGroupLimit BEFORE
    * the exchange (only k·groups rows shuffle), and the collected array is
    * bounded by k — the interpreted per-group lambda touches k elements,
    * never the corpus. Output: groupCol, `n_items`, `packed`.
    */
  def topKConcat(df: DataFrame, groupCol: String, order: Seq[Column],
      payload: Column, k: Int, sep: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(order: _*)
    df.withColumn("__p", payload)
      .withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= k)
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_items"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__rnk").as("r"),
              col("__p").as("p")))),
            x => x.getField("p")),
          sep).as("packed"))
  }
}
