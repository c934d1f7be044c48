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
}
