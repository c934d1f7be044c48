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

  /** GPT-style concat-and-chop SEQUENCE packing: lay the whole corpus
    * end-to-end in a deterministic pseudo-random order, chop the token
    * stream every `ctxLen` tokens, and report where each document landed —
    * `(id, n_tokens, tok_offset, seq_first, seq_last)` with
    * `seq = offset div ctxLen`. A doc whose span crosses a cut appears in
    * `seq_last − seq_first + 1` consecutive sequences (the training-time
    * loader's attention-mask reset points). The shuffle order is
    * `(h mod nBuckets, h, id)` with `h` the engine-portable id hash —
    * decorrelated from source/crawl order, reproducible across runs and
    * engines.
    *
    * Scale design: the global running token total is a TWO-PHASE cumsum —
    * per-bucket totals (`nBuckets` rows) prefix-summed into base offsets
    * on a relation whose size is the bucket count, then one window
    * partitioned BY BUCKET adds the local prefix. No single-partition
    * window ever sees the corpus; the only corpus-scale exchange is the
    * hash-bucket shuffle itself. `nBuckets` bounds window-partition size:
    * size it so corpus/nBuckets rows fit an executor (65536 at 100 TB).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      ctxLen: Long, nBuckets: Int = 256): DataFrame = {
    val base = df.select(
      col(idCol),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"),
      TextHash.tokenHash(col(idCol).cast("string")).as("__h"))
      .withColumn("__b", pmod(col("__h"), lit(nBuckets.toLong)))
    // Phase 1: bucket totals → exclusive base offsets. nBuckets rows — the
    // single-partition window is over the BUCKET COUNT, never the corpus.
    val bases = base.groupBy("__b")
      .agg(sum(col("n_tokens")).as("__bt"))
      .withColumn("__base",
        coalesce(sum(col("__bt")).over(
          Window.orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__base"))
    // Phase 2: local exclusive prefix within each bucket (parallel), plus
    // the broadcast base.
    val wLoc = Window.partitionBy("__b").orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(bases), "__b")
      .withColumn("tok_offset",
        col("__base") + sum(col("n_tokens")).over(wLoc) - col("n_tokens"))
      .select(
        // Integer `div`, never `/`: float division re-rounds past 2^53
        // tokens and Spark/DuckDB disagree on the cast rounding mode.
        col(idCol), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset div ${ctxLen}L").as("seq_first"),
        expr(s"(tok_offset + greatest(n_tokens, 1L) - 1L) div ${ctxLen}L")
          .as("seq_last"))
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
