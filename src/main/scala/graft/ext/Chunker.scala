package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document chunking for retrieval/training pipelines: fixed word-window
  * chunks (the RAG ingestion primitive) and chunk-granularity exact
  * deduplication with ordered reassembly (the C4/CCNet move — drop the
  * boilerplate paragraph every crawl page repeats, keep the document).
  *
  * Both are fully relational: the word array is built once per document by
  * a codegen'd `split`, chunk starts come from `explode(sequence(...))`,
  * and each chunk is a codegen'd `slice` + `array_join` — no per-token
  * higher-order functions in the corpus-scale path (CLAUDE.md: HOFs are
  * interpreted and re-inline their subtrees). The only shuffles are the
  * ones the semantics require: none for [[chunk]] (a pure flatMap shape —
  * at 100 TB it pipelines inside the scan stage), and for [[dedupChunks]]
  * one hash exchange on the chunk text (the dedup key) plus one on the
  * document id (the reassembly key).
  */
object Chunker {

  /** Overlapping fixed-size word windows: one row per (document, start)
    * with `start ∈ {0, stride, 2·stride, …} ∩ [0, n_words)`, each chunk
    * the `width`-word slice at `start` (the trailing chunks are shorter —
    * every word is covered, nothing is dropped; `chunk_idx` =
    * `start / stride`). Whitespace tokenization, single-space joins —
    * the same token stream as the dedup/similarity family.
    *
    * Scale: narrow transform only (split → explode(sequence) → slice).
    * Output is ~`n/stride` rows per doc; there is no shuffle, so the
    * chunker runs at scan speed and composes with any downstream
    * embedding/indexing stage.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      s"need 0 < stride <= width (got width=$width stride=$stride)")
    docs
      .select(col(idCol), split(col(textCol), " ").as("__w"))
      .select(col(idCol), col("__w"), size(col("__w")).as("__n"))
      .select(col(idCol), col("__w"), col("__n"),
        explode(sequence(lit(0), greatest(col("__n") - 1, lit(0)),
          lit(stride))).as("__s"))
      .select(
        col(idCol),
        (col("__s") / stride).cast("long").as("chunk_idx"),
        col("__s").cast("long").as("chunk_start"),
        least(lit(width), col("__n") - col("__s")).cast("long")
          .as("chunk_words"),
        array_join(slice(col("__w"), col("__s") + 1, lit(width)), " ")
          .as("chunk_text"))
  }

  /** Chunk-granularity EXACT corpus deduplication with reassembly: split
    * every document into non-overlapping `width`-word chunks, keep only
    * the corpus-wide FIRST occurrence of each distinct chunk text (first =
    * smallest (id, chunk_idx) — deterministic and engine-portable), and
    * re-join each document's surviving chunks in original order. A
    * document that was entirely boilerplate comes back empty rather than
    * disappearing — the caller decides the drop threshold.
    *
    * Output: (idCol, n_chunks, n_kept, dedup_text).
    *
    * Scale: one `row_number` window partitioned by chunk text (the Spark 4
    * partial WindowGroupLimit shape does NOT apply — every row needs its
    * rank — but the partition key is the high-cardinality chunk text, so
    * the exchange is balanced; a hot boilerplate chunk is exactly the
    * thing being deduplicated and still only needs its min, which AQE skew
    * handling splits fine), then one groupBy on the id for reassembly.
    * The per-document reassembly sort runs over ~n_words/width elements —
    * the one place a higher-order `transform` is acceptable (bounded,
    * per-group, not per-token).
    */
  def dedupChunks(docs: DataFrame, idCol: String, textCol: String,
      width: Int): DataFrame = {
    val chunks = chunk(docs, idCol, textCol, width, width)
    val firstW = Window.partitionBy(col("chunk_text"))
      .orderBy(col(idCol), col("chunk_idx"))
    reassemble(
      chunks.withColumn("__keep", row_number().over(firstW) === 1), idCol)
  }

  /** Incremental [[dedupChunks]]: arriving batch documents deduplicated
    * against a FROZEN corpus at chunk granularity — arrival order wins,
    * so ANY corpus occurrence of a chunk text (kept or itself deduped)
    * suppresses the batch copy, and within the batch the usual
    * min (id, chunk_idx) first-occurrence rule applies. The chunk member
    * of the incremental family (q112 exact Jaccard, q113 containment,
    * q114 cosine, q117 simhash): O(batch) probe work — the corpus
    * contributes one distinct-chunk-text relation, built once and
    * reusable across batches.
    *
    * Scale: the corpus side reduces to its distinct chunk texts (a
    * build-once, persistable relation); the probe is one left join of
    * batch chunks against it plus the batch-internal first-occurrence
    * window. No corpus re-shuffle per batch.
    */
  def incrementalDedupChunks(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, width: Int): DataFrame = {
    val seen = chunk(corpus, idCol, textCol, width, width)
      .select(col("chunk_text")).distinct()
      .withColumn("__seen", lit(true))
    val firstW = Window.partitionBy(col("chunk_text"))
      .orderBy(col(idCol), col("chunk_idx"))
    val marked = chunk(batch, idCol, textCol, width, width)
      .join(seen, Seq("chunk_text"), "left")
      .withColumn("__keep",
        col("__seen").isNull && row_number().over(firstW) === 1)
    reassemble(marked, idCol)
  }

  /** Shared reassembly tail: per document, count chunks, count survivors,
    * and join the surviving chunk texts back in `chunk_idx` order. The
    * higher-order `transform` runs over ~n_words/width elements per group
    * — bounded, not per-token.
    */
  private def reassemble(marked: DataFrame, idCol: String): DataFrame =
    marked
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("__keep").cast("long")).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__keep"),
              struct(col("chunk_idx"), col("chunk_text"))))),
            x => x.getField("chunk_text")),
          " ").as("dedup_text"))
}
