package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE vocabulary induction (Sennrich et al. ACL'16) — the real merge
  * loop, not the regex stand-in ([[TextAnalysis.bpeishTokenCount]]): learn
  * the top-k adjacent-symbol merges from the corpus, greedily, highest
  * pair count first.
  *
  * The scale trick is the classic one: train on the DISTINCT-WORD
  * frequency table, not the token stream. The corpus contributes exactly
  * one pass (tokenize → word counts, one shuffle); every merge round then
  * runs on the vocab-sized relation (|distinct words| rows — thousands to
  * low millions at 100 TB, each a short symbol string), so the loop's cost
  * is O(k · vocab), independent of corpus size. Each round is one
  * aggregate (pair counts weighted by word frequency), one bounded
  * `limit(1).collect()` (the argmax — a single row by construction), and
  * one codegen'd `replace` projection; the vocab frame is eagerly
  * checkpointed per round so the replace chain never deepens (the
  * CC-loop lineage discipline).
  *
  * Symbols ride a single space-separated string (" a b c "), padded so a
  * merge is one literal non-overlapping left-to-right `replace(" a b ")`
  * — which is exactly BPE's left-to-right non-overlapping application
  * order. Ties on pair count break by (s1, s2) lexicographically for
  * engine-stable determinism.
  */
object Bpe {

  /** One corpus pass: distinct words with frequencies, symbols initialized
    * to characters. Output: (sym = " c h a r s ", f).
    */
  def initialVocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .select(
        concat(lit(" "), array_join(split(col("w"), ""), " "), lit(" "))
          .as("sym"),
        col("f"))

  /** Adjacent-symbol pair counts over a (sym, f) vocab, weighted by word
    * frequency: the per-round aggregate of the merge loop. Vocab-sized
    * input, so the higher-order transform here is bounded work per row
    * (symbols per word), never per corpus token.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("f"), split(trim(col("sym")), " ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("f"), explode(
        transform(sequence(lit(0), size(col("a")) - 2),
          i => struct(
            element_at(col("a"), i + 1).as("s1"),
            element_at(col("a"), i + 2).as("s2")))).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(sum("f").as("cnt"))

  /** Learn the top `k` merges. Returns (rank, s1, s2, merged, cnt) in
    * merge order; stops early if the vocab runs out of pairs.
    */
  def train(docs: DataFrame, textCol: String, k: Int): DataFrame =
    trainFromVocab(initialVocab(docs, textCol), k)

  /** The merge loop over ANY (sym, f) initial vocab — the shared core
    * of char-level [[train]] and byte-level [[ByteBpe.train]] (the two
    * differ only in how a word becomes its base symbols).
    */
  def trainFromVocab(vocab0: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"Bpe.train: k=$k")
    val spark = vocab0.sparkSession
    var vocab = vocab0.localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var exhausted = false
    var r = 1
    while (r <= k && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(desc("cnt"), col("s1"), col("s2")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (s1, s2, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, s1, s2, s1 + s2, cnt))
        // TWO replace passes = exact left-to-right non-overlapping BPE
        // application. A single pass misses alternate occurrences in a
        // run (" a b a b ": the first match consumes the shared middle
        // space, hiding the second occurrence's leading space). Misses
        // are never adjacent — a miss happens only directly after a
        // match, whose replacement " s1s2 " ends in a space — so every
        // missed occurrence is space-flanked again in pass two, and
        // merging cannot create new occurrences (patterns are
        // space-delimited whole symbols). Hence exactly two passes.
        val (pat, rep) = (lit(s" $s1 $s2 "), lit(s" $s1$s2 "))
        // LAZY checkpoint (round 17, the DedupCluster CC-loop rule): it
        // still cuts lineage (each round's plan is one double-replace
        // over the previous round's cached blocks) but materializes as
        // part of the NEXT round's pairCounts job — one job per merge
        // round instead of two (the eager form paid k extra job floors).
        vocab = vocab
          .withColumn("sym", replace(replace(col("sym"), pat, rep), pat, rep))
          .localCheckpoint(eager = false)
        r += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "s1", "s2", "merged", "cnt")
  }

  /** Apply a learned merge list to a (sym, …) vocab relation, in merge
    * order — the ENCODE side of BPE, same two-pass-replace application as
    * training (so encode ∘ train is self-consistent). Vocab-sized work;
    * the projection chain is cut every 8 merges so codegen never sees an
    * unboundedly deep replace tree.
    */
  def applyMerges(vocab: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.zipWithIndex.foldLeft(vocab) { case (v, ((s1, s2), i)) =>
      val (pat, rep) = (lit(s" $s1 $s2 "), lit(s" $s1$s2 "))
      val out = v.withColumn("sym",
        replace(replace(col("sym"), pat, rep), pat, rep))
      if ((i + 1) % 8 == 0) out.localCheckpoint() else out
    }

  /** Tokenize the corpus under a learned merge list: per document, the
    * BPE token count (and word count). The corpus-scale side is two
    * narrow passes (explode + join + aggregate); the merge application
    * runs once on the distinct-word table and joins back as an
    * aggregated build side — the same skew-capped shape as the
    * boilerplate-line dedup.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col(idCol),
      explode(Dedup.tokens(col(textCol))).as("w"))
    val enc = applyMerges(
      words.groupBy("w").agg(count(lit(1)).as("f"))
        .select(col("w"),
          concat(lit(" "), array_join(split(col("w"), ""), " "), lit(" "))
            .as("sym")),
      merges)
      .select(col("w"), size(split(trim(col("sym")), " ")).as("__n_sym"))
    words.join(enc, "w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(col("__n_sym")).as("n_bpe_tokens"))
  }
}
