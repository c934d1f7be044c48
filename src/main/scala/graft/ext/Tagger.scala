package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-pattern dictionary tagging — the blocklist / topic-lexicon scan
  * every crawl-curation pipeline runs before training (bad-word
  * filtering, topic routing, license-string detection).
  *
  * SEMANTICS (both implementations, pinned): for each pattern
  * INDEPENDENTLY, the count of LEFTMOST NON-OVERLAPPING occurrences —
  * exactly Java's `indexOf`-then-skip-`len` loop, and exactly what
  * `(length(t) - length(replace(t, p, ''))) / length(p)` computes in any
  * SQL dialect (`replace` is greedy left-to-right non-overlapping in
  * Spark, DuckDB, and the JDK alike). Distinct patterns never mask each
  * other — "panama" scores both "pan" and "ana" (at offset 3).
  *
  * Two execution shapes:
  *  - [[tagCountsScan]]: relational — broadcast the dictionary, count by
  *    the replace length-diff. Fully codegen'd (no UDF), but each doc is
  *    scanned once PER PATTERN: O(|corpus|·m).
  *  - [[tagCountsAuto]]: one Aho-Corasick automaton pass per doc for the
  *    WHOLE dictionary: O(|corpus| + hits). The automaton builds once
  *    per partition from the broadcast pattern list (kilobytes); the
  *    operator is a narrow map — no shuffle until the caller aggregates.
  *    At 100 TB with a production blocklist (thousands of entries), this
  *    is the only shape that survives; the scan form is the oracle twin
  *    and the small-dictionary fast path.
  *
  * Equivalence of the automaton's non-overlap rule: AC emits matches in
  * increasing END position, so per pattern the greedy "count iff
  * start > last counted end" filter reproduces the indexOf-skip loop
  * verbatim (both take every earliest match that starts after the
  * previous taken match ends). `TaggerSpec` pins Auto ≡ Scan on
  * overlap-adversarial fixtures and random strings; q255 pins both to
  * the DuckDB replace formula cross-engine.
  */
object Tagger {

  /** Aho-Corasick automaton over exact strings (case-sensitive; callers
    * fold case upstream if wanted). Built on the driver or once per
    * partition — construction is O(Σ|p|·alphabet) over a HashMap trie.
    */
  final class Automaton(patterns: Array[String]) extends Serializable {
    require(patterns.nonEmpty, "Tagger: empty dictionary")
    require(patterns.forall(_.nonEmpty), "Tagger: empty pattern")
    require(patterns.distinct.length == patterns.length,
      s"Tagger: duplicate patterns")

    private val goto_ = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    private val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    private val fail = scala.collection.mutable.ArrayBuffer(0)

    patterns.zipWithIndex.foreach { case (p, pi) =>
      var n = 0
      p.foreach { c =>
        n = goto_(n).getOrElseUpdate(c, {
          goto_ += scala.collection.mutable.HashMap.empty[Char, Int]
          out += Nil
          fail += 0
          goto_.length - 1
        })
      }
      out(n) = pi :: out(n)
    }
    locally { // BFS fail links; merge output lists along them
      val q = scala.collection.mutable.Queue.empty[Int]
      goto_(0).values.foreach { n => fail(n) = 0; q += n }
      while (q.nonEmpty) {
        val n = q.dequeue()
        goto_(n).foreach { case (c, m) =>
          var f = fail(n)
          while (f != 0 && !goto_(f).contains(c)) f = fail(f)
          fail(m) = if (f != n && goto_(f).contains(c)) goto_(f)(c) else 0
          out(m) = out(m) ++ out(fail(m))
          q += m
        }
      }
    }
    private val patLen = patterns.map(_.length)

    /** Per-pattern leftmost-non-overlapping counts for one text. */
    def counts(text: String): Array[Long] = {
      val c = new Array[Long](patterns.length)
      val lastEnd = Array.fill(patterns.length)(-1)
      var n = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (n != 0 && !goto_(n).contains(ch)) n = fail(n)
        n = goto_(n).getOrElse(ch, 0)
        out(n).foreach { pi =>
          val start = i - patLen(pi) + 1
          if (start > lastEnd(pi)) { c(pi) += 1L; lastEnd(pi) = i }
        }
        i += 1
      }
      c
    }
  }

  private def nonOverlapCount(text: Column, pat: Column): Column =
    ((length(text) - length(call_function("replace", text, pat, lit(""))))
      / length(pat)).cast("long")

  /** Relational form: (id, pattern, n_hits) for every (doc, dictionary
    * entry) with at least one hit. Broadcast dictionary × codegen'd
    * replace length-diff — m scans per doc.
    */
  def tagCountsScan(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    new Automaton(patterns.toArray) // same dictionary validation
    val spark = df.sparkSession
    import spark.implicits._
    val pats = patterns.toDF("pattern")
    df.crossJoin(broadcast(pats))
      .select(col(idCol), col("pattern"),
        nonOverlapCount(col(textCol), col("pattern")).as("n_hits"))
      .filter(col("n_hits") > 0)
  }

  /** Automaton form: identical output, one pass per doc for the whole
    * dictionary.
    */
  def tagCountsAuto(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    new Automaton(patterns.toArray) // validate on the driver, fail fast
    val spark = df.sparkSession
    import spark.implicits._
    val pats = patterns.toArray
    val src = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
    src.mapPartitions { it =>
      val ac = new Automaton(pats) // once per partition, kilobytes
      it.flatMap { case (id, text) =>
        val c = ac.counts(if (text == null) "" else text)
        c.indices.iterator.filter(c(_) > 0L)
          .map(pi => (id, pats(pi), c(pi)))
      }
    }.toDF(idCol, "pattern", "n_hits")
  }

  /** The DuckDB twin of either form for a literal dictionary — the
    * replace length-diff over a VALUES list (integer math end to end).
    */
  def tagCountsSql(table: String, idCol: String, textCol: String,
      patterns: Seq[String]): String = {
    val vals = patterns.map(p => s"('${p.replace("'", "''")}')")
      .mkString(", ")
    s"""SELECT $idCol, pat AS pattern,
           CAST((length($textCol) - length(replace($textCol, pat, '')))
                / length(pat) AS BIGINT) AS n_hits
        FROM $table CROSS JOIN (VALUES $vals) p(pat)
        WHERE (length($textCol) - length(replace($textCol, pat, '')))
              / length(pat) > 0"""
  }
}
