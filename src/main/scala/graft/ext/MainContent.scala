package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MAIN-CONTENT EXTRACTION — the block-level boilerplate classifier a
  * production WET pipeline runs between [[TextAnalysis.htmlToText]]'s
  * whole-page strip and the corpus (jusText / trafilatura lineage:
  * Pomikálek 2011): split the page on BLOCK-LEVEL tags, score each
  * block by link density, stopword density, and length, keep the
  * content blocks, drop nav/footer/sidebar chrome. Corpus-frequency
  * line dedup (q80) only catches CROSS-DOC boilerplate; this is the
  * per-page structural pass that removes chrome the first time it is
  * ever seen.
  *
  * The recipe is PINNED (deterministic, no tuning state) so the DuckDB
  * twin can replay it textually:
  *
  *  1. Drop script/style elements whole (htmlToText step 1 — their
  *     content must not fabricate blocks).
  *  2. Split on block-level tags ([[BlockSplit]] — inline tags like
  *     `<a>`/`<b>` stay INSIDE their block, which is what makes link
  *     density measurable). Both engines keep every empty segment
  *     (Spark `split` limit -1 ≡ DuckDB `string_split_regex`), so
  *     block POSITIONS agree.
  *  3. Per block: `btext` = the [[TextAnalysis.htmlToText]] clean of
  *     the block; `link_chars` = the same clean of the concatenated
  *     `<a …>…</a>` spans (space-joined before cleaning — one pinned
  *     op order, not per-anchor).
  *  4. Classify with INTEGER-EXACT comparisons (cross-multiplication,
  *     never a float ratio — the PAV discipline):
  *     `short` if chars < [[MinChars]];
  *     `nav`   if link_chars·10 > chars·3        (link density > 0.3);
  *     `good`  if n_stop·20 ≥ n_tokens           (stopword density ≥ 5%);
  *     `low`   otherwise.
  *     The 5% stopword bar is calibrated to this corpus' measured
  *     density distribution (median ≈ 6%) so the gate genuinely
  *     discriminates — jusText's published bars assume full English
  *     prose and a 100+-word stoplist.
  *  5. `main_text` = good blocks joined by one space in document order.
  *
  * Scale shape: everything through classification is codegen'd column
  * ops over a posexplode (per-token stopword counting is the explode +
  * groupBy relational rewrite, never an interpreted higher-order
  * filter); the only per-doc array work is the final ordered join of
  * ~a-dozen good blocks.
  */
object MainContent {

  /** Block-level tag boundary. `(?:[ /][^>]*)?>` pins the name edge so
    * `<p…>` matches but `<pre>` does not; covers `</p>`, `<br/>`,
    * attributes. Lives in the Java-regex ∩ RE2 common dialect (the
    * htmlToText rule).
    */
  val BlockSplit: String =
    "(?i)</?(?:html|head|body|title|p|div|h[1-6]|ul|ol|li|nav|footer|" +
      "header|aside|section|article|table|tr|td|th|blockquote|br)" +
      "(?:[ /][^>]*)?>"

  /** Anchor-content span (requires an attribute space — `<a href…>`,
    * the only anchor form a crawler meets; dotall for multi-line
    * anchors).
    */
  val AnchorSpan: String = "(?s)<a [^>]*>(.*?)</a>"

  /** Pinned 20-word stoplist — function words only, so density is a
    * prose signal, not a topic signal.
    */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "it", "was", "for", "on", "as", "at", "by", "be",
    "this", "that", "with")

  /** Blocks shorter than this (clean chars) are chrome regardless of
    * composition — headings, nav items, inter-tag whitespace.
    */
  val MinChars = 25

  private val ScriptStyle =
    "(?si)<(script|style)[^>]*>.*?</(script|style)>"

  /** Per-block classification relation:
    * (idCol, pos, btext, link_chars, n_tokens, n_stop, chars, cls).
    */
  def blocks(df: DataFrame, idCol: String, html: Column): DataFrame = {
    val raw = df.select(col(idCol),
      posexplode(split(regexp_replace(html, ScriptStyle, " "), BlockSplit))
        .as(Seq("pos", "raw")))
    val anchors = array_join(
      regexp_extract_all(col("raw"), lit(AnchorSpan), lit(1)), " ")
    val cl = raw.select(col(idCol), col("pos"),
      TextAnalysis.htmlToText(col("raw")).as("btext"),
      length(TextAnalysis.htmlToText(anchors)).cast("long")
        .as("link_chars"))
    cl.select(col(idCol), col("pos"), col("btext"), col("link_chars"),
        explode(split(col("btext"), " ")).as("t"))
      .groupBy(col(idCol), col("pos"), col("btext"), col("link_chars"))
      .agg(count(when(col("t") =!= "", 1)).as("n_tokens"),
        count(when(col("t").isin(Stopwords: _*), 1)).as("n_stop"))
      .withColumn("chars", length(col("btext")).cast("long"))
      .withColumn("cls",
        when(col("chars") < MinChars, "short")
          .when(col("link_chars") * 10 > col("chars") * 3, "nav")
          .when(col("n_stop") * 20 >= col("n_tokens"), "good")
          .otherwise("low"))
  }

  /** Per-document extraction:
    * (idCol, main_text, n_blocks, n_good, n_nav, n_short).
    */
  def extract(df: DataFrame, idCol: String, html: Column): DataFrame =
    blocks(df, idCol, html)
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("cls") === "good",
            struct(col("pos"), col("btext"))))),
          x => x.getField("btext")), " ").as("main_text"),
        count(lit(1)).as("n_blocks"),
        count(when(col("cls") === "good", 1)).as("n_good"),
        count(when(col("cls") === "nav", 1)).as("n_nav"),
        count(when(col("cls") === "short", 1)).as("n_short"))

  /** DuckDB twin of [[blocks]]-through-[[extract]] over `htmlExpr`
    * evaluated per row of `table` — the SAME regexes (shared dialect),
    * the SAME op order, the SAME integer comparisons.
    */
  def extractSql(table: String, idExpr: String, htmlExpr: String): String = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    val anchorsJoined =
      s"array_to_string(regexp_extract_all(raw, '$AnchorSpan', 1), ' ')"
    s"""WITH pg AS (SELECT $idExpr AS id, $htmlExpr AS html FROM $table),
          ns AS (SELECT id,
                   regexp_replace(html, '$ScriptStyle', ' ', 'g') AS h
                 FROM pg),
          ar AS (SELECT id, string_split_regex(h, '$BlockSplit') AS arr
                 FROM ns),
          blk AS (SELECT id, generate_subscripts(arr, 1) - 1 AS pos,
                    unnest(arr) AS raw
                  FROM ar),
          cl AS (SELECT id, pos,
                   ${TextAnalysis.htmlToTextSql("raw")} AS btext,
                   CAST(length(${TextAnalysis.htmlToTextSql(anchorsJoined)})
                     AS BIGINT) AS link_chars
                 FROM blk),
          tok AS (SELECT id, pos, btext, link_chars,
                    unnest(string_split(btext, ' ')) AS t
                  FROM cl),
          st AS (SELECT id, pos, btext, link_chars,
                   CAST(count(CASE WHEN t <> '' THEN 1 END) AS BIGINT)
                     AS n_tokens,
                   CAST(count(CASE WHEN t IN ($stopList) THEN 1 END)
                     AS BIGINT) AS n_stop,
                   CAST(length(btext) AS BIGINT) AS chars
                 FROM tok GROUP BY 1, 2, 3, 4),
          cls AS (SELECT *,
                    CASE WHEN chars < $MinChars THEN 'short'
                         WHEN link_chars * 10 > chars * 3 THEN 'nav'
                         WHEN n_stop * 20 >= n_tokens THEN 'good'
                         ELSE 'low' END AS cls
                  FROM st)
       SELECT id AS doc_id,
              coalesce(string_agg(CASE WHEN cls = 'good' THEN btext END,
                ' ' ORDER BY pos), '') AS main_text,
              CAST(count(*) AS BIGINT) AS n_blocks,
              CAST(count(CASE WHEN cls = 'good' THEN 1 END) AS BIGINT)
                AS n_good,
              CAST(count(CASE WHEN cls = 'nav' THEN 1 END) AS BIGINT)
                AS n_nav,
              CAST(count(CASE WHEN cls = 'short' THEN 1 END) AS BIGINT)
                AS n_short
       FROM cls GROUP BY 1"""
  }
}
