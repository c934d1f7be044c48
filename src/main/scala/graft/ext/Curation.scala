package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The curation capstone: the end-to-end pass a training-data pipeline
  * runs between "raw crawl" and "training mixture", composed from the
  * engine's own operators — rule-based quality filtering
  * ([[TextAnalysis.qualityFlags]]), exact deduplication (corpus-wide min-id
  * keeper per text), and the leakage-free near-dup-aware split
  * ([[DedupCluster.leakageFreeSplit]]) — reduced to the report that gets
  * reviewed before a training run: documents and tokens per (split,
  * source).
  */
object Curation {

  /** Per-(split, source) curated-corpus report: documents surviving the
    * quality rules AND exact dedup, split-assigned by near-dup cluster so
    * families never straddle train/test. Output: (split, sourceCol,
    * n_docs, n_tokens), n_tokens = whitespace token count.
    *
    * Scale: the near-dup clustering dominates and runs once; the quality
    * rules are a codegen'd projection on the scan, exact dedup is one
    * row_number window on the text (high-cardinality key), and the final
    * aggregate is |splits|·|sources| rows. Split labels are computed over
    * the FULL corpus (assignment independent of filtering — re-running
    * with different quality rules never reshuffles the fence).
    */
  def curatedReport(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val kept = docs
      .select(col(idCol), col(sourceCol), col(textCol))
      .filter(TextAnalysis.qualityFlags(col(textCol)) === "---")
    val firstW = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    val deduped = kept
      .withColumn("__rn", row_number().over(firstW))
      .filter(col("__rn") === 1)
    val split = DedupCluster.leakageFreeSplit(docs, idCol, textCol)
      .select(col(idCol), col("split"))
    deduped
      .join(split, idCol)
      .groupBy(col("split"), col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))).as("n_tokens"))
  }

  /** Registrable host of a URL column — `scheme://host[:port]/…` →
    * `host` (port stripped, lower-cased). Codegen'd regexp; empty string
    * for non-URL garbage (a loud null would poison the cap's partition
    * key — garbage groups together and gets capped like any other host,
    * which is exactly the crawl posture).
    */
  def urlHost(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))

  /** Tracking query parameters dropped by [[canonicalUrl]] — the pinned
    * deny list (exact names; any `utm_`-prefixed name is dropped too).
    * These carry campaign attribution, not content identity, so two
    * crawls of the same page differ only by them.
    */
  val TrackingParams: Seq[String] = Seq("gclid", "fbclid", "msclkid",
    "yclid", "mc_cid", "mc_eid", "_ga", "igshid")

  /** URL CANONICALIZATION — the normal form every crawl pipeline keys
    * URL-level dedup on, BEFORE [[perHostCap]]. Deterministic pinned
    * recipe, each step pure string math mirrored exactly by
    * [[canonicalUrlSql]]:
    *
    *  1. trim; drop the fragment (`#…` — client-side only);
    *  2. percent-encoding CASE normalization (RFC 3986 §6.2.2.1):
    *     uppercase the hex of every well-formed `%xx` escape, leaving
    *     malformed `%` runs untouched. Decode-unreserved (§6.2.2.2) is
    *     DELIBERATELY omitted: uppercasing is idempotent and total,
    *     while decoding rewrites bytes and invites double-decode bugs
    *     on crawl garbage;
    *  3. scheme and authority case-fold; default-port strip (`:80` for
    *     http, `:443` for https);
    *  4. empty path → `/`; trailing `/index.html` → `/` (the one
    *     filename servers serve for the bare directory);
    *  5. query params: split on `&`, drop empties, drop tracking params
    *     ([[TrackingParams]] + `utm_*`, name compared case-folded),
    *     byte-order sort, rejoin; an emptied query drops its `?`.
    *
    * Non-URLs (no `scheme://authority`) pass through as `trim(url)` —
    * the [[urlHost]] garbage posture: canonicalization is identity, and
    * garbage groups with garbage downstream.
    *
    * Scale: one projection per row; the only non-codegen pieces are the
    * two bounded HOFs over the `%`-split and `&`-split arrays (a URL has
    * a handful of each — nothing corpus-cardinality like the per-token
    * rule in CLAUDE.md).
    */
  def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val u0 = regexp_replace(trim(url), "(?s)#.*$", "")
    // %xx case normalization via the %-split: piece 0 is pre-%, every
    // later piece follows one literal '%'.
    val parts = split(u0, "%", -1)
    val tail = slice(parts, lit(2), greatest(size(parts) - 1, lit(0)))
    val fixedTail = transform(tail, p =>
      concat(lit("%"),
        when(p.rlike("^[0-9a-fA-F]{2}"),
          concat(upper(substring(p, 1, 2)), p.substr(lit(3), length(p))))
          .otherwise(p)))
    val u = concat(element_at(parts, 1), array_join(fixedTail, ""))
    val scheme = lower(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val auth0 = lower(regexp_extract(u,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    val auth = when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val path0 = regexp_extract(u,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val path = regexp_replace(
      when(path0 === "", lit("/")).otherwise(path0), "/index\\.html$", "/")
    val q0 = regexp_extract(u, "(?s)\\?(.*)$", 1)
    val params = filter(split(q0, "&", -1), p => {
      val name = lower(substring_index(p, "=", 1))
      p =!= "" && substring(name, 1, 4) =!= "utm_" &&
        !name.isin(TrackingParams: _*)
    })
    val q = array_join(array_sort(params), "&")
    val canon = concat(scheme, lit("://"), auth, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
    when(scheme === "" || auth0 === "", trim(url)).otherwise(canon)
  }

  /** DuckDB twin of [[canonicalUrl]] over an SQL expression — the same
    * steps in the same order; regexes stay in the Java ∩ RE2 common
    * dialect, list ops mirror the HOFs (`list_transform`/`list_filter`
    * over the same splits; DuckDB `string_split` keeps empties like
    * Spark's `split(…, -1)`), and string sort is byte order on both
    * engines (DuckDB binary collation ≡ Java String ordering for the
    * ASCII-only strings URLs are after escaping).
    */
  def canonicalUrlSql(e: String): String = {
    val u0 = s"regexp_replace(trim($e), '(?s)#.*$$', '')"
    val parts = s"string_split($u0, '%')"
    // coalesce: DuckDB array_to_string of an EMPTY list is NULL, not ''.
    val u =
      s"""(list_element($parts, 1) || coalesce(array_to_string(
            list_transform($parts[2:], p -> '%' ||
              CASE WHEN regexp_matches(p, '^[0-9a-fA-F]{2}')
                   THEN upper(substring(p, 1, 2)) || substring(p, 3)
                   ELSE p END), ''), ''))"""
    val scheme = s"lower(regexp_extract($u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    val auth0 = s"lower(regexp_extract($u, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1))"
    val auth =
      s"""CASE WHEN $scheme = 'http' THEN regexp_replace($auth0, ':80$$', '')
               WHEN $scheme = 'https' THEN regexp_replace($auth0, ':443$$', '')
               ELSE $auth0 END"""
    val path0 = s"regexp_extract($u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1)"
    val path =
      s"""regexp_replace(CASE WHEN $path0 = '' THEN '/' ELSE $path0 END,
            '/index\\.html$$', '/')"""
    val q0 = s"regexp_extract($u, '(?s)\\?(.*)$$', 1)"
    val deny = TrackingParams.map(t => s"'$t'").mkString(", ")
    val q =
      s"""coalesce(array_to_string(list_sort(list_filter(string_split($q0, '&'),
            p -> p <> '' AND substring(lower(split_part(p, '=', 1)), 1, 4)
                   <> 'utm_'
               AND lower(split_part(p, '=', 1)) NOT IN ($deny))), '&'), '')"""
    s"""CASE WHEN $scheme = '' OR $auth0 = '' THEN trim($e)
             ELSE $scheme || '://' || ($auth) || ($path) ||
                  CASE WHEN ($q) = '' THEN '' ELSE '?' || ($q) END END"""
  }

  /** EXACT URL-LEVEL DEDUP keyed on [[canonicalUrl]] — the step between
    * crawl ingest and [[perHostCap]]: of all fetches whose URLs
    * canonicalize identically, keep the smallest-`orderCol` one. Same
    * window shape as [[perHostCap]] (cap = 1), so the partial
    * `WindowGroupLimit` plans before the exchange and only one row per
    * canonical URL shuffles.
    */
  def urlDedup(docs: DataFrame, urlCol: String, orderCol: String)
      : DataFrame = {
    val w = Window.partitionBy(canonicalUrl(col(urlCol)))
      .orderBy(col(orderCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** PER-HOST DOCUMENT CAP — the crawl-curation primitive between dedup
    * and mixture: keep at most `cap` documents per host, smallest
    * `orderCol` first (a deterministic total order — pass the doc id).
    * One window whose `row_number ≤ cap` plans a partial
    * `WindowGroupLimit` BEFORE the exchange (the q14/q208 rule), so only
    * cap·hosts rows shuffle — a mega-host contributes cap rows to the
    * exchange no matter how many billions it crawled.
    */
  def perHostCap(docs: DataFrame, urlCol: String, orderCol: String,
      cap: Int): DataFrame = {
    require(cap >= 1, s"perHostCap: cap=$cap")
    val w = Window.partitionBy(urlHost(col(urlCol))).orderBy(col(orderCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }
}
