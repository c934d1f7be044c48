package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt — the crawl-permission gate (RFC 9309): parse each host's
  * robots.txt into per-agent-group Allow/Disallow rules, then gate URLs
  * by the LONGEST-MATCH rule with Allow winning length ties and
  * "no matching rule" defaulting to allowed.
  *
  * Wildcards are the RFC 9309 pair: `*` (any octet sequence) and a
  * trailing `$` (end anchor). Both translate EXACTLY to SQL LIKE —
  * `*` → `%`, `$`-anchored → no trailing `%`, otherwise append `%`,
  * with `%`/`_`/`\` escaped — so the matching step is one relational
  * join + one ranked window in BOTH engines (the q259 twin replays the
  * same longest-match over the literal rule table; a parser bug or a
  * mistranslated wildcard breaks the cross-engine hash). Specificity is
  * the RAW pattern length (as written, `*`/`$` included) — one fixed,
  * engine-shared definition.
  *
  * Group selection (RFC 9309 §2.2.1): a crawler obeys the group(s)
  * matching its product token, else the `*` group(s), never both —
  * rules do not cascade across groups.
  *
  * Scale shape: robots bodies are per-HOST (millions of hosts, KB each,
  * ~GBs total at 100 TB corpus scale): the parse is a narrow flatMap,
  * the rule table is host-partitioned and small relative to the URL
  * stream, and the gate is a (host-key) join + per-URL window — the
  * same shape as [[Curation.perHostCap]], with the partial
  * WindowGroupLimit applying to the rank-1 pick.
  */
object Robots {

  /** One parsed rule: the agents of its group (lowercased), Allow or
    * Disallow, and the raw path pattern as written.
    */
  final case class Rule(agents: Seq[String], allow: Boolean, raw: String)

  /** Parse one robots.txt body. Directives are case-insensitive;
    * `#` comments and unknown directives are ignored; consecutive
    * `User-agent` lines stack into one group; an `Allow:`/`Disallow:`
    * with an EMPTY value is "no rule" per the RFC (an empty Disallow
    * historically means allow-all), so it is dropped; rules before any
    * `User-agent` line are ignored (they belong to no group).
    */
  def parse(content: String): Seq[Rule] = {
    val out = Seq.newBuilder[Rule]
    var agents = Vector.empty[String]
    var inRules = false // false while stacking consecutive UA lines
    content.split("\n", -1).foreach { line0 =>
      val line = line0.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val directive = line.substring(0, ci).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(ci + 1).trim
        directive match {
          case "user-agent" =>
            if (inRules) { agents = Vector.empty; inRules = false }
            if (value.nonEmpty)
              agents = agents :+ value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            inRules = true
            if (agents.nonEmpty && value.nonEmpty)
              out += Rule(agents, directive == "allow", value)
          case _ => inRules = true // unknown directive closes UA stacking
        }
      }
    }
    out.result()
  }

  /** robots pattern → SQL LIKE pattern (see object doc). */
  def likePattern(raw: String): String = {
    val anchored = raw.endsWith("$")
    val body = if (anchored) raw.dropRight(1) else raw
    val escaped = body.flatMap {
      case '\\' => "\\\\"
      case '%' => "\\%"
      case '_' => "\\_"
      case '*' => "%"
      case c => c.toString
    }
    if (anchored) escaped else escaped + "%"
  }

  /** Per-host rule table for ONE crawler token: parse every robots body,
    * keep the group matching `agent` where one exists, else the `*`
    * group. Output (hostCol, allow, raw, pat, plen).
    */
  def ruleTable(robots: DataFrame, hostCol: String, contentCol: String,
      agent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    val tok = agent.toLowerCase(java.util.Locale.ROOT)
    val rules: Dataset[(String, Boolean, String, String, Int)] =
      robots.select(col(hostCol).cast("string"), col(contentCol))
        .as[(String, String)]
        .flatMap { case (host, content) =>
          val all = parse(if (content == null) "" else content)
          val mine = all.filter(_.agents.contains(tok))
          val chosen =
            if (mine.nonEmpty) mine else all.filter(_.agents.contains("*"))
          chosen.map(r =>
            (host, r.allow, r.raw, likePattern(r.raw), r.raw.length))
        }
    rules.toDF(hostCol, "allow", "raw", "pat", "plen")
  }

  /** Gate URLs: per (id, host, path), `allowed` by RFC 9309
    * longest-match (raw-length specificity, Allow wins ties, default
    * allowed). One host join + one ranked window; the raw-pattern
    * tiebreak makes the pick a total order (equal (plen, allow) rules
    * agree on the verdict anyway).
    */
  def allowed(urls: DataFrame, idCol: String, hostCol: String,
      pathCol: String, rules: DataFrame): DataFrame = {
    // the LIKE lives in the JOIN condition: a URL whose host has rules
    // but none matching must keep its (null-rule) row and default to
    // allowed, not vanish in a post-join filter
    val r2 = rules.withColumnRenamed(hostCol, "__rhost")
    val cand = urls.join(r2,
      col(hostCol) === col("__rhost") &&
        expr(s"$pathCol LIKE pat ESCAPE '\\\\'"),
      "left")
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("plen").desc_nulls_last, col("allow").desc,
        col("raw").asc_nulls_last)
    cand.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col(idCol), col(hostCol), col(pathCol),
        coalesce(col("allow"), lit(true)).as("allowed"))
  }
}
