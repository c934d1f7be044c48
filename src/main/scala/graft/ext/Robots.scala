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

  /** One group's `Crawl-delay`, in MILLISECONDS (exact integer — no
    * float seconds ride through the engine; values carry ≤ 3 decimal
    * places, the rest are malformed and ignored).
    */
  final case class GroupDelay(agents: Seq[String], delayMs: Long)

  /** Everything a robots.txt body yields: the per-group Allow/Disallow
    * rules, per-group crawl-delays, the GLOBAL `Sitemap:` URLs (the
    * sitemaps protocol scopes them to the file, not to a group), and
    * every agent token that started a group (for group-existence
    * checks).
    */
  final case class RobotsFile(rules: Seq[Rule], delays: Seq[GroupDelay],
    sitemaps: Seq[String], agentsSeen: Set[String])

  private val DelayValue = "^([0-9]{1,7})(?:\\.([0-9]{1,3}))?$".r

  /** Parse one robots.txt body. Directives are case-insensitive;
    * `#` comments and unknown directives are ignored; consecutive
    * `User-agent` lines stack into one group (ANY other directive
    * closes the stack); an `Allow:`/`Disallow:` with an EMPTY value is
    * "no rule" per the RFC (an empty Disallow historically means
    * allow-all), so it is dropped; group directives before any
    * `User-agent` line are ignored (they belong to no group).
    * `Crawl-delay` values are decimal seconds with up to 3 fraction
    * digits, kept as exact milliseconds; a later delay in the same
    * group overrides an earlier one only at selection time (both rows
    * are emitted; consumers take the max — the conservative read).
    */
  def parseFull(content: String): RobotsFile = {
    val rules = Seq.newBuilder[Rule]
    val delays = Seq.newBuilder[GroupDelay]
    val sitemaps = Seq.newBuilder[String]
    val seen = Set.newBuilder[String]
    var agents = Vector.empty[String]
    var inRules = false // false while stacking consecutive UA lines
    (if (content == null) "" else content).split("\n", -1).foreach { line0 =>
      val line = line0.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val directive = line.substring(0, ci).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(ci + 1).trim
        directive match {
          case "user-agent" =>
            if (inRules) { agents = Vector.empty; inRules = false }
            if (value.nonEmpty) {
              val tok = value.toLowerCase(java.util.Locale.ROOT)
              agents = agents :+ tok
              seen += tok
            }
          case "allow" | "disallow" =>
            inRules = true
            if (agents.nonEmpty && value.nonEmpty)
              rules += Rule(agents, directive == "allow", value)
          case "crawl-delay" =>
            inRules = true
            if (agents.nonEmpty) value match {
              case DelayValue(ip, fp) =>
                val frac = Option(fp).getOrElse("").padTo(3, '0')
                delays += GroupDelay(agents, ip.toLong * 1000L + frac.toLong)
              case _ => // malformed value — ignored like an unknown line
            }
          case "sitemap" =>
            inRules = true // closes UA stacking like any non-UA line
            if (value.nonEmpty) sitemaps += value
          case _ => inRules = true // unknown directive closes UA stacking
        }
      }
    }
    RobotsFile(rules.result(), delays.result(), sitemaps.result(),
      seen.result())
  }

  /** The Allow/Disallow rules of a body (the original surface). */
  def parse(content: String): Seq[Rule] = parseFull(content).rules

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

  /** Per-host POLITENESS SCHEDULE for one crawler token:
    * (hostCol, delay_ms). Group selection is strict RFC "my group OR
    * the * group, never both", decided by group EXISTENCE
    * ([[RobotsFile.agentsSeen]]): if ANY group names `agent`, only
    * those groups' delays apply — a token-specific group WITHOUT a
    * crawl-delay means "no delay directive for me", not "inherit the
    * * group's". Multiple selected delays take the MAX (the
    * conservative read). Hosts with no applicable delay emit no row —
    * the consumer coalesces its own default.
    */
  def delayTable(robots: DataFrame, hostCol: String, contentCol: String,
      agent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    val tok = agent.toLowerCase(java.util.Locale.ROOT)
    robots.select(col(hostCol).cast("string"), col(contentCol))
      .as[(String, String)]
      .flatMap { case (host, content) =>
        val f = parseFull(content)
        val chosen =
          if (f.agentsSeen.contains(tok)) f.delays.filter(_.agents.contains(tok))
          else f.delays.filter(_.agents.contains("*"))
        if (chosen.isEmpty) None
        else Some((host, chosen.map(_.delayMs).max))
      }
      .toDF(hostCol, "delay_ms")
  }

  /** Per-host sitemap URLs (hostCol, sitemap) in file order — GLOBAL
    * per the sitemaps protocol, independent of any agent group.
    */
  def sitemapTable(robots: DataFrame, hostCol: String,
      contentCol: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(hostCol).cast("string"), col(contentCol))
      .as[(String, String)]
      .flatMap { case (host, content) =>
        parseFull(content).sitemaps.map(u => (host, u))
      }
      .toDF(hostCol, "sitemap")
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
