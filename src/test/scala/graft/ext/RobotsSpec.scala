package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [X] robots.txt: RFC 9309 parse + wildcard longest-match gate — the
  * hand-pinned half of q259's cross-engine certification.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  test("parse: groups, stacking, case, comments, empties, unknowns") {
    val txt =
      """# top comment
        |User-Agent: GraftBot   # trailing comment
        |User-agent: otherbot
        |Disallow: /a
        |ALLOW: /a/b$
        |Disallow:
        |Crawl-delay: 5
        |User-agent: *
        |disallow: /c*d
        |
        |Sitemap: http://x.test/map.xml
        |Disallow: /orphan-should-attach-to-star
        |""".stripMargin
    val rules = Robots.parse(txt)
    rules(0) shouldBe Robots.Rule(Seq("graftbot", "otherbot"), false, "/a")
    rules(1) shouldBe Robots.Rule(Seq("graftbot", "otherbot"), true, "/a/b$")
    // empty Disallow dropped; crawl-delay parsed elsewhere but closes
    // UA stacking like any non-UA directive
    rules(2) shouldBe Robots.Rule(Seq("*"), false, "/c*d")
    // sitemap (unknown) doesn't start a group; next rule still in *
    rules(3) shouldBe
      Robots.Rule(Seq("*"), false, "/orphan-should-attach-to-star")
    rules.length shouldBe 4
    // rules before any user-agent line are ignored
    Robots.parse("Disallow: /x\nUser-agent: *\nDisallow: /y") shouldBe
      Seq(Robots.Rule(Seq("*"), false, "/y"))
    Robots.parse("") shouldBe Seq.empty
  }

  test("likePattern: wildcard/anchor/escape translation") {
    Robots.likePattern("/a") shouldBe "/a%"
    Robots.likePattern("/a$") shouldBe "/a"
    Robots.likePattern("/a*b") shouldBe "/a%b%"
    Robots.likePattern("/a*b$") shouldBe "/a%b"
    Robots.likePattern("/100%_x") shouldBe "/100\\%\\_x%"
    Robots.likePattern("/b\\c") shouldBe "/b\\\\c%"
  }

  test("gate: longest match wins, Allow wins ties, default allowed, group isolation") {
    val robots = Seq(
      ("h0", """User-agent: *
               |Disallow: /private
               |Allow: /private/ok$
               |Disallow: /tmp*
               |""".stripMargin),
      ("h1", """User-agent: *
               |Disallow: /
               |User-agent: graftbot
               |Allow: /private/graft*
               |Disallow: /
               |""".stripMargin),
      ("h2", "# no rules at all\n"),
      ("h3", """User-agent: *
               |Disallow: /p
               |Allow: /p
               |""".stripMargin)
    ).toDF("host", "content")
    val rules = Robots.ruleTable(robots, "host", "content", "GraftBot")
    val urls = Seq(
      (0L, "h0", "/private/ok"), (1L, "h0", "/private/okay"),
      (2L, "h0", "/private/x"), (3L, "h0", "/tmpfile"),
      (4L, "h0", "/public"),
      (5L, "h1", "/private/graft9"), (6L, "h1", "/anything"),
      (7L, "h2", "/whatever"),
      (8L, "h3", "/p/tie"),
      (9L, "hmissing", "/no-robots-at-all")
    ).toDF("id", "host", "path")
    val got = Robots.allowed(urls, "id", "host", "path", rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    got shouldBe Map(
      0L -> true,   // exact Allow $ (len 12) beats Disallow /private (8)
      1L -> false,  // $ anchor: /private/okay does NOT match /private/ok$
      2L -> false, 3L -> false, 4L -> true,
      5L -> true,   // graftbot group only: Allow len 15 beats Disallow /
      6L -> false,  // graftbot group's Disallow /, not *'s
      7L -> true,   // empty robots → default allowed
      8L -> true,   // equal length: Allow wins the tie
      9L -> true)   // no robots row at all → default allowed
  }

  test("parseFull: crawl-delay ms-exact, per group; sitemaps global") {
    val f = Robots.parseFull(
      """User-agent: a
        |Crawl-delay: 2
        |Crawl-delay: 0.5
        |Sitemap: http://x.test/m1.xml
        |User-agent: b
        |crawl-DELAY: 1.25
        |SITEMAP: http://x.test/m2.xml.gz
        |User-agent: c
        |Crawl-delay: nonsense
        |Crawl-delay: 1.2345
        |Crawl-delay:
        |""".stripMargin)
    f.delays shouldBe Seq(
      Robots.GroupDelay(Seq("a"), 2000L),
      Robots.GroupDelay(Seq("a"), 500L), // both kept; selection takes max
      Robots.GroupDelay(Seq("b"), 1250L))
    // malformed values (word, >3 fraction digits, empty) are ignored
    f.delays.exists(_.agents == Seq("c")) shouldBe false
    f.sitemaps shouldBe
      Seq("http://x.test/m1.xml", "http://x.test/m2.xml.gz")
    f.agentsSeen shouldBe Set("a", "b", "c")
    // a delay before any UA line belongs to no group
    Robots.parseFull("Crawl-delay: 3\nUser-agent: *\nCrawl-delay: 4\n")
      .delays shouldBe Seq(Robots.GroupDelay(Seq("*"), 4000L))
  }

  test("delayTable: my-group-or-star, never both; max of selected") {
    val robots = Seq(
      // star only → star's delay
      ("h0", "User-agent: *\nCrawl-delay: 2\n"),
      // my group overrides star's
      ("h1", "User-agent: *\nCrawl-delay: 10\n\n" +
        "User-agent: graftbot\nCrawl-delay: 0.5\n"),
      // my group EXISTS but has no delay → NO fallback to star's
      ("h2", "User-agent: graftbot\nDisallow: /x\n\n" +
        "User-agent: *\nCrawl-delay: 7\n"),
      // two star groups with delays → max (conservative)
      ("h3", "User-agent: *\nCrawl-delay: 1\n\n" +
        "User-agent: *\nCrawl-delay: 3\n"),
      // no delays anywhere → no row
      ("h4", "User-agent: *\nDisallow: /a\n")
    ).toDF("host", "content")
    val got = Robots.delayTable(robots, "host", "content", "GraftBot")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("h0" -> 2000L, "h1" -> 500L, "h3" -> 3000L)
  }

  test("sitemapTable: file order, group-independent") {
    val robots = Seq(
      ("h0", "Sitemap: http://h0.test/a.xml\nUser-agent: *\n" +
        "Disallow: /x\nSitemap: http://h0.test/b.xml\n"),
      ("h1", "# nothing\n")
    ).toDF("host", "content")
    Robots.sitemapTable(robots, "host", "content")
      .orderBy("sitemap").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq shouldBe Seq(
      ("h0", "http://h0.test/a.xml"), ("h0", "http://h0.test/b.xml"))
  }
}
