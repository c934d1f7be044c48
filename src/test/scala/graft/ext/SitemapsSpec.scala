package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [X] sitemap.xml frontier seeding: urlset/sitemapindex parse,
  * namespace-prefix and CDATA tolerance, malformed-entry drop, gzip
  * round-trip, and the seeds() relational surface — the hand-pinned
  * half of q263's cross-engine certification.
  */
class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>http://h.test/p/1</loc>
      |    <lastmod>2026-01-05</lastmod>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><loc> http://h.test/p/2 </loc></url>
      |  <url><lastmod>2026-01-06</lastmod></url>
      |  <url><loc></loc></url>
      |</urlset>
      |""".stripMargin

  test("urlset parse: fields verbatim-trimmed, loc-less entries dropped") {
    val es = Sitemaps.parseXml(urlset)
    es shouldBe Seq(
      Sitemaps.Entry("url", "http://h.test/p/1",
        Some("2026-01-05"), Some("0.8")),
      Sitemaps.Entry("url", "http://h.test/p/2", None, None))
  }

  test("sitemapindex parse; namespace prefixes and CDATA tolerated") {
    val idx =
      """<?xml version="1.0"?>
        |<sm:sitemapindex xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sm:sitemap><sm:loc><![CDATA[http://h.test/map1.xml.gz]]></sm:loc>
        |    <sm:lastmod>2026-02-01</sm:lastmod></sm:sitemap>
        |  <sm:sitemap><sm:loc>http://h.test/map2.xml</sm:loc></sm:sitemap>
        |</sm:sitemapindex>
        |""".stripMargin
    Sitemaps.parseXml(idx) shouldBe Seq(
      Sitemaps.Entry("sitemap", "http://h.test/map1.xml.gz",
        Some("2026-02-01"), None),
      Sitemaps.Entry("sitemap", "http://h.test/map2.xml", None, None))
  }

  test("gzip round-trip; seeds() reads plain and gzipped bodies") {
    val raw = urlset.getBytes("UTF-8")
    Sitemaps.gunzip(Sitemaps.gzip(raw)).toSeq shouldBe raw.toSeq
    val df = Seq(
      ("ha", raw, false),
      ("hb", Sitemaps.gzip(raw), true)
    ).toDF("host", "body", "gz")
    val got = Sitemaps.seeds(df, "host", "body", "gz")
      .orderBy("host", "loc")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)))
    got.length shouldBe 4
    got.map(_._1).toSeq shouldBe Seq("ha", "ha", "hb", "hb")
    got(0) shouldBe ("ha", "url", "http://h.test/p/1", "2026-01-05", "0.8")
    got(1) shouldBe ("ha", "url", "http://h.test/p/2", null, null)
  }

  test("external entities refused (XXE posture)") {
    val evil =
      """<?xml version="1.0"?>
        |<!DOCTYPE urlset [<!ENTITY x SYSTEM "file:///etc/passwd">]>
        |<urlset><url><loc>&x;</loc></url></urlset>
        |""".stripMargin
    // DTD support is off: the parse must throw, never resolve the entity
    an[Exception] should be thrownBy Sitemaps.parseXml(evil)
  }
}
