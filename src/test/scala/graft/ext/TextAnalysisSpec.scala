package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [X] text analysis: language ID, quality features, token counts,
  * fingerprints.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("languageId picks the marker-richest language, fixed tie order") {
    val docs = Seq(
      (1L, "the cat and the dog is a friend of mine"),
      (2L, "el perro y la casa de que en madrid"),
      (3L, "der hund und das haus ist ein freund"),
      (4L, "le chat et les maisons un une paris"),
      (5L, "xyzzy plugh") // no markers at all → tie → first lang wins
    ).toDF("doc_id", "text")
    val out = docs.select($"doc_id", TextAnalysis.languageId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "en")
  }

  test("token counts: whitespace vs BPE-ish regex") {
    val df = Seq((1L, "hello world42 foo-bar")).toDF("doc_id", "text")
    val r = df.select(
      TextAnalysis.tokenCount($"text"),
      TextAnalysis.bpeishTokenCount($"text")).head()
    r.getLong(0) shouldBe 3L
    // runs: hello, world, 42, foo, -, bar
    r.getLong(1) shouldBe 6L
  }

  test("quality features: ratios bounded and sensitive to repetition") {
    val df = Seq(
      (1L, "spam spam spam spam"),
      (2L, "all words here differ nicely")
    ).toDF("doc_id", "text")
    val r = df.select($"doc_id",
      TextAnalysis.uniqueTokenRatio($"text").as("u"),
      TextAnalysis.charsPerToken($"text").as("c"),
      TextAnalysis.stopwordRatio($"text").as("s"))
      .collect().map(x => x.getLong(0) -> x).toMap
    r(1L).getAs[Double]("u") shouldBe 0.25
    r(2L).getAs[Double]("u") shouldBe 1.0
    r(1L).getAs[Double]("c") shouldBe (19.0 / 4) +- 1e-6
    r(2L).getAs[Double]("s") shouldBe 0.0
  }

  test("fingerprint is order-sensitive (rolling-hash contract)") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),
      (3L, "alpha beta gamma")
    ).toDF("doc_id", "text")
    val fp = df.select($"doc_id", TextAnalysis.fingerprint($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fp(1L) shouldBe fp(3L)
    fp(1L) should not be fp(2L)
  }

  test("redact: PII rules hit emails, phones, digit runs, in rule order") {
    val df = Seq(
      (1L, "mail bob.smith+x@example.co.uk now"),
      (2L, "call +1 (555) 123-4567 today"),
      (3L, "id 94107 ok 7")
    ).toDF("id", "text")
    val out = df.select($"id",
      TextAnalysis.redact($"text", TextAnalysis.PiiRules).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "mail [EMAIL] now"
    out(2L) shouldBe "call [PHONE] today"
    out(3L) shouldBe "id # ok 7" // runs ≥2 only; single digits survive
  }

  test("normalizeText: lowercase, strip symbols, squeeze spaces, trim") {
    val df = Seq((1L, "  Hello,   WORLD!! (x=1) ")).toDF("id", "text")
    df.select(TextAnalysis.normalizeText($"text")).head().getString(0) shouldBe
      "hello world x 1"
    // idempotent: normalizing normalized text is the identity
    df.select(TextAnalysis.normalizeText(
      TextAnalysis.normalizeText($"text"))).head().getString(0) shouldBe
      "hello world x 1"
  }

  test("approx_count_distinct within 5% of exact (A6 sanity, Q24 Spark side)") {
    val li = graft.Tables.lineitem(spark, graft.TestSpark.Sf0001)
    val r = li.agg(
      countDistinct($"l_partkey").as("exact"),
      approx_count_distinct($"l_partkey", 0.02).as("approx")).head()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    math.abs(approx - exact) / exact should be < 0.05
  }

  test("vocabGrowth: hand-computed Heaps curve; empty-new-type buckets kept") {
    // one source, 4 docs, 2 buckets (docs 1-2 | docs 3-4):
    //   d1 "a b", d2 "a c" → bucket 0: 4 tokens, new types {a,b,c}=3
    //   d3 "a b", d4 "a d" → bucket 1: 4 tokens, new type {d}=1
    val docs = Seq(
      (1L, "a b", "s"), (2L, "a c", "s"), (3L, "a b", "s"), (4L, "a d", "s"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.vocabGrowth(docs, "doc_id", "text", "source", 2)
      .orderBy("bkt").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    out.toSeq shouldBe Seq(
      (0L, 4L, 3L, 4L, 3L),
      (1L, 4L, 1L, 8L, 4L))
    // a bucket introducing NO new types still appears on the volume
    // spine with new_types = 0 and a flat cumulative curve
    val rep = Seq((1L, "x y", "s"), (2L, "x y", "s")).toDF("doc_id", "text", "source")
    TextAnalysis.vocabGrowth(rep, "doc_id", "text", "source", 2)
      .orderBy("bkt").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(5))).toSeq shouldBe
      Seq((0L, 2L, 2L), (1L, 0L, 2L))
  }

  test("sliceTokenJsd: hand-computed two-slice divergence; bounded by ln 2") {
    // A = {x,x}, B = {y,y}; corpus 50/50. JSD(P_A || corpus) for
    // P=(1,0) vs Q=(.5,.5) = 0.5*ln(4/3) + 0.5*(0.5*ln(2/3) + 0.5*ln 2)
    // = 0.215761 -- and by symmetry B matches A exactly.
    val df = Seq((1L, "x x", "A"), (2L, "y y", "B"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.sliceTokenJsd(df, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    out("A") shouldBe 0.215761 +- 1e-6
    out("B") shouldBe out("A")
    out.values.foreach(v => v should (be >= 0.0 and be <= 0.6931471805599453))
    // a slice IDENTICAL to the corpus diverges by 0
    val one = Seq((1L, "x y z", "only")).toDF("doc_id", "text", "source")
    TextAnalysis.sliceTokenJsd(one, "source", "text")
      .collect().head.getDouble(2) shouldBe 0.0
  }
  test("htmlToText: pinned recipe — elements, tags, entities, order") {
    import spark.implicits._
    val page = "<HTML><head><STYLE>b { x: \"r\"; }</STYLE></head>" +
      "<body a=\"1\"><p>alpha</p><script>if (1 < 2) { z = \"&amp;\"; }" +
      "</script><p>beta  &amp; tail &lt;b&gt; &#39;q&#39;&nbsp;end</p>" +
      "<p>&amp;lt;literal</p></body></html>"
    val got = Seq(page).toDF("h")
      .select(TextAnalysis.htmlToText(col("h"))).head.getString(0)
    // script/style dropped whole (the `<` inside script never leaks);
    // entity-coded brackets survive as TEXT; &amp; decodes LAST so
    // "&amp;lt;" means the literal text "&lt;", not "<"
    got shouldBe "alpha beta & tail <b> 'q' end &lt;literal"
  }

  test("linkHrefs + linkHost: anchor forms and host resolution") {
    import spark.implicits._
    val html = """<html><a href="http://A.Test/x">1</a>
      <a class="c" id="i" href="/rooted">2</a>
      <a href="//Proto.test/y">3</a><a href="rel/sub">4</a>
      <a href="https://sec.test/z?q=1">5</a><p>no links here</p>
      <area href="/not-an-anchor"></html>"""
    val df = Seq((0L, html, "base.test")).toDF("id", "html", "bh")
    val hrefs = df.select(explode(TextAnalysis.linkHrefs(col("html"))).as("h"))
      .collect().map(_.getString(0)).toSeq
    hrefs shouldBe Seq("http://A.Test/x", "/rooted", "//Proto.test/y",
      "rel/sub", "https://sec.test/z?q=1")
    val hosts = df.select(explode(TextAnalysis.linkHrefs(col("html"))).as("h"),
        col("bh"))
      .select(TextAnalysis.linkHost(col("h"), col("bh")).as("dst"))
      .collect().map(_.getString(0)).toSeq
    hosts shouldBe Seq("a.test", "base.test", "proto.test", "base.test",
      "sec.test")
  }
}
