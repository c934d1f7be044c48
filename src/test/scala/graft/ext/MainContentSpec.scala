package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [X] Main-content extraction: hand-pinned blocks on a literal page
  * (every classification rule exercised against values computed by
  * hand), the script-fabrication trap, ordered reassembly, and edge
  * shapes — the engine-internal half of q262's cross-engine pin.
  */
class MainContentSpec extends SparkSpec {
  import spark.implicits._

  private def run(html: String) =
    MainContent.blocks(Seq((1L, html)).toDF("id", "h"), "id", col("h"))
      .orderBy("pos")
      .select("pos", "btext", "link_chars", "n_tokens", "n_stop", "chars",
        "cls")
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(6)))

  test("hand-pinned page: every rule fires on its planted block") {
    val html =
      "<html><body>" +
        "<h1>Tiny head</h1>" + // 9 chars -> short
        // link wall: text 24+23=47+1 space = 48 chars, link 48 -> nav
        "<p><a href=\"/a\">Archive of older articles</a> " +
        "<a href=\"/b\">Catalog of all product</a></p>" +
        // prose: 9 tokens, 3 stops (the, of, the), 44 chars -> good
        "<p>the craft of writing gets the job done well</p>" +
        // jargon: 7 tokens, 0 stops, 43 chars -> low
        "<div>spark shuffle partition codegen catalyst tungsten plans</div>" +
        "</body></html>"
    val bs = run(html).filter(_._1.nonEmpty)
    bs.map(b => (b._1, b._6)) shouldBe Array(
      ("Tiny head", "short"),
      ("Archive of older articles Catalog of all product", "nav"),
      ("the craft of writing gets the job done well", "good"),
      ("spark shuffle partition codegen catalyst tungsten plans", "low"))
    // hand-computed numerics of the nav block: anchor texts are 25 and
    // 22 chars, space-joined = 48; btext is the same 48 (tags became
    // the separating space); 480 > 144
    val nav = bs(1)
    nav._2 shouldBe 48L // link_chars
    nav._5 shouldBe 48L // chars
    // the good block: 9 tokens, 3 stopwords, 3*20 >= 9
    bs(2)._3 shouldBe 9L
    bs(2)._4 shouldBe 3L
    // the low block: 7 tokens ("plans" is not a stopword), 0 stops
    bs(3)._3 shouldBe 7L
    bs(3)._4 shouldBe 0L
  }

  test("script content cannot fabricate a block; style vanishes whole") {
    val html = "<html><body><p>the first of all good and long texts</p>" +
      "<script>var x = \"<p>the the the of it is a fake block here</p>\";" +
      "</script>" +
      "<style>p { color: red } /* <div>the of and to in is</div> */</style>" +
      "<p>the second of all good and long texts</p></body></html>"
    val out = MainContent.extract(
      Seq((1L, html)).toDF("id", "h"), "id", col("h")).collect().head
    out.getString(1) shouldBe
      "the first of all good and long texts " +
        "the second of all good and long texts"
    out.getLong(3) shouldBe 2L // n_good — the fake block never existed
  }

  test("ordered reassembly across interleaved chrome; empty page") {
    val html = "<html><body>" +
      "<p>the alpha of it all begins right here now</p>" +
      "<p><a href=\"/x\">Directory of all member pages listed</a></p>" +
      "<p>the omega of it all ends right here now</p>" +
      "</body></html>"
    val out = MainContent.extract(
      Seq((1L, html)).toDF("id", "h"), "id", col("h")).collect().head
    out.getString(1) shouldBe
      "the alpha of it all begins right here now " +
        "the omega of it all ends right here now"
    val empty = MainContent.extract(
      Seq((1L, "<html><body></body></html>")).toDF("id", "h"),
      "id", col("h")).collect().head
    empty.getString(1) shouldBe ""
    empty.getLong(3) shouldBe 0L
  }

  test("boundary exactness: link density and stopword bars are strict") {
    // exactly 30% link chars (btext "abcdefghi xxx…x" = 9+1+20 = 30,
    // link 9): 90 > 90 is FALSE — the bound is strict — so the block
    // falls through to the stopword rule (0 stops -> low)
    val eq = "<p>" + "<a href=\"/l\">abcdefghi</a>" + "x" * 20 + "</p>"
    run("<html><body>" + eq + "</body></html>")
      .filter(_._1.nonEmpty).head._6 shouldBe "low"
    // one char more of link text tips it: chars 31, link 10 -> 100 > 93
    val over = "<p>" + "<a href=\"/l\">abcdefghij</a>" + "x" * 20 + "</p>"
    run("<html><body>" + over + "</body></html>")
      .filter(_._1.nonEmpty).head._6 shouldBe "nav"
    // exactly 5% stopwords: 20 tokens, 1 stop -> 20 >= 20 -> good
    val atBar = "<p>the " + (1 to 19).map(i => s"tok$i").mkString(" ") + "</p>"
    run("<html><body>" + atBar + "</body></html>")
      .filter(_._1.nonEmpty).head._6 shouldBe "good"
    // 0 stops in 19 tokens -> low
    val under = "<p>" + (1 to 19).map(i => s"tok$i").mkString(" ") + "</p>"
    run("<html><body>" + under + "</body></html>")
      .filter(_._1.nonEmpty).head._6 shouldBe "low"
  }

  test("<pre> is not a block boundary; <br/> and attributes are") {
    val html = "<html><body><p>the text of a <pre>x</pre> stays as one " +
      "good long block</p><p class=\"c\">the next of all blocks breaks " +
      "on attributed tags</p><p>the third of all blocks<br/>splits " +
      "on self-closing br tags</p></body></html>"
    val bs = run(html).filter(_._1.nonEmpty).map(_._1)
    // <pre> survives tag-STRIPPING inside the block (it is inline to
    // the splitter), so the first block keeps its full text
    bs(0) shouldBe "the text of a x stays as one good long block"
    bs(1) shouldBe "the next of all blocks breaks on attributed tags"
    // <br/> split the third paragraph into two blocks
    bs(2) shouldBe "the third of all blocks"
    bs(3) shouldBe "splits on self-closing br tags"
  }
}
