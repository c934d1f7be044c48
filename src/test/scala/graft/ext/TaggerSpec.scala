package graft.ext

import graft.SparkSpec

/** [X] dictionary tagging: Aho-Corasick automaton ≡ relational
  * replace-count on overlap-adversarial fixtures and random text — the
  * engine-internal half of q255's cross-engine pin.
  */
class TaggerSpec extends SparkSpec {
  import spark.implicits._

  private def auto(text: String, pats: Seq[String]): Map[String, Long] = {
    val c = new Tagger.Automaton(pats.toArray).counts(text)
    pats.zipWithIndex.collect { case (p, i) if c(i) > 0 => p -> c(i) }.toMap
  }

  /** The reference semantics: Java indexOf-then-skip loop. */
  private def naive(text: String, pats: Seq[String]): Map[String, Long] =
    pats.flatMap { p =>
      var i = 0; var n = 0L
      while ({ val j = text.indexOf(p, i); j >= 0 && { n += 1; i = j + p.length; true } }) ()
      if (n > 0) Some(p -> n) else None
    }.toMap

  test("hand-computed overlap cases") {
    auto("panama", Seq("pan", "ana", "nam")) shouldBe
      Map("pan" -> 1L, "ana" -> 1L, "nam" -> 1L)
    // self-overlap: non-overlapping greedy
    auto("aaaa", Seq("aa")) shouldBe Map("aa" -> 2L)
    auto("aaa", Seq("aa")) shouldBe Map("aa" -> 1L)
    // multi-word pattern with shared boundary
    auto("a a a", Seq("a a", "a")) shouldBe Map("a a" -> 1L, "a" -> 3L)
    // prefix family: shorter pattern fires inside longer one
    auto("table table", Seq("ta", "table", "able")) shouldBe
      Map("ta" -> 2L, "table" -> 2L, "able" -> 2L)
    // no hits at all
    auto("zzz", Seq("a", "ab")) shouldBe Map.empty
  }

  test("automaton ≡ indexOf loop on random overlap-heavy text (property)") {
    val pats = Seq("a", "ab", "aba", "b ", "a a", "bb", "ba b")
    val rnd = new scala.util.Random(42)
    (0 until 300).foreach { _ =>
      val t = (0 until rnd.nextInt(60))
        .map(_ => "ab "(rnd.nextInt(3))).mkString
      auto(t, pats) shouldBe naive(t, pats)
    }
  }

  test("tagCountsAuto ≡ tagCountsScan on a DataFrame") {
    val docs = Seq(
      (0L, "panama banana"), (1L, "a a a table"), (2L, ""),
      (3L, "aa aaa aaaa"), (4L, "b ab aba abab")).toDF("doc_id", "text")
    val pats = Seq("a", "an", "ana", "aa", "ab", "table", "a a")
    val a = Tagger.tagCountsAuto(docs, "doc_id", "text", pats)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val s = Tagger.tagCountsScan(docs, "doc_id", "text", pats)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    a shouldBe s
    a((1L, "a a")) shouldBe 1L
    a((3L, "aa")) shouldBe 4L // aa|1, aa a|1, aa aa|2
  }

  test("dictionary validation is loud") {
    intercept[IllegalArgumentException] {
      Tagger.tagCountsAuto(Seq((0L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", Seq("a", "a"))
    }.getMessage should include("duplicate")
    intercept[IllegalArgumentException] {
      new Tagger.Automaton(Array(""))
    }.getMessage should include("empty pattern")
    intercept[IllegalArgumentException] {
      new Tagger.Automaton(Array.empty[String])
    }.getMessage should include("empty dictionary")
  }
}
