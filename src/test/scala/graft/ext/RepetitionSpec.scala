package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [X] Gopher-style repetition metrics (q59). */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("repetition metrics: uniqueness and top-bigram dominance") {
    val docs = Seq(
      (1L, "a b a b a b"),        // 6 tok, 2 uniq; "a b" 3×, "b a" 2× of 5
      (2L, "w x y z"),            // all unique; every bigram occurs once
      (3L, "solo"),               // single token: no bigrams
      (4L, "t t t t")             // fully degenerate
    ).toDF("doc_id", "text")
    val m = Repetition.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    m(0).getLong(1) shouldBe 6L
    m(0).getDouble(2) shouldBe (2.0 / 6 +- 1e-6)
    m(0).getDouble(3) shouldBe (3.0 / 5 +- 1e-6)
    m(1).getDouble(2) shouldBe 1.0
    m(1).getDouble(3) shouldBe (1.0 / 3 +- 1e-6)
    m(2).getLong(1) shouldBe 1L
    m(2).getDouble(3) shouldBe 0.0 // no bigrams → defined as 0, not null
    m(3).getDouble(2) shouldBe 0.25
    m(3).getDouble(3) shouldBe 1.0
  }

  test("dupNgramProfile: exact fractions on a known repeater") {
    // "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] → top "a b"×3
    // (glen 3), dup chars = 3·3 + 2·3 = 15; doc_len = 11.
    val docs = Seq((1L, "a b a b a b"), (2L, "x y z")).toDF("doc_id", "text")
    val got = Repetition.dupNgramProfile(docs, "doc_id", "text", Seq(2, 5))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got((1L, 2)) shouldBe ((r6(9.0 / 11), r6(15.0 / 11)))
    // 5-grams of 6 tokens: [a b a b a, b a b a b] — both unique (glen 9)
    got((1L, 5)) shouldBe ((r6(9.0 / 11), 0.0))
    // doc 2 has no 5-gram → no (2, 5) row; unique 2-grams → dup 0
    got.contains((2L, 5)) shouldBe false
    got((2L, 2)) shouldBe ((r6(3.0 / 5), 0.0))
  }

  test("dupNgramProfile ≡ driver brute force on the sf0.001 corpus slice") {
    val docs = graft.Tables.documents(spark, graft.TestSpark.Sf0001)
      .filter(col("doc_id") < 30)
    val ns = Seq(2, 3, 4, 5, 6)
    val got = Repetition.dupNgramProfile(docs, "doc_id", "text", ns)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ref = docs.select("doc_id", "text").collect().flatMap { row =>
      val (id, text) = (row.getLong(0), row.getString(1))
      val t = text.split(" ", -1)
      ns.filter(_ <= t.length).map { n =>
        val grams = t.sliding(n).map(_.mkString(" ")).toSeq
        val byG = grams.groupBy(identity).view.mapValues(_.size).toMap
        // count-argmax, longer-gram tiebreak — the packed-long convention
        val top = {
          val (c, gl) = byG.iterator.map { case (g, cc) => (cc.toLong, g.length.toLong) }.max
          c * gl
        }
        val dup = byG.collect { case (g, c) if c >= 2 => c.toLong * g.length }.sum
        (id, n) -> ((r6(top.toDouble / text.length),
          r6(dup.toDouble / text.length)))
      }
    }.toMap
    got shouldBe ref
  }

  test("metrics join adds no exchange beyond the two doc-keyed aggregates") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Repetition.repetitionMetrics(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // Aggregates and the final join are all keyed by doc_id; Spark reuses
    // the partitioning, so no exchange sits between the aggs and the join.
    assert(!plan.contains("CartesianProduct"))
  }
}
