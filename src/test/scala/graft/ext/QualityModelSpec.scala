package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Weak-label logistic quality gate: fit separates separable labels, and
  * scoring is exactly the recorded broadcast-literal dot (the certificate
  * contract the q195 twin relies on).
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  test("fit separates a separable weak label; score ≡ recorded-literal dot") {
    // label 1 = long repetitive docs, label 0 = short ones: separable on
    // every feature, so the fitted gate must admit the long class
    val docs = ((0 until 40).map(i =>
      (i.toLong, Seq.fill(30)("verbose filler words").mkString(" "))) ++
      (40 until 80).map(i => (i.toLong, "tiny doc")))
      .toDF("doc_id", "text")
    val m = QualityModel.fit(docs, "doc_id", "text", col("doc_id") < 40)
    m.weights.length shouldBe 3
    val scored = QualityModel.score(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    (0 until 40).foreach(i => scored(i.toLong)._2 shouldBe 1)
    (40 until 80).foreach(i => scored(i.toLong)._2 shouldBe 0)
    // score is EXACTLY the left-associated literal dot over the features
    val Array(w1, w2, w3) = m.weights
    docs.collect().foreach { r =>
      val toks = r.getString(1).split(" ", -1)
      val lg = toks.length.toDouble * w1 +
        toks.distinct.length.toDouble * w2 +
        r.getString(1).length.toDouble * w3 + m.intercept
      val expected = BigDecimal(lg)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      scored(r.getLong(0))._1 shouldBe expected
    }
  }
}
