package graft.ops

import graft.SparkSpec

/** As-of join semantics: greatest right time ≤ left time per key. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // trades (left) and quotes (right) per symbol
  private val trades = Seq(
    ("A", 10L, 100.0), ("A", 20L, 101.0), ("A", 35L, 102.0),
    ("B", 5L, 50.0), ("B", 6L, 51.0)
  ).toDF("sym", "t", "price")

  private val quotes = Seq(
    ("A", 8L, 99.5), ("A", 20L, 100.5), ("A", 30L, 101.5),
    ("B", 6L, 49.9), ("C", 1L, 1.0)
  ).toDF("sym", "qt", "quote")

  test("matches the greatest quote time ≤ trade time, per symbol") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "t", "qt")
      .orderBy("sym", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Any]("r_quote")))
    out.toSeq shouldBe Seq(
      ("A", 10L, 99.5),   // quote@8
      ("A", 20L, 100.5),  // simultaneous quote matches (≤)
      ("A", 35L, 101.5),  // quote@30
      ("B", 5L, null),    // no quote yet → null
      ("B", 6L, 49.9))    // simultaneous
  }

  test("left rows and columns are preserved exactly (left-outer shape)") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "t", "qt")
    out.count() shouldBe trades.count()
    out.columns.toSeq shouldBe Seq("sym", "t", "price", "r_quote")
    out.select("sym", "t", "price").exceptAll(trades).count() shouldBe 0L
  }

  test("plans with a single exchange per side and no nested loop") {
    val plan = AsOfJoin.asOf(trades, quotes, "sym", "t", "qt")
      .queryExecution.executedPlan.toString
    plan should not include "NestedLoop"
    plan should not include "CartesianProduct"
    // union-window formulation: exchanges only for the per-key window sort
    plan.linesIterator.count(_.trim.startsWith("Exchange")) should be <= 2
  }
}
