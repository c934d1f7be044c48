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

  test("forward direction matches the smallest quote time ≥ trade time") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "t", "qt",
      direction = "forward")
      .orderBy("sym", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Any]("r_quote")))
    out.toSeq shouldBe Seq(
      ("A", 10L, 100.5),  // next quote @20
      ("A", 20L, 100.5),  // simultaneous matches (≥)
      ("A", 35L, null),   // nothing after 30 → null
      ("B", 5L, 49.9),    // quote @6
      ("B", 6L, 49.9))    // simultaneous
  }

  test("nearest picks the closer side; exact tie keeps backward") {
    // trade A@25: quote@20 (dist 5) vs quote@30 (dist 5) → tie → backward.
    val t2 = Seq(("A", 25L, 1.0), ("A", 9L, 2.0), ("A", 31L, 3.0))
      .toDF("sym", "t", "price")
    val out = AsOfJoin.asOf(t2, quotes, "sym", "t", "qt",
      direction = "nearest")
      .orderBy("t")
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    out.toSeq shouldBe Seq(
      (9L, 99.5),    // dist to 8 = 1 < dist to 20 = 11
      (25L, 100.5),  // tie 5/5 → backward quote@20
      (31L, 101.5))  // dist to 30 = 1 < ∞ forward
  }

  test("nearest falls back to the only available side") {
    val t2 = Seq(("B", 1L, 1.0), ("B", 100L, 2.0), ("D", 7L, 3.0))
      .toDF("sym", "t", "price")
    val out = AsOfJoin.asOf(t2, quotes, "sym", "t", "qt",
      direction = "nearest")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Any]("r_quote")))
      .toSet
    out shouldBe Set(
      ("B", 1L, 49.9),   // only forward exists
      ("B", 100L, 49.9), // only backward exists
      ("D", 7L, null))   // no right rows for key at all
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
