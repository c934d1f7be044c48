package graft.ops

import graft.SparkSpec

/** One-pass long-format table profiling. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: per-column nonnull/distinct/min/max, nulls excluded") {
    val df = Seq(
      (1L, Some("b"), 10),
      (2L, None, 10),
      (3L, Some("a"), 30)
    ).toDF("id", "s", "v")
    val p = Profile.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    p("id") shouldBe ((3L, 3L, "1", "3"))
    p("s") shouldBe ((2L, 2L, "a", "b")) // null neither counted nor min
    p("v") shouldBe ((3L, 2L, "10", "30"))
  }

  test("profile runs as a single one-scan job (no per-column passes)") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val plan = Profile.profile(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    // multiple count-distincts compile to ONE Expand over one scan
    plan.linesIterator.count(_.contains("Expand [")) shouldBe 1
  }

  test("madOutlierProfile: hand-computed median/MAD/outlier count") {
    // group a: 1 2 3 4 100 → med 3, |dev| = 2 1 0 1 97 → MAD 1,
    //   outliers (> 3·1): only 100 → n_out 1
    // group b: 5 5 5 7 → med 5, |dev| = 0 0 0 2 → MAD 0 (degenerate),
    //   outliers (> 0): only 7 → n_out 1
    val df = (Seq(1, 2, 3, 4, 100).map(("a", _)) ++
      Seq(5, 5, 5, 7).map(("b", _))).toDF("g", "v")
    val out = Profile.madOutlierProfile(df, "g", "v", k = 3.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    out("a") shouldBe ((3.0, 1.0, 5L, 1L))
    out("b") shouldBe ((5.0, 0.0, 4L, 1L))
  }

  test("madOutlierProfile: even counts interpolate; robust to the outlier") {
    // 1 2 3 1000: med 2.5 (interpolated), |dev| = 1.5 .5 .5 997.5 →
    // MAD = 1.0; the huge value does NOT drag the center (vs mean 251.5)
    val df = Seq(1, 2, 3, 1000).map(("a", _)).toDF("g", "v")
    val r = Profile.madOutlierProfile(df, "g", "v").collect().head
    r.getDouble(1) shouldBe 2.5
    r.getDouble(2) shouldBe 1.0
    r.getLong(4) shouldBe 1L
  }

  test("groupOls: exact fit on a perfect line; r2 = 1") {
    // y = 3x + 2 exactly
    val df = (1 to 10).map(x => ("a", x, 3 * x + 2)).toDF("g", "x", "y")
    val r = Profile.groupOls(df, "g", "x", "y").collect().head
    r.getLong(1) shouldBe 10L
    r.getDouble(2) shouldBe 3.0 +- 1e-9
    r.getDouble(3) shouldBe 2.0 +- 1e-9
    r.getDouble(4) shouldBe 1.0 +- 1e-9
  }

  test("groupOls: hand-computed slope on a noisy group; degenerate nulls") {
    // points (0,0) (1,1) (2,1): n=3 sx=3 sy=2 sxy=3 sxx=5
    // slope = (9-6)/(15-9) = 0.5; intercept = (2 - 0.5·3)/3 = 1/6
    // r2 = 3²/(6·(3·2-4)) = 9/12 = 0.75
    val df = (Seq((0, 0), (1, 1), (2, 1)).map { case (x, y) => ("a", x, y) } ++
      Seq(("cx", 5, 1), ("cx", 5, 9), // constant x → no fit
        ("cy", 1, 4), ("cy", 2, 4))) // constant y → slope 0, r2 null
      .toDF("g", "x", "y")
    val out = Profile.groupOls(df, "g", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    out("a").getDouble(2) shouldBe 0.5 +- 1e-9
    out("a").getDouble(3) shouldBe (1.0 / 6) +- 1e-6
    out("a").getDouble(4) shouldBe 0.75 +- 1e-9
    out("cx").isNullAt(2) shouldBe true
    out("cx").isNullAt(3) shouldBe true
    out("cx").isNullAt(4) shouldBe true
    out("cy").getDouble(2) shouldBe 0.0 +- 1e-9
    out("cy").isNullAt(4) shouldBe true
  }

  test("paretoFront2D ≡ brute dominance filter; ties on both axes kept") {
    // (id, maximize q, minimize c) — includes an exact tie pair (5, 6)
    val rows = Seq((1L, 10L, 100L), (2L, 10L, 90L), (3L, 8L, 80L),
      (4L, 8L, 95L), (5L, 6L, 80L), (6L, 6L, 80L), (7L, 12L, 200L),
      (8L, 5L, 70L), (9L, 4L, 70L))
    val got = Profile.paretoFront2D(rows.toDF("id", "q", "c"), "q", "c")
      .collect().map(_.getAs[Long]("id")).toSet
    val brute = rows.filterNot { p =>
      rows.exists(o => o != p && o._2 >= p._2 && o._3 <= p._3 &&
        (o._2 > p._2 || o._3 < p._3))
    }.map(_._1).toSet
    got shouldBe brute
    got shouldBe Set(2L, 3L, 7L, 8L) // 5/6 tie dominated by 3 (8 > 6, 80 ≤ 80)
  }

  test("giniIndex: hand-computed concentration, tie invariance, equal = 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),   // G = 0.25
      ("b", 5L), ("b", 5L),                          // equal -> 0
      ("c", 0L), ("c", 0L), ("c", 10L)               // one holder -> 2/3
    ).toDF("g", "x")
    val out = Profile.giniIndex(df, "g", col("x"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    out("a") shouldBe ((4L, 0.25))
    out("b") shouldBe ((2L, 0.0))
    out("c")._2 shouldBe 0.666667 +- 1e-6
    // zero-sum group drops
    Profile.giniIndex(Seq(("z", 0L)).toDF("g", "x"), "g", col("x"))
      .count() shouldBe 0L
  }
}
