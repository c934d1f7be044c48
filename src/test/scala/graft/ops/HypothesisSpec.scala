package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Welch's t-test and Mann-Whitney U (q226/q227), plus the mergeable
  * grid-quantile probe (q228). Assertions are hand-computed on tiny
  * cohorts — the portable-integer discipline means every statistic is a
  * deterministic function of exact counts.
  */
class HypothesisSpec extends SparkSpec {
  import spark.implicits._

  test("welchTTest: hand-computed t and Welch-Satterthwaite df") {
    // g1: {1,2,3} → n=3, m=2, v=1;  g2: {4,6} → n=2, m=5, v=2
    val df = Seq(("g1", 1), ("g1", 2), ("g1", 3), ("g2", 4), ("g2", 6))
      .toDF("g", "x")
    val out = Hypothesis.welchTTest(df, "g", col("x")).collect()
    out.length shouldBe 1
    val r = out.head
    (r.getString(0), r.getString(1)) shouldBe (("g1", "g2"))
    r.getDouble(4) shouldBe 2.0 // mean_a
    r.getDouble(5) shouldBe 5.0 // mean_b
    // se² = 1/3 + 2/2 = 4/3; t = -3 / sqrt(4/3) = -2.598076
    r.getDouble(6) shouldBe -2.598076 +- 1e-6
    // df = (4/3)² / ((1/3)²/2 + 1²/1) = (16/9) / (1/18 + 1) = 1.684211
    r.getDouble(7) shouldBe 1.684211 +- 1e-6
  }

  test("statsTable merge law + welchFromStats ≡ welchTTest math") {
    // same cohorts as the pair test, re-expressed as two tables over one
    // group key: {1,2,3} vs {4,6} → identical t and df
    val a = Seq(("k", 1), ("k", 2), ("k", 3)).toDF("g", "x")
    val b = Seq(("k", 4), ("k", 6)).toDF("g", "x")
    // linear merge: shard stats add exactly
    val mergedA = Hypothesis.mergeStatsTables(
      Hypothesis.statsTable(a.limit(1), "g", col("x")),
      Hypothesis.statsTable(a.exceptAll(a.limit(1)), "g", col("x")))
    mergedA.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq shouldBe Seq(("k", 3L, 6L, 14L))
    val out = Hypothesis.welchFromStats(mergedA,
      Hypothesis.statsTable(b, "g", col("x")), "g").collect()
    out.length shouldBe 1
    out.head.getDouble(5) shouldBe -2.598076 +- 1e-6
    out.head.getDouble(6) shouldBe 1.684211 +- 1e-6
  }

  test("welchTTest: n<2 groups and zero-variance pairs drop") {
    val df = Seq(("a", 5), ("a", 5), ("b", 7), ("b", 7), ("c", 1))
      .toDF("g", "x")
    // a and b both have v=0 → pooled se 0 → pair dropped; c has n=1
    Hypothesis.welchTTest(df, "g", col("x")).count() shouldBe 0L
  }

  test("mannWhitneyU: hand-computed doubled rank sum, U, ties, z") {
    // A = {1, 3, 3}, B = {2, 3, 5}: sorted 1,2,3,3,3,5
    // ranks: 1→1, 2→2, {3,3,3}→avg 4, 5→6; R_A = 1+4+4 = 9 → 2R_A = 18
    // 2U_A = 18 − 3·4 = 6; ties = 3³−3 = 24
    val df = Seq((true, 1.0), (true, 3.0), (true, 3.0),
      (false, 2.0), (false, 3.0), (false, 5.0))
      .map { case (a, v) => ("k", a, v) }.toDF("g", "ia", "v")
    val out = Hypothesis.mannWhitneyU(df, "g", col("ia"), col("v")).collect()
    out.length shouldBe 1
    val r = out.head
    (r.getLong(1), r.getLong(2)) shouldBe ((3L, 3L))
    r.getLong(3) shouldBe 6L   // 2U_A
    r.getLong(4) shouldBe 24L  // Σ(t³−t)
    // σ² = (9/12)·(7 − 24/30) = 0.75·6.2 = 4.65
    // z = (6 − 9) / (2·sqrt(4.65)) = −0.695608
    r.getDouble(5) shouldBe -0.695608 +- 1e-6
  }

  test("mannWhitneyU: all-tied group (σ²=0) and one-cohort group drop") {
    val df = Seq(("t", true, 1.0), ("t", false, 1.0),
      ("o", true, 1.0), ("o", true, 2.0)).toDF("g", "ia", "v")
    Hypothesis.mannWhitneyU(df, "g", col("ia"), col("v")).count() shouldBe 0L
  }

  test("twoProportionZ: hand-computed pooled z; degenerate groups drop") {
    // g: A 2/4 vs B 1/4 → pool 3/8, se = sqrt(.375·.625·.5) = 0.342329,
    // z = 0.25/se = 0.730297
    val df = Seq(
      ("g", true, true), ("g", true, true), ("g", true, false),
      ("g", true, false), ("g", false, true), ("g", false, false),
      ("g", false, false), ("g", false, false),
      // h: all successes in both arms → pooled rate 1 → se 0 → drops
      ("h", true, true), ("h", false, true),
      // i: arm B empty → drops
      ("i", true, true), ("i", true, false))
      .toDF("g", "ia", "s")
    val out = Hypothesis.twoProportionZ(df, "g", col("ia"), col("s"))
      .collect()
    out.length shouldBe 1
    val r = out.head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) shouldBe
      ((4L, 2L, 4L, 1L))
    r.getDouble(5) shouldBe 0.5
    r.getDouble(6) shouldBe 0.25
    r.getDouble(7) shouldBe 0.730297 +- 1e-6
  }

  test("cusum: prefix-identity excursion, earliest argmax, no-excursion -1") {
    // a (target 3): v 5,1,6,2 → S 2,0,3,2 → max 3 at bkt 2
    // b: all below target → S always 0 → bkt_at_max = -1
    // c: v 4,2,4,2 → S 1,0,1,0 → tie broken to the EARLIEST bucket (0)
    val grid = Seq(
      ("a", 0L, 5.0), ("a", 1L, 1.0), ("a", 2L, 6.0), ("a", 3L, 2.0),
      ("b", 0L, 1.0), ("b", 1L, 2.0),
      ("c", 0L, 4.0), ("c", 1L, 2.0), ("c", 2L, 4.0), ("c", 3L, 2.0))
      .toDF("k", "bkt", "v")
    val out = Timeseries.cusum(grid, "k", "bkt", "v", target = 3.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    out("a") shouldBe ((4L, 3.0, 2L))
    out("b") shouldBe ((2L, 0.0, -1L))
    out("c") shouldBe ((4L, 1.0, 0L))
  }

  test("rocAuc: exact rank AUC with the half-credit tie convention") {
    // g: pos {3,5} vs neg {1,4} → 3 of 4 pairs won → 0.75
    // t: pos {2,3} vs neg {2} → (2,2) ties ½, (3,2) wins → 1.5/2 = 0.75
    // p: perfect separation → 1.0;  r: reversed → 0.0
    val df = Seq(
      ("g", true, 3.0), ("g", true, 5.0), ("g", false, 1.0),
      ("g", false, 4.0),
      ("t", true, 2.0), ("t", true, 3.0), ("t", false, 2.0),
      ("p", true, 9.0), ("p", false, 1.0),
      ("r", true, 1.0), ("r", false, 9.0))
      .toDF("g", "y", "s")
    val out = Hypothesis.rocAuc(df, "g", col("y"), col("s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out("g") shouldBe ((2L, 2L, 0.75))
    out("t") shouldBe ((2L, 1L, 0.75))
    out("p") shouldBe ((1L, 1L, 1.0))
    out("r") shouldBe ((1L, 1L, 0.0))
  }

  test("confusionAtThresholds: counts, ratios, and NULL at 0 denominators") {
    val df = Seq(
      ("g", true, 3.0), ("g", true, 5.0), ("g", false, 1.0),
      ("g", false, 4.0)).toDF("g", "y", "s")
    val out = Hypothesis.confusionAtThresholds(df, "g", col("y"),
      col("s"), Seq(2.5, 10.0))
      .collect().map(r => r.getDouble(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          Option(r.get(6)), Option(r.get(7)), Option(r.get(8))))).toMap
    // t=2.5: tp 2 (3,5), fp 1 (4), fn 0, tn 1 → P 2/3, R 1, F1 0.8
    out(2.5) shouldBe ((2L, 1L, 0L, 1L,
      Some(0.666667), Some(1.0), Some(0.8)))
    // t=10: nothing predicted positive → precision NULL, recall 0
    out(10.0) shouldBe ((0L, 0L, 2L, 2L, None, Some(0.0), Some(0.0)))
    an[IllegalArgumentException] should be thrownBy
      Hypothesis.confusionAtThresholds(df, "g", col("y"), col("s"),
        Seq(Double.NaN))
  }

  test("quantilesFromEcdf: inverse CDF off a merged count table") {
    // values 1..10 once each: p50 → r=5 → v=5; p95 → r=ceil(9.5)=10 → v=10
    val a = Seq(1, 2, 3, 4, 5).map(_.toDouble).toDF("x")
    val b = Seq(6, 7, 8, 9, 10).map(_.toDouble).toDF("x")
    val merged = graft.ops.Drift.mergeEcdfTables(
      graft.ops.Drift.ecdfTable(a, "x"), graft.ops.Drift.ecdfTable(b, "x"))
    // merge law: ≡ one table over the union
    merged.orderBy("v").collect().map(r => (r.getDouble(0), r.getLong(1)))
      .toSeq shouldBe graft.ops.Drift.ecdfTable(a.union(b), "x")
      .orderBy("v").collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    val q = graft.ops.Drift.quantilesFromEcdf(merged, Seq(1, 50, 95, 100))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(3))))
      .toMap
    q(1) shouldBe ((1L, 1.0))    // r = max(1, ceil(0.1)) = 1
    q(50) shouldBe ((5L, 5.0))
    q(95) shouldBe ((10L, 10.0)) // ceil(9.5) = 10
    q(100) shouldBe ((10L, 10.0))
    an[IllegalArgumentException] should be thrownBy
      graft.ops.Drift.quantilesFromEcdf(merged, Seq(0))
  }
}
