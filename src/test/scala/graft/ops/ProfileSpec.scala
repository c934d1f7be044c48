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
}
