package graft.ops

import graft.SparkSpec

/** SCD2 interval build: episode collapse, interval chaining, null states. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    // key 1: A A B A  → episodes A[1,3) B[3,4) A[4,∞)
    (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"), (1L, 4L, "A"),
    // key 2: single row → one open episode
    (2L, 5L, "X")
  ).toDF("k", "ts", "state")

  test("consecutive duplicates collapse; intervals chain; last is current") {
    val out = Scd.scd2(log, "k", Seq("ts"), Seq("state"))
      .select($"k", $"state", $"eff_from", $"eff_to", $"is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    out shouldBe Set(
      (1L, "A", 1L, 3L, false),
      (1L, "B", 3L, 4L, false),
      (1L, "A", 4L, -1L, true),
      (2L, "X", 5L, -1L, true))
  }

  test("an all-NULL opening state still opens its key's first episode") {
    val withNull = Seq(
      (1L, 1L, null.asInstanceOf[String]), (1L, 2L, "A"))
      .toDF("k", "ts", "state")
    val out = Scd.scd2(withNull, "k", Seq("ts"), Seq("state"))
      .select($"eff_from").collect().map(_.getLong(0)).toSet
    out shouldBe Set(1L, 2L) // null episode AND the A episode both present
  }

  test("multi-column state: change in ANY column opens an episode") {
    val two = Seq((1L, 1L, "A", 10), (1L, 2L, "A", 20), (1L, 3L, "A", 20))
      .toDF("k", "ts", "s1", "s2")
    val out = Scd.scd2(two, "k", Seq("ts"), Seq("s1", "s2"))
    out.count() shouldBe 2 // s2 10→20 opens; third row collapses
  }
}
