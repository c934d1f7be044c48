package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot CDC classification (q62) — the derivation dual of Upsert. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, 10.0, "x"), (2L, 20.0, "y"), (3L, 30.0, "z")
  ).toDF("k", "v", "s")

  test("classifies insert / delete / update / same, null-safely") {
    val newSnap = Seq(
      (1L, 10.0, "x"),  // same
      (2L, 25.0, "y"),  // update (v)
      (4L, 40.0, "w")   // insert; 3 missing → delete
    ).toDF("k", "v", "s")
    val out = Cdc.snapshotDiff(oldSnap, newSnap, "k", Seq("v", "s"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    out.toSeq shouldBe Seq(
      (1L, "same"), (2L, "update"), (3L, "delete"), (4L, "insert"))
  }

  test("a value moving to or from NULL counts as an update") {
    val withNull = Seq((1L, Option.empty[java.lang.Double], "x"))
      .toDF("k", "v", "s")
    val out = Cdc.snapshotDiff(oldSnap.filter($"k" === 1L), withNull,
      "k", Seq("v", "s")).collect()
    out.head.getString(1) shouldBe "update"
    // NULL == NULL is 'same' under the null-safe comparison
    val both = Cdc.snapshotDiff(withNull, withNull, "k", Seq("v", "s")).collect()
    both.head.getString(1) shouldBe "same"
  }

  test("diff then apply reproduces the new snapshot (round-trip with Upsert)") {
    val newSnap = Seq(
      (1L, 10.0, "x"), (2L, 25.0, "y"), (4L, 40.0, "w"), (5L, 50.0, "v")
    ).toDF("k", "v", "s")
    val diff = Cdc.snapshotDiff(oldSnap, newSnap, "k", Seq("v", "s"))
    val upserts = newSnap.join(
      diff.filter($"change".isin("insert", "update")), Seq("k"), "left_semi")
    val deletes = diff.filter($"change" === "delete").select("k")
    val applied = Upsert.upsert(oldSnap, upserts, "k")
      .join(deletes, Seq("k"), "left_anti")
    applied.orderBy("k").collect().toSeq shouldBe
      newSnap.orderBy("k").collect().toSeq
  }

  test("duplicate keys violate the precondition: guard throws, diff fans out") {
    val dupes = Seq((2L, 20.0, "y"), (2L, 21.0, "y2"), (4L, 40.0, "w"))
      .toDF("k", "v", "s")
    // The cheap guard names the offending key.
    val ex = intercept[IllegalArgumentException] {
      Cdc.assertUniqueKey(dupes, "k")
    }
    ex.getMessage should include("key 2 has 2 rows")
    Cdc.assertUniqueKey(oldSnap, "k") // unique input passes
    // And this is the fan-out it protects against: key 2 appears twice
    // in the diff, with contradictory labels possible.
    val fanned = Cdc.snapshotDiff(oldSnap, dupes, "k", Seq("v", "s"))
      .filter($"k" === 2L).count()
    fanned shouldBe 2L
  }

  test("no compare columns → only membership changes") {
    val newSnap = Seq((2L, 99.0, "q"), (4L, 1.0, "r")).toDF("k", "v", "s")
    val out = Cdc.snapshotDiff(oldSnap, newSnap, "k", Seq.empty)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    out(2L) shouldBe "same" // values differ but nothing is compared
    out(3L) shouldBe "delete"
    out(4L) shouldBe "insert"
  }
}
