package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** J3 analog: banded equi-joinification must equal the nested-loop band
  * join exactly, including cell-boundary and negative values.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("banded == naive band join on adversarial values") {
    // values straddling cell boundaries, negatives, exact-width gaps
    val l = Seq(0.0, 49.999, 50.0, 99.9, -0.1, -50.0, 150.0, 200.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
    val r = Seq(25.0, 50.0, 100.0, -25.0, -100.0, 149.0, 250.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
    val banded = RangeJoin.banded(l, r, "lv", "rv", 50.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.join(r, abs(col("lv") - col("rv")) <= 50.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    banded shouldBe naive
    banded should not be empty
  }

  test("intervalOverlap == naive overlap join, each pair exactly once") {
    // Random-ish intervals spanning 0..3 cells at width 10, incl. point
    // intervals, cell-boundary endpoints, and nested intervals.
    val iv = Seq(
      (1L, 0L, 5L), (2L, 5L, 5L), (3L, 9L, 10L), (4L, 10L, 30L),
      (5L, 12L, 13L), (6L, 29L, 31L), (7L, 40L, 41L), (8L, 0L, 35L)
    )
    val l = iv.map { case (i, s, e) => (1L, i, s, e) }
      .toDF("k", "lid", "ls", "le")
    val r = iv.map { case (i, s, e) => (1L, i, s, e) }
      .toDF("k", "rid", "rs", "re")
    val fast = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re",
      Seq("k"), 10L).select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val naive = l.join(r, col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    fast.toSet shouldBe naive.toSet
    // canonical-cell attribution: no pair appears twice
    fast.length shouldBe fast.toSet.size
    fast.toSet should contain((4L, 6L)) // overlap across a cell boundary
    fast.toSet should contain((8L, 5L)) // nested interval
  }

  test("intervalOverlap ≡ naive on 200 random intervals, several widths (property)") {
    val rnd = new scala.util.Random(42)
    val iv = (1L to 200L).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i % 3, i, s, s + rnd.nextInt(40).toLong) // 3 keys, lengths 0..39
    }
    val l = iv.toDF("k", "lid", "ls", "le")
    val r = iv.map { case (k, i, s, e) => (k, i, s, e) }
      .toDF("k", "rid", "rs", "re")
    val naiveSet = l.join(r.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    for (w <- Seq(7L, 40L, 500L)) {
      val fast = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re",
        Seq("k"), w).select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1)))
      fast.toSet shouldBe naiveSet
      withClue(s"width $w duplicates: ") {
        fast.length shouldBe fast.toSet.size
      }
    }
  }

  test("intervalOverlap respects the equi-key restriction") {
    val l = Seq((1L, 10L, 0L, 100L), (2L, 20L, 0L, 100L))
      .toDF("k", "lid", "ls", "le")
    val r = Seq((1L, 30L, 50L, 60L), (2L, 40L, 50L, 60L))
      .toDF("k", "rid", "rs", "re")
    val out = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re",
      Seq("k"), 50L).select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    out shouldBe Set((10L, 30L), (20L, 40L)) // never across keys
  }

  test("plans as a hash equi-join, not a nested loop") {
    val l = spark.range(100).select(col("id").as("lid"), (col("id") * 1.7).as("lv"))
    val r = spark.range(100).select(col("id").as("rid"), (col("id") * 2.3).as("rv"))
    val plan = RangeJoin.banded(l, r, "lv", "rv", 10.0)
      .queryExecution.executedPlan.toString
    plan should not include "NestedLoop"
    plan should (include("HashJoin") or include("SortMergeJoin"))
  }
}
