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

  test("plans as a hash equi-join, not a nested loop") {
    val l = spark.range(100).select(col("id").as("lid"), (col("id") * 1.7).as("lv"))
    val r = spark.range(100).select(col("id").as("rid"), (col("id") * 2.3).as("rv"))
    val plan = RangeJoin.banded(l, r, "lv", "rv", 10.0)
      .queryExecution.executedPlan.toString
    plan should not include "NestedLoop"
    plan should (include("HashJoin") or include("SortMergeJoin"))
  }
}
