package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The §4 "approx at scale" optimizer rule: exact percentile under the
  * oracle, t-digest sketch when the session opts in — same code.
  */
class ApproxMedianRuleSpec extends SparkSpec {
  import spark.implicits._

  private val df = (1 to 1001).map(i => (i % 10, i.toDouble)).toDF("g", "v")
  private def medianPlan = df.groupBy("g")
    .agg(percentile($"v", lit(0.5)).as("med"))

  private def optimized = medianPlan.queryExecution.optimizedPlan.toString

  test("off by default: exact percentile survives optimization") {
    ApproxMedianAtScale.enable(spark) // attach rule...
    ApproxMedianAtScale.disable(spark) // ...but leave the flag off
    optimized should include("percentile")
    optimized should not include "percentile_approx"
  }

  test("flag on: percentile rewritten to approx_percentile, values close") {
    ApproxMedianAtScale.enable(spark)
    try {
      optimized should include("percentile_approx")
      val approx = medianPlan.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      ApproxMedianAtScale.disable(spark)
      val exact = medianPlan.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      exact.foreach { case (g, ex) =>
        math.abs(approx(g) - ex) / ex should be <= 0.02
      }
      // result schema is unchanged by the rewrite (double stays double)
      medianPlan.schema("med").dataType.typeName shouldBe "double"
    } finally ApproxMedianAtScale.disable(spark)
  }

  test("guards: distinct / non-double / weighted percentiles stay exact") {
    ApproxMedianAtScale.enable(spark)
    try {
      val intPlan = (1 to 100).toDF("i").agg(percentile($"i", lit(0.5)))
        .queryExecution.optimizedPlan.toString
      intPlan should not include "percentile_approx"
      val distinctPlan = df.groupBy("g")
        .agg(percentile_approx($"v", lit(0.5), lit(100))) // already approx: untouched
      distinctPlan.collect().length shouldBe 10
      // descending percentile_cont is a reversed Percentile: the sketch is
      // ascending-only, so a rewrite would return the mirrored quantile
      df.createOrReplaceTempView("amr_t")
      val descPlan = spark.sql(
        "SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY v DESC) FROM amr_t")
      descPlan.queryExecution.optimizedPlan.toString should not include "percentile_approx"
      val asc = spark.sql(
        "SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY v) FROM amr_t")
        .head().getDouble(0)
      val desc = descPlan.head().getDouble(0)
      desc should be > asc // 75th vs 25th — mirrored quantiles stay exact
    } finally ApproxMedianAtScale.disable(spark)
  }
}
