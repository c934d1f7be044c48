package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite exact `percentile` aggregates to
  * `approx_percentile` (t-digest sketch) when the session opts in.
  *
  * The exact percentile buffers every value per group — fine for the
  * reference's per-way medians (≤ hundreds of vertices,
  * `update_ways_metadata.py:27-29`), unbounded at 100 TB group sizes.
  * SURVEY §4/§7 documents approx as the at-scale fallback; this rule makes
  * the swap a config flip instead of a code change, so the same pipeline
  * runs exact under the oracle and sketched at scale.
  *
  * Scope guards: only non-distinct, unfiltered aggregates over DOUBLE
  * children with the default frequency are rewritten — those are the
  * cases where ApproximatePercentile has the same result type.
  *
  * Semantics caveat: the two functions differ by more than sketch
  * error. Exact `Percentile` (percentile_cont) linearly INTERPOLATES
  * between neighbors, while `ApproximatePercentile` returns an actual
  * dataset element — so e.g. the median of an even-sized group differs
  * even at accuracy→∞. Use the flip where element-valued quantiles are
  * acceptable, not where interpolated quantiles are load-bearing.
  */
object ApproxMedianAtScale extends Rule[LogicalPlan] {
  val EnabledKey = "graft.approxPercentile.enabled"
  val AccuracyKey = "graft.approxPercentile.accuracy"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "false").toBoolean) plan
    else {
      val acc = conf.getConfString(AccuracyKey,
        ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY.toString).toInt
      plan.transformAllExpressions {
        case ae: AggregateExpression if shouldRewrite(ae) =>
          val p = ae.aggregateFunction.asInstanceOf[Percentile]
          ae.copy(aggregateFunction = new ApproximatePercentile(
            p.child, p.percentageExpression, Literal(acc)))
      }
    }

  private def shouldRewrite(ae: AggregateExpression): Boolean =
    ae.aggregateFunction match {
      case p: Percentile =>
        // !p.reverse: percentile_cont(... ORDER BY v DESC) plans as a
        // reversed Percentile; ApproximatePercentile is ascending-only,
        // so rewriting would return the mirrored quantile.
        !ae.isDistinct && ae.filter.isEmpty && !p.reverse &&
          p.child.dataType == DoubleType &&
          p.percentageExpression.foldable &&
          (p.frequencyExpression match {
            case Literal(1L, _) => true
            case _ => false
          })
      case _ => false
    }

  /** Attach to a live session (driver-provided sessions we didn't build;
    * the production route is `GraftExtensions`' injectOptimizerRule).
    * Idempotent.
    */
  def enable(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    spark.conf.set(EnabledKey, "true")
  }

  def disable(spark: SparkSession): Unit =
    spark.conf.set(EnabledKey, "false")
}
