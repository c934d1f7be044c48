package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("... graft_dot(a, b) ...")` works alongside the Column API.
  *
  * Two entry points:
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *     build (the production route — survives session cloning);
  *   - [[GraftFunctions.register]] on a live session (the route for
  *     driver-provided sessions we didn't build).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    // Off by default (graft.approxPercentile.enabled) — the oracle runs
    // exact; flipping the conf swaps in the t-digest sketch at scale.
    ext.injectOptimizerRule(_ => ApproxMedianAtScale)
  }
}

object GraftFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val dotDescription: FunctionDescription = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, null, "graft_dot",
      "graft_dot(a, b) - sequential dot product of two double arrays", ""),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  val intersectDescription: FunctionDescription = (
    FunctionIdentifier("graft_sorted_intersect_count"),
    new ExpressionInfo(classOf[SortedIntersectCount].getName, null,
      "graft_sorted_intersect_count",
      "graft_sorted_intersect_count(a, b) - intersection size of two " +
        "ascending-sorted long arrays (linear merge). PRECONDITION: both " +
        "arrays must be sorted ascending and contain no null elements; " +
        "unsorted or null-holding input yields an unspecified count " +
        "(use array_sort + filter(x -> x is not null) first)", ""),
    (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1)))

  val hilbertDescription: FunctionDescription = (
    FunctionIdentifier("graft_hilbert"),
    new ExpressionInfo(classOf[HilbertIndex].getName, null, "graft_hilbert",
      "graft_hilbert(x, y, order) - Hilbert-curve index of 2-D cell " +
        "(x, y), both in [0, 2^order); order must be a literal in " +
        "[1, 31]", ""),
    (children: Seq[Expression]) => {
      require(children.length == 3, "graft_hilbert takes (x, y, order)")
      val order = children(2) match {
        case lit if lit.foldable && lit.eval() != null =>
          lit.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"graft_hilbert: order must be an integer literal, got $other")
          }
        case _ => throw new IllegalArgumentException(
          "graft_hilbert: order must be a foldable literal")
      }
      // Validate at the SQL surface too (HilbertIndex's constructor
      // require is the backstop): a clear builder-level message beats a
      // case-class init error surfacing mid-analysis.
      if (order < 1 || order > 31) throw new IllegalArgumentException(
        s"graft_hilbert: order must be in [1, 31], got $order")
      HilbertIndex(children(0), children(1), order)
    })

  val all: Seq[FunctionDescription] =
    Seq(dotDescription, intersectDescription, hilbertDescription)

  /** Register every graft function into an existing session's registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.graftbridge.FunctionBridge
        .register(spark, ident, info, builder)
    }
}
