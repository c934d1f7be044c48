package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed exact-median aggregator — the custom-UDAF exemplar of SURVEY
  * §2.11, matching `np.median` semantics (`update_ways_metadata.py:29`):
  * sort, take the middle element, average the two middle elements on even
  * counts. Bit-identical to Spark's built-in `percentile(x, 0.5)` (linear
  * interpolation at q=0.5 reduces to the same mean) — the built-in remains
  * the production path; this exists to pin the semantics in one place and
  * exercise the Aggregator surface.
  *
  * Memory: buffers the group's values (like the built-in exact
  * percentile). Bounded-memory at 100 TB is `approx_percentile` — see
  * SURVEY §4.
  */
object ExactMedian extends Aggregator[Double, ArrayBuffer[Double], Double] {

  override def zero: ArrayBuffer[Double] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[Double], a: Double): ArrayBuffer[Double] = {
    b += a; b
  }

  override def merge(x: ArrayBuffer[Double], y: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    x ++= y; x
  }

  override def finish(b: ArrayBuffer[Double]): Double = {
    if (b.isEmpty) return Double.NaN
    val a = b.toArray
    java.util.Arrays.sort(a)
    val n = a.length
    if (n % 2 == 1) a(n / 2)
    else (a(n / 2 - 1) + a(n / 2)) / 2.0
  }

  // Buffers are engine-internal (shuffled between partial and final agg),
  // so an opaque kryo encoding is the right trade: no row conversion cost.
  override def bufferEncoder: Encoder[ArrayBuffer[Double]] =
    Encoders.kryo[ArrayBuffer[Double]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form, usable in `agg(...)`. */
  def median(c: Column): Column = udaf(ExactMedian).apply(c)
}
