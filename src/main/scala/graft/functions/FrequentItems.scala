package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitter sketch as a typed Aggregator, plus the exact
  * two-pass heavy-hitter operator built on it.
  *
  * The sketch keeps at most `capacity` counters and is MERGEABLE in the
  * Agarwal et al. ("Mergeable Summaries", PODS'12) sense: under any
  * partial-aggregation tree, every item's estimate undercounts its true
  * frequency by at most n/(capacity+1). Consequence: any item with true
  * count > n/(capacity+1) is guaranteed present in the final sketch —
  * the sketch's ORDER of arrival affects the counter values, but never
  * loses a qualifying item. That makes the two-pass operator below exact
  * and deterministic even though the sketch itself is neither.
  *
  * Scale shape: pass 1 shuffles one ≤ capacity-entry map per partial
  * aggregate (vs a full groupBy's shuffle of the entire key space);
  * pass 2 recounts ONLY the ≤ capacity candidates via a broadcast
  * semi-filter. At 100 TB with a billion-key space and capacity 10³,
  * that's the difference between shuffling gigabytes of key counts and
  * shuffling kilobytes of sketches.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
  require(capacity >= 1, s"MisraGries: capacity must be >= 1, got $capacity")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(m: mutable.Map[String, Long], x: String): mutable.Map[String, Long] = {
    if (m.contains(x)) m(x) += 1L
    else if (m.size < capacity) m(x) = 1L
    else {
      // Classic MG step: a miss on a full sketch decrements every counter
      // (absorbing the new item against one of each existing one).
      val dead = mutable.ArrayBuffer.empty[String]
      m.keysIterator.foreach { k =>
        val v = m(k) - 1L
        if (v > 0L) m(k) = v else dead += k
      }
      dead.foreach(m.remove)
    }
    m
  }

  override def merge(a: mutable.Map[String, Long],
      b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (k, v) => a(k) = a.getOrElse(k, 0L) + v }
    if (a.size > capacity) {
      // Subtract the (capacity+1)-th largest counter from all and drop the
      // non-positive — at most `capacity` survive, and the subtracted
      // offset respects the mergeable-summaries error bound.
      val vals = a.values.toArray
      java.util.Arrays.sort(vals)
      val t = vals(vals.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.keysIterator.foreach { k =>
        val v = a(k) - t
        if (v > 0L) a(k) = v else dead += k
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(m: mutable.Map[String, Long]): Map[String, Long] = m.toMap

  // Buffers only cross the wire between partial and final aggregation;
  // opaque kryo skips the catalyst map conversion per row.
  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object FrequentItems {

  /** The sketch as a column aggregate: map of item → (undercounted)
    * estimate, at most `capacity` entries.
    */
  def mgSketch(c: Column, capacity: Int): Column =
    udaf(new MisraGries(capacity)).apply(c)

  /** EXACT heavy hitters: every item whose count exceeds `support · n`,
    * with exact counts and corpus share. Two passes: (1) the MG sketch
    * with capacity ⌈1/support⌉ — its guarantee makes the candidate set a
    * superset of every qualifying item; (2) an exact recount restricted
    * to the candidates (broadcast join), then the support filter on the
    * exact counts. The sketch's nondeterminism cannot reach the output:
    * candidates either pass the exact filter or don't.
    */
  def heavyHitters(df: DataFrame, itemCol: String, support: Double): DataFrame = {
    require(support > 0.0 && support < 1.0,
      s"heavyHitters: support must be in (0,1), got $support")
    val capacity = math.ceil(1.0 / support).toInt
    val items = df.select(col(itemCol).cast("string").as("w"))
    val cands = items.agg(mgSketch(col("w"), capacity).as("sk"))
      .select(explode(map_keys(col("sk"))).as("w"))
    val tot = items.agg(count(lit(1)).as("n_total"))
    items.join(broadcast(cands), "w")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .filter(col("cnt") > col("n_total") * support)
      .select(col("w"), col("cnt"),
        round(col("cnt").cast("double") / col("n_total").cast("double"), 6)
          .as("share"))
  }
}
