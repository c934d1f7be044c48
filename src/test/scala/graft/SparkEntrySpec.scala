package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Driver-contract smoke: entry() yields rows; every registered query runs
  * at sf0.001 and every oracle key maps to a real query.
  */
class SparkEntrySpec extends AnyFunSuite with Matchers {
  private def spark = TestSpark.spark

  test("entry() returns rows on sf0.001") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("oracleSql keys are a subset of queries keys") {
    SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet) shouldBe empty
  }

  test("every registered query executes at sf0.001 and returns rows") {
    // q27's 0.5-cosine near-dup threshold legitimately matches no pair in
    // the 500-vector sf0.001 sample — empty is its correct answer there.
    val mayBeEmpty = Set("q27_embedding_near_dup")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, TestSpark.Sf0001).count()
          if (n > 0 || mayBeEmpty(name)) None else Some(s"$name: 0 rows")
        } catch { case e: Exception => Some(s"$name: ${e.getMessage}") }
    }
    failures shouldBe empty
  }
}
