package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [X] Gopher-style repetition metrics (q59). */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("repetition metrics: uniqueness and top-bigram dominance") {
    val docs = Seq(
      (1L, "a b a b a b"),        // 6 tok, 2 uniq; "a b" 3×, "b a" 2× of 5
      (2L, "w x y z"),            // all unique; every bigram occurs once
      (3L, "solo"),               // single token: no bigrams
      (4L, "t t t t")             // fully degenerate
    ).toDF("doc_id", "text")
    val m = Repetition.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    m(0).getLong(1) shouldBe 6L
    m(0).getDouble(2) shouldBe (2.0 / 6 +- 1e-6)
    m(0).getDouble(3) shouldBe (3.0 / 5 +- 1e-6)
    m(1).getDouble(2) shouldBe 1.0
    m(1).getDouble(3) shouldBe (1.0 / 3 +- 1e-6)
    m(2).getLong(1) shouldBe 1L
    m(2).getDouble(3) shouldBe 0.0 // no bigrams → defined as 0, not null
    m(3).getDouble(2) shouldBe 0.25
    m(3).getDouble(3) shouldBe 1.0
  }

  test("metrics join adds no exchange beyond the two doc-keyed aggregates") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Repetition.repetitionMetrics(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // Aggregates and the final join are all keyed by doc_id; Spark reuses
    // the partitioning, so no exchange sits between the aggs and the join.
    assert(!plan.contains("CartesianProduct"))
  }
}
