package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.types._

/** Testdata schema canary. The driver has regenerated the parquet tables
  * mid-stream with DIFFERENT physical types before (round 8: `events.ts`
  * went INT64 TIMESTAMP(NANOS) → TIMESTAMP_NTZ and 18 queries errored with
  * messages that pointed nowhere near the cause). This suite fails FIRST
  * and NAMES the event: if it goes red after a testdata refresh, check the
  * parquet physical schemas (`pyarrow.parquet.read_schema`) and extend the
  * adaptive readers in `Tables.scala` — do not debug individual queries.
  */
class TablesSpec extends AnyFunSuite with Matchers {
  private def spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("events.ts normalizes to TimestampType (schema-adaptive reader)") {
    withClue("events.parquet ts changed physical type AGAIN — extend " +
      "Tables.events before touching any query: ") {
      Tables.events(spark, d).schema("ts").dataType shouldBe TimestampType
    }
    // the raw-nanos view must stay a long regardless of the physical type
    Tables.eventsRawNanos(spark, d).schema("ts").dataType shouldBe LongType
  }

  test("key analytic columns keep their expected logical types") {
    val checks: Seq[(String, org.apache.spark.sql.DataFrame, String, DataType)] = Seq(
      ("documents", Tables.documents(spark, d), "doc_id", LongType),
      ("documents", Tables.documents(spark, d), "text", StringType),
      ("embeddings", Tables.embeddings(spark, d), "vec_id", LongType),
      ("embeddings", Tables.embeddings(spark, d), "embedding",
        ArrayType(FloatType, containsNull = true)),
      ("lineitem", Tables.lineitem(spark, d), "l_quantity", DoubleType),
      // NTZ since the 2026-08-13 regeneration; every date query is green
      // against DuckDB with the session TZ pinned UTC, so NTZ is the
      // working contract — a change EITHER way needs a fresh audit.
      ("lineitem", Tables.lineitem(spark, d), "l_shipdate", TimestampNTZType),
      ("orders", Tables.orders(spark, d), "o_orderkey", LongType))
    val bad = checks.flatMap { case (t, df, c, want) =>
      val got = df.schema(c).dataType
      if (got == want) None else Some(s"$t.$c: expected $want, got $got")
    }
    withClue("testdata physical schemas drifted — fix Tables readers " +
      "first: ") { bad shouldBe empty }
  }
}
