package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}
import graft.osm.{OsmXml, RoutingGraph}

/** Golden end-to-end: the §3.1 enrichment pipeline on the reference's
  * sample extract with deterministic synthetic tiles → `ways_metadata`
  * semantics (popularity + greenery, normalized, FK-closed, highres pass
  * disabled — update_ways_metadata.py:128-144).
  */
class WaysEnrichmentSpec extends SparkSpec {

  private def haveSample = new java.io.File(TestSpark.ExampleOsm).exists()

  private lazy val result =
    WaysEnrichment.runDefault(spark, TestSpark.ExampleOsm).cache()

  test("produces one row per enriched edge with both metric columns") {
    assume(haveSample)
    result.columns.toSeq shouldBe Seq("gid", "popularity", "greenery")
    result.count() should be > 300L
    result.select("gid").distinct().count() shouldBe result.count()
  }

  test("metrics are normalized to [0,1] with max exactly 1 (A2/A3)") {
    assume(haveSample)
    val r = result.agg(
      min("popularity"), max("popularity"),
      min("greenery"), max("greenery")).head()
    r.getDouble(0) should be >= 0.0
    r.getDouble(1) shouldBe 1.0 +- 1e-12
    r.getDouble(2) should be >= 0.0
    r.getDouble(3) shouldBe 1.0 +- 1e-12
  }

  test("FK contract: every gid references a routing edge (J4)") {
    assume(haveSample)
    val tables = OsmXml.parse(spark, TestSpark.ExampleOsm)
    val edges = RoutingGraph.edges(
      RoutingGraph.routableWays(tables.ways), tables.nodes)
    result.join(edges, Seq("gid"), "left_anti").count() shouldBe 0L
  }

  test("pipeline is deterministic across runs (golden stability)") {
    assume(haveSample)
    val again = WaysEnrichment.runDefault(spark, TestSpark.ExampleOsm)
    result.exceptAll(again).count() shouldBe 0L
    again.exceptAll(result).count() shouldBe 0L
  }

  test("golden checksum is byte-stable across JVMs/sessions (SURVEY §5.3)") {
    assume(haveSample)
    val h = result
      .select(concat_ws("|", col("gid"),
        round(col("popularity"), 9), round(col("greenery"), 9)).as("s"))
      .agg(md5(concat_ws("\n", sort_array(collect_list("s")))).as("h"))
      .head().getString(0)
    h shouldBe "f33c0c0f4378cabf4b492914023990aa"
  }

  test("disabled highres pass contributes no column (reference :138)") {
    assume(haveSample)
    result.columns should not contain "popularity_highres"
  }
}
