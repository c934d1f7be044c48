package graft.pipeline

import graft.{SparkSpec, TestSpark}

/** §3.3 import pipeline end-to-end on the reference sample: every
  * documented table materializes with sane contents.
  */
class OsmImportSpec extends SparkSpec {

  private def haveSample = new java.io.File(TestSpark.ExampleOsm).exists()

  test("writeAll materializes the full documented table set") {
    assume(haveSample)
    val dir = java.nio.file.Files.createTempDirectory("osmimport").toString
    OsmImport.writeAll(spark, TestSpark.ExampleOsm, dir)
    val expected = Seq("planet_osm_point", "planet_osm_line",
      "planet_osm_polygon", "planet_osm_roads", "planet_osm_rels",
      "ways", "ways_vertices_pgr", "pointsOfInterest")
    val counts = expected.map(t => t -> spark.read.parquet(s"$dir/$t").count()).toMap
    counts.foreach { case (t, n) =>
      withClue(s"table $t:") { n should be > 0L }
    }
    // line/polygon split is a partition of tagged ways (minus rels)
    counts("planet_osm_roads") should be <= counts("planet_osm_line")
    // routing: more edges than source ways is expected after noding
    counts("ways") should be >= 400L
    counts("ways_vertices_pgr") should be >= 200L
  }

  test("snapped POIs reference existing edges with bounded distance") {
    assume(haveSample)
    val t = OsmImport.importAll(spark, TestSpark.ExampleOsm)
    val snapped = t.pois.filter("edge_gid IS NOT NULL")
    snapped.count() should be > 0L
    snapped.filter("dist_m > 50.0").count() shouldBe 0L
    // FK: every referenced edge gid exists
    snapped.join(t.edges.select("gid"),
      snapped("edge_gid") === t.edges("gid"), "left_anti").count() shouldBe 0L
  }
}
