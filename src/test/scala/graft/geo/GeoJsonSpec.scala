package graft.geo

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.raster.UrlTemplate

/** P2/P3 GeoJSON round-trip + T3 URL templating. */
class GeoJsonSpec extends SparkSpec {
  import spark.implicits._

  private val geom = Seq((1L, Seq((-118.1, 34.1), (-118.2, 34.2))))
    .toDF("id", "pts")
    .select($"id",
      transform($"pts", p =>
        struct(p.getField("_1").as("lng"), p.getField("_2").as("lat"))).as("geom"))

  test("toLineString emits spec-shaped GeoJSON ([lng,lat] pairs)") {
    val json = geom.select(GeoJson.toLineString($"geom")).as[String].head()
    json shouldBe
      """{"type":"LineString","coordinates":[[-118.1,34.1],[-118.2,34.2]]}"""
  }

  test("fromLineString inverts toLineString exactly") {
    val back = geom.select($"geom",
      GeoJson.fromLineString(GeoJson.toLineString($"geom")).as("geom2"))
    back.filter(to_json($"geom") =!= to_json($"geom2")).count() shouldBe 0L
  }

  test("fromLineString parses external GeoJSON text") {
    val parsed = Seq("""{"type":"LineString","coordinates":[[1.5,2.5],[3.0,4.0]]}""")
      .toDF("j").select(GeoJson.fromLineString($"j").as("g"))
      .select(element_at($"g", 2).getField("lng")).as[Double].head()
    parsed shouldBe 3.0
  }

  test("UrlTemplate substitutes tile coordinates (T3)") {
    UrlTemplate.substitute(
      "https://tiles.example/${z}/${x}/${y}.png", 704, 1634, 12) shouldBe
      "https://tiles.example/12/704/1634.png"
  }
}
