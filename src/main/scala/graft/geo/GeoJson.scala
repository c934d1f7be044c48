package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P2/P3 — GeoJSON round-trip for LineString geometries
  * (`update_ways_metadata.py:22,25`: `st_asgeojson` then
  * `json.loads(...)['coordinates']`). The engine's internal geometry stays
  * a nested array column (no serialize-parse round trip, SURVEY §4); these
  * exist for API parity at the system edge.
  */
object GeoJson {

  /** geometry array<struct<lng,lat>> → GeoJSON LineString text.
    * Coordinates serialize as [lng, lat] pairs per the GeoJSON spec.
    */
  def toLineString(geom: Column): Column =
    to_json(struct(
      lit("LineString").as("type"),
      transform(geom, p => array(p.getField("lng"), p.getField("lat")))
        .as("coordinates")))

  private val lineStringSchema = StructType(Seq(
    StructField("type", StringType),
    StructField("coordinates", ArrayType(ArrayType(DoubleType)))))

  /** GeoJSON LineString text → geometry array<struct<lng,lat>>. */
  def fromLineString(json: Column): Column =
    transform(
      from_json(json, lineStringSchema).getField("coordinates"),
      c => struct(element_at(c, 1).as("lng"), element_at(c, 2).as("lat")))
}
