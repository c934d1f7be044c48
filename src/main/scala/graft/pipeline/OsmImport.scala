package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.osm.{FeatureTables, OsmXml, RoutingGraph}

/** The import half of the reference (§3.3: osm2pgsql + osm2pgrouting,
  * README.md:17,44): one OSM extract → the documented table set, written as
  * parquet. Mirrors the external C++ tools' semantics end-to-end:
  *
  *   planet_osm_point / line / polygon / roads   (osm2pgsql, README.md:33-38)
  *   planet_osm_rels                             (multipolygon assembly)
  *   ways / ways_vertices_pgr / pois             (osm2pgrouting, README.md:44-54)
  *
  * Write layout: one directory per table under `outDir`. At 100 TB the
  * same DAG runs over many regional extracts (S1 parallelizes per file);
  * output tables would be partitioned by region/tile — a layout knob, not
  * a plan change.
  */
object OsmImport {

  case class ImportedTables(
      points: DataFrame, lines: DataFrame, polygons: DataFrame,
      roads: DataFrame, relPolygons: DataFrame,
      edges: DataFrame, vertices: DataFrame, pois: DataFrame)

  def importAll(spark: SparkSession, osmPath: String): ImportedTables = {
    val t = OsmXml.parse(spark, osmPath)
    val wayFeats = FeatureTables.taggedWayFeatures(t.ways, t.nodes)
    val lines = FeatureTables.lines(wayFeats)
    val routable = RoutingGraph.routableWays(t.ways)
    val pois = RoutingGraph.pois(t.nodes)
    val edges = RoutingGraph.edges(routable, t.nodes)
    ImportedTables(
      points = FeatureTables.points(t.nodes),
      lines = lines,
      polygons = FeatureTables.polygons(wayFeats),
      roads = FeatureTables.roads(lines),
      relPolygons = FeatureTables.relationPolygons(
        t.relations, FeatureTables.wayGeometries(t.ways, t.nodes)),
      edges = edges,
      vertices = RoutingGraph.vertices(routable, t.nodes),
      pois = RoutingGraph.snapPois(pois, edges))
  }

  /** Import and persist every table under `outDir/<name>`. */
  def writeAll(spark: SparkSession, osmPath: String, outDir: String): Unit = {
    val t = importAll(spark, osmPath)
    Seq(
      "planet_osm_point" -> t.points,
      "planet_osm_line" -> t.lines,
      "planet_osm_polygon" -> t.polygons,
      "planet_osm_roads" -> t.roads,
      "planet_osm_rels" -> t.relPolygons,
      "ways" -> t.edges,
      "ways_vertices_pgr" -> t.vertices,
      "pointsOfInterest" -> t.pois
    ).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }
  }
}
