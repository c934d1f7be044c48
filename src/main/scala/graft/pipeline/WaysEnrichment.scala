package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Upsert
import graft.osm.{OsmXml, RoutingGraph}
import graft.raster.{RasterSampler, SyntheticTileStore, Tile, TileStore, ValueFns}

/** One enrichment pass = the reference's `process_*` functions:
  * (tile source, value function, zoom, output column).
  */
case class EnrichmentPass(
    column: String,
    store: TileStore,
    valueFn: (Tile, Int, Int) => Double,
    zoom: Int,
    enabled: Boolean = true)

/** The §3.1 pipeline (`update_ways_metadata.main`, :128-144), one lazy DAG:
  *
  *   parse OSM → routing edges → posexplode(geom) → T1/T2 address →
  *   repartition(tile) → sample → median per gid → normalize by global max
  *   → join-upsert into ways_metadata.
  *
  * Passes run sequentially like the reference's main(): popularity (Strava
  * L-mode heat, zoom 12), greenery (satellite RGB, zoom 15), and the
  * config-gated highres pass DISABLED by default, matching the
  * commented-out call at `update_ways_metadata.py:138`.
  */
object WaysEnrichment {

  def defaultPasses(seed: Long = 42L): Seq[EnrichmentPass] = Seq(
    EnrichmentPass("popularity",
      new SyntheticTileStore(256, "L", seed), ValueFns.strava, zoom = 12),
    EnrichmentPass("greenery",
      new SyntheticTileStore(256, "RGB", seed + 1), ValueFns.greeneryAbsolute, zoom = 15),
    EnrichmentPass("popularity_highres",
      new SyntheticTileStore(512, "L", seed + 2), ValueFns.strava, zoom = 15,
      enabled = false))

  /** Edge coordinates: (gid, lng, lat) — one row per polyline vertex. */
  def edgeCoords(edges: DataFrame): DataFrame =
    edges.select(col("gid"), explode(col("geom")).as("pt"))
      .select(col("gid"), col("pt.lng").as("lng"), col("pt.lat").as("lat"))

  /** Run all enabled passes and return the final `ways_metadata` table
    * (gid, <one column per pass>), FK-filtered to existing edges (J4).
    */
  def run(spark: SparkSession, osmPath: String,
      passes: Seq[EnrichmentPass]): DataFrame = {
    val tables = OsmXml.parse(spark, osmPath)
    val routable = RoutingGraph.routableWays(tables.ways)
    val edges = RoutingGraph.edges(routable, tables.nodes).cache()
    val coords = edgeCoords(edges).cache()

    val metadata = passes.filter(_.enabled).foldLeft(Option.empty[DataFrame]) {
      case (acc, pass) =>
        val m = RasterSampler.medianPass(
          coords, pass.store, pass.zoom, pass.valueFn, pass.column)
        Some(acc.fold(m)(prev => Upsert.upsert(prev, m, "gid")))
    }.getOrElse(spark.emptyDataFrame)

    // FK contract (sql/ways_metadata.ddl:6): every gid references an edge.
    metadata.join(edges.select("gid"), Seq("gid"), "left_semi")
  }

  /** Convenience: full pipeline on an OSM extract with synthetic tiles. */
  def runDefault(spark: SparkSession, osmPath: String): DataFrame =
    run(spark, osmPath, defaultPasses())
}
