package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-Mercator "world pixel" projection and slippy-map tile addressing,
  * re-expressed as native (codegen-friendly) Column math — no UDFs.
  *
  * Semantics contract (reference `dataproviders.py:25-56`):
  *   - project_4326_to_3857: `siny = sin(lat·π/180)` clamped to ±0.9999
  *     (≈ |lat| 89.189°); world coords in [0, tileSize):
  *       x = tileSize · (0.5 + lng/360)
  *       y = tileSize · (0.5 − ln((1+siny)/(1−siny)) / 4π)
  *   - convert_3857_to_xyz: `scale = 1 << zoom`;
  *       pixel = floor((world · scale) % tileSize)   (float mod first!)
  *       tile  = floor(world · scale / tileSize)
  *     The reference applies Python float `%` to the *scaled float* before
  *     floor — replicated here. Values are non-negative, so fmod == pymod.
  */
object Mercator {
  val DefaultTileSize = 256

  /** World-pixel x in [0, tileSize). */
  def worldX(lng: Column, tileSize: Int = DefaultTileSize): Column =
    lit(tileSize) * (lit(0.5) + lng / lit(360.0))

  /** World-pixel y in [0, tileSize); clamp constant 0.9999 is contract. */
  def worldY(lat: Column, tileSize: Int = DefaultTileSize): Column = {
    val siny0 = sin(lat * lit(math.Pi) / lit(180.0))
    val siny = least(greatest(siny0, lit(-0.9999)), lit(0.9999))
    lit(tileSize) * (lit(0.5) -
      log((lit(1.0) + siny) / (lit(1.0) - siny)) / (lit(4.0) * lit(math.Pi)))
  }

  private def scaled(world: Column, zoom: Column): Column =
    // 1 << zoom, as exact double math (2^z is exact for any sane zoom)
    world * pow(lit(2.0), zoom.cast("double"))

  /** Tile index along one axis: floor(world·scale / tileSize). */
  def tileIdx(world: Column, zoom: Column, tileSize: Int = DefaultTileSize): Column =
    floor(scaled(world, zoom) / lit(tileSize.toDouble)).cast("long")

  /** Pixel within the tile: floor((world·scale) % tileSize), float mod. */
  def pixelIdx(world: Column, zoom: Column, tileSize: Int = DefaultTileSize): Column =
    floor(scaled(world, zoom) % lit(tileSize.toDouble)).cast("long")

  /** Great-circle distance in meters (haversine, R = 6371008.8). */
  def haversineMeters(lng1: Column, lat1: Column, lng2: Column, lat2: Column): Column = {
    val toRad = lit(math.Pi / 180.0)
    val dLat = (lat2 - lat1) * toRad
    val dLng = (lng2 - lng1) * toRad
    val a = pow(sin(dLat / 2), 2) +
      cos(lat1 * toRad) * cos(lat2 * toRad) * pow(sin(dLng / 2), 2)
    lit(2.0 * 6371008.8) * asin(sqrt(a))
  }

  /** Square grid cell key for distance-bounded joins (J3): cell side in
    * degrees; returns (cellX, cellY). Neighbor expansion is the caller's
    * job (explode over the 3×3 neighborhood on the build side).
    */
  def gridCell(lng: Column, lat: Column, cellDeg: Double): (Column, Column) =
    (floor(lng / lit(cellDeg)).cast("long"), floor(lat / lit(cellDeg)).cast("long"))
}
