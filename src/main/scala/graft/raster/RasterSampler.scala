package graft.raster

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.Mercator

/** One coordinate to sample, already tile-addressed. */
case class SampleKey(gid: Long, tx: Long, ty: Long, px: Int, py: Int)

/** A sampled value (None = tile fetch failed, F6 null semantics). */
case class Sampled(gid: Long, value: Option[Double])

/** T7 — the tile-grouped sampling operator: the distributed rewrite of the
  * reference's tile cache (`dataproviders.py:69,79-83`). Semantic contract:
  * each (x, y, z) tile is fetched + decoded once per pass, reused for every
  * coordinate falling in it.
  *
  * Plan shape: derive tile/pixel addresses with native column math (T1/T2,
  * codegen'd) → `repartition(tx, ty)` so a tile's coordinates are co-located
  * → `mapPartitions` with a per-partition LRU fetches each tile once. At
  * 1000 executors the shuffle is by tile key, so tile fetches scale with
  * #tiles (bounded by 4^zoom), never with #coordinates.
  */
object RasterSampler {

  /** Address each (gid, lng, lat) row: world → tile/pixel at `zoom`. */
  def address(coords: DataFrame, zoom: Int, tileSize: Int = 256): DataFrame = {
    val wx = Mercator.worldX(col("lng"), tileSize)
    val wy = Mercator.worldY(col("lat"), tileSize)
    val z = lit(zoom)
    coords.select(
      col("gid"),
      Mercator.tileIdx(wx, z, tileSize).as("tx"),
      Mercator.tileIdx(wy, z, tileSize).as("ty"),
      Mercator.pixelIdx(wx, z, tileSize).cast("int").as("px"),
      Mercator.pixelIdx(wy, z, tileSize).cast("int").as("py"))
  }

  /** Sample every addressed coordinate; one fetch per tile per partition. */
  def sample(addressed: DataFrame, store: TileStore, zoom: Int,
      valueFn: (Tile, Int, Int) => Double): Dataset[Sampled] = {
    val spark = addressed.sparkSession
    import spark.implicits._
    addressed.as[SampleKey]
      .repartition(col("tx"), col("ty"))
      .mapPartitions { it =>
        val cached = new CachingTileStore(store)
        it.map { k =>
          Sampled(k.gid, cached.fetch(k.tx, k.ty, zoom).map(valueFn(_, k.px, k.py)))
        }
      }
  }

  /** The full §3.1 value pass: coords (gid, lng, lat) → per-gid median of
    * sampled values → normalized by the global max (A1/A2/A3/J5). Null
    * samples (failed tiles) are excluded per F6.
    *
    * `exact=true` is reference parity (np.median); `exact=false` is the
    * 100 TB path — `approx_percentile` keeps per-group state bounded when
    * group sizes are unbounded (way vertex counts are tiny, so exact is
    * the default; the knob exists for other coordinate sources).
    */
  def medianPass(coords: DataFrame, store: TileStore, zoom: Int,
      valueFn: (Tile, Int, Int) => Double, outCol: String,
      exact: Boolean = true): DataFrame = {
    val sampled = sample(address(coords, zoom, store.tileSize), store, zoom, valueFn)
      .toDF()
    val medExpr =
      if (exact) percentile(col("value"), lit(0.5))
      else approx_percentile(col("value"), lit(0.5), lit(10000))
    val med = sampled
      .filter(col("value").isNotNull)
      .groupBy("gid")
      .agg(medExpr.as("med"))
    val mx = med.agg(max(col("med")).as("mx"))
    med.crossJoin(broadcast(mx))
      .select(col("gid"),
        when(col("mx") > 0, col("med") / col("mx")).otherwise(col("med")).as(outCol))
  }
}
