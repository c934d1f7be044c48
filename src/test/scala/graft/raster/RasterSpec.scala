package graft.raster

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** T4-T7 + F6 — value functions, tile cache semantics, and the tile-grouped
  * median pass (dataproviders.py:59-105, update_ways_metadata.py:12-35).
  */
class RasterSpec extends SparkSpec {
  import spark.implicits._

  test("strava value = gray/255 (T4)") {
    val t = Tile(2, 2, "L", Array(0, 128, 255, 64))
    ValueFns.strava(t, 0, 0) shouldBe 0.0
    ValueFns.strava(t, 1, 1) shouldBe 64 / 255.0
    ValueFns.strava(t, 1, 0) shouldBe 128 / 255.0 // row-major (px, py)
  }

  test("greenery absolute: proportion of green-dominant pixels in crop (T5)") {
    // 256×256 all-green tile → every crop pixel green-dominant → 1.0
    val green = Tile(256, 256, "RGB", Array.fill(256 * 256)(0x00ff00))
    ValueFns.greeneryAbsolute(green, 128, 128) shouldBe 1.0
    // all-red → 0.0
    val red = Tile(256, 256, "RGB", Array.fill(256 * 256)(0xff0000))
    ValueFns.greeneryAbsolute(red, 128, 128) shouldBe 0.0
    // crop clamps at tile edges without error
    ValueFns.greeneryAbsolute(green, 0, 0) shouldBe 1.0
    ValueFns.greeneryAbsolute(green, 255, 255) shouldBe 1.0
  }

  test("greenery relative (T6, reference dead code): mean-based, /200 scale") {
    val green = Tile(256, 256, "RGB", Array.fill(256 * 256)(0x00c800)) // g=200
    ValueFns.greeneryRelative(green, 128, 128) shouldBe 1.0
    val dim = Tile(256, 256, "RGB", Array.fill(256 * 256)(0x006400)) // g=100
    ValueFns.greeneryRelative(dim, 128, 128) shouldBe 0.5
  }

  test("SyntheticTileStore is deterministic and mode-consistent") {
    val s = new SyntheticTileStore(256, "L", seed = 7)
    val a = s.fetch(1, 2, 3).get
    val b = s.fetch(1, 2, 3).get
    a.pixels.toSeq shouldBe b.pixels.toSeq
    all(a.pixels.toSeq) should (be >= 0 and be <= 255)
    s.fetch(9, 9, 3).get.pixels.toSeq should not be a.pixels.toSeq
  }

  test("CachingTileStore fetches each tile once (T7 cache contract)") {
    val counting = new TileStore {
      val tileSize = 4
      var calls = 0
      def fetch(x: Long, y: Long, z: Int): Option[Tile] = {
        calls += 1
        Some(Tile(4, 4, "L", Array.fill(16)((x + y).toInt)))
      }
    }
    val cached = new CachingTileStore(counting, capacity = 8)
    for (_ <- 1 to 5) cached.fetch(1, 1, 2)
    for (_ <- 1 to 5) cached.fetch(2, 1, 2)
    counting.calls shouldBe 2
    cached.hits shouldBe 8
    cached.misses shouldBe 2
  }

  test("missing tile → null samples excluded, other tiles unaffected (F6)") {
    val store = new SyntheticTileStore(256, "L", seed = 42,
      missing = Some((0L, 0L, 1)))
    // two points in tile (0,0) at z=1 (west hemisphere, north), two in (1,1)
    val coords = Seq(
      (1L, -90.0, 40.0), (1L, -91.0, 41.0),
      (2L, 90.0, -40.0), (2L, 91.0, -41.0)
    ).toDF("gid", "lng", "lat")
    val out = RasterSampler.medianPass(coords, store, 1, ValueFns.strava, "v")
    val rows = out.collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(2L) // gid 1's tile failed → dropped
    rows.head.getDouble(1) shouldBe 1.0 // only survivor normalizes to 1
  }

  test("medianPass: exact median per gid, normalized by global max (A1-A3)") {
    // Constant-value store: value = (x+y) % 256 / 255 for all pixels.
    val store = new TileStore {
      val tileSize = 256
      def fetch(x: Long, y: Long, z: Int): Option[Tile] =
        Some(Tile(256, 256, "L", Array.fill(256 * 256)(((x + y) % 256).toInt)))
    }
    // gid 1 spans lng so its two points land in tiles (0,0) and (1,0) at z=1:
    // values 0/255 and 1/255 → median 0.5/255. gid 2 in tile (1,1): 2/255.
    val coords = Seq(
      (1L, -90.0, 40.0), (1L, 90.0, 40.0), (2L, 90.0, -40.0)
    ).toDF("gid", "lng", "lat")
    val out = RasterSampler.medianPass(coords, store, 1, ValueFns.strava, "v")
      .orderBy("gid").collect()
    // normalization: max median is gid 2's 2/255 → gid1 = 0.25, gid2 = 1.0
    out.map(_.getDouble(1)).toSeq shouldBe Seq(0.25, 1.0)
  }

  test("approx medianPass (100 TB path) tracks the exact pass") {
    val store = new SyntheticTileStore(256, "L", seed = 42)
    val coords = (1 to 200).map(i =>
      ((i % 7).toLong, -118.0 + i * 0.001, 34.0 + i * 0.0007))
      .toDF("gid", "lng", "lat")
    val exact = RasterSampler
      .medianPass(coords, store, 12, ValueFns.strava, "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val approx = RasterSampler
      .medianPass(coords, store, 12, ValueFns.strava, "v", exact = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    exact.keySet shouldBe approx.keySet
    exact.foreach { case (g, v) => approx(g) shouldBe v +- 0.11 }
  }

  test("address() agrees with Mercator on tile/pixel keys") {
    val coords = Seq((1L, -118.1225, 34.1385)).toDF("gid", "lng", "lat")
    val r = RasterSampler.address(coords, 12).head()
    // Caltech-area lng/lat at z12 → known slippy tile x=704, y=1634 (the
    // Strava/Google tile scheme the reference fetches at zoom 12).
    r.getAs[Long]("tx") shouldBe 704L
    r.getAs[Long]("ty") shouldBe 1634L
    r.getAs[Int]("px") should (be >= 0 and be < 256)
    r.getAs[Int]("py") should (be >= 0 and be < 256)
  }
}
