package graft.geo

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** T1/T2 contract (dataproviders.py:25-56): exact formula parity including
  * the ±0.9999 siny clamp and float-mod-before-floor pixel addressing.
  */
class MercatorSpec extends SparkSpec {
  import spark.implicits._

  private def projectOne(lng: Double, lat: Double): (Double, Double) = {
    val r = Seq((lng, lat)).toDF("lng", "lat")
      .select(Mercator.worldX(col("lng")), Mercator.worldY(col("lat")))
      .head()
    (r.getDouble(0), r.getDouble(1))
  }

  test("worldX/worldY match the reference formula at hand-computed points") {
    // lng=0, lat=0 → center of the world tile.
    projectOne(0.0, 0.0) shouldBe ((128.0, 128.0))
    // lng=180 → right edge.
    projectOne(180.0, 0.0)._1 shouldBe 256.0 +- 1e-12
    // lat=85.0511287798 (web-mercator square cutoff): y ≈ 0.
    val (_, yTop) = projectOne(0.0, 85.0511287798)
    yTop shouldBe 0.0 +- 1e-6
  }

  test("siny clamp engages above ~89.189° latitude (clamp constant 0.9999)") {
    // Beyond the clamp latitude, y must saturate at the clamped value
    // instead of diverging to -inf at the pole.
    val (_, y89) = projectOne(0.0, 89.3)
    val (_, y90) = projectOne(0.0, 90.0)
    y89 shouldBe y90 // both clamped to siny = 0.9999
    val expected = 256.0 * (0.5 - math.log(1.9999 / 0.0001) / (4 * math.Pi))
    y90 shouldBe expected +- 1e-9
  }

  test("pixel/tile addressing: recomposition identity and ranges") {
    // Deterministic property grid: 441 lng/lat points × 4 zooms.
    val pts = for {
      i <- -10 to 10; j <- -10 to 10; z <- Seq(1, 5, 12, 15)
    } yield (i * 17.3 + 0.137, j * 8.09 + 0.071, z)
    val rows = pts.toDF("lng", "lat", "z")
      .select(
        col("z"),
        Mercator.worldX(col("lng")).as("wx"),
        Mercator.tileIdx(Mercator.worldX(col("lng")), col("z")).as("tx"),
        Mercator.pixelIdx(Mercator.worldX(col("lng")), col("z")).as("px"))
      .collect()
    rows.foreach { r =>
      val (z, wx, tx, px) =
        (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3))
      assert(px >= 0L && px < 256L, s"px=$px out of range")
      assert(tx >= 0L && tx < (1L << z), s"tx=$tx out of range at z=$z")
      // tile*256 + pixel == floor(scaled world coordinate)
      assert(tx * 256 + px == math.floor(wx * (1L << z)).toLong)
    }
  }

  test("worldX is strictly increasing in lng; worldY decreasing in lat") {
    val rows = Seq(-170.0, -40.0, 0.0, 40.0, 170.0).map(l => (l, l / 2))
      .toDF("lng", "lat")
      .select(Mercator.worldX(col("lng")).as("wx"),
        Mercator.worldY(col("lat")).as("wy"))
      .collect()
    val wxs = rows.map(_.getDouble(0)).toSeq
    val wys = rows.map(_.getDouble(1)).toSeq
    wxs shouldBe wxs.sorted
    wys shouldBe wys.sorted.reverse
  }

  test("haversine: known distance (Paris-London ≈ 343.5 km)") {
    val d = Seq((2.3522, 48.8566, -0.1276, 51.5072)).toDF("a", "b", "c", "e")
      .select(Mercator.haversineMeters(col("a"), col("b"), col("c"), col("e")))
      .head().getDouble(0)
    d shouldBe 343.5e3 +- 1.5e3
  }

  test("gridCell keys neighbors within one cell of each other") {
    val cell = 200.0 / 111320.0
    val df = Seq((-118.125, 34.14), (-118.1251, 34.1401)).toDF("lng", "lat")
    val (cx, cy) = Mercator.gridCell(col("lng"), col("lat"), cell)
    val cells = df.select(cx.as("cx"), cy.as("cy")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    math.abs(cells(0)._1 - cells(1)._1) should be <= 1L
    math.abs(cells(0)._2 - cells(1)._2) should be <= 1L
  }
}
