package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom semi-join reduction: identical results, reduced probe. */
class BloomJoinSpec extends SparkSpec {

  test("bloomFilteredJoin == plain join (long and string keys)") {
    val probe = spark.range(0, 50000)
      .select(col("id").as("k"), (col("id") % 13).as("v"))
    val build = spark.range(0, 50000).filter(col("id") % 100 === 0)
      .select(col("id").as("k"), lit("dim").as("name"))
    val plain = probe.join(build, Seq("k"))
    val bloomed = BloomJoin.bloomFilteredJoin(probe, build, "k", 1000L)
    plain.exceptAll(bloomed).count() shouldBe 0L
    bloomed.exceptAll(plain).count() shouldBe 0L

    val sProbe = probe.select(concat(lit("k"), col("k")).as("k"), col("v"))
    val sBuild = build.select(concat(lit("k"), col("k")).as("k"), col("name"))
    val sPlain = sProbe.join(sBuild, Seq("k"))
    val sBloomed = BloomJoin.bloomFilteredJoin(sProbe, sBuild, "k", 1000L)
    sPlain.exceptAll(sBloomed).count() shouldBe 0L
    sBloomed.exceptAll(sPlain).count() shouldBe 0L
  }

  test("the filter actually reduces the probe side") {
    val probe = spark.range(0, 100000).select(col("id").as("k"))
    val build = spark.range(0, 100).select((col("id") * 1000).as("k"))
    val bf = build.stat.bloomFilter("k", 100L, 0.01)
    val kept = probe.filter(
      udf((k: Long) => bf.mightContainLong(k)).apply(col("k"))).count()
    kept.toDouble should be < 100000 * 0.05 // ≥95% of the probe dropped
  }
}
