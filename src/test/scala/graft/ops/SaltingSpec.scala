package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew salting: identical results to the direct plans on skewed data. */
class SaltingSpec extends SparkSpec {

  // 90% of rows share key 0 (the hot key), the rest spread over 100 keys.
  private lazy val skewed = spark.range(0, 20000)
    .select(
      when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 100).as("k"),
      (col("id") % 97).cast("double").as("v"))

  test("saltedAgg == direct groupBy on skewed keys") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("v_sum"), count("v").as("n"))
    val salted = Salting.saltedAgg(skewed, "k", "v", buckets = 8,
      Map("v_sum" -> ("v", "sum"), "n" -> ("v", "count")))
    direct.exceptAll(salted).count() shouldBe 0L
    salted.exceptAll(direct).count() shouldBe 0L
  }

  test("saltedBroadcastJoin == plain join against a unique-key dimension") {
    val dim = spark.range(0, 100)
      .select(col("id").as("k"), concat(lit("name-"), col("id")).as("name"))
    val direct = skewed.join(dim, Seq("k")).groupBy("k", "name")
      .agg(count(lit(1)).as("n"))
    val salted = Salting.saltedBroadcastJoin(skewed, dim, "k", buckets = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"))
    direct.exceptAll(salted).count() shouldBe 0L
    salted.exceptAll(direct).count() shouldBe 0L
  }

  test("skewReport: hand-computed hot-key stats and salt recommendation") {
    import spark.implicits._
    // key 1: 600 rows, key 2: 300, keys 3..12: 10 each → n=1000, k=12
    val df = (Seq.fill(600)(1L) ++ Seq.fill(300)(2L) ++
      (3L to 12L).flatMap(Seq.fill(10)(_))).toDF("key0")
    val got = Salting.skewReport(df, "key0", targetPerTask = 100L, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    got.length shouldBe 3
    got(0) shouldBe ((1L, 600L, 0.6, 7.2, 6L)) // 600/1000, 600·12/1000, ceil(600/100)
    got(1) shouldBe ((2L, 300L, 0.3, 3.6, 3L))
    got(2)._2 shouldBe 10L // ties on cnt → smallest key first
    got(2)._1 shouldBe 3L
    got(2)._5 shouldBe 1L
  }
}
