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
}
