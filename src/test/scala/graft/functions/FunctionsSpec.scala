package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables, TestSpark}
import graft.ext.Similarity

/** Native expression + SQL registration + typed aggregator exemplars. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct: interpreted eval and codegen agree with plain math") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -1.0), Array(2.0, 2.0))
    ).toDF("a", "b")
    val out = df.select(VectorExpressions.dotNative($"a", $"b")).as[Double]
      .collect().toSeq
    out shouldBe Seq(32.0, -1.0)
  }

  test("DotProduct: null array → null result; float arrays auto-cast") {
    val out = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(
        VectorExpressions.dotNative($"a", $"a").as("aa"),
        VectorExpressions.dotNative($"a", $"b").as("ab"))
      .head()
    out.getDouble(0) shouldBe 5.0
    assert(out.isNullAt(1))
  }

  test("graft_dot registers as a SQL function on a live session") {
    GraftFunctions.register(spark)
    spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head() shouldBe 11.0
  }

  test("graft_hilbert registers as a SQL function; order must be literal") {
    GraftFunctions.register(spark)
    // matches the Column-API expression bit for bit
    val viaSql = spark.sql(
      "SELECT graft_hilbert(5L, 3L, 3) AS h").head().getLong(0)
    val viaColumn = spark.range(1)
      .select(graft.ops.StorageLayout.hilbertValue(
        org.apache.spark.sql.functions.lit(5L),
        org.apache.spark.sql.functions.lit(3L), order = 3))
      .head().getLong(0)
    viaSql shouldBe viaColumn
    // out-of-range coordinates fail loudly through the SQL route too
    intercept[Exception] {
      spark.sql("SELECT graft_hilbert(9L, 0L, 3) AS h").head()
    }
  }

  test("graft_sorted_intersect_count: merge semantics, SQL + Column routes") {
    GraftFunctions.register(spark)
    spark.sql("SELECT graft_sorted_intersect_count(array(1L, 3L, 5L, 9L), " +
        "array(2L, 3L, 9L, 11L)) AS c")
      .as[Long].head() shouldBe 2L
    Seq((Seq(1L, 2L), Seq.empty[Long])).toDF("a", "b")
      .select(VectorExpressions.sortedIntersectCount($"a", $"b"))
      .as[Long].head() shouldBe 0L
  }

  test("DotProduct equals the higher-order fold on real embeddings") {
    val emb = Tables.embeddings(spark, TestSpark.Sf0001).limit(50)
      .select(Similarity.asDouble(col("embedding")).as("v"))
    val hof = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val mismatches = emb
      .select((VectorExpressions.dotNative(col("v"), col("v")) - hof).as("diff"))
      .filter(col("diff") =!= 0.0)
    mismatches.count() shouldBe 0L // bit-identical, not approximately equal
  }

  test("ExactMedian aggregator: odd, even, and singleton groups") {
    val df = Seq(
      (1, 1.0), (1, 9.0), (1, 5.0),          // odd → 5.0
      (2, 1.0), (2, 2.0), (2, 3.0), (2, 10.0), // even → 2.5
      (3, 7.0)                                // singleton → 7.0
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(ExactMedian.median($"v").as("m"))
      .orderBy("g").as[(Int, Double)].collect().toSeq
    out shouldBe Seq((1, 5.0), (2, 2.5), (3, 7.0))
  }

  test("ExactMedian matches built-in percentile(0.5) on real data") {
    val li = Tables.lineitem(spark, TestSpark.Sf0001)
    val both = li.groupBy("l_orderkey").agg(
      ExactMedian.median(col("l_extendedprice")).as("agg_med"),
      percentile(col("l_extendedprice"), lit(0.5)).as("builtin_med"))
    both.filter(col("agg_med") =!= col("builtin_med")).count() shouldBe 0L
  }
}
