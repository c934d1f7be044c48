package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Linear sketches (q222–q224): count-min, AMS F2, feature hashing.
  * The load-bearing property is LINEARITY — sketch(A ∪ B) equals the
  * element-wise sum of sketch(A) and sketch(B), bit-for-bit — plus the
  * CMS one-sided error guarantee and the collision-free exactness of
  * both estimators (deterministic hashes make "collision-free" a
  * checkable precondition, not a hope).
  */
class LinearSketchesSpec extends SparkSpec {
  import spark.implicits._

  // Two groups with known token frequencies; g1: a×3 b×2 c×1, g2: a×1 d×4.
  private def corpus = Seq(
    ("g1", "a"), ("g1", "a"), ("g1", "a"), ("g1", "b"), ("g1", "b"),
    ("g1", "c"), ("g2", "a"), ("g2", "d"), ("g2", "d"), ("g2", "d"),
    ("g2", "d")
  ).toDF("g", "tok")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("cmsSketch: counters partition occurrences; total mass per row = group size") {
    val sk = LinearSketches.cmsSketch(corpus, "g", "tok", depth = 3, width = 64)
    val mass = sk.groupBy("g", "r").agg(sum("cnt").as("m")).collect()
    mass.length shouldBe 6 // 2 groups × 3 hash rows
    mass.foreach(r => r.getLong(2) shouldBe (if (r.getString(0) == "g1") 6L else 5L))
    sk.groupBy("g", "r").count().collect().foreach(_.getLong(2) should be <= 64L)
  }

  test("cmsMerge ≡ cold rebuild: the linear merge law, bit-for-bit") {
    val a = corpus.filter(col("tok") =!= "d")
    val b = corpus.filter(col("tok") === "d")
    val merged = LinearSketches.cmsMerge(
      LinearSketches.cmsSketch(a, "g", "tok", 3, 64),
      LinearSketches.cmsSketch(b, "g", "tok", 3, 64), "g")
    val cold = LinearSketches.cmsSketch(corpus, "g", "tok", 3, 64)
    sortedRows(merged) shouldBe sortedRows(cold)
  }

  test("cmsEstimate: one-sided (est >= true count), exact when collision-free") {
    val sk = LinearSketches.cmsSketch(corpus, "g", "tok", depth = 3, width = 1024)
    val truth = corpus.groupBy("g", "tok").agg(count(lit(1)).as("t"))
    val est = LinearSketches.cmsEstimate(
      sk, corpus.select("g", "tok").distinct(), "g", "tok", 3, 1024)
    val joined = est.join(truth, Seq("g", "tok"))
      .select(col("est_cnt"), col("t")).collect()
    joined.foreach(r => r.getLong(0) should be >= r.getLong(1))
    // 5 distinct tokens into 1024 buckets: verify collision-free per hash
    // row (deterministic), which makes the estimate EXACT
    val free = sk.groupBy("g", "r").agg(countDistinct("b").as("nb"),
      count(lit(1)).as("n")).collect().forall(r => r.getLong(2) == r.getLong(3))
    assert(free, "hash collision in 5 tokens × 1024 buckets — pick a new width")
    joined.foreach(r => r.getLong(0) shouldBe r.getLong(1))
  }

  test("amsMerge ≡ cold rebuild, and F2 exact when collision-free") {
    val a = corpus.filter(col("tok") =!= "d")
    val b = corpus.filter(col("tok") === "d")
    val merged = LinearSketches.amsMerge(
      LinearSketches.amsSketch(a, "g", "tok", 3, 1024),
      LinearSketches.amsSketch(b, "g", "tok", 3, 1024), "g")
    val cold = LinearSketches.amsSketch(corpus, "g", "tok", 3, 1024)
    sortedRows(merged) shouldBe sortedRows(cold)
    // collision-free ⇒ each bucket holds one token's ±f, c² = f², every
    // row's Σc² is exactly F2, so the median row is exact too.
    // g1: 3² + 2² + 1² = 14; g2: 1² + 4² = 17.
    LinearSketches.amsF2Estimate(cold, "g", depth = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap shouldBe
      Map("g1" -> 14L, "g2" -> 17L)
  }

  test("featureHash is linear and hashedCosine sees identical groups as 1.0") {
    val a = corpus.filter(col("tok") =!= "d")
    val b = corpus.filter(col("tok") === "d")
    val merged = LinearSketches.featureHash(a, "g", "tok", dim = 1024)
      .union(LinearSketches.featureHash(b, "g", "tok", dim = 1024))
      .groupBy("g", "j").agg(sum("v").as("v"))
    sortedRows(merged) shouldBe
      sortedRows(LinearSketches.featureHash(corpus, "g", "tok", dim = 1024))

    // g3 := an exact copy of g1's token multiset → cosine 1.0; g1 vs g2
    // share only token a → small positive cosine, strictly < 1
    val withCopy = corpus.union(
      corpus.filter(col("g") === "g1").select(lit("g3").as("g"), col("tok")))
    val cos = LinearSketches.hashedCosine(
      LinearSketches.featureHash(withCopy, "g", "tok", dim = 1024), "g")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(5)))
      .toMap
    cos(("g1", "g3")) shouldBe 1.0
    cos(("g1", "g2")) should (be > 0.0 and be < 1.0)
  }

  test("guards: depth/width/dim contracts fail loudly") {
    an[IllegalArgumentException] should be thrownBy
      LinearSketches.cmsSketch(corpus, "g", "tok", depth = 0, width = 64)
    an[IllegalArgumentException] should be thrownBy
      LinearSketches.amsSketch(corpus, "g", "tok", depth = 4, width = 64)
    an[IllegalArgumentException] should be thrownBy
      LinearSketches.featureHash(corpus, "g", "tok", dim = 1)
  }
}
