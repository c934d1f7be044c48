package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization ANN: split each d-dim vector into `m` subvectors,
  * k-means each subspace into `ksub` centroids, store each vector as `m`
  * small codes; queries score candidates with an asymmetric distance
  * table (ADC) — m·ksub exact subspace distances computed once per query,
  * then every candidate's approximate distance is m table lookups.
  * The memory-side scale path next to the routing-side [[IvfIndex]]:
  * IVF prunes WHICH vectors are scanned, PQ shrinks WHAT is scanned
  * (d·4 bytes → m codes, 32× at d=64/m=8), and production systems
  * compose them (IVF-PQ).
  *
  * Scale shape: training is m k-means fits over a sample (codebooks are
  * m·ksub·(d/m) doubles — kilobytes, a closure broadcast); encoding is
  * one embarrassingly-parallel pass; a query never shuffles — the ADC
  * scan is a map over the code table followed by a top-k
  * (TakeOrderedAndProject), with an optional exact re-rank joining the
  * shortlist back to the full vectors (broadcast: the shortlist is
  * k·refine rows).
  */
object PqIndex {

  /** codebooks(sub)(code) = centroid of that subspace cell. */
  case class Model(m: Int, dsub: Int, codebooks: Array[Array[Array[Double]]],
      encoded: DataFrame)

  /** Train per-subspace codebooks and encode the corpus.
    * `ksub` ≤ 256 keeps codes byte-sized.
    */
  def build(emb: DataFrame, vecCol: String, idCol: String,
      m: Int, ksub: Int, seed: Long = 42L, maxIter: Int = 10): Model = {
    val first = emb.select(size(col(vecCol))).head().getInt(0)
    require(first % m == 0, s"dim $first not divisible by m=$m")
    val dsub = first / m
    val asDouble = Similarity.asDouble(col(vecCol))
    // One k-means per subspace over the sliced sub-vectors. The m fits are
    // independent, so they run as CONCURRENT Spark jobs (scheduler
    // interleaves their small stages instead of paying m sequential
    // job-latency floors). At corpus scale, fit on a sample — the codebook
    // only needs cells that tile the subspace.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val codebooks = Await.result(
      Future.sequence((0 until m).toList.map { s => Future {
        val sub = emb.select(
          array_to_vector(slice(asDouble, s * dsub + 1, dsub)).as("_features"))
        new KMeans().setK(ksub).setSeed(seed + s).setFeaturesCol("_features")
          .setMaxIter(maxIter).fit(sub)
          .clusterCenters.map(_.toArray)
      }}), Duration.Inf).toArray
    val enc = udf { (v: Seq[Double]) =>
      Array.tabulate(m) { s =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < ksub) {
          var d = 0.0; var i = 0
          while (i < dsub) {
            val diff = v(s * dsub + i) - codebooks(s)(c)(i)
            d += diff * diff; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
    }
    Model(m, dsub, codebooks,
      emb.select(col(idCol), asDouble.as("_v"))
        .withColumn("codes", enc(col("_v"))))
  }

  /** ADC top-k: approximate squared-L2 via the query's distance table,
    * shortlist of `k * refine`, exact cosine re-rank of the shortlist.
    */
  def search(model: Model, queryVec: Array[Double], idCol: String,
      k: Int, refine: Int = 4): DataFrame = {
    val m = model.m; val dsub = model.dsub
    // m×ksub exact subspace distances, once per query, driver-side.
    val dtable = Array.tabulate(m, model.codebooks(0).length) { (s, c) =>
      var d = 0.0; var i = 0
      while (i < dsub) {
        val diff = queryVec(s * dsub + i) - model.codebooks(s)(c)(i)
        d += diff * diff; i += 1
      }
      d
    }
    val adc = udf { (codes: Seq[Int]) =>
      var d = 0.0; var s = 0
      while (s < m) { d += dtable(s)(codes(s)); s += 1 }
      d
    }
    val qNorm = math.sqrt(queryVec.map(x => x * x).sum)
    val q = array(queryVec.map(lit): _*)
    val cos = graft.functions.VectorExpressions.dotNative(col("_v"), q) /
      (sqrt(graft.functions.VectorExpressions.dotNative(col("_v"), col("_v"))) * qNorm)
    model.encoded
      .select(col(idCol), col("_v"), adc(col("codes")).as("adc_d2"))
      .orderBy(col("adc_d2"), col(idCol)).limit(k * refine)
      .select(col(idCol), round(cos, 6).as("cos_r"))
      .orderBy(desc("cos_r"), col(idCol)).limit(k)
  }
}
