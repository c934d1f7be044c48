package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the round-16 optimization work.
  * Not part of the register.
  */
object Profile16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, sfDir)
    ext.Dedup.cosineSimilarityJoin(docs, "doc_id", "text", 2, 1, 2).count()

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val idx = ext.Dedup.gramIndex(docs, "doc_id", "text", n = 2)
      noop(idx.packed) // materialize enc/weighted/packed checkpoints
      val tauNum = 1; val tauDen = 2
      val probesC = ext.Dedup.atFullWidth("gid")(idx.weighted
        .filter(col("sufsq") * (tauDen.toLong * tauDen) >=
          col("n2") * (tauNum.toLong * tauNum))
        .select(col("__id"), col("gid"), col("sufsq"), col("n2")))
      val rawC = probesC.alias("a").join(probesC.alias("b"),
        col("a.gid") === col("b.gid") && col("a.__id") < col("b.__id") &&
          col("a.sufsq").cast("double") * col("b.sufsq") *
            lit((tauDen.toDouble * tauDen)) >=
            col("a.n2").cast("double") * col("b.n2") *
              lit(tauNum.toDouble * tauNum * (1.0 - 1e-9)))
        .select(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
      time("cos raw join only (pinned)") { noop(rawC) }
      time("cos cand pinned repart+distinct") {
        noop(ext.Dedup.distinctPairs("doc_a")(rawC))
      }
      time("cos cand plain distinct (coalesced)") { noop(rawC.distinct()) }
      time("cos full join (new code)") {
        noop(ext.Dedup.cosineSimilarityJoin(idx, 1, 2))
      }
      time("cos full join (new code + 64k floor)") {
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        try noop(ext.Dedup.cosineSimilarityJoin(idx, 1, 2))
        finally spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
      }
      time("jac full join (new code)") {
        noop(ext.Dedup.jaccardSimilarityJoin(idx, 1, 2))
      }
      time("jac full join (new code + 64k floor)") {
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        try noop(ext.Dedup.jaccardSimilarityJoin(idx, 1, 2))
        finally spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
      }
    }
    spark.stop()
  }
}
