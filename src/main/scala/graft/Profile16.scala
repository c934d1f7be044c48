package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the round-16 optimization work:
  * times each GramIndex relation and join phase in isolation (noop-style
  * count actions) so the expensive phase is identified before touching it.
  * Not part of the register; deleted when the round's work is done.
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
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, sfDir)
    // warmup whole pipeline once (JIT)
    ext.Dedup.jaccardSimilarityJoin(docs, "doc_id", "text", 2, 1, 2).count()

    val tauNum = 1; val tauDen = 2
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val idx = ext.Dedup.gramIndex(docs, "doc_id", "text", n = 2)
      noop(idx.sets) // materialize checkpoints outside the timings below
      val sets = idx.sets
      println(s"[prof] docs=${sets.count()}  " +
        s"avg nn=${sets.agg(avg(col("nn"))).head.getDouble(0)}")
      val prefixLen = (col("nn") -
        floor((col("nn") * tauNum + (tauDen - 1)) / lit(tauDen.toDouble)) + 1)
        .cast("int")
      val probes = sets.select(col("__id"), col("nn"),
        posexplode(slice(col("gs"), lit(1), prefixLen)).as(Seq("pos", "gid")))
      time("probes generate only") { noop(probes) }
      println(s"[prof] probe rows=${probes.count()}")
      val raw = probes.alias("a").join(probes.alias("b"),
        col("a.gid") === col("b.gid") &&
          col("a.__id") < col("b.__id") &&
          col("a.nn") * tauNum <= col("b.nn") * tauDen &&
          col("b.nn") * tauNum <= col("a.nn") * tauDen &&
          (lit(1) + least(col("a.nn") - col("a.pos") - 1,
            col("b.nn") - col("b.pos") - 1)) * (tauNum + tauDen) >=
            (col("a.nn") + col("b.nn")) * tauNum)
        .select(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
      time("raw match join (no distinct)") { noop(raw) }
      println(s"[prof] raw pairs=${raw.count()}")
      time("raw + distinct") { noop(raw.distinct()) }
      println(s"[prof] distinct pairs=${raw.distinct().count()}")
      time("raw + distinct (no AQE coalesce)") {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        try noop(raw.distinct())
        finally spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.enabled", "true")
      }
      time("raw + distinct (minPartitionSize=64k)") {
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        try noop(raw.distinct())
        finally spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
      }
      time("jaccard full join (minPartitionSize=64k)") {
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        try noop(ext.Dedup.jaccardSimilarityJoin(idx, 1, 2))
        finally spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
      }
      time("jaccard full join (from ckpts)") {
        noop(ext.Dedup.jaccardSimilarityJoin(idx, 1, 2))
      }
      val probesC = idx.weighted
        .filter(col("sufsq") * (tauDen.toLong * tauDen) >=
          col("n2") * (tauNum.toLong * tauNum))
        .select(col("__id"), col("gid"), col("sufsq"), col("n2"))
      println(s"[prof] cosine probe rows=${probesC.count()}")
      val rawC = probesC.alias("a").join(probesC.alias("b"),
        col("a.gid") === col("b.gid") && col("a.__id") < col("b.__id") &&
          col("a.sufsq").cast("double") * col("b.sufsq") *
            lit((tauDen.toDouble * tauDen)) >=
            col("a.n2").cast("double") * col("b.n2") *
              lit(tauNum.toDouble * tauNum * (1.0 - 1e-9)))
        .select(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
      time("cosine raw (no distinct)") { noop(rawC) }
      println(s"[prof] cosine raw pairs=${rawC.count()}")
      time("cosine raw + distinct") { noop(rawC.distinct()) }
      time("cosine full join (minPartitionSize=64k)") {
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        try noop(ext.Dedup.cosineSimilarityJoin(idx, 1, 2))
        finally spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
      }
      time("cosine full join (from ckpts)") {
        noop(ext.Dedup.cosineSimilarityJoin(idx, 1, 2))
      }
    }
    spark.stop()
  }
}
