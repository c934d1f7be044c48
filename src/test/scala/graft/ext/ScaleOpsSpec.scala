package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Drift

/** Round-4 corpus-lifecycle operators: mixture rebalancing, incremental
  * LSH dedup, rank-ordered context packing, PSI drift, SemDeDup.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- Sampling.mixtureKeep -------------------------------------------

  private val mixDocs = (0 until 400).map { i =>
    (i.toLong, if (i % 4 == 0) "big" else "small")
  }.toDF("id", "src") // 100 big, 300 small

  test("mixtureKeep caps over-represented strata at their target share") {
    // targets: big 0.5, small 0.5 → big rate = min(1, .5*400/100) = 1 (all
    // 100 kept); small rate = .5*400/300 = 2/3 (hash-sampled).
    val kept = Sampling.mixtureKeep(mixDocs, "id", "src",
      Map("big" -> 0.5), defaultShare = 0.5)
    val bySrc = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc("big") shouldBe 100L
    // md5-hash sampling at rate 2/3 over 300 rows: expect ~200, allow
    // binomial spread (±3σ ≈ ±24).
    bySrc("small").toDouble shouldBe 200.0 +- 25.0
    val rates = kept.select("src", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rates("big") shouldBe 1.0
    rates("small") shouldBe (2.0 / 3.0) +- 1e-12
  }

  test("mixtureKeep is deterministic and a subset-consistent filter") {
    val a = Sampling.mixtureKeep(mixDocs, "id", "src",
      Map("big" -> 0.5), 0.5).select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.mixtureKeep(mixDocs.repartition(7), "id", "src",
      Map("big" -> 0.5), 0.5).select("id").collect().map(_.getLong(0)).toSet
    a shouldBe b // partitioning-independent
  }

  // --- Dedup.incrementalDupIds ----------------------------------------

  test("incrementalDupIds flags batch docs colliding with the corpus, once") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta"), // exact dup of 1 → both bands match
      (11L, "iota kappa lambda mu")    // unrelated
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDupIds(corpus, batch, "doc_id", "text",
      Seq(Seq("mh0", "mh1"), Seq("mh2", "mh3")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.keySet shouldBe Set(10L)
    out(10L) shouldBe 0L // first matching band
  }

  test("incrementalDupIds emits one row per batch doc even for crowded buckets") {
    // 20 identical corpus docs: a colliding batch doc must emit 1 row
    // (semi-join), not 20 (inner-join fan-out).
    val corpus = (1L to 20L).map(i => (i, "same text here all over"))
      .toDF("doc_id", "text")
    val batch = Seq((100L, "same text here all over")).toDF("doc_id", "text")
    val out = Dedup.incrementalDupIds(corpus, batch, "doc_id", "text",
      Seq(Seq("mh0", "mh1"), Seq("mh2", "mh3"))).collect()
    out.length shouldBe 1
  }

  // --- Packing.topKConcat ---------------------------------------------

  test("topKConcat packs the top-k payloads in rank order") {
    val df = Seq(
      ("g1", 3.0, "c"), ("g1", 9.0, "a"), ("g1", 5.0, "b"), ("g1", 1.0, "d"),
      ("g2", 2.0, "only")).toDF("g", "score", "payload")
    val rows = Packing.topKConcat(df, "g",
      Seq(desc("score"), col("payload")), col("payload"), k = 3, sep = " | ")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    rows("g1") shouldBe ((3L, "a | b | c"))
    rows("g2") shouldBe ((1L, "only")) // smaller group: all rows, no pad
  }

  test("topKConcat breaks score ties by the declared tiebreak") {
    val df = Seq(("g", 1.0, "z"), ("g", 1.0, "a"), ("g", 1.0, "m"))
      .toDF("g", "score", "p")
    val out = Packing.topKConcat(df, "g",
      Seq(desc("score"), col("p")), col("p"), 2, "+").collect().head
    out.getString(2) shouldBe "a+m"
  }

  // --- Drift ------------------------------------------------------------

  test("bucketOf is a monotone integer ladder with closed-left buckets") {
    val df = Seq(99L, 100L, 101L, 249L, 250L, 1000L).toDF("v")
    val got = df.select(Drift.bucketOf(col("v"), Seq(100L, 250L)).as("b"))
      .collect().map(_.getLong(0)).toSeq
    got shouldBe Seq(0L, 1L, 1L, 1L, 2L, 2L)
  }

  test("psiTerms: identical cohorts give zero terms; empty-side buckets drop") {
    // Same distribution in both cohorts → every term 0.
    val same = (0 until 100).flatMap(i =>
      Seq((i.toLong, true), (i.toLong, false))).toDF("v", "a")
    val zeros = Drift.psiTerms(same, col("a"), Drift.bucketOf(col("v"), Seq(50L)))
      .collect()
    zeros.length shouldBe 2
    all(zeros.map(_.getDouble(3))) shouldBe 0.0
    // A bucket present only in cohort A is omitted (term undefined).
    val skewed = Seq((10L, true), (10L, false), (99L, true))
      .toDF("v", "a")
    val out = Drift.psiTerms(skewed, col("a"),
      Drift.bucketOf(col("v"), Seq(50L))).collect()
    out.length shouldBe 1
    out.head.getLong(0) shouldBe 0L
  }

  test("chiSquare: independence gives 0; hand-computed 2×2 association; V in [0,1]") {
    // perfectly independent 2×2: every cell 25 of 100
    val indep = (for (a <- Seq("x", "y"); b <- Seq("p", "q");
      _ <- 0 until 25) yield (a, b)).toDF("a", "b")
    val z = Drift.chiSquare(indep, "a", "b").head()
    z.getAs[Double]("chi2") shouldBe 0.0
    z.getAs[Double]("cramers_v") shouldBe 0.0
    z.getAs[Long]("dof") shouldBe 1L
    // 2×2 with association: cells x/p=30 x/q=10 y/p=10 y/q=30 → N=80,
    // all expected 20, chi2 = 4·(10²/20) = 20, V = sqrt(20/80) = 0.5
    val assoc = (Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))).toDF("a", "b")
    val r = Drift.chiSquare(assoc, "a", "b").head()
    r.getAs[Long]("n") shouldBe 80L
    r.getAs[Double]("chi2") shouldBe 20.0
    r.getAs[Double]("cramers_v") shouldBe 0.5
  }

  test("ksTest: identical samples give D=0; disjoint give D=1; known hand case") {
    val same = (0 until 50).flatMap(i =>
      Seq((i.toDouble, true), (i.toDouble, false))).toDF("v", "a")
    val z = Drift.ksTest(same, "v", col("a")).head()
    z.getAs[Double]("d_stat") shouldBe 0.0
    // disjoint supports: ECDFs reach (1, 0) at A's max → D = 1 there
    val disj = ((0 until 10).map(i => (i.toDouble, true)) ++
      (0 until 10).map(i => (100.0 + i, false))).toDF("v", "a")
    val o = Drift.ksTest(disj, "v", col("a")).head()
    o.getAs[Double]("d_stat") shouldBe 1.0
    o.getAs[Double]("at_value") shouldBe 9.0
    // hand case: A = {1,2,3,4}, B = {3,4,5,6}: at v=2 F_A=1/2 F_B=0 → D=0.5
    val hand = (Seq(1.0, 2.0, 3.0, 4.0).map((_, true)) ++
      Seq(3.0, 4.0, 5.0, 6.0).map((_, false))).toDF("v", "a")
    val r = Drift.ksTest(hand, "v", col("a")).head()
    r.getAs[Long]("n_a") shouldBe 4L
    r.getAs[Long]("n_b") shouldBe 4L
    r.getAs[Double]("d_stat") shouldBe 0.5
    r.getAs[Double]("at_value") shouldBe 2.0
    // bucketed two-phase cumsum ≡ the single-window ECDF on random data,
    // for a bucket count that forces many non-trivial bucket boundaries
    val rnd = new scala.util.Random(17)
    val big = (0 until 2000).map(_ =>
      (math.rint(rnd.nextDouble() * 500) / 10.0, rnd.nextBoolean()))
      .toDF("v", "a")
    val got = Drift.ksTest(big, "v", col("a"), nBuckets = 7).head()
    val rows = big.collect().map(r2 => (r2.getDouble(0), r2.getBoolean(1)))
    val na = rows.count(_._2).toDouble
    val nb = rows.size - na
    val dExp = rows.map(_._1).distinct.sorted.map { v =>
      math.abs(rows.count(t => t._2 && t._1 <= v) / na -
        rows.count(t => !t._2 && t._1 <= v) / nb)
    }.max
    got.getAs[Double]("d_stat") shouldBe
      (BigDecimal(dExp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("wasserstein1: constant shift gives the shift; identical gives 0") {
    // B = A + 5 pointwise → W1 = 5 exactly (mass moves 5 units)
    val shifted = ((0 until 100).map(i => (i.toDouble, true)) ++
      (0 until 100).map(i => (i.toDouble + 5, false))).toDF("v", "a")
    Drift.wasserstein1(shifted, "v", col("a")).head()
      .getAs[Double]("w1") shouldBe 5.0
    val same = (0 until 50).flatMap(i =>
      Seq((i.toDouble, true), (i.toDouble, false))).toDF("v", "a")
    Drift.wasserstein1(same, "v", col("a")).head()
      .getAs[Double]("w1") shouldBe 0.0
    // bucketed rank join ≡ driver integral on random data
    val rnd = new scala.util.Random(23)
    val big = (0 until 1000).map(_ =>
      (math.rint(rnd.nextDouble() * 300) / 10.0, rnd.nextBoolean()))
      .toDF("v", "a")
    val got = Drift.wasserstein1(big, "v", col("a"), nBuckets = 5).head()
    val rows = big.collect().map(r2 => (r2.getDouble(0), r2.getBoolean(1)))
    val na = rows.count(_._2).toDouble
    val nb = rows.size - na
    val vs = rows.map(_._1).distinct.sorted
    val terms = vs.zip(vs.tail).map { case (v1, v2) =>
      val dv = math.abs(rows.count(t => t._2 && t._1 <= v1) / na -
        rows.count(t => !t._2 && t._1 <= v1) / nb)
      BigDecimal(math.round(dv * (v2 - v1) * 1e9)) / BigDecimal(1e9)
    }
    val expected = BigDecimal(terms.sum.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.getAs[Double]("w1") shouldBe expected
  }

  test("incrementalKs ≡ ksTest over the combined raw rows, bit for bit") {
    val rnd = new scala.util.Random(29)
    val corpusRows = (0 until 800).map(_ =>
      math.rint(rnd.nextDouble() * 400) / 10.0)
    val batchRows = (0 until 150).map(_ =>
      math.rint(rnd.nextDouble() * 400) / 10.0 + 3.0) // shifted arrivals
    val corpus = graft.ops.Drift.ecdfTable(corpusRows.toDF("value"), "value")
    val inc = graft.ops.Drift.incrementalKs(corpus,
      batchRows.toDF("value"), "value", nBuckets = 7).head()
    val direct = graft.ops.Drift.ksTest(
      (corpusRows.map((_, true)) ++ batchRows.map((_, false)))
        .toDF("value", "a"), "value", col("a"), nBuckets = 13).head()
    inc.getAs[Long]("n_a") shouldBe direct.getAs[Long]("n_a")
    inc.getAs[Long]("n_b") shouldBe direct.getAs[Long]("n_b")
    inc.getAs[Double]("d_stat") shouldBe direct.getAs[Double]("d_stat")
    inc.getAs[Double]("at_value") shouldBe direct.getAs[Double]("at_value")
    // and the same frozen table serves the W1 probe, also bit-identically
    val incW = graft.ops.Drift.incrementalWasserstein(corpus,
      batchRows.toDF("value"), "value", nBuckets = 7).head()
    val directW = graft.ops.Drift.wasserstein1(
      (corpusRows.map((_, true)) ++ batchRows.map((_, false)))
        .toDF("value", "a"), "value", col("a"), nBuckets = 13).head()
    incW.getAs[Double]("w1") shouldBe directW.getAs[Double]("w1")
  }

  test("quantizedEcdfTable: bounded size; probe ≡ full test at grid resolution") {
    val rnd = new scala.util.Random(31)
    // genuinely continuous values — ~every double distinct
    val corpusRows = (0 until 2000).map(_ => rnd.nextDouble() * 40.0)
    val batchRows = (0 until 300).map(_ => rnd.nextDouble() * 40.0 + 3.0)
    val step = 0.5
    val q = graft.ops.Drift.quantizedEcdfTable(
      corpusRows.toDF("value"), "value", step)
    // the table is grid-bounded, not data-bounded: ≤ range/step + 1 cells
    corpusRows.distinct.size should be > 1900 // raw table would be ~n rows
    q.count() should be <= (40.0 / step).toLong + 1
    // probe over the quantized table ≡ the full two-sample test over
    // combined raw rows quantized at the SAME grid — bit for bit
    val inc = graft.ops.Drift.incrementalKsQuantized(q,
      batchRows.toDF("value"), "value", step, nBuckets = 7).head()
    val combined = (corpusRows.map((_, true)) ++ batchRows.map((_, false)))
      .toDF("value", "a")
      .select(graft.ops.Drift.quantize(col("value"), step).as("value"),
        col("a"))
    val direct = graft.ops.Drift.ksTest(combined, "value", col("a"),
      nBuckets = 13).head()
    inc.getAs[Double]("d_stat") shouldBe direct.getAs[Double]("d_stat")
    inc.getAs[Double]("at_value") shouldBe direct.getAs[Double]("at_value")
    val incW = graft.ops.Drift.incrementalWassersteinQuantized(q,
      batchRows.toDF("value"), "value", step, nBuckets = 7).head()
    val directW = graft.ops.Drift.wasserstein1(combined, "value",
      col("a"), nBuckets = 13).head()
    incW.getAs[Double]("w1") shouldBe directW.getAs[Double]("w1")
    // the grid really is the only approximation: the quantized KS is
    // within one cell's mass of the raw-value KS on this smooth data
    val rawD = graft.ops.Drift.ksTest(
      (corpusRows.map((_, true)) ++ batchRows.map((_, false)))
        .toDF("value", "a"), "value", col("a")).head().getAs[Double]("d_stat")
    math.abs(inc.getAs[Double]("d_stat") - rawD) should be < 0.05
  }

  test("quantize: non-finite values propagate unchanged (cross-engine NaN/Inf parity)") {
    // Spark's floor returns LongType — unguarded, NaN would land in cell
    // 0 and ±Inf would overflow under ANSI, while DuckDB's DOUBLE floor
    // keeps them. The guard makes both engines agree: non-finite in,
    // same non-finite out; finite values hit the floor(v/step)·step path.
    val vals = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 3.7, -3.7, 0.0).toDF("v")
    val out = vals.select(
      graft.ops.Drift.quantize(col("v"), 0.5).as("q")).collect()
      .map(_.getDouble(0))
    assert(out(0).isNaN)
    out(1) shouldBe Double.PositiveInfinity
    out(2) shouldBe Double.NegativeInfinity
    out(3) shouldBe 3.5
    out(4) shouldBe -4.0 // floor, not trunc: left edge below the value
    out(5) shouldBe 0.0
  }

  test("psiTerms detects a shifted distribution with positive PSI") {
    // Cohort A concentrated low, cohort B high: both buckets drift.
    val df = ((0 until 90).map(i => (10L, true)) ++
      (0 until 10).map(_ => (90L, true)) ++
      (0 until 10).map(_ => (10L, false)) ++
      (0 until 90).map(_ => (90L, false))).toDF("v", "a")
    val psi = Drift.psiTerms(df, col("a"), Drift.bucketOf(col("v"), Seq(50L)))
      .agg(sum("psi_term")).head().getDouble(0)
    psi should be > 3.0 // (0.9-0.1)*ln(9) × 2 ≈ 3.52
  }

  // --- SemDedup ---------------------------------------------------------

  private def vec(xs: Double*): Seq[Double] = xs.toSeq

  test("assign picks the nearest centroid by cosine with id tiebreak") {
    val emb = Seq(
      (10L, Seq(1.0f, 0.1f)),   // → centroid 0 (x-axis)
      (11L, Seq(0.1f, 1.0f)),   // → centroid 1 (y-axis)
      (12L, Seq(1.0f, 1.0f))    // equidistant → tiebreak: centroid 0
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, vec(1.0, 0.0)), (1L, vec(0.0, 1.0)))
      .toDF("cid", "cv")
    val got = SemDedup.assign(emb, "embedding", "vec_id", cents)
      .select("vid", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(10L -> 0L, 11L -> 1L, 12L -> 0L)
  }

  test("dropList keeps the lowest id and only compares within a cluster") {
    // Cluster 0: 10, 12 nearly parallel (cos≈1) → 12 dropped, keeper 10.
    // Cluster 1: 11 parallel to 13 BUT different cluster → no pair.
    val emb = Seq(
      (10L, Seq(1.0f, 0.01f)),
      (12L, Seq(1.0f, 0.02f)),
      (11L, Seq(0.01f, 1.0f)),
      (13L, Seq(0.3f, 1.0f)) // same cluster as 11, cos(11,13) ≈ 0.958
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, vec(1.0, 0.0)), (1L, vec(0.0, 1.0)))
      .toDF("cid", "cv")
    val assigned = SemDedup.assign(emb, "embedding", "vec_id", cents)
    val dropped = SemDedup.dropList(assigned, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    dropped.toSeq shouldBe Seq((12L, 10L, 1L))
    // Lower threshold picks up the in-cluster (11,13) pair too — but
    // never a cross-cluster pair.
    val loose = SemDedup.dropList(assigned, 0.9)
      .collect().map(_.getLong(0)).toSet
    loose shouldBe Set(12L, 13L)
  }

  test("cellSizeAudit reports exact self-join size and skew before the join") {
    // cells of 3, 2, 1 members -> pairs 3, 1, 0; straggler share 3/4
    val emb = Seq(
      (1L, Seq(1.0f, 0.01f)), (2L, Seq(1.0f, 0.02f)), (3L, Seq(1.0f, 0.03f)),
      (4L, Seq(0.01f, 1.0f)), (5L, Seq(0.02f, 1.0f)),
      (6L, Seq(-1.0f, -1.1f))).toDF("vec_id", "embedding")
    val cents = Seq((0L, vec(1.0, 0.0)), (1L, vec(0.0, 1.0)),
      (2L, vec(-1.0, -1.0))).toDF("cid", "cv")
    val audit = SemDedup.cellSizeAudit(
      SemDedup.assign(emb, "embedding", "vec_id", cents))
    val byCell = audit.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    byCell shouldBe Map(0L -> ((3L, 3L)), 1L -> ((2L, 1L)), 2L -> ((1L, 0L)))
    val s = SemDedup.cellSkewSummary(audit).head()
    s.getLong(0) shouldBe 4L   // total pairs = exact dropList join size
    s.getLong(1) shouldBe 3L   // straggler cell
    s.getDouble(2) shouldBe 0.75 +- 1e-9
  }

  test("incrementalDropList drops batch near-dups of the corpus, keeps novel") {
    // Corpus (frozen): 20 on the x-axis, 21 on the y-axis.
    // Batch: 30 ≈ x-axis (near-dup of 20), 31 well off both (novel).
    val cents = Seq((0L, vec(1.0, 0.0)), (1L, vec(0.0, 1.0))).toDF("cid", "cv")
    val corpus = SemDedup.assign(
      Seq((20L, Seq(1.0f, 0.01f)), (21L, Seq(0.01f, 1.0f)))
        .toDF("vec_id", "embedding"),
      "embedding", "vec_id", cents)
    val batch = Seq(
      (30L, Seq(1.0f, 0.02f)),  // cos(30,20) ≈ 1 → dropped, keeper 20
      (31L, Seq(1.0f, 0.9f))    // cluster 0, cos(31,20) ≈ 0.74 → kept
    ).toDF("vec_id", "embedding")
    val out = SemDedup.incrementalDropList(
      corpus, batch, "embedding", "vec_id", cents, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq((30L, 20L, 1L))
  }

  test("incrementalDropList never compares across clusters; corpus always keeps") {
    // Batch vector 40 is parallel to corpus 21 but assigns to cluster 0
    // (cos to centroid 0 higher) → no comparison with 21, survives.
    val cents = Seq((0L, vec(1.0, 0.0)), (1L, vec(0.0, 1.0))).toDF("cid", "cv")
    val corpus = SemDedup.assign(
      Seq((21L, Seq(1.0f, 0.8f))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", cents) // cluster 0
    val batch = Seq((40L, Seq(0.8f, 1.0f))).toDF("vec_id", "embedding") // cluster 1
    SemDedup.incrementalDropList(corpus, batch, "embedding", "vec_id",
      cents, 0.5).count() shouldBe 0L
    // Same pair, threshold met, when both land in one cluster: batch id
    // is ALWAYS the dropped side even though 21 < 40 — arrival order wins.
    val oneCell = Seq((0L, vec(1.0, 0.0))).toDF("cid", "cv")
    val co1 = SemDedup.assign(
      Seq((21L, Seq(1.0f, 0.8f))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", oneCell)
    val got = SemDedup.incrementalDropList(co1, batch, "embedding",
      "vec_id", oneCell, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.toSeq shouldBe Seq((40L, 21L))
  }

  test("incrementalDropList matches brute force over the split") {
    // 40 seeded vectors, centroids = first 4, corpus = ids with id%3!=0,
    // batch = id%3==0; brute force recomputes every (batch, corpus)
    // cosine restricted to equal assigned clusters.
    val rnd = new scala.util.Random(7)
    val all = (4L until 44L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val cents = (0L until 4L).map(i =>
      (i, Seq.fill(8)(rnd.nextDouble() * 2 - 1))).toDF("cid", "cv")
    val corpusDf = all.filter(col("vec_id") % 3 =!= 0)
    val batchDf = all.filter(col("vec_id") % 3 === 0)
    val corpus = SemDedup.assign(corpusDf, "embedding", "vec_id", cents)
    val got = SemDedup.incrementalDropList(
      corpus, batchDf, "embedding", "vec_id", cents, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val asg = SemDedup.assign(all, "embedding", "vec_id", cents)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Double](1), r.getDouble(2), r.getLong(3)))).toMap
    val want = asg.keys.filter(_ % 3 == 0).flatMap { b =>
      val (bv, bn, bc) = asg(b)
      val hits = asg.keys.filter(c => c % 3 != 0 && asg(c)._3 == bc)
        .map { c =>
          val (cv, cn, _) = asg(c)
          val cos = BigDecimal(bv.zip(cv).map(p => p._1 * p._2).sum / (bn * cn))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (c, cos)
        }.filter(_._2 >= 0.5)
      if (hits.isEmpty) None
      else Some((b, hits.map(_._1).min, hits.size.toLong))
    }.toSet
    got shouldBe want
    got.nonEmpty shouldBe true // the seed plants at least one near-dup
  }

  test("dropBoilerplate removes cross-doc frequent lines, keeps order, counts") {
    // "footer" appears in all three docs → boilerplate. "a b" repeats
    // WITHIN doc 1 only → document frequency 1, kept (both occurrences).
    val docs = Seq(
      (1L, "a b\nfooter\na b"),
      (2L, "unique two\nfooter"),
      (3L, "footer\nsolo line")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dropBoilerplate(docs, "doc_id", "text", minDf = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    out(1L) shouldBe (("a b\na b", 2L, 1L))
    out(2L) shouldBe (("unique two", 1L, 1L))
    out(3L) shouldBe (("solo line", 1L, 1L))
  }

  test("dropBoilerplate keeps fully-boilerplate docs with empty text") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.dropBoilerplate(docs, "doc_id", "text", minDf = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    out.length shouldBe 3
    out.foreach { case (_, t, k, d) => t shouldBe ""; k shouldBe 0L; d shouldBe 1L }
  }

  test("dropBoilerplate splits on a literal separator, not a regex") {
    // '|' would be a regex alternation if unquoted — "a|b" must split into
    // "a" and "b", not into empty strings.
    val docs = Seq((1L, "a|b"), (2L, "c|b")).toDF("doc_id", "text")
    val out = TextAnalysis.dropBoilerplate(docs, "doc_id", "text", sep = "|", minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "a"
    out(2L) shouldBe "c"
  }
}
