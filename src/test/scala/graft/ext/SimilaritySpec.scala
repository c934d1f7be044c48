package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [X] similarity search: exact cosine math, brute-force and bucketed ANN. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f)),   // identical to query
    (2L, Array(0.9f, 0.1f, 0.0f)),   // close
    (3L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
    (4L, Array(-1.0f, 0.0f, 0.0f))   // opposite
  ).toDF("vec_id", "embedding")

  test("cosine column math: identity=1, orthogonal=0, opposite=-1") {
    val c = emb.select($"vec_id",
      Similarity.cosine(
        Similarity.asDouble($"embedding"),
        array(lit(1.0), lit(0.0), lit(0.0))).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    c(1L) shouldBe 1.0 +- 1e-9
    c(3L) shouldBe 0.0 +- 1e-9
    c(4L) shouldBe -1.0 +- 1e-9
  }

  test("bruteForceTopK: correct ranking with deterministic ties") {
    val q = emb.filter($"vec_id" === 0L)
      .select(Similarity.asDouble($"embedding").as("qv"))
    val top = Similarity.bruteForceTopK(
      emb.filter($"vec_id" > 0), "embedding", "vec_id", q, 3)
      .collect().map(_.getLong(0)).toSeq
    top shouldBe Seq(1L, 2L, 3L)
  }

  test("signBucket blocks by leading-dimension signs") {
    val b = emb.select($"vec_id",
      Similarity.signBucket($"embedding", 3).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    b(0L) shouldBe b(1L) // same signs → same bucket
    b(0L) should not be b(3L)
    b(0L) should not be b(4L)
  }

  test("bucketedTopK finds same-bucket neighbors (exact rescoring inside)") {
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding".as("qv"))
    val top = Similarity.bucketedTopK(emb, "embedding", "vec_id", q, 3, 5)
      .collect().map(_.getLong(0)).toSeq
    // bucket 0b001 (only dim 1 positive) contains exactly vecs 0 and 1;
    // vec 2's positive second dim puts it in 0b011 — blocked out by design
    top shouldBe Seq(0L, 1L)
  }

  test("knnJoin: every query gets its own ranked top-k; query side broadcasts") {
    val queries = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (200L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("qid", "qv")
    val out = Similarity.knnJoin(emb, "embedding", "vec_id", queries, 2)
    val byQ = out.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq).toMap
    byQ(100L) shouldBe Seq(0L, 1L) // identical vecs; tie broken by vec_id
    byQ(200L).head shouldBe 3L // the orthogonal query's nearest is vec 3
    out.queryExecution.executedPlan.toString should include("BroadcastNestedLoopJoin")
  }

  test("knnJoin: custom query column names, incl. one colliding with a candidate column") {
    // Query id column deliberately named like the candidates' vector
    // column: the defensive internal renames must keep them apart.
    val queries = Seq((100L, Array(1.0f, 0.0f, 0.0f)))
      .toDF("embedding", "searchvec")
    val out = Similarity.knnJoin(emb, "embedding", "vec_id", queries, 2,
      qidCol = "embedding", qvCol = "searchvec")
    out.columns.toSeq shouldBe Seq("embedding", "vec_id", "cos_r", "rnk")
    out.collect().map(_.getLong(1)).toSeq shouldBe Seq(0L, 1L)
    an[IllegalArgumentException] should be thrownBy
      Similarity.knnJoin(emb, "embedding", "vec_id", queries, 2,
        qidCol = "vec_id", qvCol = "searchvec")
    // ids may not shadow the documented output columns either
    an[IllegalArgumentException] should be thrownBy
      Similarity.knnJoin(emb.withColumnRenamed("vec_id", "rnk"),
        "embedding", "rnk", queries, 2,
        qidCol = "embedding", qvCol = "searchvec")
  }

  test("contrastivePairs: positives same-label, hard negatives nearest other-label") {
    // candidates: label 0 along +x, label 1 along +y, one label-1 vector
    // CLOSE to +x (the hard negative that must outrank the easy one)
    val cands = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f), 0),
      (11L, Array(0.9f, 0.1f, 0.0f), 0),
      (12L, Array(0.0f, 1.0f, 0.0f), 1),
      (13L, Array(0.7f, 0.7f, 0.0f), 1), // hard negative for a +x anchor
      (14L, Array(-1.0f, 0.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val anchors = Seq((1L, Array(1.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.contrastivePairs(cands, anchors,
      "vec_id", "embedding", "label", kPos = 2, kNeg = 1)
      .collect()
      .map(r => (r.getBoolean(2), r.getInt(4)) -> r.getLong(1)).toMap
    out((true, 1)) shouldBe 10L   // exact same direction
    out((true, 2)) shouldBe 11L   // close, same label
    out((false, 1)) shouldBe 13L  // the 45° label-1 vector, not the 90° one
    out.size shouldBe 3           // kNeg=1 → easy negative 12 excluded
    // the anchor side broadcasts; the top-k is a group limit before the
    // exchange (rank <= literal conjunct kept for the optimizer)
    val plan = Similarity.contrastivePairs(cands, anchors,
      "vec_id", "embedding", "label", 2, 1)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastNestedLoopJoin")
    plan should include("WindowGroupLimit")
  }

  test("mmrRerank: diversity beats redundancy at low lambda, λ=1 is plain top-k") {
    // Query +x. Candidates: two near-copies of +x (10, 11), one diverse
    // 45° vector (12), one orthogonal (13).
    val cands = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(0.999f, 0.01f, 0.0f)),
      (12L, Array(0.7f, 0.7f, 0.0f)),
      (13L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Array(1.0, 0.0, 0.0)
    // λ=1: pure relevance → the two near-copies first
    val plain = Similarity.mmrRerank(cands, "embedding", "vec_id", q,
      shortlist = 4, k = 3, lambda = 1.0)
      .orderBy("rnk").collect().map(_.getLong(0)).toSeq
    plain shouldBe Seq(10L, 11L, 12L)
    // λ=0.5: after picking 10, the near-copy 11 is maximally redundant —
    // the diverse 12 must take rank 2
    val div = Similarity.mmrRerank(cands, "embedding", "vec_id", q,
      shortlist = 4, k = 3, lambda = 0.5)
      .orderBy("rnk").collect().map(_.getLong(0)).toSeq
    div.take(2) shouldBe Seq(10L, 12L)
    // k capped by the candidate count; contract guards
    Similarity.mmrRerank(cands, "embedding", "vec_id", q, 4, 4, 0.7)
      .count() shouldBe 4
    an[IllegalArgumentException] should be thrownBy
      Similarity.mmrRerank(cands, "embedding", "vec_id", q, 2, 3, 0.7)
    an[IllegalArgumentException] should be thrownBy
      Similarity.mmrRerank(cands, "embedding", "vec_id", q, 4, 2, 1.5)
  }

  test("nearDupPairs: only ≥-threshold pairs, a<b canonical order") {
    val pairs = Similarity.nearDupPairs(emb, "embedding", "vec_id", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((0L, 1L))
    pairs should contain((0L, 2L))
    pairs.foreach { case (a, b) => a should be < b }
    pairs.map(_._2) should not contain 4L
  }

  test("nearDupPairsBlocked ≡ nearDupPairs bit-for-bit (property, several B)") {
    // Random unit-ish vectors; threshold low enough that many pairs pass,
    // so both the accept and the reject paths (incl. the raw-cut decimal
    // skip) are exercised. Scores must be BIT-equal, not just close —
    // the kernel replicates the relational form's double ops exactly.
    val rnd = new scala.util.Random(7)
    val data = (0L until 150L).map { i =>
      (i, Array.fill(16)(rnd.nextFloat() - 0.3f))
    }.toDF("vec_id", "embedding")
    val expect = Similarity.nearDupPairs(data, "embedding", "vec_id", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    expect should not be empty
    for (b <- Seq(1, 3, 16, 64)) {
      val got = Similarity
        .nearDupPairsBlocked(data, "embedding", "vec_id", 0.4, blocks = b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      got shouldBe expect
    }
  }

  /** Reference reimplementation of TextHash.tokenHash for the projection
    * sign (md5 hex → strip a-f → pad → first 8 digits).
    */
  private def refHash(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (hex.replaceAll("[a-f]", "") + "00000000").substring(0, 8).toLong
  }

  test("randomProject: exact hand-computed cells, full shape, determinism") {
    val d = 4; val k = 3
    val data = Seq(
      (0L, Array(1.0f, 0.5f, -0.25f, 0.125f)),
      (1L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.randomProject(data, "embedding", "vec_id", k)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    out.size shouldBe 2 * k
    def sign(i: Int, j: Int): Double = if (refHash(s"${i}_$j") % 2 == 0) 1.0 else -1.0
    val vecs = Map(0L -> Array(1.0, 0.5, -0.25, 0.125), 1L -> Array(0.0, 0.0, 1.0, 0.0))
    for (id <- Seq(0L, 1L); j <- 0 until k) {
      // power-of-two components: the 2^-40 truncation is exact here
      val expect = BigDecimal((0 until d).map(i => vecs(id)(i) * sign(i, j)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      out((id, j)) shouldBe expect +- 1e-9
    }
    // deterministic across invocations
    val again = Similarity.randomProject(data, "embedding", "vec_id", k)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    again shouldBe out
  }

  test("randomProject preserves relative distances (JL sanity)") {
    // Two near-identical vectors and one far vector: after projection the
    // near pair must stay much closer than the far pair.
    val rnd = new scala.util.Random(11)
    val a = Array.fill(64)(rnd.nextFloat())
    val b = a.clone(); b(0) = b(0) + 0.01f
    val c = Array.fill(64)(-rnd.nextFloat())
    val data = Seq((0L, a), (1L, b), (2L, c)).toDF("vec_id", "embedding")
    val p = Similarity.randomProject(data, "embedding", "vec_id", 16)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2))).toMap
    def dist(x: Seq[Double], y: Seq[Double]) =
      math.sqrt(x.zip(y).map { case (u, v) => (u - v) * (u - v) }.sum)
    dist(p(0L), p(1L)) should be < dist(p(0L), p(2L)) / 10
  }

  // ---- SRP fingerprints -------------------------------------------------

  /** Driver-side reference of `Similarity.srpSignature`: same hyperplane
    * hash, same 2^-40 truncation (Scala's `.toLong` truncates toward zero
    * like Spark's cast), same `sum >= 0` sign rule.
    */
  private def refSrp(v: Array[Float]): Long = {
    var sh = 0L
    for (j <- 0 until 64) {
      var s = 0L
      for (i <- v.indices) {
        val sg = if (refHash(s"${i}_$j") % 2 == 0) 1L else -1L
        s += sg * (v(i).toDouble * 1099511627776.0).toLong
      }
      if (s >= 0) sh |= (1L << j)
    }
    sh
  }

  /** 40 random dim-8 vectors plus planted structure: 100 = exact copy of
    * 0, 101 = 0 with one jittered coordinate (near in angle), 102 = the
    * negation of 0 (max angle).
    */
  private lazy val srpData: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map(id =>
      id -> Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    val v0 = base.head._2
    val jit = v0.clone(); jit(3) = jit(3) + 0.02f
    base ++ Seq(100L -> v0.clone(), 101L -> jit, 102L -> v0.map(-_))
  }

  test("srpSignature: bit-exact vs the driver-side reference") {
    val df = srpData.toDF("vec_id", "embedding")
    val got = Similarity.srpSignature(df, "embedding", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.size shouldBe srpData.size
    for ((id, v) <- srpData) got(id) shouldBe refSrp(v)
    // planted structure shows up in the fingerprints themselves
    got(100L) shouldBe got(0L)
    java.lang.Long.bitCount(got(101L) ^ got(0L)) should be <= 8
    // negation flips every non-zero-sum bit: far in Hamming space
    java.lang.Long.bitCount(got(102L) ^ got(0L)) should be >= 56
  }

  test("srpNearDupPairs ≡ brute-force Hamming over a radius grid") {
    val df = srpData.toDF("vec_id", "embedding")
    val sigs = srpData.map { case (id, v) => id -> refSrp(v) }
    for (r <- Seq(0, 5, 14, 33)) {
      val expect = (for {
        (a, sa) <- sigs; (b, sb) <- sigs if a < b
        d = java.lang.Long.bitCount(sa ^ sb) if d <= r
      } yield (a, b, d.toLong)).toSet
      val got = Similarity.srpNearDupPairs(df, "embedding", "vec_id", r)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      withClue(s"radius $r:") { got shouldBe expect }
    }
    // the exact copy collides at radius 0 (the jittered near-dup may too —
    // a 0.02 nudge often flips no sign; exactness is pinned by the grid)
    Similarity.srpNearDupPairs(df, "embedding", "vec_id", 0)
      .collect().map(x => (x.getLong(0), x.getLong(1))) should contain((0L, 100L))
  }

  test("incrementalSrpPairs ≡ cross-split brute force; copy collides at 0") {
    val (corpus, batch) = srpData.partition(_._1 < 100L)
    val cDf = corpus.toDF("vec_id", "embedding")
    val bDf = batch.toDF("vec_id", "embedding")
    val cSig = Similarity.srpSignature(cDf, "embedding", "vec_id")
    for (r <- Seq(0, 14)) {
      val expect = (for {
        (a, va) <- batch; (b, vb) <- corpus
        d = java.lang.Long.bitCount(refSrp(va) ^ refSrp(vb)) if d <= r
      } yield (a, b, d.toLong)).toSet
      val got = Similarity.incrementalSrpPairs(
        cSig, bDf, "embedding", "vec_id", r)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      withClue(s"radius $r:") { got shouldBe expect }
    }
    Similarity.incrementalSrpPairs(cSig, bDf, "embedding", "vec_id", 0)
      .collect().map(x => (x.getLong(0), x.getLong(1))) should contain((100L, 0L))
  }

  /** Driver union-find with union-by-min: the root of each component is
    * its minimum id, matching clustersFromEdges' min-label semantics.
    */
  private def unionFind(ids: Seq[Long],
      pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ids.map(i => i -> find(i)).toMap
  }

  test("srpClusters ≡ driver union-find over the brute pair graph") {
    val df = srpData.toDF("vec_id", "embedding")
    val sigs = srpData.map { case (id, v) => id -> refSrp(v) }
    val pairs = for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 14
    } yield (a, b)
    val expect = unionFind(sigs.map(_._1), pairs)
    val got = Similarity.srpClusters(df, "embedding", "vec_id", 14)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getInt(2))).toMap
    got.view.mapValues(_._1).toMap shouldBe expect
    for ((id, (cl, k)) <- got) k shouldBe (if (cl == id) 1 else 0)
  }

  test("assignToSrpClusters: min-label adoption; novel vector founds its own") {
    val (corpus, batch) = srpData.partition(_._1 < 100L)
    val cDf = corpus.toDF("vec_id", "embedding")
    val bDf = batch.toDF("vec_id", "embedding")
    val cSig = Similarity.srpSignature(cDf, "embedding", "vec_id")
    val labels = Similarity.srpClusters(cDf, "embedding", "vec_id", 14)
    val got = Similarity.assignToSrpClusters(labels, cSig, bDf,
      "embedding", "vec_id", 14)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // brute expectation across the split
    val cSigs = corpus.map { case (id, v) => id -> refSrp(v) }
    val cLabels = unionFind(cSigs.map(_._1),
      for {
        (a, sa) <- cSigs; (b, sb) <- cSigs
        if a < b && java.lang.Long.bitCount(sa ^ sb) <= 14
      } yield (a, b))
    for ((bid, bv) <- batch) {
      val matches = cSigs.filter { case (_, cs) =>
        java.lang.Long.bitCount(refSrp(bv) ^ cs) <= 14 }.map(_._1)
      val expect =
        if (matches.isEmpty) bid else matches.map(cLabels).min
      withClue(s"batch $bid:") { got(bid) shouldBe expect }
    }
    // the exact copy of corpus vec 0 adopts vec 0's cluster
    got(100L) shouldBe cLabels(0L)
  }

  test("covarianceMatrix ≡ driver reference with the same truncation discipline") {
    val rnd = new scala.util.Random(41)
    val vecs = (0L until 40L).map(i =>
      i -> Array.fill(6)((rnd.nextDouble() * 2 - 1).toFloat))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.covarianceMatrix(df, "embedding", "vec_id")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    got.size shouldBe 21 // 6·7/2 upper triangle
    val S = 1099511627776.0
    val n = vecs.size
    val xs = vecs.map(_._2.map(_.toDouble))
    for (i <- 0 until 6; j <- i until 6) {
      val sxy = xs.map(v => (v(i) * v(j) * S).toLong).sum
      val sa = xs.map(v => (v(i) * S).toLong).sum
      val sb = xs.map(v => (v(j) * S).toLong).sum
      val ref = BigDecimal(sxy.toDouble / S / n -
        (sa.toDouble / S / n) * (sb.toDouble / S / n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      withClue(s"cov($i,$j):") { got((i, j)) shouldBe ref }
    }
    // sanity: the diagonal is a variance — nonnegative
    (0 until 6).foreach(i => got((i, i)) should be >= -1e-6)
  }

  test("covariance sketch merges exactly: merge(sums(A), sums(B)) ≡ sums(A ∪ B)") {
    val rnd = new scala.util.Random(43)
    val vecs = (0L until 60L).map(i =>
      i -> Array.fill(5)((rnd.nextDouble() * 2 - 1).toFloat))
    val all = vecs.toDF("vec_id", "embedding")
    val aPart = vecs.filter(_._1 % 3 == 0).toDF("vec_id", "embedding")
    val bPart = vecs.filter(_._1 % 3 != 0).toDF("vec_id", "embedding")
    def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val merged = Similarity.mergeCovarianceSums(
      Similarity.covarianceSums(aPart, "embedding", "vec_id"),
      Similarity.covarianceSums(bPart, "embedding", "vec_id"))
    cells(merged) shouldBe
      cells(Similarity.covarianceSums(all, "embedding", "vec_id"))
    // and the finalized matrix is bit-identical to the full recompute
    Similarity.finalizeCovariance(merged).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap shouldBe
      Similarity.covarianceMatrix(all, "embedding", "vec_id").collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
  }

  test("pcaComponents: orthonormal eigenpairs in decreasing-variance order; projection ≡ driver dot") {
    val rnd = new scala.util.Random(47)
    // anisotropic cloud: dim 0 dominates, dim 1 second, rest noise
    val scale = Array(5.0, 2.0, 0.3, 0.2, 0.15, 0.1)
    val vecs = (0L until 200L).map(i =>
      i -> Array.tabulate(6)(d => (rnd.nextGaussian() * scale(d)).toFloat))
    val df = vecs.toDF("vec_id", "embedding")
    val w = Similarity.pcaComponents(df, "embedding", "vec_id", kComp = 3)
    w.length shouldBe 3
    // orthonormal
    for (a <- 0 until 3; b <- a until 3) {
      val dot = (0 until 6).map(i => w(a)(i) * w(b)(i)).sum
      dot shouldBe ((if (a == b) 1.0 else 0.0) +- 1e-6)
    }
    // the top component points down the dominant axis
    math.abs(w(0)(0)) should be > 0.99
    math.abs(w(1)(1)) should be > 0.95
    // eigenpair residual against the (rounded) covariance actually used
    val cells = Similarity.covarianceMatrix(df, "embedding", "vec_id")
      .collect()
    val a6 = Array.ofDim[Double](6, 6)
    cells.foreach { r =>
      a6(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      a6(r.getInt(1))(r.getInt(0)) = r.getDouble(2)
    }
    val v0 = w(0)
    val av = Array.tabulate(6)(i => (0 until 6).map(j => a6(i)(j) * v0(j)).sum)
    val lam = (0 until 6).map(i => v0(i) * av(i)).sum
    val resid = math.sqrt((0 until 6).map(i =>
      math.pow(av(i) - lam * v0(i), 2)).sum)
    resid should be < 1e-6
    // distributed projection ≡ driver dot (same fold order)
    val proj = Similarity.pcaProject(df, "embedding", "vec_id", w)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    vecs.take(20).foreach { case (id, v) =>
      for (c <- 0 until 3) {
        val ref = (0 until 6).foldLeft(0.0)((s, i) => s + v(i).toDouble * w(c)(i))
        proj((id, c)) shouldBe (BigDecimal(ref)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }
}
