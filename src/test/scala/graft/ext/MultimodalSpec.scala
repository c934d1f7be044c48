package graft.ext

import graft.{SparkSpec, TestSpark}
import Multimodal._

/** [X] multimodal binary-column plumbing: stub decode, features, resize,
  * frame sampling — schemas and partition batching are the real contract.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    MediaRow(1L, "payload-one".getBytes("UTF-8")),
    MediaRow(2L, "payload-two-longer".getBytes("UTF-8")),
    MediaRow(3L, "payload-one".getBytes("UTF-8")) // same bytes as 1
  ).toDS()

  test("stub decode is deterministic and bounded") {
    val a = StubCodec.decode("abc".getBytes)
    val b = StubCodec.decode("abc".getBytes)
    a.pixels.toSeq shouldBe b.pixels.toSeq
    a.width should (be >= 8 and be <= 64)
    a.height should (be >= 8 and be <= 64)
    all(a.pixels.toSeq) should (be >= 0 and be <= 255)
  }

  test("imageFeatures: typed metadata + pooled stats, same bytes → same row") {
    val f = imageFeatures(media).collect().map(x => x.media_id -> x).toMap
    f(1L).meta.nBytes shouldBe 11L
    f(1L).meta.format shouldBe "stub-gray"
    (f(1L).mean_px, f(1L).max_px) shouldBe ((f(3L).mean_px, f(3L).max_px))
    f(1L).meta.width shouldBe f(3L).meta.width
    f(1L).mean_px should (be >= 0.0 and be <= 255.0)
  }

  test("sampleFrames: stride-sampled generator fan-out") {
    val frames = sampleFrames(media, nFrames = 6, stride = 2).collect()
    frames.length shouldBe 9 // 3 media × frames {0, 2, 4}
    frames.map(_.frame_idx).distinct.sorted.toSeq shouldBe Seq(0, 2, 4)
    // the histogram shortcut must equal a literal per-frame decode
    val byKey = frames.map(f => (f.media_id, f.frame_idx) -> f.mean_px).toMap
    media.collect().foreach { m =>
      StubCodec.decodeFrames(m.payload, 6).zipWithIndex
        .filter(_._2 % 2 == 0).foreach { case (f, i) =>
          byKey((m.media_id, i)) shouldBe
            f.pixels.foldLeft(0L)(_ + _).toDouble / f.pixels.length
        }
    }
  }

  test("audioChunks: fixed windows + trailing partial, deterministic RMS") {
    val chunks = audioChunks(media, window = 100).collect()
    val byId = chunks.groupBy(_.media_id)
    byId.foreach { case (_, cs) =>
      // payload.length*4 samples → all-but-last chunks full, last partial
      cs.init.foreach(_.n_samples shouldBe 100)
      cs.map(_.n_samples).sum % 4 shouldBe 0
      all(cs.map(_.rms)) should be > 0.0
      cs.map(_.chunk_idx).sorted.toSeq shouldBe cs.indices.toSeq
    }
    // deterministic: same payloads → same chunk stats
    audioChunks(media, window = 100).collect().map(c =>
      (c.media_id, c.chunk_idx, c.rms)).toSet shouldBe
      chunks.map(c => (c.media_id, c.chunk_idx, c.rms)).toSet
  }

  test("resize: nearest-neighbor to exact target dims, corners preserved") {
    val f = Frame(4, 4, (0 until 16).toArray)
    val r = resize(f, 2, 2)
    (r.width, r.height) shouldBe ((2, 2))
    r.pixels.toSeq shouldBe Seq(0, 2, 8, 10)
    val up = resize(f, 8, 8)
    up.pixels(0) shouldBe 0
    up.pixels(63) shouldBe 15
  }

  // Independent aHash reference: literal decode → literal nearest-neighbor
  // index selection → strict integer bit rule. Reimplemented here (not
  // calling resize/aHashBits) so the spec catches index-arithmetic drift.
  private def refAHash(payload: Array[Byte], frame: Int): Long = {
    val f = StubCodec.decode(payload)
    val px = Array.tabulate(64) { i =>
      val (y, x) = (i / 8, i % 8)
      val base = f.pixels((y * f.height / 8) * f.width + x * f.width / 8)
      (base + frame * 7) % 256
    }
    val s = px.map(_.toLong).sum
    (0 until 64).foldLeft(0L)((h, i) =>
      if (px(i) * 64L > s) h | (1L << i) else h)
  }

  private def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("frameHashes ≡ reference aHash; identical payloads share hashes") {
    val got = frameHashes(media, Seq(0, 1, 3)).collect()
      .map(f => (f.media_id, f.frame_idx) -> f.ph).toMap
    got.size shouldBe 9
    media.collect().foreach { m =>
      Seq(0, 1, 3).foreach { fr =>
        got((m.media_id, fr)) shouldBe refAHash(m.payload, fr)
      }
    }
    got((1L, 0)) shouldBe got((3L, 0)) // same bytes, same hash
    // re-encode (frame shift) stays NEAR its original; unrelated payloads
    // (independent 64-bit hashes) sit far — the perceptual contract
    dist(got((1L, 0)), got((1L, 1))) should be <= 8
    dist(got((1L, 0)), got((2L, 0))) should be > 8
  }

  test("phashNearDupPairs ≡ brute force over packed (media, frame) ids") {
    val univ = (1L to 30L).map(i =>
      MediaRow(i, s"synthetic payload number $i".getBytes("UTF-8"))).toDS()
    val hashes = frameHashes(univ, Seq(0, 1)).collect()
      .map(f => (f.media_id * 16 + f.frame_idx) -> f.ph).sortBy(_._1)
    for (d <- Seq(0, 4, 8)) {
      val brute = (for {
        (ia, ha) <- hashes; (ib, hb) <- hashes
        if ia < ib && dist(ha, hb) <= d
      } yield (ia, ib, dist(ha, hb).toLong)).toSet
      phashNearDupPairs(univ, Seq(0, 1), maxDist = d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet shouldBe brute
    }
  }

  test("incrementalPhashPairs: re-encodes match their originals, O(batch) probe ≡ brute") {
    val univ = (1L to 25L).map(i =>
      MediaRow(i, s"corpus image payload $i".getBytes("UTF-8"))).toDS()
    val corpusSig = frameHashes(univ, Seq(0)).toDF()
    val got = incrementalPhashPairs(corpusSig, univ, maxDist = 4, frame = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val h0 = frameHashes(univ, Seq(0)).collect().map(f => f.media_id -> f.ph)
    val h1 = frameHashes(univ, Seq(1)).collect().map(f => f.media_id -> f.ph)
    val brute = (for {
      (ia, ha) <- h1; (ib, hb) <- h0; if dist(ha, hb) <= 4
    } yield (ia, ib, dist(ha, hb).toLong)).toSet
    got shouldBe brute
    // most re-encodes land within radius 4 of their own original (the
    // expected wrap rate is 64·7/256 ≈ 1.75 bits)
    got.count { case (a, b, _) => a == b } should be >= 15
  }

  test("aHash survives a real LOSSY JPEG re-encode; unrelated images stay far") {
    // The perceptual-hash contract only a lossy container can prove:
    // smooth deterministic images re-encoded as baseline JPEG (q=0.85)
    // must still hash within a small Hamming radius of their original,
    // while independent images stay tens of bits apart. The decode
    // rides the same mapPartitions frameHashes path as PNG/BMP.
    val w = 40; val h = 32
    def img(seed: Long) = Multimodal.Frame(w, h, Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (((x * (3 + seed % 5) + y * (2 + seed % 3)) + seed * 37) % 200).toInt
    })
    val ids = (1L to 20L)
    val orig = ids.map(i =>
      MediaRow(i, graft.ext.Containers.pngBytes(img(i)))).toDS()
    val jpeg = ids.map(i =>
      MediaRow(i, graft.ext.Containers.jpegBytes(img(i), 0.85f))).toDS()
    val hOrig = frameHashes(orig, Seq(0),
      decode = graft.ext.Containers.decodePng)
      .collect().map(f => f.media_id -> f.ph).toMap
    val hJpeg = frameHashes(jpeg, Seq(0),
      decode = graft.ext.Containers.decodeJpeg)
      .collect().map(f => f.media_id -> f.ph).toMap
    // JPEG re-encodes match their own original within radius 8 — pinned
    // on >= 90% of images (the host JDK's ImageIO quantization tables
    // are implementation-defined; a JRE swap may shift a single image's
    // worst block) with a loose per-image ceiling as the sanity bound.
    val selfDists = ids.map(i => dist(hOrig(i), hJpeg(i)))
    selfDists.count(_ <= 8) should be >= (ids.size * 9 / 10)
    selfDists.max should be <= 16
    // ...and the probe machinery finds the matches: each jpeg arrival
    // hits its original through the band join at radius 8
    val corpusSig = frameHashes(orig, Seq(0),
      decode = graft.ext.Containers.decodePng).toDF()
    val hits = incrementalPhashPairs(corpusSig, jpeg, maxDist = 8,
      frame = 0, decode = graft.ext.Containers.decodeJpeg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the probe has no false negatives, so every within-radius pair hits
    ids.filter(i => dist(hOrig(i), hJpeg(i)) <= 8)
      .foreach(i => hits should contain((i, i)))
    // unrelated pairs: median cross-distance stays in the tens of bits
    val cross = for { a <- ids; b <- ids; if a < b }
      yield dist(hOrig(a), hOrig(b))
    cross.sorted.apply(cross.size / 2) should be >= 16
  }

  test("voiceActivity ≡ driver islands over audioChunks; runs ordered and disjoint") {
    val univ = (1L to 15L).map(i =>
      MediaRow(i, (s"audio payload $i " * (i.toInt % 5 + 2)).getBytes("UTF-8"))).toDS()
    val tau = 18900.0
    val got = voiceActivity(univ, window = 64, tau = tau).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    val chunks = audioChunks(univ, 64).collect()
      .groupBy(_.media_id).view.mapValues(_.sortBy(_.chunk_idx)).toMap
    val ref = chunks.toSeq.flatMap { case (mid, cs) =>
      val voiced = cs.filter(_.rms >= tau).map(_.chunk_idx)
      val runs = voiced.foldLeft(List.empty[List[Int]]) {
        case (acc, c) if acc.nonEmpty && acc.head.head == c - 1 =>
          (c :: acc.head) :: acc.tail
        case (acc, c) => List(c) :: acc
      }.reverse.map(_.reverse)
      runs.zipWithIndex.map { case (r, i) =>
        (mid, i + 1, r.head, r.last, r.size.toLong) }
    }
    got.toSet shouldBe ref.toSet
    got should not be empty
    // runs within a payload never touch or overlap
    got.groupBy(_._1).values.foreach { rs =>
      rs.sortBy(_._3).sliding(2).foreach {
        case Array(a, b) => b._3 should be > (a._4 + 1)
        case _ =>
      }
    }
  }

  test("cdcChunks: exact tiling, reference parity, boundaries survive insertion") {
    val base = (0 until 400).map(i => (i * 37 % 251).toByte).toArray
    val media = Seq(MediaRow(1L, base)).toDS()
    val chunks = cdcChunks(media, window = 8, maskBits = 5).collect()
      .sortBy(_.chunk_idx)
    // chunks tile the payload exactly
    chunks.head.start shouldBe 0
    chunks.map(_.len).sum shouldBe base.length
    chunks.sliding(2).foreach {
      case Array(a, b) => b.start shouldBe a.start + a.len
      case _ =>
    }
    // reference: recompute each chunk's polynomial hash directly
    chunks.foreach { c =>
      val ref = base.slice(c.start, c.start + c.len)
        .foldLeft(0L)((h, b) => h * 257L + (b & 0xff))
      c.chash shouldBe ref
    }
    // THE content-defined property: prepend 3 bytes — boundaries
    // re-align, so all but the first chunk(s) keep their hashes (a
    // fixed-size chunker would shift every chunk)
    val shifted = Array[Byte](9, 8, 7) ++ base
    val chunks2 = cdcChunks(Seq(MediaRow(2L, shifted)).toDS(),
      window = 8, maskBits = 5).collect()
    val h1 = chunks.map(_.chash).toSet
    val h2 = chunks2.map(_.chash).toSet
    (h1 intersect h2).size should be >= h1.size - 2
    chunks.length should be >= 5 // maskBits 5 → E[len] 32 over 400 bytes
  }

  test("phashClusters ≡ driver union-find over brute Hamming edges") {
    val univ = (1L to 30L).map(i =>
      MediaRow(i, s"cluster payload ${i % 10}".getBytes("UTF-8"))).toDS()
    val got = phashClusters(univ, maxDist = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val hs = frameHashes(univ, Seq(0)).collect().map(f => f.media_id -> f.ph)
    val parent = scala.collection.mutable.Map(hs.map(h => h._1 -> h._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for ((ia, ha) <- hs; (ib, hb) <- hs
         if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 4) {
      val (ra, rb) = (find(ia), find(ib))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    hs.foreach { case (id, _) =>
      val root = find(id)
      got(id) shouldBe ((root, if (root == id) 1 else 0))
    }
    // payloads i and i+10 share bytes → same cluster, one keeper
    got(1L)._1 shouldBe got(11L)._1
    got.values.count(_._2 == 1) should be <= 12
  }

  test("cdcDedupStats: duplicate payloads dedup to near-half the bytes") {
    val payloads = (1L to 10L).map(i =>
      MediaRow(i, s"shared content block number ${i % 5} repeated padding padding padding".getBytes("UTF-8")))
    val stats = cdcDedupStats(cdcChunks(payloads.toDS()).toDF()).head()
    stats.getAs[Long]("n_bytes") shouldBe payloads.map(_.payload.length.toLong).sum
    // ids 1-5 and 6-10 share payload content pairwise (i % 5) → half dedups
    stats.getAs[Double]("dedup_ratio") should be > 0.4
  }

  test("asMedia adapts a text table into the binary schema") {
    val docs = graft.Tables.documents(spark, TestSpark.Sf0001)
    val ds = asMedia(docs, "doc_id", "text")
    val row = ds.head()
    row.payload.length should be > 0
    imageFeatures(ds).count() shouldBe docs.count()
  }

  test("audioFingerprint: exact under clean scaling, near under truncation, far for unrelated") {
    val rnd = new scala.util.Random(31)
    def wav(samples: Array[Int]) = Containers.wavBytes(samples)
    // base streams in [-16384, 16383] so a clean ×2 stays in 16-bit range
    val base = (0 until 4).map(_ => Array.fill(65 * 48)(rnd.nextInt(32768) - 16384))
    val rows = base.zipWithIndex.flatMap { case (s, i) =>
      Seq(
        MediaRow(i * 10L, wav(s)),
        MediaRow(i * 10L + 1, wav(s.map(_ * 2))), // clean re-encode
        MediaRow(i * 10L + 2, wav(s.map(_ / 2))) // lossy (truncated) re-encode
      )
    }
    val fp = audioFingerprint(rows.toDS(), window = 48,
      decode = Containers.decodeWav)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    for (i <- 0 until 4) {
      dist(i * 10L, i * 10L + 1) shouldBe 0 // sign-of-delta is scale-exact
      dist(i * 10L, i * 10L + 2) should be <= 6 // truncation flips near-ties only
      for (j <- 0 until 4 if j != i)
        dist(i * 10L, j * 10L) should be > 12 // unrelated streams far apart
    }
    // the banded incremental probe finds exactly the brute-force matches
    val corpusFp = audioFingerprint(
      base.zipWithIndex.map { case (s, i) => MediaRow(i.toLong, wav(s)) }.toDS(),
      window = 48, decode = Containers.decodeWav)
    val batch = base.zipWithIndex
      .map { case (s, i) => MediaRow(100L + i, wav(s.map(_ / 2))) }.toDS()
    val got = incrementalAudioPairs(corpusFp, batch, window = 48,
      maxDist = 6, decode = Containers.decodeWav)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe (0 until 4).map(i => (100L + i, i.toLong)).toSet
  }
}
