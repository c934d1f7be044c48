package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [X] Bloom frontier membership: no false negatives, sane false
  * positives at a deliberately overloaded size, idempotent merge, and
  * shard-build ≡ whole-build — the engine-internal half of q258's
  * cross-engine pin.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def urls(ids: Range) =
    ids.map(i => (i.toLong, s"http://h${i % 11}.test/p/$i")).toDF("id", "url")

  test("no false negatives, ever") {
    val p = Bloom.Params()
    val corpus = urls(0 until 500)
    val words = Bloom.build(corpus, "url", p).localCheckpoint()
    val got = Bloom.probe(corpus, "url", "id", words, p)
      .filter(!col("maybe_present")).count()
    got shouldBe 0L
  }

  test("false positives exist at an overloaded size but stay bounded") {
    // m = 1024 bits, n = 200 keys, k = 3: p_bit ≈ 0.44, fpr ≈ 9% — big
    // enough to observe deterministically, far from all-ones
    val p = Bloom.Params(mBits = 1L << 10, k = 3)
    val words = Bloom.build(urls(0 until 200), "url", p).localCheckpoint()
    val absent = urls(10000 until 11000)
    val fp = Bloom.probe(absent, "url", "id", words, p)
      .filter(col("maybe_present")).count()
    fp should be > 0L    // the structure is probabilistic, not a set
    fp should be < 400L  // and not saturated
  }

  test("merge is idempotent and shard-build ≡ whole-build") {
    val p = Bloom.Params(mBits = 1L << 12, k = 4)
    val a = urls(0 until 150)
    val b = urls(150 until 300)
    val whole = Bloom.build(urls(0 until 300), "url", p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sharded = Bloom.merge(Bloom.build(a, "url", p),
      Bloom.build(b, "url", p))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sharded shouldBe whole
    // ∨ is idempotent: re-merging a shard changes nothing
    val again = Bloom.merge(Bloom.merge(Bloom.build(a, "url", p),
      Bloom.build(b, "url", p)), Bloom.build(b, "url", p))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    again shouldBe whole
    // every word is a non-negative 63-bit long (bit 63 unused by layout)
    whole.values.foreach(_ should be >= 0L)
  }

  test("empty filter probes all-false; params validated loudly") {
    val p = Bloom.Params(mBits = 1L << 12, k = 4)
    val empty = Seq.empty[(Long, Long)].toDF("w", "bits")
    Bloom.probe(urls(0 until 20), "url", "id", empty, p)
      .filter(col("maybe_present")).count() shouldBe 0L
    intercept[IllegalArgumentException] { Bloom.Params(mBits = 1000) }
    intercept[IllegalArgumentException] { Bloom.Params(k = 0) }
  }

  test("probeDense ≡ relational probe, including which false positives") {
    val p = Bloom.Params(mBits = 1L << 10, k = 3)
    val words = Bloom.build(urls(0 until 200), "url", p).localCheckpoint()
    val dense = Bloom.denseWords(words, p)
    val cand = urls(0 until 1200)
    val a = Bloom.probe(cand, "url", "id", words, p)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val b = Bloom.probeDense(cand, "url", "id", dense, p)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    b shouldBe a
    intercept[IllegalArgumentException] {
      Bloom.probeDense(cand, "url", "id", dense.take(3), p)
    }
  }

  test("sharded: no false negatives; S=1 words ≡ unsharded words") {
    val p = Bloom.Params(mBits = 1L << 12, k = 4)
    val corpus = urls(0 until 400)
    val words = Bloom.buildSharded(corpus, "url", shards = 4, p)
      .localCheckpoint()
    Bloom.probeSharded(corpus, "url", "id", words, 4, p)
      .filter(!col("maybe_present")).count() shouldBe 0L
    // a single shard ignores the routing salt: the word table is the
    // unsharded one plus a zero shard column
    val one = Bloom.buildSharded(corpus, "url", shards = 1, p)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    one.forall(_._1 == 0) shouldBe true
    one.map(t => t._2 -> t._3).toMap shouldBe
      Bloom.build(corpus, "url", p)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("probeSharded ≡ per-shard relational probe, false positives and all") {
    val p = Bloom.Params(mBits = 1L << 10, k = 3)
    val S = 4
    val corpus = urls(0 until 200)
    val words = Bloom.buildSharded(corpus, "url", S, p).localCheckpoint()
    val cand = urls(0 until 1200)
      .withColumn("s", Bloom.shardOf(col("url"), S))
    val got = Bloom.probeSharded(cand, "url", "id", words, S, p)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // reference: probe each shard's keys against that shard's filter
    // with the RELATIONAL path (a different mechanism end to end)
    val ref = (0 until S).flatMap { s =>
      Bloom.probe(cand.filter(col("s") === s), "url", "id",
        words.filter(col("s") === s).drop("s"), p)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2))
    }.toMap
    got shouldBe ref
    got.values.exists(_ == true) shouldBe true // some hits exist
    got.values.exists(_ == false) shouldBe true // and some misses
  }

  test("mergeSharded: split builds ∨ to the whole; idempotent") {
    val p = Bloom.Params(mBits = 1L << 12, k = 4)
    val S = 3
    def key(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getLong(1)) -> r.getLong(2)
    val whole = Bloom.buildSharded(urls(0 until 300), "url", S, p)
      .collect().map(key).toMap
    val merged = Bloom.mergeSharded(
      Bloom.buildSharded(urls(0 until 150), "url", S, p),
      Bloom.buildSharded(urls(150 until 300), "url", S, p))
    merged.collect().map(key).toMap shouldBe whole
    Bloom.mergeSharded(merged,
      Bloom.buildSharded(urls(150 until 300), "url", S, p))
      .collect().map(key).toMap shouldBe whole
  }
}
