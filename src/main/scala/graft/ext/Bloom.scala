package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter over a key set — the crawl-frontier membership structure
  * ("have we seen this URL?") at 100 TB: the full URL set is terabytes,
  * the filter is `m` BITS (megabytes for billions of keys), probes are
  * O(k) word lookups against a broadcast/persisted word table, and the
  * one-sided error is the RIGHT side for a frontier (a false positive
  * skips a re-crawl; a false negative — impossible here — would re-crawl
  * forever).
  *
  * Layout: 63 bits per word (`(w, bits)` rows, absent word = 0) — bit 63
  * is deliberately unused so every word and every mask stays a
  * NON-NEGATIVE long, which keeps the DuckDB twin in plain BIGINT
  * arithmetic (no HUGEINT two's-complement step) and the Spark side off
  * the ANSI bit-63 traps. Masks go through `shiftleft(1L, bit)` (OR'd,
  * never added — the q111 rule); the twin uses a 63-row literal
  * (bit, mask) VALUES table of spelled-out powers of two.
  *
  * Hashing: double hashing over the [[TextHash.tokenHash63]] portable
  * hash (exact SQL twin exists): `pos_i = (h1 + i·h2') mod m` with
  * `h2' = (h2 mod 2^61)·2 + 1` — ODD, so for the required power-of-two
  * `m` the probe sequence walks a full cycle (an even step would orbit a
  * subgroup and waste k). All arithmetic stays below 2^63 on both
  * engines.
  *
  * The state law is `∨` (bit_or) — IDEMPOTENT, unlike every count-based
  * streaming state in this engine: merging the same batch twice is a
  * no-op, so the streaming form (ST35) needs NO replay guard — the one
  * on-arrival structure where at-least-once delivery is exactly-once
  * state for free.
  */
object Bloom {

  /** `mBits` must be a power of two (the odd-step full-cycle argument
    * above); `k` probes per key.
    */
  final case class Params(mBits: Long = 1L << 18, k: Int = 5) {
    require(mBits > 0 && (mBits & (mBits - 1)) == 0,
      s"Bloom: mBits=$mBits must be a power of two")
    // 2^40 bits = 128 GiB of filter — far past any sane single filter
    // (shard above that) and the bound under which every probe-position
    // term is provably exact: i·b2 < 16·2^40 = 2^44 (no ANSI overflow)
    // and positions stay below 2^53 (exact even through double math).
    require(mBits <= (1L << 40),
      s"Bloom: mBits=$mBits > 2^40 — shard the filter instead")
    require(k >= 1 && k <= 16, s"Bloom: k=$k out of range")
  }

  private def maskOf(bit: Column): Column =
    call_function("shiftleft", lit(1L), bit.cast("int"))

  /** The k (word, mask-bit) probe positions for a key, as an exploded
    * relation: (…input cols…, w, bit).
    */
  private def positions(df: DataFrame, keyCol: String, p: Params): DataFrame = {
    val h1 = TextHash.tokenHash63(col(keyCol)) % lit(p.mBits)
    val h2 = (TextHash.tokenHash63(concat(col(keyCol), lit("|h2")))
      % lit(2305843009213693952L)) * 2 + 1 // odd, < 2^62
    val b2 = h2 % lit(p.mBits)
    val posArr = array((0 until p.k).map(i =>
      pmod(h1 + lit(i.toLong) * b2, lit(p.mBits))): _*)
    df.withColumn("__pos", explode(posArr))
      .withColumn("w", expr("__pos DIV 63")) // integer DIV — exact at any mBits
      .withColumn("bit", (col("__pos") % 63L).cast("int"))
      .drop("__pos")
  }

  /** Build the word table (w, bits) from a key column — one explode +
    * one bit_or aggregate; rows ≤ mBits/63 regardless of corpus size.
    */
  def build(df: DataFrame, keyCol: String, p: Params = Params()): DataFrame =
    positions(df.select(col(keyCol)), keyCol, p)
      .groupBy("w")
      .agg(bit_or(maskOf(col("bit"))).as("bits"))

  /** Merge word tables by `∨` — idempotent AND commutative, so shard
    * builds union freely and replays are no-ops.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("w").agg(bit_or(col("bits")).as("bits"))

  /** Probe: per input row, `maybe_present` = all k bits set. The word
    * table is filter-sized (≤ mBits/63 rows) — broadcast it; the stream
    * side stays a narrow explode + local aggregate back to one row per
    * key occurrence. No false negatives BY CONSTRUCTION for any key
    * that went through [[build]].
    */
  def probe(df: DataFrame, keyCol: String, idCol: String, words: DataFrame,
      p: Params = Params()): DataFrame =
    positions(df.select(col(idCol), col(keyCol)), keyCol, p)
      .join(broadcast(words), Seq("w"), "left")
      .withColumn("__hit",
        when(coalesce(col("bits"), lit(0L)).bitwiseAND(maskOf(col("bit")))
          =!= 0L, 1).otherwise(0))
      .groupBy(col(idCol), col(keyCol))
      .agg((min(col("__hit")) === 1).as("maybe_present"))

  /** Densify a word table to the flat `Array[Long]` of all mBits/63
    * words (absent = 0) — the PROBE-SIDE representation: the whole
    * filter is mBits/8 bytes (2 MB at 2^24), i.e. a broadcast literal,
    * not a relation. Bounded by construction; the require keeps a
    * mis-sized call from materializing gigabytes on the driver.
    */
  def denseWords(words: DataFrame, p: Params): Array[Long] = {
    require(p.mBits <= (1L << 30),
      s"Bloom.denseWords: mBits=${p.mBits} too large to densify (> 2^30)")
    val n = ((p.mBits + 62) / 63).toInt
    val arr = new Array[Long](n)
    words.select(col("w"), col("bits")).collect().foreach { r =>
      arr(r.getLong(0).toInt) = r.getLong(1)
    }
    arr
  }

  /** Dense probe — the production shape for a stream probing a built
    * filter: the word array rides along as ONE shared array literal and
    * every check is codegen'd arithmetic (`element_at` + bitwiseAND on
    * the k positions, b1/b2 computed once per row). NO explode, NO
    * join, NO shuffle — a narrow map pass, unlike [[probe]] whose
    * relational shape exists for the SQL twin and for filters too big
    * to densify. Identical verdicts ([[BloomSpec]] pins dense ≡
    * relational).
    */
  def probeDense(df: DataFrame, keyCol: String, idCol: String,
      words: Array[Long], p: Params): DataFrame = {
    require(words.length == ((p.mBits + 62) / 63).toInt,
      s"Bloom.probeDense: word array length ${words.length} does not " +
        s"match mBits=${p.mBits}")
    val wlit = lit(words)
    val b1 = TextHash.tokenHash63(col(keyCol)) % lit(p.mBits)
    val b2 = (TextHash.tokenHash63(concat(col(keyCol), lit("|h2")))
      % lit(2305843009213693952L)) * 2 + 1
    val hit = (0 until p.k).map { i =>
      val pos = pmod(col("__b1") + lit(i.toLong) * col("__b2"), lit(p.mBits))
      // double div is exact here: pos < mBits <= 2^40 (Params bound), so
      // pos/63 carries ~2^-19 ulp error vs a >= 1/63 gap to any integer.
      (element_at(wlit, (pos / 63L).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (pos % 63L).cast("int"))) =!= 0L)
    }.reduce(_ && _)
    df.select(col(idCol), col(keyCol))
      .withColumn("__b1", b1)
      .withColumn("__b2", b2 % lit(p.mBits))
      .withColumn("maybe_present", hit)
      .drop("__b1", "__b2")
  }

  // ------------------------------------------------------------------
  // Sharded frontier — the form PAST the single-broadcast dense cap.
  //
  // A billions-of-URLs frontier needs m ≈ 10^10 bits: too big to
  // broadcast whole, and the relational probe's exploded join (k rows
  // per key, join, re-aggregate) is exactly the shuffle the dense path
  // was built to kill. The sharded form splits the KEY SPACE: shard
  // s = hash(key·salt) mod S (an INDEPENDENT salt — a power-of-two S
  // sharing low bits with the position hash would correlate shard and
  // positions and cluster the filter), each shard an ordinary
  // [[Params]]-sized filter over its own keys. A key's k positions all
  // live in its own shard, so the probe co-partitions ONE shuffle of
  // probe rows (each carrying its k precomputed positions — k longs,
  // not k exploded rows) against the co-shuffled shard word tables,
  // densifies each shard once per task (mBits/63 longs, the per-shard
  // dense cap), and answers every probe with local array arithmetic.
  // The merge law is unchanged: ∨ per (shard, word) — idempotent,
  // commutative, replay-free.
  // ------------------------------------------------------------------

  /** Key → shard routing (independent salt, see above). */
  def shardOf(key: Column, shards: Int): Column =
    pmod(TextHash.tokenHash63(concat(key, lit("|shard"))),
      lit(shards.toLong)).cast("int")

  /** Build the sharded word table (s, w, bits); each shard is an
    * independent `p`-sized filter over its routed keys. With
    * shards = 1 this is exactly [[build]]'s table plus a zero shard
    * column (the positions ignore the shard salt) — the spec-pinned
    * equivalence.
    */
  def buildSharded(df: DataFrame, keyCol: String, shards: Int,
      p: Params = Params()): DataFrame = {
    require(shards >= 1, s"Bloom.buildSharded: shards=$shards")
    positions(df.select(col(keyCol))
        .withColumn("__s", shardOf(col(keyCol), shards)), keyCol, p)
      .groupBy(col("__s").as("s"), col("w"))
      .agg(bit_or(maskOf(col("bit"))).as("bits"))
  }

  /** Merge sharded word tables — ∨ per (shard, word). */
  def mergeSharded(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("s", "w").agg(bit_or(col("bits")).as("bits"))

  /** Co-partitioned dense probe of a sharded filter: ONE shuffle of
    * probe rows (id, key, k positions) cogrouped with the shard word
    * tables; each task densifies its shard (≤ mBits/63 longs — the
    * require keeps a shard past the densify budget from materializing)
    * and probes locally. Output (idCol, keyCol, maybe_present), one
    * row per input row; no false negatives for built keys by
    * construction. The position arithmetic is the SAME column math as
    * [[probe]]/[[probeDense]]; only the word lookup moves task-local.
    */
  def probeSharded(df: DataFrame, keyCol: String, idCol: String,
      words: DataFrame, shards: Int, p: Params = Params()): DataFrame = {
    require(p.mBits <= (1L << 30),
      s"Bloom.probeSharded: per-shard mBits=${p.mBits} too large to " +
        "densify (> 2^30) — raise the shard count instead")
    val spark = df.sparkSession
    import spark.implicits._
    val nW = ((p.mBits + 62) / 63).toInt
    val h1 = TextHash.tokenHash63(col(keyCol)) % lit(p.mBits)
    val b2 = ((TextHash.tokenHash63(concat(col(keyCol), lit("|h2")))
      % lit(2305843009213693952L)) * 2 + 1) % lit(p.mBits)
    val probes = df
      .select(col(idCol).cast("long"), col(keyCol).cast("string"))
      .withColumn("__s", shardOf(col(keyCol), shards))
      .withColumn("__h1", h1)
      .withColumn("__b2", b2)
      .withColumn("__pos", array((0 until p.k).map(i =>
        pmod(col("__h1") + lit(i.toLong) * col("__b2"), lit(p.mBits))): _*))
      .select(col(idCol), col(keyCol), col("__s"), col("__pos"))
      .as[(Long, String, Int, Seq[Long])]
    val ws = words.select(col("s").cast("int"), col("w"), col("bits"))
      .as[(Int, Long, Long)]
    probes.groupByKey(_._3).cogroup(ws.groupByKey(_._1)) {
      case (_, ps, wit) =>
        val arr = new Array[Long](nW)
        wit.foreach(t => arr(t._2.toInt) = t._3)
        ps.map(t => (t._1, t._2, t._4.forall(pos =>
          (arr((pos / 63L).toInt) & (1L << (pos % 63L).toInt)) != 0L)))
    }.toDF(idCol, keyCol, "maybe_present")
  }

  /** DuckDB twin of the sharded position relation — [[posSql]] plus the
    * shard column from the salted hash.
    */
  def posShardedSql(keyExpr: String, shards: Int, p: Params): String = {
    val h1 = s"(${TextHash.tokenHash63Sql(keyExpr)} % ${p.mBits})"
    val h2 = s"(((${TextHash.tokenHash63Sql(s"$keyExpr || '|h2'")}" +
      s" % 2305843009213693952) * 2 + 1) % ${p.mBits})"
    val sh = s"(${TextHash.tokenHash63Sql(s"$keyExpr || '|shard'")} % $shards)"
    s"""SELECT *, $sh AS s,
               ($h1 + i * $h2) % ${p.mBits} // 63 AS w,
               ($h1 + i * $h2) % ${p.mBits} % 63 AS bit
        FROM __keys CROSS JOIN
          (VALUES ${(0 until p.k).map(i => s"($i)").mkString(", ")}) pi(i)"""
  }

  /** The DuckDB twin pieces — the same math, textually. `maskValues` is
    * the 63-row (bit, mask) literal table; [[posSql]] yields one row per
    * (input row, probe i) with columns w, bit.
    */
  def maskValuesSql: String =
    (0 until 63).map(b => s"($b, ${1L << b})").mkString("(VALUES ", ", ", ") mask(bit, mask)")

  def posSql(keyExpr: String, p: Params): String = {
    val h1 = s"(${TextHash.tokenHash63Sql(keyExpr)} % ${p.mBits})"
    val h2 = s"(((${TextHash.tokenHash63Sql(s"$keyExpr || '|h2'")}" +
      s" % 2305843009213693952) * 2 + 1) % ${p.mBits})"
    s"""SELECT *, ($h1 + i * $h2) % ${p.mBits} // 63 AS w,
               ($h1 + i * $h2) % ${p.mBits} % 63 AS bit
        FROM __keys CROSS JOIN
          (VALUES ${(0 until p.k).map(i => s"($i)").mkString(", ")}) pi(i)"""
  }
}
