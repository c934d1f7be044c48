package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity self-join — the STRING member of
  * the exact similarity-join family (set Jaccard/cosine/containment live in
  * [[Dedup]], vector cosine in [[Similarity]]): all pairs with
  * `levenshtein(a, b) <= k`, found without comparing all pairs.
  *
  * Candidate generation is the PassJoin / Li et al. segment pigeonhole
  * (cf. ariadnes-thread's fuzzy tag matching, which scans linearly): split
  * every string into `k+1` contiguous segments; if `ed(s, t) <= k` then `t`
  * contains at least one of `s`'s segments VERBATIM, within `k` positions of
  * its home offset, and `|len(s) - len(t)| <= k`. So the index side emits
  * k+1 (segment, idx, len) rows per string and the probe side emits the
  * bounded set of substrings that could equal a segment of a partner of any
  * admissible length — `(2k+1)·(k+1)·(2k+1)` combinations of (length delta,
  * segment idx, position shift), all LITERAL, so the enumeration is one
  * posexplode over a constant array with pure codegen'd substring
  * arithmetic. Candidates equi-join on (substring, idx, partner length) —
  * a hash join, never a nested loop — then `distinct` (a pair can collide
  * on several segments) and a codegen'd `levenshtein <= k` verify.
  *
  * Strings shorter than `k + 1` cannot give k+1 non-empty segments (an
  * empty segment matches everything); they route through a brute path
  * restricted to lengths `<= 2k + 1` — a bounded universe (any partner of
  * a short string is itself short, by the length filter).
  *
  * Scale: one exploded scan per side (constant fan-out), one hash-join
  * shuffle on segment keys, distinct, map-side verify. Candidate volume is
  * data-dependent (hot segments — e.g. a shared constant prefix — fan out);
  * the prefix order inside segments is positional, so unlike the set joins
  * there is no rarest-first rescue: pick segment count (= k) against the
  * alphabet. Output: (id_a, id_b, dist), id_a < id_b.
  */
object Fuzzy {

  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 8, s"editDistanceJoin: 1 <= k <= 8, got $k")
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__l"))
      .localCheckpoint(eager = false)

    // ---- long path: strings with at least k+1 chars --------------------
    val long = base.filter(col("__l") >= k + 1)
    // Segment i of a length-L string (k+1 segments, longer ones LAST):
    //   base = L div (k+1), r = L mod (k+1)
    //   len_i = base + (i >= k+1-r ? 1 : 0)
    //   start_i (1-based) = i*base + max(0, i - (k+1-r)) + 1
    def segLen(lc: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) = {
      val b = lc.cast("int") / lit(k + 1)
      val bi = floor(b).cast("int")
      val r = lc.cast("int") % lit(k + 1)
      bi + when(i >= lit(k + 1) - r, 1).otherwise(0)
    }
    def segStart(lc: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) = {
      val bi = floor(lc.cast("int") / lit(k + 1)).cast("int")
      val r = lc.cast("int") % lit(k + 1)
      i * bi + greatest(lit(0), i - (lit(k + 1) - r)) + lit(1)
    }
    val segIdx = (0 to k).map(lit(_))
    val index = long
      .select(col("__id"), col("__s"), col("__l"),
        explode(array(segIdx: _*)).as("__i"))
      .select(col("__id").as("ia"), col("__l").as("la"),
        col("__i"),
        expr(s"substring(__s, ${segStartSql("__l", "__i")}, ${segLenSql("__l", "__i")})")
          .as("__seg"))
    // Probe: every (length delta, segment idx, shift) combo — constant.
    val combos = for {
      dl <- -k to k; i <- 0 to k; o <- -k to k
    } yield struct(lit(dl).as("dl"), lit(i).as("i"), lit(o).as("o"))
    val probe = long
      .select(col("__id"), col("__s"), col("__l"),
        explode(array(combos: _*)).as("__c"))
      .withColumn("__l2", col("__l") + col("__c.dl"))     // partner length
      .filter(col("__l2") >= k + 1)
      .withColumn("__i", col("__c.i"))
      .withColumn("__sl", segLen(col("__l2"), col("__i")))
      .withColumn("__sp", segStart(col("__l2"), col("__i")) + col("__c.o"))
      .filter(col("__sp") >= 1 &&
        col("__sp") + col("__sl") - 1 <= col("__l"))
      .select(col("__id").as("ib"), col("__l2").as("la"), col("__i"),
        expr("substring(__s, __sp, __sl)").as("__seg"))
    val candLong = index.join(probe, Seq("__seg", "__i", "la"))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"))

    // ---- short path: strings under k+1 chars (partners are <= 2k+1) ----
    val shortAll = base.filter(col("__l") <= 2 * k + 1)
      .select(col("__id"), col("__l"))
    val shortSide = base.filter(col("__l") < k + 1).select(col("__id"), col("__l"))
    val candShort = shortSide.alias("x")
      .join(shortAll.alias("y"),
        abs(col("x.__l") - col("y.__l")) <= k && col("x.__id") =!= col("y.__id"))
      .select(least(col("x.__id"), col("y.__id")).as("ia"),
        greatest(col("x.__id"), col("y.__id")).as("ib"))

    // ---- verify ---------------------------------------------------------
    val cands = candLong.unionByName(candShort).distinct()
    cands
      .join(base.select(col("__id").as("ia"), col("__s").as("__sa")), "ia")
      .join(base.select(col("__id").as("ib"), col("__s").as("__sb")), "ib")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= k)
      .select(col("ia").as("id_a"), col("ib").as("id_b"), col("dist"))
  }

  // SQL-text twins of segLen/segStart for the index side (substring wants
  // them inline; identical arithmetic, integer div).
  private def segLenSql(l: String, i: String): String =
    s"($l div ${k1}) + (CASE WHEN $i >= ${k1} - ($l % ${k1}) THEN 1 ELSE 0 END)"
  private def segStartSql(l: String, i: String): String =
    s"$i * ($l div ${k1}) + greatest(0, $i - (${k1} - ($l % ${k1}))) + 1"
  private def k1: String = "__K1__" // patched per call below
}
