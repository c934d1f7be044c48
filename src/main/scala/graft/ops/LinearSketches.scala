package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.TextHash

/** LINEAR sketches — count-min (Cormode & Muthukrishnan, J. Algorithms
  * 2005), the AMS/count-sketch second-moment estimator (Alon, Matias &
  * Szegedy, STOC 1996; Charikar, Chen & Farach-Colton, ICALP 2002), and
  * the feature-hashing vectorizer (Weinberger et al., ICML 2009).
  *
  * Why a third sketch family next to HLL (q24, order-equivalent union)
  * and bottom-k (q213–q216, deterministic set union): these are LINEAR —
  * the sketch of A ∪ B is literally the element-wise SUM of the sketches
  * of A and B, so merge ≡ full recompute holds bit-for-bit over plain
  * integer addition, commutative and associative with no rank step at
  * all. That is the strongest mergeability class: shard-local sketches
  * roll up through any tree shape (per-executor partials, per-shard
  * files, per-day increments) and every path yields the identical
  * counters, which is what lets a DuckDB twin certify the merge law the
  * q214/q217 way.
  *
  * Portability: every bucket/sign hash is a salted
  * [[graft.ext.TextHash.tokenHash]] (md5-digit hash computable
  * identically in both engines); counters are exact integers; the only
  * doubles are final single divisions (+ an IEEE-exact sqrt) — bit
  * parity by construction, no rounding traps until the documented
  * round6z at the surface.
  *
  * Scale shape: one corpus scan, a depth-way generator explode
  * (integer structs, no strings leave the hash expression), one
  * map-side-combinable groupBy. State is ≤ depth·width rows per group
  * FOREVER (sparse: zero buckets are absent), probes are O(batch·depth)
  * lookups against the frozen counters — the incremental-family
  * contract (q112…q217) in its purest form.
  */
object LinearSketches {

  /** Per-row (r, bucket) generator for the CMS hash rows: salt "|c{r}". */
  private def cmsBuckets(elem: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { r =>
      struct(lit(r).as("r"),
        (TextHash.tokenHash(concat(elem, lit(s"|c$r"))) % width).as("b"))
    }: _*)

  /** Count-min sketch of `elemCol` OCCURRENCES per `groupCol`: sparse
    * rows (group, r, b, cnt) — depth salted hash rows of width buckets,
    * `cnt` = number of occurrences landing in bucket b under hash row r.
    * Zero buckets are absent; state ≤ depth·width rows per group.
    */
  def cmsSketch(df: DataFrame, groupCol: String, elemCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 8,
      s"cmsSketch: depth=$depth outside [1,8] (8 salted rows is already " +
        "δ=e^-8; more rows cost a wider explode for no practical gain)")
    require(width >= 2, s"cmsSketch: width=$width must be >= 2")
    df.select(col(groupCol),
        explode(cmsBuckets(col(elemCol), depth, width)).as("rb"))
      .groupBy(col(groupCol), col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two CMS tables (same depth/width/salts): element-wise counter
    * ADDITION — the linear-sketch merge law `cms(A ∪ B) = cms(A) + cms(B)`
    * holds exactly, so the result is bit-equal to a cold rebuild over
    * the union. O(depth·width) rows per group per side.
    */
  def cmsMerge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.select(col(groupCol), col("r"), col("b"), col("cnt"))
      .union(b.select(col(groupCol), col("r"), col("b"), col("cnt")))
      .groupBy(col(groupCol), col("r"), col("b"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates for `probes` (group, elem) rows against a
    * CMS table: est = min over the depth rows of the probed bucket's
    * counter (absent bucket = 0). The CMS guarantee — `est >= true
    * count`, overestimation only — holds because counters only ever add.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, groupCol: String,
      elemCol: String, depth: Int, width: Int): DataFrame =
    probes
      .select(col(groupCol), col(elemCol),
        explode(cmsBuckets(col(elemCol), depth, width)).as("rb"))
      .select(col(groupCol), col(elemCol),
        col("rb.r").as("r"), col("rb.b").as("b"))
      .join(sketch, Seq(groupCol, "r", "b"), "left")
      .groupBy(col(groupCol), col(elemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))

  /** DuckDB twin of [[cmsSketch]] over `FROM (...) src(group, elem)`:
    * replays the salted bucket hashes and the occurrence group-by.
    */
  def cmsSketchSql(from: String, groupExpr: String, groupName: String,
      elemExpr: String, depth: Int, width: Int): String = {
    val rows = (0 until depth).map { r =>
      s"SELECT $groupExpr AS $groupName, $r AS r, " +
        s"${TextHash.tokenHashSql(s"$elemExpr || '|c$r'")} % $width AS b " +
        s"FROM $from"
    }.mkString(" UNION ALL ")
    s"""SELECT $groupName, r, b, CAST(count(*) AS BIGINT) AS cnt
        FROM ($rows) GROUP BY 1, 2, 3"""
  }

  /** DuckDB twin of [[cmsSketch]] + [[cmsEstimate]] composed: the sketch
    * built from `from` (the FULL corpus — running it against a merged
    * Spark sketch makes the hash match certify the linear merge law, the
    * q214/q217 certificate shape), probed with the distinct
    * (group, elem) rows of `probeFrom`.
    */
  def cmsEstimateSql(from: String, probeFrom: String, groupExpr: String,
      groupName: String, elemExpr: String, elemName: String,
      depth: Int, width: Int): String = {
    val pbRows = (0 until depth).map { r =>
      s"SELECT $groupExpr AS $groupName, $elemExpr AS $elemName, $r AS r, " +
        s"${TextHash.tokenHashSql(s"$elemExpr || '|c$r'")} % $width AS b " +
        s"FROM $probeFrom"
    }.mkString(" UNION ALL ")
    s"""WITH sk AS MATERIALIZED (
            ${cmsSketchSql(from, groupExpr, groupName, elemExpr, depth, width)}),
          pb AS ($pbRows)
       SELECT pb.$groupName, pb.$elemName,
              CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est_cnt
       FROM pb LEFT JOIN sk ON sk.$groupName = pb.$groupName
         AND sk.r = pb.r AND sk.b = pb.b
       GROUP BY 1, 2"""
  }

  /** Exact integer `c div d` for 0 ≤ c < 1e8: the double quotient of two
    * integers this small is correctly rounded (multiples land exactly on
    * their representable quotient; non-multiples sit ≥ 1/d above it,
    * orders of magnitude beyond one ulp), so truncation ≡ floor ≡ the
    * DuckDB `//` the twins use. Lets bucket AND sign come from disjoint
    * digit ranges of ONE salted hash — one md5 per (token, row) instead
    * of two, on both engines (measured: q223 was the priciest new-query
    * bench line before this).
    */
  private def digitsDiv(c: Column, d: Long): Column =
    (c / lit(d.toDouble)).cast("long")

  /** Per-row (r, bucket, sign) generator for the AMS rows: one hash per
    * row (salt "|a{r}") — bucket from the low digits (`h mod width`),
    * sign from digit 5 (`(h div 10⁴) mod 2`). Bucket and sign are
    * APPROXIMATELY independent: strictly disjoint digit ranges only when
    * width divides 10⁴; for other widths ≤ 10⁴ (e.g. 256) the bucket
    * residue leaks a little of digit 5, which is an estimator-variance
    * nuance, never a parity one (both engines compute identically).
    * [[amsSketch]] enforces width ≤ 10⁴ so the sign digit never sits
    * BELOW the bucket modulus.
    */
  private def amsTriples(elem: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { r =>
      val h = TextHash.tokenHash(concat(elem, lit(s"|a$r")))
      struct(lit(r).as("r"), (h % width).as("b"),
        (lit(1L) - lit(2L) * (digitsDiv(h, 10000L) % 2)).as("sg"))
    }: _*)

  /** AMS/count-sketch of `elemCol` per `groupCol`: sparse rows
    * (group, r, b, c) with `c` = Σ sign_r(x) over occurrences landing in
    * bucket b — a LINEAR ±1 projection, so [[amsMerge]] is exact. depth
    * should be ODD (the F2 estimator takes the median row).
    */
  def amsSketch(df: DataFrame, groupCol: String, elemCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 9 && depth % 2 == 1,
      s"amsSketch: depth=$depth must be odd in [1,9] (median-of-rows)")
    require(width >= 2 && width <= 10000,
      s"amsSketch: width=$width must be in [2, 10000] (sign digit lives at 10^4)")
    df.select(col(groupCol),
        explode(amsTriples(col(elemCol), depth, width)).as("x"))
      .select(col(groupCol), col("x.r").as("r"), col("x.b").as("b"),
        col("x.sg").as("sg"))
      .groupBy(col(groupCol), col("r"), col("b"))
      .agg(sum(col("sg")).as("c"))
  }

  /** Merge two AMS tables (same depth/width/salts): element-wise signed
    * addition — exact for the same reason as [[cmsMerge]]. Zero-sum
    * buckets are kept (a 0 counter row is distinguishable from an
    * absent one only cosmetically; both contribute 0 to F2).
    */
  def amsMerge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.select(col(groupCol), col("r"), col("b"), col("c"))
      .union(b.select(col(groupCol), col("r"), col("b"), col("c")))
      .groupBy(col(groupCol), col("r"), col("b"))
      .agg(sum(col("c")).as("c"))

  /** F2 (second frequency moment, Σ f_x² = the self-join size) estimate
    * from an AMS table: per row r the estimator Σ_b c[r][b]² is unbiased;
    * the median over the (odd) depth rows is returned. All integer math —
    * the estimate itself is an exact BIGINT on both engines.
    */
  def amsF2Estimate(sketch: DataFrame, groupCol: String, depth: Int)
      : DataFrame = {
    require(depth >= 1 && depth % 2 == 1,
      s"amsF2Estimate: depth=$depth must be odd (median row)")
    val perRow = sketch.groupBy(col(groupCol), col("r"))
      .agg(sum(col("c") * col("c")).as("f2r"))
    val w = Window.partitionBy(groupCol).orderBy(col("f2r"), col("r"))
    perRow
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === (depth + 1) / 2)
      .select(col(groupCol), col("f2r").as("f2_est"))
  }

  /** DuckDB twin of [[amsSketch]] + [[amsF2Estimate]] composed, over
    * `FROM (...) src`: replays bucket/sign hashes, per-row squared sums,
    * and the median-row pick (same (f2r, r) tiebreak).
    */
  def amsF2Sql(from: String, groupExpr: String, groupName: String,
      elemExpr: String, depth: Int, width: Int): String = {
    // inner projection computes the salted hash ONCE per (token, row) —
    // the md5 is the cost center on both engines
    val rows = (0 until depth).map { r =>
      s"SELECT $groupName, $r AS r, h % $width AS b, " +
        s"1 - 2 * ((h // 10000) % 2) AS sg FROM " +
        s"(SELECT $groupExpr AS $groupName, " +
        s"${TextHash.tokenHashSql(s"$elemExpr || '|a$r'")} AS h FROM $from)"
    }.mkString(" UNION ALL ")
    s"""WITH sk AS (SELECT $groupName, r, b, CAST(sum(sg) AS BIGINT) AS c
                    FROM ($rows) GROUP BY 1, 2, 3),
             pr AS (SELECT $groupName, r, CAST(sum(c * c) AS BIGINT) AS f2r
                    FROM sk GROUP BY 1, 2),
             rk AS (SELECT $groupName, f2r, row_number() OVER
                      (PARTITION BY $groupName ORDER BY f2r, r) AS rn
                    FROM pr)
        SELECT $groupName, f2r AS f2_est FROM rk
        WHERE rn = ${(depth + 1) / 2}"""
  }

  /** Feature-hashing vectorizer (the "hashing trick"): `elemCol`
    * occurrences per `groupCol` projected to a DENSE dim-bucket signed
    * vector, as sparse rows (group, j, v) — index hash salt "|f", sign
    * salt "|g", `v` = Σ sign(x) per bucket. LINEAR: the vector of a
    * union of corpora is the sum of their vectors, so per-shard vectors
    * roll up exactly; a classifier/centroid built on hashed features
    * never needs a vocabulary scan.
    */
  def featureHash(df: DataFrame, groupCol: String, elemCol: String,
      dim: Int): DataFrame = {
    require(dim >= 2 && dim <= 1000000,
      s"featureHash: dim=$dim outside [2, 1e6] (sign digit is h div 10^7 " +
        "— the index must stay clear of it)")
    val h = TextHash.tokenHash(concat(col(elemCol), lit("|f")))
    df.select(col(groupCol), (h % dim).as("j"),
        (lit(1L) - lit(2L) * (digitsDiv(h, 10000000L) % 2)).as("sg"))
      .groupBy(col(groupCol), col("j"))
      .agg(sum(col("sg")).as("v"))
  }

  /** All-pairs cosine similarity between the hashed vectors of
    * [[featureHash]]'s groups (a < b ordering): integer dot products and
    * squared norms, then one double division against the product of two
    * IEEE-exact sqrts — `sqrt(na)·sqrt(nb)` instead of `sqrt(na·nb)`
    * because the INTEGER product of two corpus-scale norms can exceed
    * 2^63 while each factor is exactly representable in a double.
    * Intended for group counts that are small (sources, shards, topics):
    * the pair relation is |groups|², not |corpus|².
    */
  def hashedCosine(vecs: DataFrame, groupCol: String): DataFrame = {
    val v = vecs.select(col(groupCol).as("g"), col("j"), col("v"))
      .localCheckpoint() // feeds norms AND both join sides (multi-use rule)
    val norms = v.groupBy(col("g"))
      .agg(sum(col("v") * col("v")).as("nrm"))
    val dots = v.alias("a")
      .join(v.alias("b"),
        col("a.j") === col("b.j") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("ga"), col("b.g").as("gb"))
      .agg(sum(col("a.v") * col("b.v")).as("dot"))
    val pairs = norms.alias("na")
      .join(norms.alias("nb"), col("na.g") < col("nb.g"))
      .select(col("na.g").as("ga"), col("nb.g").as("gb"),
        col("na.nrm").as("nrm_a"), col("nb.nrm").as("nrm_b"))
    pairs.join(dots, Seq("ga", "gb"), "left")
      .select(col("ga").as(s"${groupCol}_a"), col("gb").as(s"${groupCol}_b"),
        coalesce(col("dot"), lit(0L)).as("dot"),
        col("nrm_a"), col("nrm_b"),
        graft.syntax.round6z(
          coalesce(col("dot"), lit(0L)).cast("double") /
            (sqrt(col("nrm_a").cast("double")) *
              sqrt(col("nrm_b").cast("double")))).as("cos_sim"))
  }

  /** DuckDB twin of [[featureHash]] + [[hashedCosine]] composed, over
    * `FROM (...) src(group, elem)`.
    */
  def hashedCosineSql(from: String, groupExpr: String, groupName: String,
      elemExpr: String, dim: Int): String =
    s"""WITH fh AS (SELECT $groupExpr AS g,
               ${TextHash.tokenHashSql(s"$elemExpr || '|f'")} AS h
             FROM $from),
           fv AS (SELECT g, h % $dim AS j,
               1 - 2 * ((h // 10000000) % 2) AS sg
             FROM fh),
           v AS MATERIALIZED (SELECT g, j, CAST(sum(sg) AS BIGINT) AS v
             FROM fv GROUP BY 1, 2),
           nr AS (SELECT g, CAST(sum(v * v) AS BIGINT) AS nrm
             FROM v GROUP BY 1),
           dt AS (SELECT a.g AS ga, b.g AS gb,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM v a JOIN v b ON b.j = a.j AND a.g < b.g
             GROUP BY 1, 2)
       SELECT na.g AS ${groupName}_a, nb.g AS ${groupName}_b,
              coalesce(dt.dot, 0) AS dot,
              na.nrm AS nrm_a, nb.nrm AS nrm_b,
              round(CAST(coalesce(dt.dot, 0) AS DOUBLE) /
                (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))),
                6) + 0.0 AS cos_sim
       FROM nr na JOIN nr nb ON na.g < nb.g
       LEFT JOIN dt ON dt.ga = na.g AND dt.gb = nb.g"""
}
