package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Similarity, TextAnalysis}
import graft.ext.TextHash.{tokenHashSql, P, Seeds}

/** Extension surface (BASELINE.json north_star): LLM-pipeline operators —
  * dedup (exact / minhash-LSH / simhash / n-gram Jaccard / embedding
  * near-dup), similarity search (brute-force + LSH-bucketed ANN), text
  * analysis (language-ID, quality, token counts, fingerprint), sessionization
  * and windowed event aggregates (batch mirrors of the streaming ops).
  */
object ExtQueries {

  /** Q18 [X]: exact dedup by content hash (md5 is identical across engines). */
  val q18 = OracleQuery(
    "q18_exact_dedup",
    (s, d) => Dedup.exactByHash(Tables.documents(s, d), "doc_id", "text"),
    Some("""SELECT md5(text) AS h, min(doc_id) AS keeper,
                   CAST(count(*) AS BIGINT) AS dup_cnt
            FROM documents GROUP BY md5(text)"""),
  )

  private[queries] val minhashSigSql: String = {
    val mins = Seeds.zipWithIndex.map { case ((a, b), j) =>
      s"min(($a * h + $b) % $P) AS mh$j"
    }.mkString(",\n                   ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
            h AS (SELECT doc_id, ${tokenHashSql("w")} AS h FROM tok)
            SELECT doc_id, $mins
            FROM h GROUP BY doc_id"""
  }

  /** Q19 [X]: minhash signatures (4 hashes, deterministic seeds). */
  val q19 = OracleQuery(
    "q19_minhash_sig",
    (s, d) =>
      Dedup.minHashSignature(Tables.documents(s, d), "doc_id", "text")
        .select("doc_id", "mh0", "mh1", "mh2", "mh3"),
    Some(minhashSigSql),
  )

  /** Q19b [X]: LSH banding — candidate pairs sharing either 2-row band. */
  val q19b = OracleQuery(
    "q19b_lsh_pairs",
    (s, d) => {
      val sig = Dedup.minHashSignature(Tables.documents(s, d), "doc_id", "text")
      Dedup.lshCandidatePairs(sig, "doc_id",
        Seq(Seq("mh0", "mh1"), Seq("mh2", "mh3")))
    },
    Some(s"""WITH sig AS ($minhashSigSql)
            SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, 0 AS band_id
            FROM sig x JOIN sig y ON x.mh0 = y.mh0 AND x.mh1 = y.mh1 AND x.doc_id < y.doc_id
            UNION ALL
            SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, 1 AS band_id
            FROM sig x JOIN sig y ON x.mh2 = y.mh2 AND x.mh3 = y.mh3 AND x.doc_id < y.doc_id"""),
  )

  /** Q20 [X]: brute-force cosine top-k against vec 0 (exact baseline). */
  val q20 = OracleQuery(
    "q20_cosine_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0)
        .select(Similarity.asDouble(col("embedding")).as("qv"))
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") > 0), "embedding", "vec_id", q, 10)
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                 q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_dot_product(v, qv) /
                         (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_r
            FROM e, q WHERE vec_id > 0
            ORDER BY cos_r DESC, vec_id LIMIT 10"""),
  )

  private val bucketSql: String =
    (0 until 6).map(i =>
      s"(CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")

  /** Q20b [X]: LSH-bucketed ANN — sign-pattern blocking then exact rescore. */
  val q20b = OracleQuery(
    "q20b_ann_bucketed",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      Similarity.bucketedTopK(emb, "embedding", "vec_id", q, 6, 5)
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   CAST($bucketSql AS BIGINT) AS bucket
                   FROM embeddings),
                 q AS (SELECT v AS qv, bucket AS qb FROM e WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_dot_product(v, qv) /
                         (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_r
            FROM e, q WHERE bucket = qb
            ORDER BY cos_r DESC, vec_id LIMIT 5"""),
  )

  /** Q21 [X]: token frequencies per language (stopword-filtered). */
  val q21 = OracleQuery(
    "q21_token_freq",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 2 && !col("w").isin("the", "and", "for"))
        .groupBy("lang", "w")
        .agg(count(lit(1)).as("cnt")),
    Some("""SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
            WHERE length(w) > 2 AND w NOT IN ('the', 'and', 'for')
            GROUP BY lang, w"""),
  )

  /** Q22 (W2, batch mirror of ST3): 30-minute-gap sessionization. Gaps are
    * compared in integer µs on both engines (ns truncated identically).
    */
  val q22 = OracleQuery(
    "q22_sessionization",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("is_new",
          when(col("tus") - lag("tus", 1).over(w) > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum("is_new").over(frame))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("val_sum"),
          min("event_id").as("first_event"))
    },
    Some("""WITH e AS (SELECT event_id, user_id, value,
                              epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
                 g AS (SELECT *, CASE WHEN tus - lag(tus) OVER
                         (PARTITION BY user_id ORDER BY event_id) > 1800000000
                         THEN 1 ELSE 0 END AS is_new FROM e),
                 se AS (SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
                        FROM g)
            SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 6) AS val_sum, min(event_id) AS first_event
            FROM se GROUP BY user_id, session_id"""),
  )

  /** Q23 (ST2 batch parity): tumbling 1h windows per event type. */
  val q23 = OracleQuery(
    "q23_tumbling_window",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(
          unix_micros(date_trunc("hour", col("ts"))).as("bucket_us"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("val_sum")),
    Some("""SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS bucket_us,
                   event_type, CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 6) AS val_sum
            FROM events GROUP BY 1, 2"""),
  )

  private[queries] val simhashSql: String = {
    val sums = (0 until 16).map(j =>
      s"CAST(SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s$j")
      .mkString(",\n                   ")
    val bits = (0 until 16).map(j =>
      s"(CASE WHEN s$j >= 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
            h AS (SELECT doc_id, ${tokenHashSql("w")} AS h FROM tok),
            b AS (SELECT doc_id, $sums FROM h GROUP BY doc_id)
            SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM b"""
  }

  /** Q25 [X]: 16-bit SimHash per document. */
  val q25 = OracleQuery(
    "q25_simhash",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), Dedup.simHash16(col("text")).as("simhash")),
    Some(simhashSql),
  )

  /** Q26 [X]: word-bigram Jaccard between consecutive documents. */
  val q26 = OracleQuery(
    "q26_ngram_jaccard",
    (s, d) =>
      Dedup.consecutiveNgramJaccard(Tables.documents(s, d), "doc_id", "text", 2),
    Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 bg AS (SELECT DISTINCT doc_id, g FROM
                        (SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
                                FOR i IN generate_series(1, len(t) - 1)]) AS g FROM tok)),
                 n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nb FROM bg GROUP BY doc_id),
                 i AS (SELECT x.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS ni
                       FROM bg x JOIN bg y ON y.g = x.g AND y.doc_id = x.doc_id + 1
                       GROUP BY x.doc_id)
            SELECT a.doc_id AS doc_a, a.doc_id + 1 AS doc_b,
                   round(CAST(COALESCE(ni, 0) AS DOUBLE) /
                         CAST(a.nb + b.nb - COALESCE(ni, 0) AS DOUBLE), 6) AS jac
            FROM n a JOIN n b ON b.doc_id = a.doc_id + 1
            LEFT JOIN i ON i.doc_id = a.doc_id"""),
  )

  /** Q27 [X]: embedding-cosine near-duplicate pairs (brute force; the
    * blocked variant is q20b's bucketing composed with the same rescore).
    */
  val q27 = OracleQuery(
    "q27_embedding_near_dup",
    (s, d) =>
      Similarity.nearDupPairsBlocked(Tables.embeddings(s, d), "embedding", "vec_id", 0.5),
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
            SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
                   round(list_dot_product(x.v, y.v) /
                         (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6) AS cos_r
            FROM e x JOIN e y ON x.vec_id < y.vec_id
            WHERE round(list_dot_product(x.v, y.v) /
                        (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6) >= 0.5"""),
  )

  private val langidSql: String = {
    val scores = TextAnalysis.LangMarkers.map { case (lang, m) =>
      val list = m.map(w => s"'$w'").mkString(", ")
      s"CAST(SUM(CASE WHEN w IN ($list) THEN 1 ELSE 0 END) AS BIGINT) AS s_$lang"
    }.mkString(",\n                   ")
    val langs = TextAnalysis.LangMarkers.map(_._1)
    val chain = langs.init.zipWithIndex.map { case (lang, i) =>
      val rest = langs.drop(i + 1).map(l => s"s_$lang >= s_$l").mkString(" AND ")
      s"WHEN $rest THEN '$lang'"
    }.mkString("\n                   ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
            sc AS (SELECT doc_id, $scores FROM tok GROUP BY doc_id)
            SELECT doc_id, CASE $chain ELSE '${langs.last}' END AS pred_lang,
                   s_en, s_es, s_de, s_fr, s_zh
            FROM sc"""
  }

  /** Q28 [X]: marker-based language ID (argmax with fixed tie order). */
  val q28 = OracleQuery(
    "q28_langid",
    (s, d) => {
      val doc = Tables.documents(s, d)
      val scored = TextAnalysis.LangMarkers.foldLeft(doc) { case (acc, (lang, m)) =>
        acc.withColumn(s"s_$lang", TextAnalysis.langScore(col("text"), m))
      }
      scored.select(col("doc_id"),
        TextAnalysis.languageId(col("text")).as("pred_lang"),
        col("s_en"), col("s_es"), col("s_de"), col("s_fr"), col("s_zh"))
    },
    Some(langidSql),
  )

  /** Q29 [X]: quality-score features. */
  val q29 = OracleQuery(
    "q29_quality",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars2"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("n_uniq"),
        TextAnalysis.charsPerToken(col("text")).as("chars_per_tok"),
        TextAnalysis.uniqueTokenRatio(col("text")).as("uniq_ratio")),
    Some("""SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars2,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                   CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
                   round(CAST(length(text) AS DOUBLE) /
                         CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS chars_per_tok,
                   round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
                         CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS uniq_ratio
            FROM documents"""),
  )

  /** Q30 [X]: whitespace vs BPE-ish regex token counts. */
  val q30 = OracleQuery(
    "q30_token_count",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_bpe")),
    Some("""SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
                   CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe
            FROM documents"""),
  )

  /** Q31 [X]: order-sensitive document fingerprint (rolling-hash analog). */
  val q31 = OracleQuery(
    "q31_fingerprint",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp")),
    Some(s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
            ph AS (SELECT doc_id, (i * ${tokenHashSql("t[i]")}) % $P AS c
                   FROM tok, UNNEST(generate_series(1, len(t))) AS u(i))
            SELECT doc_id, CAST(SUM(c) % $P AS BIGINT) AS fp
            FROM ph GROUP BY doc_id"""),
  )

  /** Q32 [X]: multimodal/binary column metadata — byte length + content
    * hash of the utf-8 payload (the decode stage itself is the stubbed
    * TileStore/Multimodal path; this pins the binary plumbing).
    */
  val q32 = OracleQuery(
    "q32_binary_meta",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        md5(col("text")).as("h")),
    Some("""SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   md5(text) AS h
            FROM documents"""),
  )

  /** Q33 [X]: multimodal decode→feature pipeline (stubbed codec, real
    * plumbing). The oracle mirrors [[graft.ext.Multimodal.StubCodec]]'s
    * 64-bit mixing EXACTLY in DuckDB: Java's wrapping signed-long
    * arithmetic is re-expressed as HUGEINT arithmetic mod 2^64 (unsigned
    * space), with `mulmod` split into 32-bit halves so no intermediate
    * overflows the 128-bit HUGEINT. The payload is ASCII text, so
    * `ord(char)` equals the UTF-8 byte. A hash match certifies the whole
    * decode→feature path — dimensions, byte count, and pooled pixel mean.
    */
  val q33 = OracleQuery(
    "q33_multimodal_features",
    (s, d) => {
      import graft.ext.Multimodal
      Multimodal.imageFeatures(
        Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text"))
        .toDF()
        .select(col("media_id"), col("meta.width").as("w"),
          col("meta.height").as("h"), col("meta.nBytes").as("n_bytes"),
          round(col("mean_px"), 6).as("mean_px"))
    },
    Some(StubCodecSql.q33Oracle),
  )

  /** Q34 [X]: video-style frame sampling fan-out, hash-certified by the
    * same HUGEINT mod-2^64 StubCodec mirror as q33 (shifted-frame means
    * recomputed from the base pixel relation).
    */
  val q34 = OracleQuery(
    "q34_frame_sample",
    (s, d) => {
      import graft.ext.Multimodal
      Multimodal.sampleFrames(
        Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text"),
        nFrames = 8, stride = 3)
        .toDF()
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"), round(avg("mean_px"), 6).as("avg_px"))
    },
    Some(StubCodecSql.q34Oracle),
  )

  /** Q35 (P2/P3): GeoJSON round-trip — geometry → LineString text → parsed
    * back; the oracle checks the identity (the JSON text itself never
    * leaves the engine).
    */
  val q35 = OracleQuery(
    "q35_geojson_roundtrip",
    (s, d) => {
      import graft.geo.GeoJson
      val geom = Tables.customer(s, d).select(
        col("c_custkey"),
        array(
          struct((col("c_acctbal") / 100.0).as("lng"),
            (col("c_nationkey").cast("double")).as("lat")),
          struct((col("c_acctbal") / 200.0).as("lng"),
            (col("c_nationkey").cast("double") + 0.5).as("lat"))).as("geom"))
      val roundTripped = geom.select(col("c_custkey"),
        GeoJson.fromLineString(GeoJson.toLineString(col("geom"))).as("geom2"))
      roundTripped.select(
        col("c_custkey"),
        element_at(col("geom2"), 1).getField("lng").as("lng0"),
        element_at(col("geom2"), 2).getField("lat").as("lat1"),
        size(col("geom2")).cast("long").as("n_pts"))
    },
    Some("""SELECT c_custkey,
                   c_acctbal / 100.0 AS lng0,
                   CAST(c_nationkey AS DOUBLE) + 0.5 AS lat1,
                   CAST(2 AS BIGINT) AS n_pts
            FROM customer"""),
  )

  /** Q36 (as-of join): for each event, the most recent prior-or-equal
    * purchase by the same user, ordered by event_id (unique, monotone with
    * the generator's timeline). DuckDB twin uses its native ASOF JOIN.
    */
  val q36 = OracleQuery(
    "q36_asof_join",
    (s, d) => {
      import graft.ops.AsOfJoin
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_event_id"),
          col("event_id").as("p_id"))
      AsOfJoin.asOf(ev, purchases, "user_id", "event_id", "p_event_id")
        .select(col("event_id"), col("user_id"), col("r_p_id").as("last_purchase"))
    },
    Some("""SELECT e.event_id, e.user_id, p.event_id AS last_purchase
            FROM events e
            ASOF LEFT JOIN (SELECT user_id, event_id FROM events
                            WHERE event_type = 'purchase') p
              ON e.user_id = p.user_id AND e.event_id >= p.event_id"""),
  )

  /** Q51: funnel conversion — per user, the first click and first purchase
    * event ids and whether the click preceded the purchase (null-propagating
    * on users missing either stage, matching SQL comparison semantics).
    */
  val q51 = OracleQuery(
    "q51_funnel",
    (s, d) =>
      Tables.events(s, d).groupBy("user_id").agg(
        min(when(col("event_type") === "click", col("event_id"))).as("first_click"),
        min(when(col("event_type") === "purchase", col("event_id"))).as("first_purchase"))
        .withColumn("converted",
          (col("first_click") < col("first_purchase")).cast("int")),
    Some("""WITH f AS (SELECT user_id,
                   min(CASE WHEN event_type = 'click' THEN event_id END) AS first_click,
                   min(CASE WHEN event_type = 'purchase' THEN event_id END) AS first_purchase
                   FROM events GROUP BY user_id)
            SELECT user_id, first_click, first_purchase,
                   CAST(first_click < first_purchase AS INTEGER) AS converted
            FROM f"""),
  )

  /** Q52: hourly retention — for each hour, users active in it AND the
    * next hour (distinct user-hour self-join, the cohort-retention shape).
    */
  val q52 = OracleQuery(
    "q52_retention",
    (s, d) => {
      val uh = Tables.events(s, d)
        .select(col("user_id"),
          unix_micros(date_trunc("hour", col("ts"))).as("h"))
        .distinct()
      uh.alias("a")
        .join(uh.alias("b"),
          col("a.user_id") === col("b.user_id") &&
            col("b.h") === col("a.h") + 3600000000L)
        .groupBy(col("a.h").as("h"))
        .agg(count(lit(1)).as("retained"))
    },
    Some("""WITH uh AS (SELECT DISTINCT user_id,
                   epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS h
                   FROM events)
            SELECT a.h AS h, CAST(count(*) AS BIGINT) AS retained
            FROM uh a JOIN uh b
              ON b.user_id = a.user_id AND b.h = a.h + 3600000000
            GROUP BY a.h"""),
  )

  /** Q58: time-weighted average value per user — each value weighted by
    * the µs gap to the next event, normalized by the user's active span.
    * Users with one event have no span; users whose events all share one
    * microsecond have a ZERO span (twa would be 0/0 = NaN, whose
    * formatting differs between engines) — both excluded on both sides.
    */
  val q58 = OracleQuery(
    "q58_time_weighted_avg",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("ntus", lead("tus", 1).over(w))
        .groupBy("user_id")
        .agg(
          round(
            sum(when(col("ntus").isNotNull,
              col("value") * (col("ntus") - col("tus")))) /
              (max("tus") - min("tus")).cast("double"), 6).as("twa"),
          count(lit(1)).as("n"),
          (max("tus") - min("tus")).as("__span"))
        .filter(col("n") >= 2 && col("__span") > 0)
        .drop("__span")
    },
    Some("""WITH e AS (SELECT user_id, event_id, value,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
                 l AS (SELECT *, lead(tus) OVER (PARTITION BY user_id ORDER BY event_id) AS ntus FROM e)
            SELECT user_id,
                   round(sum(CASE WHEN ntus IS NOT NULL THEN value * (ntus - tus) END) /
                         CAST(max(tus) - min(tus) AS DOUBLE), 6) AS twa,
                   CAST(count(*) AS BIGINT) AS n
            FROM l GROUP BY user_id
            HAVING count(*) >= 2 AND max(tus) > min(tus)"""),
  )

  /** Q221 [X]: SEQUENTIAL three-stage funnel view → click → purchase
    * ([[graft.ops.Timeseries.sequentialFunnel]]) — each stage strictly
    * AFTER the previous completion (`t_{i+1} = min(ts > t_i)`), the
    * chained-order semantics q51's independent first-occurrence
    * comparison cannot express past two stages. One row per user who
    * viewed, epoch-µs stage times with NULLs from the drop-off on,
    * depth = completed stages. All integer µs — no float surface; the
    * twin chains the same conditional-min CTEs.
    */
  val q221 = OracleQuery(
    "q221_sequential_funnel",
    (s, d) => graft.ops.Timeseries.sequentialFunnel(
      Tables.events(s, d), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")),
    Some("""WITH e AS (SELECT user_id, event_type,
                    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
              s1 AS (SELECT user_id, min(us) AS t1 FROM e
                    WHERE event_type = 'view' GROUP BY 1),
              s2 AS (SELECT s1.user_id, s1.t1,
                      min(CASE WHEN e.us > s1.t1 THEN e.us END) AS t2
                    FROM s1 LEFT JOIN e ON e.user_id = s1.user_id
                      AND e.event_type = 'click'
                    GROUP BY 1, 2),
              s3 AS (SELECT s2.user_id, s2.t1, s2.t2,
                      min(CASE WHEN e.us > s2.t2 THEN e.us END) AS t3
                    FROM s2 LEFT JOIN e ON e.user_id = s2.user_id
                      AND e.event_type = 'purchase'
                    GROUP BY 1, 2, 3)
         SELECT user_id, t1, t2, t3,
                1 + CAST(t2 IS NOT NULL AS BIGINT)
                  + CAST(t3 IS NOT NULL AS BIGINT) AS depth
         FROM s3"""),
  )

  /** Q225 [X]: Kaplan-Meier survival curve for time-to-purchase after
    * first view, by entry-week cohort ([[graft.ops.Timeseries
    * .kaplanMeier]]) — the right-censored time-to-event read q52's
    * fixed-lag retention cannot give: never-converting users are
    * censored at the last observed timestamp (not dropped, not counted
    * as never-converting — both bias S). Float discipline: each factor
    * `1 − d/n` is one exact integer division; the running product is a
    * SEQUENTIAL day-ordered fold on BOTH engines (`aggregate` ≡
    * `list_reduce` over the same day-sorted slice — the q169 identical-
    * fold-order rule), rounded once at the surface.
    */
  val q225 = OracleQuery(
    "q225_survival_km",
    (s, d) => graft.ops.Timeseries.kaplanMeier(
      Tables.events(s, d), "user_id", "ts", "event_type",
      entryType = "view", eventType = "purchase"),
    Some("""WITH e AS MATERIALIZED (SELECT user_id, event_type,
                    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
              ent AS (SELECT user_id, min(us) AS t0 FROM e
                      WHERE event_type = 'view' GROUP BY 1),
              evt AS (SELECT ent.user_id, ent.t0,
                        min(CASE WHEN e.us > ent.t0 THEN e.us END) AS tevt
                      FROM ent LEFT JOIN e ON e.user_id = ent.user_id
                        AND e.event_type = 'purchase'
                      GROUP BY 1, 2),
              mu AS (SELECT max(us) AS m FROM e),
              pu AS (SELECT
                       epoch_us(date_trunc('week', make_timestamp(t0)))
                         AS cohort_us,
                       (CASE WHEN tevt IS NOT NULL THEN tevt - t0
                             ELSE mu.m - t0 END) // 86400000000 AS day,
                       CAST(tevt IS NOT NULL AS BIGINT) AS ev
                     FROM evt, mu),
              dt AS (SELECT cohort_us, day,
                       CAST(sum(ev) AS BIGINT) AS d_events,
                       CAST(sum(1 - ev) AS BIGINT) AS c_censored
                     FROM pu GROUP BY 1, 2),
              rk AS MATERIALIZED (SELECT cohort_us, day, d_events,
                       c_censored,
                       CAST(sum(d_events + c_censored)
                              OVER (PARTITION BY cohort_us)
                            - coalesce(sum(d_events + c_censored)
                                OVER (PARTITION BY cohort_us ORDER BY day
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS BIGINT)
                         AS n_risk
                     FROM dt),
              ag AS (SELECT cohort_us,
                       list(struct_pack(day := day, d := d_events,
                                        n := n_risk)
                            ORDER BY day) AS arr
                     FROM rk GROUP BY 1),
              ex AS (SELECT cohort_us, unnest(arr) AS x,
                       generate_subscripts(arr, 1) AS pos, arr
                     FROM ag)
         SELECT rk.cohort_us, rk.day, rk.n_risk, rk.d_events,
                rk.c_censored,
                round(list_reduce(
                  list_prepend(CAST(1.0 AS DOUBLE),
                    list_transform(ex.arr[1:ex.pos],
                      e -> CAST(1.0 AS DOUBLE)
                           - CAST(e.d AS DOUBLE) / e.n)),
                  (a, f) -> a * f), 6) + 0.0 AS survival
         FROM rk JOIN ex ON ex.cohort_us = rk.cohort_us
           AND ex.x.day = rk.day"""),
  )

  val all: Seq[OracleQuery] = Seq(
    q18, q19, q19b, q20, q20b, q21, q22, q23,
    q25, q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q36,
    q51, q52, q58, q221, q225)
}
