package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Tables
import graft.ext.{PqIndex, Retrieval, Similarity, TextAnalysis}
import graft.ops.Graph

/** Round-4 (continued): retrieval and structure operators — BM25 lexical
  * search, per-slice distribution divergence, bounded BFS over a derived
  * graph, serialization-roundtrip fidelity, and PQ-compressed ANN.
  */
object RetrievalQueries {

  /** Q87 [X]: BM25 top-10 for a fixed query term set — the lexical
    * retrieval scorer (targeted curation / RAG indexing). Per-term
    * contributions go round→DECIMAL before the per-doc sum so both
    * engines sum exactly (q72 route); rank on the rounded score with the
    * id tiebreak (q47 route).
    */
  private val Bm25Terms = Seq("spark", "merge", "shuffle")
  val q87 = OracleQuery(
    "q87_bm25",
    (s, d) => Retrieval.bm25TopK(
      Tables.documents(s, d), "doc_id", "text", Bm25Terms, 10),
    Some(Retrieval.bm25OracleSql(Bm25Terms, 10)),
  )

  /** Q88 [X]: per-source KL divergence and cross-entropy of the token
    * distribution vs the whole corpus — the data-recipe drift monitor
    * (token-level sibling of the numeric PSI, q78).
    */
  val q88 = OracleQuery(
    "q88_source_kl",
    (s, d) => TextAnalysis.sliceTokenKl(
      Tables.documents(s, d), "source", "text")
      .withColumnRenamed("source", "src"),
    Some("""WITH tok AS (SELECT source AS src, unnest(string_split(text, ' ')) AS w FROM documents),
                 sw AS (SELECT src, w, CAST(count(*) AS BIGINT) AS cnt_sw FROM tok GROUP BY src, w),
                 wt AS (SELECT w, CAST(sum(cnt_sw) AS BIGINT) AS cnt_w FROM sw GROUP BY w),
                 st AS (SELECT src, CAST(sum(cnt_sw) AS BIGINT) AS n_s FROM sw GROUP BY src),
                 tt AS (SELECT CAST(sum(cnt_w) AS BIGINT) AS n_tot FROM wt),
                 c AS (SELECT src, n_s,
                         CAST(round((CAST(cnt_sw AS DOUBLE)/n_s) *
                            ln((CAST(cnt_sw AS DOUBLE)/n_s) / (CAST(cnt_w AS DOUBLE)/n_tot)), 12) AS DECIMAL(32,12)) AS kl_term,
                         CAST(round((CAST(cnt_sw AS DOUBLE)/n_s) *
                            ln(CAST(cnt_w AS DOUBLE)/n_tot), 12) AS DECIMAL(32,12)) AS ce_term
                       FROM sw JOIN wt USING (w) JOIN st USING (src), tt)
            SELECT src, round(CAST(sum(kl_term) AS DOUBLE), 6) AS kl,
                   round(CAST(-sum(ce_term) AS DOUBLE), 6) AS cross_entropy,
                   CAST(min(n_s) AS BIGINT) AS n_tok
            FROM c GROUP BY src"""),
  )

  /** Q89 [X]: bounded BFS — minimum hop count from supplier #1 over the
    * bipartite supplier↔part graph (edges = sparse lineitem slice, both
    * directions; part ids offset by 10^6 into a shared node space; the
    * supplier seed stays well-connected at every SF, where a part seed
    * goes edgeless at sf0.1). Level-synchronous frontier joins on our
    * side; `WITH RECURSIVE` with a UNION-dedup fixpoint on the oracle's.
    */
  val q89 = OracleQuery(
    "q89_graph_bfs",
    (s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_quantity") < 5)
        .select(col("l_suppkey").cast("long").as("s"),
          (col("l_partkey").cast("long") + 1000000L).as("p"))
        .distinct()
      val edges = li.select(col("s").as("src"), col("p").as("dst"))
        .union(li.select(col("p").as("src"), col("s").as("dst")))
      Graph.bfsHops(edges, "src", "dst", Seq(1L), maxHops = 4)
    },
    Some("""WITH RECURSIVE
              e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                           CAST(l_partkey AS BIGINT) + 1000000 AS p
                    FROM lineitem WHERE l_quantity < 5),
              edges AS (SELECT s AS src, p AS dst FROM e
                        UNION ALL SELECT p, s FROM e),
              bfs(node, hop) AS (
                SELECT CAST(1 AS BIGINT), 0
                UNION
                SELECT g.dst, b.hop + 1
                FROM bfs b JOIN edges g ON g.src = b.node
                WHERE b.hop < 4)
            SELECT node, CAST(min(hop) AS INTEGER) AS hop
            FROM bfs GROUP BY node"""),
  )

  /** Q90 [X]: serialization-roundtrip fidelity — documents → JSONL
    * (`to_json`) → parsed back (`from_json`) → original columns. The
    * oracle is the identity projection, so the hash match IS the
    * losslessness proof for the JSONL interchange format every training
    * pipeline ships corpora in.
    */
  val q90 = OracleQuery(
    "q90_jsonl_roundtrip",
    (s, d) => {
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      Tables.documents(s, d)
        .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))).as("line"))
        .select(from_json(col("line"), schema).as("r"))
        .select(col("r.doc_id"), col("r.text"), col("r.lang"),
          col("r.source"), col("r.n_chars"))
    },
    Some("SELECT doc_id, text, lang, source, n_chars FROM documents"),
  )

  /** Q91 [X]: PQ-compressed ANN — codes-only ADC scan shortlists 4k
    * candidates, exact cosine re-ranks the top 5 for query vector 0.
    * Like q74 (IVF), k-means codebooks are not portably expressible in
    * SQL → rows-only check; `PqIndexSpec` pins recall vs exact top-k.
    */
  val q91 = OracleQuery(
    "q91_pq_ann",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val qv = emb.filter(col("vec_id") === 0)
        .select(Similarity.asDouble(col("embedding"))).head()
        .getSeq[Double](0).toArray
      val model = PqIndex.build(emb.filter(col("vec_id") >= 5),
        "embedding", "vec_id", m = 8, ksub = 16, maxIter = 5)
      PqIndex.search(model, qv, "vec_id", k = 5)
    },
    None,
  )

  val all: Seq[OracleQuery] = Seq(q87, q88, q89, q90, q91)
}
