package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query: a Spark implementation and (when the semantics
  * are SQL-expressible) a DuckDB twin run by the driver over the same
  * parquet tables. Column names/types must match exactly — the driver sorts
  * columns by name, rounds doubles to 1e-9, sorts rows, and hash-compares.
  *
  * `dynOracle` is the CERTIFICATE seam for queries whose full semantics are
  * not SQL-portable (seeded k-means ANN): the run records a tiny fact about
  * its result (e.g. the returned ids), and the twin — built AFTER the run,
  * since Verify dumps oracle_sql.json last — independently recomputes the
  * exact values for those ids from the raw tables. A hash match then
  * certifies the reported values are correct (optimality/recall is pinned
  * by the scalatest spec instead). Returns None until the query has run,
  * so a restricted Verify pass degrades to the rows-only check.
  */
final case class OracleQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    dynOracle: () => Option[String] = () => None)

object Registry {
  lazy val all: Seq[OracleQuery] =
    CoreQueries.all ++ ExtQueries.all ++ TrainQueries.all ++
      CurationQueries.all ++ ScaleQueries.all ++ RetrievalQueries.all ++
      SimilarityQueries.all ++ MediaQueries.all ++ WarcQueries.all

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** NOT cached: dynOracle certificates materialize only after their query
    * has run, and Verify reads this map after the run loop.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.dynOracle().orElse(q.oracle).map(q.name -> _)).toMap
}
