package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query: a Spark implementation and (when the semantics
  * are SQL-expressible) a DuckDB twin run by the driver over the same
  * parquet tables. Column names/types must match exactly — the driver sorts
  * columns by name, rounds doubles to 1e-9, sorts rows, and hash-compares.
  */
final case class OracleQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  lazy val all: Seq[OracleQuery] =
    CoreQueries.all ++ ExtQueries.all ++ TrainQueries.all ++
      CurationQueries.all ++ ScaleQueries.all ++ RetrievalQueries.all

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
