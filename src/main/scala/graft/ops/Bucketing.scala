package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed tables: pre-shuffled storage for co-located joins and
  * aggregations (SURVEY §4 join-selection notes). Writing both sides of a
  * recurring join bucketed by the join key into the same bucket count lets
  * every subsequent join/groupBy on that key plan WITHOUT an Exchange —
  * at 100 TB the dominant cost of a fact-fact join is exactly that
  * shuffle, and it is paid once at write time instead of per query.
  */
object Bucketing {

  /** Persist `df` as a bucketed (and bucket-sorted) catalog table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two tables previously written with [[writeBucketed]] on the same
    * key and bucket count: plans as a zero-exchange sort-merge join.
    */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
