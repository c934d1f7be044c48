package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * All tables are plain parquet reads except `events`, whose `ts` column is
  * physically INT64 TIMESTAMP(NANOS) — a type vanilla Spark refuses
  * ([PARQUET_TYPE_ILLEGAL]). We flip the legacy conf that surfaces it as a
  * long and convert to a microsecond timestamp ourselves (truncating, which
  * matches DuckDB's `CAST(ts_ns AS TIMESTAMP)` semantics used by the oracle).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts` as a proper TimestampType (µs, UTC).
    *
    * Schema-adaptive: older generated data stores `ts` as INT64
    * TIMESTAMP(NANOS) (surfaced as a long under the legacy conf and
    * truncated to µs here); newer data stores a plain TIMESTAMP(MICROS),
    * which the legacy conf leaves untouched and needs no conversion.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      // NB: integer `div`, not `/` — ns-since-epoch (~1.7e18) exceeds the
      // exact-integer range of a double, so float division would corrupt µs.
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // Newer data is TIMESTAMP_NTZ; with the session TZ pinned to UTC the
      // cast to LTZ preserves the underlying micros exactly.
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** `events` keeping raw nanosecond longs (for exact-nanos arithmetic). */
  def eventsRawNanos(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ =>
        raw.withColumn(
          "ts",
          unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)) * lit(1000L))
    }
  }
}
