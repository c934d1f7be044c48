package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables, TestSpark}

/** Partitioned storage layout (SURVEY §4): hive-style partition columns
  * must prune at the scan — at 100 TB a predicate on the partition key
  * reads 1/N of the files, and that has to be visible in the plan, not
  * assumed.
  */
class StorageLayoutSpec extends SparkSpec {

  test("partitionBy layout prunes partitions for a key predicate") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString
    Tables.lineitem(spark, TestSpark.Sf0001)
      .write.partitionBy("l_returnflag").parquet(s"$dir/li")
    val read = spark.read.parquet(s"$dir/li").filter(col("l_returnflag") === "R")
    val scan = read.queryExecution.executedPlan.toString
    scan should include("PartitionFilters")
    scan should include("l_returnflag")
    // counts agree with the unpartitioned source
    val want = Tables.lineitem(spark, TestSpark.Sf0001)
      .filter(col("l_returnflag") === "R").count()
    read.count() shouldBe want
    // only the matching partition directory is listed in the scan's files
    val dirs = new java.io.File(s"$dir/li").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("l_returnflag="))
    dirs.length should be > 1 // layout actually partitioned
  }

  test("repartition by write key bounds file count per partition") {
    val dir = java.nio.file.Files.createTempDirectory("layout2").toString
    Tables.lineitem(spark, TestSpark.Sf0001)
      .repartition(col("l_returnflag"))
      .write.partitionBy("l_returnflag").parquet(s"$dir/li")
    // one task per key → one file per partition dir (plus markers)
    val parts = new java.io.File(s"$dir/li").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("l_returnflag="))
    parts.foreach { p =>
      p.listFiles().count(_.getName.endsWith(".parquet")) shouldBe 1
    }
  }
}
