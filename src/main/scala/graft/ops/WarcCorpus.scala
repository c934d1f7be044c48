package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Warc

/** WARC/WET shard ingestion — the Spark plumbing around the
  * [[graft.ext.Warc]] codec ([[JsonlCorpus]]'s sibling for the crawl
  * interchange format).
  *
  * Scale shape: one WARC shard = one task. `.warc.gz` is per-record-gzip
  * but NOT block-splittable mid-file without an index, so the standard
  * production layout (Common Crawl: ~64k shards of ~1 GB each) maps a
  * shard to a partition via `binaryFile` — parallelism comes from shard
  * COUNT, which at 100 TB is tens of thousands of tasks, far beyond any
  * cluster's slot count. The whole shard is held in memory while
  * parsing (binaryFile semantics); at the 1 GB convention that is within
  * any sane executor sizing, and the record iterator streams OUT of the
  * parse so downstream operators never hold more than a batch. Shards
  * beyond ~2 GB (the Array[Byte] ceiling) must be re-sharded upstream —
  * the parser fails loudly rather than truncating.
  */
object WarcCorpus {

  /** One parsed record row: source shard path, record position within
    * the shard, the header map (keys case-folded to lowercase, first
    * value wins for duplicate names — use the codec for full fidelity),
    * and the raw content block.
    */
  final case class WarcRow(file: String, rec_idx: Int,
      headers: Map[String, String], payload: Array[Byte])

  private def toRows(file: String, recs: Seq[Warc.WarcRecord]): Iterator[WarcRow] =
    recs.iterator.zipWithIndex.map { case (r, i) =>
      WarcRow(file, i,
        r.headers.groupBy(_._1.toLowerCase(java.util.Locale.ROOT))
          .map { case (k, vs) => k -> vs.head._2 }, r.payload)
    }

  /** Marker + manifest written by [[writeWet]] on job success: one shard
    * file name per line. Its ABSENCE next to leftover temp shards (or a
    * listed-but-missing shard) means an interrupted write — [[readWarc]]
    * refuses such a directory instead of silently consuming a partial
    * corpus (the [[graft.ext.Warc]] loud-failure posture).
    */
  val SuccessMarker: String = ShardSink.SuccessMarker

  /** Read WARC shards under `path` (a glob; e.g. `dir/\*.warc` or
    * `dir/\*.warc.gz`) into (file, rec_idx, headers, payload) rows.
    * `gz = true` splits per-record gzip members first. If the directory
    * carries a [[writeWet]] manifest (or leftover temp shards), the read
    * first verifies the write committed completely.
    */
  def readWarc(spark: SparkSession, path: String,
      gz: Boolean): Dataset[WarcRow] = {
    ShardSink.preflight(spark, path, "readWarc")
    parseShards(spark.read.format("binaryFile").load(path), gz)
  }

  /** The shard-parsing kernel shared by [[readWarc]] and the streaming
    * ingest (ST32): (path, content) binary-file rows → parsed records.
    * One shard = one task (the binaryFile partitioning), records stream
    * out of the parse.
    */
  def parseShards(files: DataFrame, gz: Boolean): Dataset[WarcRow] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (f, bytes) =>
        toRows(f, if (gz) Warc.parseWarcGz(bytes) else Warc.parseWarc(bytes))
      }
  }

  /** WET view: conversion records as a documents-like corpus
    * (url, date, text — payload decoded as UTF-8). Non-conversion
    * records (warcinfo, request/response, metadata) drop here; they are
    * container bookkeeping, not corpus text.
    */
  def wetDocuments(rows: Dataset[WarcRow]): DataFrame = {
    import rows.sparkSession.implicits._
    rows.filter(r => r.headers.get("warc-type").contains("conversion"))
      .map(r => (r.headers.getOrElse("warc-target-uri", ""),
        r.headers.getOrElse("warc-date", ""),
        new String(r.payload, "UTF-8")))
      .toDF("url", "date", "text")
  }

  /** WET EXPORT — the sink half of the interchange story: write a
    * (url, date, text) corpus as `shards` seekable `.warc.gz` files
    * (one warcinfo + one conversion record per doc, every record its
    * own gzip member — the layout [[readWarc]] and any standard WARC
    * reader consume). Sharding is an explicit `repartition(shards)` (the
    * [[JsonlCorpus.write]] rule: downstream loaders parallelize by
    * file, so the file count is a stated choice); each task STREAMS its
    * records straight into one `part-NNNNN.warc.gz` through the Hadoop
    * FS — no per-partition buffering of the shard, so shard size is
    * disk-bounded, not memory-bounded. Record order within a shard
    * follows the partition iterator (WARC attaches no meaning to record
    * order; the manifest family owns content checksums). Commit protocol
    * (task-attempt temps, delete-then-rename, `_SUCCESS` manifest,
    * speculation OFF): [[ShardSink]].
    */
  def writeWet(docs: DataFrame, path: String, shards: Int,
      warcDate: String = "2026-01-01T00:00:00Z"): Unit =
    ShardSink.writeSharded(docs.select(col("url"), col("date"), col("text")),
      path, shards, i => f"part-$i%05d.warc.gz", "writeWet") {
      (pid, out, it) =>
        def member(r: Warc.WarcRecord): Unit =
          Warc.gzipMember(out, Warc.writeRecord(r))
        member(Warc.WarcRecord(Seq(
          "WARC-Type" -> "warcinfo",
          "WARC-Record-ID" -> s"<urn:graft:shard:$pid>",
          "WARC-Date" -> warcDate,
          "Content-Type" -> "application/warc-fields"),
          "software: graft\r\n".getBytes("US-ASCII")))
        it.foreach { row =>
          member(Warc.WarcRecord(Seq(
            "WARC-Type" -> "conversion",
            "WARC-Target-URI" -> row.getString(0),
            "WARC-Date" ->
              (if (row.isNullAt(1) || row.getString(1).isEmpty) warcDate
               else row.getString(1)),
            "Content-Type" -> "text/plain"),
            row.getString(2).getBytes("UTF-8")))
        }
    }
}
