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
  val SuccessMarker = "_SUCCESS"
  private val TmpPrefix = "_tmp-part-"

  /** Driver-side completeness check before consuming a directory that
    * [[writeWet]] may have produced. External WARC corpora (no marker,
    * no temps) pass through untouched; an empty-content `_SUCCESS` (a
    * foreign committer's) is honored as success but carries no shard
    * list to verify.
    */
  private def preflight(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val isGlob = p.getName.exists(c => c == '*' || c == '?' || c == '[')
    val dir = if (isGlob) p.getParent else p
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir) || !fs.getFileStatus(dir).isDirectory) return
    val names = fs.listStatus(dir).map(_.getPath.getName).toSet
    val tmps = names.filter(_.startsWith(TmpPrefix))
    require(tmps.isEmpty,
      s"readWarc: uncommitted writeWet temp shards under $dir " +
        s"(interrupted write?): ${tmps.toSeq.sorted.take(3).mkString(", ")}")
    if (names.contains(SuccessMarker)) {
      val in = fs.open(new org.apache.hadoop.fs.Path(dir, SuccessMarker))
      val listed =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toVector
        finally in.close()
      val missing = listed.filterNot(names.contains)
      require(missing.isEmpty,
        s"readWarc: $dir/$SuccessMarker lists shards that are absent: " +
          missing.take(3).mkString(", "))
    }
  }

  /** Read WARC shards under `path` (a glob; e.g. `dir/\*.warc` or
    * `dir/\*.warc.gz`) into (file, rec_idx, headers, payload) rows.
    * `gz = true` splits per-record gzip members first. If the directory
    * carries a [[writeWet]] manifest (or leftover temp shards), the read
    * first verifies the write committed completely.
    */
  def readWarc(spark: SparkSession, path: String,
      gz: Boolean): Dataset[WarcRow] = {
    preflight(spark, path)
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
    * order; the manifest family owns content checksums).
    *
    * Commit protocol (task level): each task attempt streams into a
    * `_tmp-part-NNNNN-<attempt>` path and renames it into place only on
    * success, so a retried attempt never interleaves bytes into the
    * final file. The rename-into-place is delete-then-rename (both
    * attempts of a partition carry identical rows — a late speculative
    * winner is still a complete shard), but run this sink with
    * speculation OFF: two live attempts racing the delete window could
    * momentarily leave the final path absent. On job success the driver
    * writes a [[SuccessMarker]] manifest listing every shard;
    * [[readWarc]] verifies it and refuses leftover temps, so an
    * interrupted write can never be consumed as a complete corpus.
    */
  def writeWet(docs: DataFrame, path: String, shards: Int,
      warcDate: String = "2026-01-01T00:00:00Z"): Unit = {
    require(shards >= 1, s"writeWet: shards=$shards")
    val spark = docs.sparkSession
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    val rootFs = root.getFileSystem(serConf.value)
    rootFs.mkdirs(root)
    // A re-write starts by invalidating any prior success state: stale
    // temps go, and the marker goes FIRST so a crash mid-write leaves
    // a directory readWarc refuses rather than a stale "complete" one.
    rootFs.delete(new org.apache.hadoop.fs.Path(root, SuccessMarker), false)
    rootFs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(TmpPrefix))
      .foreach(rootFs.delete(_, false))
    docs.select(col("url"), col("date"), col("text"))
      .repartition(shards)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val finalName = f"part-$pid%05d.warc.gz"
        val file = new org.apache.hadoop.fs.Path(path, finalName)
        val tmp = new org.apache.hadoop.fs.Path(path,
          f"$TmpPrefix$pid%05d-${tc.taskAttemptId()}.warc.gz")
        val fs = file.getFileSystem(serConf.value)
        val out = fs.create(tmp, true)
        try {
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
        } finally out.close()
        // Task commit: publish the complete temp under the final name.
        fs.delete(file, false)
        require(fs.rename(tmp, file),
          s"writeWet: could not commit $tmp to $file")
      }
    // Job commit: the manifest names every shard (readWarc checks it).
    val manifest = (0 until shards).map(i => f"part-$i%05d.warc.gz")
      .mkString("", "\n", "\n")
    val mOut = rootFs.create(
      new org.apache.hadoop.fs.Path(root, SuccessMarker), true)
    try mOut.write(manifest.getBytes("UTF-8")) finally mOut.close()
  }
}
