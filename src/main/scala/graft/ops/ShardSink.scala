package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The shared shard-sink commit protocol behind every "N final files on a
  * filesystem" sink ([[WarcCorpus.writeWet]], [[TfRecord.write]]).
  *
  * Task level: each attempt streams into a `_tmp-part-NNNNN-<attempt>`
  * path and renames into place only on success, so a retried attempt
  * never interleaves bytes into a final file. The rename is
  * delete-then-rename (both attempts of a partition carry identical
  * rows — a late speculative winner is still a complete shard), but run
  * these sinks with speculation OFF: two live attempts racing the delete
  * window could momentarily leave the final path absent.
  *
  * Job level: on success the driver writes a `_SUCCESS` manifest naming
  * every shard; [[preflight]] verifies it before any read and refuses
  * leftover temps, so an interrupted write can never be consumed as a
  * complete corpus (the [[graft.ext.Warc]] loud-failure posture).
  */
object ShardSink {

  val SuccessMarker = "_SUCCESS"
  val TmpPrefix = "_tmp-part-"

  /** Driver-side completeness check before consuming a directory a
    * [[writeSharded]] sink may have produced. External corpora (no
    * marker, no temps) pass through untouched; an empty-content
    * `_SUCCESS` (a foreign committer's) is honored as success but
    * carries no shard list to verify. `reader` labels the failure.
    */
  def preflight(spark: SparkSession, path: String, reader: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val isGlob = p.getName.exists(c => c == '*' || c == '?' || c == '[')
    val dir = if (isGlob) p.getParent else p
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir) || !fs.getFileStatus(dir).isDirectory) return
    val names = fs.listStatus(dir).map(_.getPath.getName).toSet
    val tmps = names.filter(_.startsWith(TmpPrefix))
    require(tmps.isEmpty,
      s"$reader: uncommitted temp shards under $dir " +
        s"(interrupted write?): ${tmps.toSeq.sorted.take(3).mkString(", ")}")
    if (names.contains(SuccessMarker)) {
      val in = fs.open(new org.apache.hadoop.fs.Path(dir, SuccessMarker))
      val listed =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toVector
        finally in.close()
      val missing = listed.filterNot(names.contains)
      require(missing.isEmpty,
        s"$reader: $dir/$SuccessMarker lists shards that are absent: " +
          missing.take(3).mkString(", "))
    }
  }

  /** Repartition `df` into `shards` partitions and stream each through
    * `writePartition(partitionId, out, rows)` into `shardName(id)` under
    * `path`, with the full task/job commit protocol above. Each task
    * STREAMS straight into one file through the Hadoop FS — no
    * per-partition buffering, so shard size is disk-bounded, not
    * memory-bounded.
    */
  def writeSharded(df: DataFrame, path: String, shards: Int,
      shardName: Int => String, label: String)(
      writePartition: (Int, java.io.OutputStream, Iterator[Row]) => Unit): Unit = {
    require(shards >= 1, s"$label: shards=$shards")
    val spark = df.sparkSession
    // The delete-then-rename task commit is only safe with exactly one
    // live attempt per partition: fail loudly instead of racing.
    require(!spark.conf.get("spark.speculation", "false").toBoolean,
      s"$label: writeSharded requires spark.speculation=false " +
        "(delete-then-rename task commit races concurrent attempts)")
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    val rootFs = root.getFileSystem(serConf.value)
    rootFs.mkdirs(root)
    // A re-write starts by invalidating any prior success state: stale
    // temps go, and the marker goes FIRST so a crash mid-write leaves
    // a directory preflight refuses rather than a stale "complete" one.
    rootFs.delete(new org.apache.hadoop.fs.Path(root, SuccessMarker), false)
    rootFs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(TmpPrefix))
      .foreach(rootFs.delete(_, false))
    df.repartition(shards)
      .foreachPartition { (it: Iterator[Row]) =>
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val file = new org.apache.hadoop.fs.Path(path, shardName(pid))
        val tmp = new org.apache.hadoop.fs.Path(path,
          f"$TmpPrefix$pid%05d-${tc.taskAttemptId()}")
        val fs = file.getFileSystem(serConf.value)
        val out = fs.create(tmp, true)
        try writePartition(pid, out, it) finally out.close()
        // Task commit: publish the complete temp under the final name.
        fs.delete(file, false)
        require(fs.rename(tmp, file),
          s"$label: could not commit $tmp to $file")
      }
    // Job commit. Every shard has committed by now, so any TmpPrefix
    // survivor is dead-attempt debris (a task that died mid-write and
    // was retried under a new attempt id): sweep it so one transient
    // retry can't leave a preflight-poisoning temp next to a complete,
    // manifest-listed corpus.
    rootFs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(TmpPrefix))
      .foreach(rootFs.delete(_, false))
    // The manifest names every shard (preflight checks it).
    val manifest = (0 until shards).map(shardName).mkString("", "\n", "\n")
    val mOut = rootFs.create(
      new org.apache.hadoop.fs.Path(root, SuccessMarker), true)
    try mOut.write(manifest.getBytes("UTF-8")) finally mOut.close()
  }
}
