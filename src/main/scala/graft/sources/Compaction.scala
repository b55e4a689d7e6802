package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for hive-partitioned parquet tables — the
  * delta-style OPTIMIZE maintenance pass. Streaming/incremental sinks
  * (A15's idempotent append, A17 upserts) fragment partitions into many
  * small files; at 100 TB that is a metadata and open-cost bomb: every
  * query pays listing + footer reads + one task per file.
  *
  * Spark-first shape: file sizes come from driver-side FS metadata (a
  * listing, not data), only FRAGMENTED partitions are re-read, and the
  * rewrite is one job — [[graft.operators.BalancedRepartition]] sizes the
  * shuffle so each output file ≈ `targetFileBytes`, and dynamic partition
  * overwrite swaps ONLY the rewritten partitions (untouched partitions
  * keep their files byte-for-byte). Re-running is a no-op (idempotent by
  * construction: compacted partitions no longer match the fragmentation
  * predicate).
  *
  * Reference counterpart: the censo pipeline controls file size at WRITE
  * time (transform.py:155-169, ~2M rows/file); this is the missing other
  * half — repairing size after incremental appends, without a full
  * table rewrite.
  */
object Compaction {

  /** One partition directory's before/after accounting. */
  case class PartitionReport(partition: String, filesBefore: Int,
                             bytes: Long, rewritten: Boolean)

  /** [[vacuum]] accounting: every orphan found, and the subset actually
    * deleted (the rest are younger than the retention window).
    */
  case class VacuumReport(orphansFound: Seq[String], removed: Seq[String],
                          retentionMs: Long)

  /** Orphan-file GC — the delta-VACUUM maintenance pass, without a
    * transaction log. For plain parquet tables the reader's visibility
    * rule IS the manifest: partition discovery skips paths whose name
    * starts with `_` or `.` (Spark/Hive hidden-path convention), and the
    * Hadoop commit protocol stages every in-flight task's output under
    * `_temporary/` until job commit. So an ABORTED write leaves its
    * partial files exactly there: invisible to every reader, but billed
    * and listed forever until someone deletes them.
    *
    * vacuum removes hidden orphans (staging dirs, stray hidden files —
    * never `_SUCCESS`) whose modification time is older than
    * `retentionMs`. The retention window is the correctness guard: a
    * RUNNING job's `_temporary` is younger than any sane retention, so
    * in-flight writers are never broken — same contract as delta's
    * VACUUM grace period. Data files are untouched: visible-file deletion
    * without a log would be guesswork, and compaction already handles
    * visible small-file debt.
    */
  def vacuum(spark: SparkSession, root: String,
             retentionMs: Long = 7L * 24 * 3600 * 1000,
             dryRun: Boolean = false): VacuumReport = {
    val rootPath = new Path(root)
    val fs = FileSystem.get(rootPath.toUri,
      spark.sparkContext.hadoopConfiguration)
    val cutoff = System.currentTimeMillis() - retentionMs
    def isHiddenOrphan(name: String): Boolean =
      (name.startsWith("_") || name.startsWith(".")) && name != "_SUCCESS"
    // one level of partition dirs is enough for the hive layout this
    // engine writes (root/_temporary, root/col=v/_temporary, hidden strays)
    def candidates(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val entries = fs.listStatus(dir).toSeq
      val here = entries.filter(s => isHiddenOrphan(s.getPath.getName))
      val below = entries
        .filter(s => s.isDirectory && !isHiddenOrphan(s.getPath.getName))
        .flatMap(s => fs.listStatus(s.getPath).toSeq
          .filter(c => isHiddenOrphan(c.getPath.getName)))
      here ++ below
    }
    val orphans = if (fs.exists(rootPath)) candidates(rootPath) else Seq.empty
    val expired = orphans.filter(_.getModificationTime < cutoff)
    if (!dryRun) expired.foreach(s => fs.delete(s.getPath, true))
    VacuumReport(orphans.map(_.getPath.toString),
      if (dryRun) Seq.empty else expired.map(_.getPath.toString),
      retentionMs)
  }

  /** Compact every `col=value` partition whose parquet-file count exceeds
    * both `minFiles` and what `targetFileBytes` would need.
    *
    * @return per-partition reports (rewritten = matched the fragmentation
    *         predicate and was rewritten this call)
    */
  def compactPartitioned(spark: SparkSession, root: String,
                         partitionCol: String,
                         targetFileBytes: Long = 128L << 20,
                         minFiles: Int = 2): Seq[PartitionReport] = {
    val rootPath = new Path(root)
    val fs = FileSystem.get(rootPath.toUri,
      spark.sparkContext.hadoopConfiguration)
    val partDirs = fs.listStatus(rootPath)
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(s"$partitionCol="))
    val reports = partDirs.toSeq.map { d =>
      val files = fs.listStatus(d.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      val bytes = files.map(_.getLen).sum
      val targetFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      val fragmented = files.length > math.max(targetFiles, (minFiles - 1).toLong)
      PartitionReport(d.getPath.getName, files.length, bytes, fragmented)
    }
    val toRewrite = reports.filter(_.rewritten)
    if (toRewrite.nonEmpty) {
      val values = toRewrite.map(_.partition.split("=", 2)(1))
      val frag = spark.read.parquet(root)
        .where(col(partitionCol).cast("string").isin(values: _*))
      // rows-per-file from the fragmented partitions' own byte/row ratio,
      // so output files land ≈ targetFileBytes without a config guess
      val totalRows = frag.count()
      val totalBytes = toRewrite.map(_.bytes).sum
      val rowsPerFile = math.max(1L,
        if (totalBytes == 0) totalRows
        else totalRows * targetFileBytes / math.max(totalBytes, 1L))
      val balanced = graft.operators.BalancedRepartition(
        frag, Seq(partitionCol), rowsPerFile)
      val conf = spark.conf
      val prev = conf.getOption("spark.sql.sources.partitionOverwriteMode")
      conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try balanced.write.mode("overwrite").partitionBy(partitionCol)
        .parquet(root)
      finally prev match {
        case Some(v) => conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    reports
  }
}
