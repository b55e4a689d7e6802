package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-Audit-Publish — the staged-commit pattern (Iceberg's WAP / "audit
  * branch" workflow, rebuilt on plain parquet + the Spark/Hive hidden-path
  * convention; reference sink: transform.py:172-175 writes blind appends).
  * A batch lands in three steps:
  *
  *   1. STAGE  — written under `root/_staging/<batchId>/` in the final
  *      partition layout. The `_` prefix makes it invisible to every
  *      partition-discovery reader (the A21 vacuum visibility rule), so a
  *      half-written or abandoned stage can never corrupt a query.
  *   2. AUDIT  — validation predicates run against the STAGED FILES read
  *      back (not the input frame: what's audited is exactly what would
  *      publish, including any write-path type/encoding surprises).
  *   3. PUBLISH — per-file atomic renames move staged files into the
  *      table partitions under a `<batchId>-` name prefix; any files of a
  *      previous attempt of the SAME batch are removed first, so a
  *      crashed-and-retried publish overwrites itself (the D8 replay
  *      contract) instead of duplicating rows.
  *
  * A failed audit deletes the stage and leaves the table bit-identical —
  * bad data never becomes visible, which is the entire point.
  *
  * Scale shape: stage is one normal partitioned write (the only data
  * movement); audit is one read of the staged batch (batch-sized, not
  * table-sized); publish is pure FS metadata (one rename per staged
  * file). Nothing here scans the existing table.
  */
object Wap {

  /** Audit = named predicate over the staged frame; None = pass. */
  type Audit = (String, DataFrame => Option[String])

  /** Fails unless the staged batch has at least `n` rows. */
  def minRows(n: Long): Audit = (s"minRows($n)", df => {
    val c = df.count()
    if (c >= n) None else Some(s"staged $c rows < required $n")
  })

  /** Fails if any staged row has a NULL in any of `cols`. */
  def noNulls(cols: String*): Audit = (s"noNulls(${cols.mkString(",")})", df => {
    val bad = df.where(cols.map(col(_).isNull).reduce(_ || _)).count()
    if (bad == 0) None else Some(s"$bad staged rows with NULL key")
  })

  /** Fails if `cols` is not a unique key of the staged batch. */
  def uniqueKey(cols: String*): Audit = (s"uniqueKey(${cols.mkString(",")})", df => {
    val dups = df.groupBy(cols.map(col): _*).count().where(col("count") > 1).count()
    if (dups == 0) None else Some(s"$dups duplicated key groups in stage")
  })

  case class WapReport(batchId: String, published: Boolean, stagedRows: Long,
                       failures: Seq[String], publishedFiles: Int)

  def writeAuditPublish(spark: SparkSession, df: DataFrame, root: String,
                        partitionCol: String, batchId: String,
                        audits: Seq[Audit]): WapReport = {
    // '-' is the prefix delimiter in published file names: a batchId
    // containing it would make "b1-" a prefix of batch "b1-2"'s files,
    // so publish/readAsOf would claim another batch's data. Disallow it.
    require(batchId.matches("[A-Za-z0-9_]+"),
      s"batchId '$batchId' must be filesystem- and prefix-safe " +
        "([A-Za-z0-9_], no '-')")
    val rootPath = new Path(root)
    val fs = FileSystem.get(rootPath.toUri,
      spark.sparkContext.hadoopConfiguration)
    val stagePath = new Path(root, s"_staging/$batchId")

    // STAGE (a retried batch replaces its own abandoned stage first)
    if (fs.exists(stagePath)) fs.delete(stagePath, true)
    df.write.mode("overwrite").partitionBy(partitionCol)
      .parquet(stagePath.toString)

    // AUDIT the staged files read back
    val staged = spark.read.parquet(stagePath.toString)
    val stagedRows = staged.count()
    val failures = audits.flatMap { case (name, check) =>
      check(staged).map(msg => s"$name: $msg")
    }
    def dropStage(): Unit = {
      fs.delete(stagePath, true)
      val parent = stagePath.getParent // .../_staging — remove when empty
      if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
        fs.delete(parent, false)
    }
    if (failures.nonEmpty) {
      dropStage()
      return WapReport(batchId, published = false, stagedRows, failures, 0)
    }

    // PUBLISH: remove any previous attempt of this batch, then rename
    val partDirs = fs.listStatus(stagePath)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    var moved = 0
    partDirs.foreach { d =>
      val target = new Path(rootPath, d.getPath.getName)
      fs.mkdirs(target)
      fs.listStatus(target)
        .filter(_.getPath.getName.startsWith(s"$batchId-"))
        .foreach(old => fs.delete(old.getPath, false))
      fs.listStatus(d.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .foreach { f =>
          val ok = fs.rename(f.getPath,
            new Path(target, s"$batchId-${f.getPath.getName}"))
          require(ok, s"publish rename failed for ${f.getPath}")
          moved += 1
        }
    }
    dropStage()
    WapReport(batchId, published = true, stagedRows, failures, moved)
  }

  /** Time-travel read of a WAP table: the table "as of" a subset of its
    * published batches. The batchId-prefixed file names ARE the
    * snapshot metadata (Iceberg keeps this mapping in manifest files;
    * here the layout itself is the manifest — the same
    * layout-as-ledger rule as A30): a file belongs to snapshot set V
    * iff its name carries no known batch prefix (the base load) or a
    * prefix in V. Cost is one FS listing of the partition dirs —
    * file-count-sized metadata, no data read to decide visibility.
    *
    * `allBatches` must list every batch ever published (the caller's
    * commit history); `visible` selects the snapshot. Unknown-prefix
    * files are always included — conservative, like A22's unknown-file
    * rule: forgetting a batch in `allBatches` can only ADD data to
    * every snapshot, never silently drop committed rows from one.
    */
  def readAsOf(spark: SparkSession, root: String,
               allBatches: Seq[String], visible: Seq[String]): DataFrame = {
    allBatches.foreach(b => require(b.matches("[A-Za-z0-9_]+"),
      s"batch '$b': ids are [A-Za-z0-9_] (no '-' — it delimits the " +
        "batch prefix in file names)"))
    val hidden = allBatches.toSet -- visible
    val rootPath = new Path(root)
    val fs = FileSystem.get(rootPath.toUri,
      spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(rootPath)
      .filter(s => s.isDirectory && s.getPath.getName.contains("=") &&
        !s.getPath.getName.startsWith("_"))
      .flatMap(d => fs.listStatus(d.getPath))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .filterNot(f => hidden.exists(b =>
        f.getPath.getName.startsWith(s"$b-")))
      .map(_.getPath.toString).toSeq
    if (files.isEmpty)
      spark.read.parquet(root).where(lit(false))
    else spark.read.option("basePath", root).parquet(files: _*)
  }
}
