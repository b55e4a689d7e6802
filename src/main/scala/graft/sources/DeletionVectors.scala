package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read targeted deletion — A33's copy-on-write delete with the
  * write amplification moved to read time (Iceberg v2 / Delta
  * deletion-vector semantics on plain parquet):
  *
  *   - MARK is O(matching rows): the A22 zone manifest proves which files
  *     can hold a target, ONLY those are scanned, and the (file, key)
  *     pairs that actually match land in a sidecar under
  *     `root/_deletes/<batchId>.parquet`. Data files are untouched — a
  *     GDPR request against a 100 TB table writes KBs, not rewritten
  *     gigabytes, and the mark is visible to readers immediately.
  *   - READ anti-joins the data against the union of sidecars on
  *     (file, key). Deletes are entity-sized by contract, so the sidecar
  *     side is broadcast — the merge costs one map-side probe per row,
  *     no shuffle of the table.
  *   - APPLY (compaction time, A18's moment) rewrites ONLY sidecar-named
  *     files without their marked rows via the A29/A33 stage-and-swap
  *     discipline, then drops the sidecars — read cost returns to zero.
  *
  * The copy-on-write/merge-on-read split is the standard lakehouse
  * trade: A33 optimizes reads (pay once at delete), this optimizes
  * delete latency and write amplification (pay a probe per read until
  * compaction). Both compose with the same zone-map targeting.
  *
  * NULL-key rows can never be marked (`isin` never matches NULL) and the
  * apply-side anti-join passes them through — the A33 NULL-survival
  * contract holds on both paths by construction.
  *
  * Idempotence: a batch id names its sidecar, so a retried mark
  * overwrites itself; apply is a no-op when no sidecars exist. Batch ids
  * are `[A-Za-z0-9_]` (the A29 lesson: '-' delimits name prefixes).
  */
object DeletionVectors {

  case class MarkReport(filesTotal: Int, filesScanned: Int,
                        rowsMarked: Long)
  case class ApplyReport(filesRewritten: Int, rowsRemoved: Long)

  private def deletesDir(root: String) = new Path(root, "_deletes")

  private def fs(spark: SparkSession, root: String): FileSystem =
    FileSystem.get(new Path(root).toUri,
      spark.sparkContext.hadoopConfiguration)

  /** Mark `targets` of `keyCol` (long) deleted: zone-prune to the files
    * that can hold one, scan just those, sidecar the matching
    * (file, key) pairs. Data files untouched.
    */
  def markDeleted(spark: SparkSession, root: String, keyCol: String,
                  targets: Seq[Long], batchId: String,
                  maxTargets: Int = 100000): MarkReport = {
    require(targets.nonEmpty, "DeletionVectors: empty target set")
    require(batchId.matches("[A-Za-z0-9_]+"),
      s"batchId '$batchId' must be [A-Za-z0-9_] (no '-')")
    require(targets.size <= maxTargets,
      s"DeletionVectors: ${targets.size} targets > $maxTargets — " +
        "corpus-sized deletes should be a filtered rewrite (A18/A33)")
    val zones = DataSkipping.collectStats(spark, root, Seq(keyCol))
      .collect() // one row per (file, keyCol): file-count-sized metadata
    val files = zones.map(_.file).distinct
    val affected = zones.filter { z =>
      if (!z.hasStats) true
      else (z.minLong, z.maxLong) match {
        case (Some(lo), Some(hi)) => targets.exists(t => t >= lo && t <= hi)
        case _ => false // provably all-null key column: no match possible
      }
    }.map(_.file).distinct
    if (affected.isEmpty) return MarkReport(files.length, 0, 0L)

    val dv = spark.read.parquet(affected.toIndexedSeq: _*)
      .where(col(keyCol).isin(targets: _*)) // NULL keys never match
      .select(input_file_name().as("file"),
        col(keyCol).cast("long").as("key"))
    val out = new Path(deletesDir(root), s"$batchId.parquet")
    dv.coalesce(1).write.mode("overwrite").parquet(out.toString)
    val marked = spark.read.parquet(out.toString).count()
    MarkReport(files.length, affected.length, marked)
  }

  /** All live sidecar marks, empty-framed when none exist. Each batch is
    * its own parquet directory under `_deletes/`, so the read enumerates
    * them explicitly (a plain directory read would not recurse into
    * non-partition subdirectories).
    */
  def deletes(spark: SparkSession, root: String): DataFrame = {
    val d = deletesDir(root)
    val f = fs(spark, root)
    val batchDirs =
      if (!f.exists(d)) Array.empty[String]
      else f.listStatus(d).filter(_.isDirectory).map(_.getPath.toString)
    if (batchDirs.isEmpty) {
      import spark.implicits._
      spark.emptyDataset[(String, Long)].toDF("file", "key")
    } else spark.read.parquet(batchDirs.toIndexedSeq: _*)
      .select("file", "key")
  }

  /** The table with marks merged out: one broadcast anti-join on
    * (file, key) — the per-read price of merge-on-read, no table
    * shuffle. NULL-key rows always pass (their join key matches no
    * sidecar row).
    */
  def readWithDeletes(spark: SparkSession, root: String,
                      keyCol: String): DataFrame = {
    val dv = broadcast(deletes(spark, root)
      .withColumnRenamed("key", "__dv_key"))
    spark.read.parquet(root)
      .withColumn("__file", input_file_name())
      .join(dv, col("__file") === dv("file") &&
        col(keyCol).cast("long") === dv("__dv_key"), "left_anti")
      .drop("__file")
  }

  /** Compaction step: rewrite ONLY the files sidecars name, without
    * their marked rows, swap them in (A29/A33 rename discipline), drop
    * the sidecars. After apply, plain reads are exact again.
    */
  def applyDeletes(spark: SparkSession, root: String, keyCol: String,
                   batchId: String = "dvapply"): ApplyReport = {
    require(batchId.matches("[A-Za-z0-9_]+"),
      s"batchId '$batchId' must be [A-Za-z0-9_] (no '-')")
    val f = fs(spark, root)
    val dv = deletes(spark, root).cache()
    try {
      val affected = dv.select("file").distinct()
        .collect().map(_.getString(0)) // sidecar-file-count-sized metadata
      if (affected.isEmpty) return ApplyReport(0, 0L)
      val rowsBefore = spark.read.parquet(affected.toIndexedSeq: _*).count()

      val dvb = broadcast(dv.withColumnRenamed("key", "__dv_key"))
      val kept = spark.read.parquet(affected.toIndexedSeq: _*)
        .withColumn("__file", input_file_name())
        .join(dvb, col("__file") === dvb("file") &&
          col(keyCol).cast("long") === dvb("__dv_key"), "left_anti")
        .drop("__file")
      val stageDir = new Path(root, s"_staging_dv/$batchId")
      f.delete(stageDir, true)
      kept.write.mode("overwrite").parquet(stageDir.toString)
      val keptRows = spark.read.parquet(stageDir.toString).count()

      affected.foreach(p => f.delete(new Path(p), false))
      val parts = f.listStatus(stageDir)
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      parts.zipWithIndex.foreach { case (s, i) =>
        val dst = new Path(root, s"$batchId-$i-${s.getPath.getName}")
        f.delete(dst, false) // a retried apply overwrites itself
        require(f.rename(s.getPath, dst),
          s"DeletionVectors: publish rename failed for ${s.getPath}")
      }
      f.delete(new Path(root, "_staging_dv"), true)
      f.delete(deletesDir(root), true)
      ApplyReport(affected.length, rowsBefore - keptRows)
    } finally dv.unpersist()
  }
}
