package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted key deletion — the GDPR / right-to-be-forgotten rewrite
  * (delta-lake `DELETE WHERE key IN (...)` semantics on plain parquet):
  * remove every row whose key is in a bounded target set while
  * rewriting ONLY the files that can possibly contain one.
  *
  * Composition, not new machinery: the A22 zone-map manifest
  * ([[DataSkipping.collectStats]]) proves which files are DISJOINT from
  * the target set — those are never opened, never rewritten, their
  * bytes and names untouched (the gate checks this literally). Affected
  * files are read, filtered (`NOT IN` targets), staged, and swapped in
  * with the A29 rename discipline. On a key-clustered layout (range
  * partitioning, A27 z-order) a deletion of one entity's keys touches
  * O(1) files of the table — THE argument for clustered writes beyond
  * read pruning.
  *
  * Crash contract (log-less, same class as A21/A29): originals are
  * removed before staged files rename in, so a crash mid-publish can
  * leave kept rows of AFFECTED files temporarily missing (the staging
  * dir still holds them — a retry of the same batch completes the
  * swap); it can never resurrect a deleted key or duplicate a row. A
  * transaction log (delta) is what removes that window; out of scope
  * here by design.
  *
  * At 100 TB: the manifest is one footer-read per file (reused across
  * deletes); the rewrite cost is proportional to AFFECTED data only.
  * Targets are bounded (driver literal, the blocklist contract) —
  * GDPR requests are entity-sized, not corpus-sized.
  */
object TargetedDelete {

  case class DeleteReport(filesTotal: Int, filesRewritten: Int,
                          rowsDeleted: Long)

  def deleteKeys(spark: SparkSession, root: String, keyCol: String,
                 targets: Seq[Long], maxTargets: Int = 100000,
                 batchId: String = "del0"): DeleteReport = {
    require(targets.nonEmpty, "TargetedDelete: empty target set")
    require(batchId.matches("[A-Za-z0-9_-]+"),
      s"batchId '$batchId' must be filesystem- and prefix-safe")
    require(targets.size <= maxTargets,
      s"TargetedDelete: ${targets.size} targets > $maxTargets — " +
        "corpus-sized deletes should be a full filtered rewrite (A18)")
    val zones = DataSkipping.collectStats(spark, root, Seq(keyCol))
      .collect() // one row per (file, keyCol): file-count-sized metadata
    val files = zones.map(_.file).distinct
    val affected = zones.filter { z =>
      if (!z.hasStats) true // no stats -> must assume a target is inside
      else (z.minLong, z.maxLong) match {
        case (Some(lo), Some(hi)) => targets.exists(t => t >= lo && t <= hi)
        case _ => false // provably all-null key column: no match possible
      }
    }.map(_.file).distinct
    if (affected.isEmpty) return DeleteReport(files.length, 0, 0L)

    val rowsBefore = zones.filter(z => affected.contains(z.file))
      .map(_.rows).sum
    val fs = FileSystem.get(new Path(root).toUri,
      spark.sparkContext.hadoopConfiguration)
    val stageDir = new Path(root, s"_staging_delete/$batchId")
    fs.delete(stageDir, true)
    // NULL keys must survive: `!isin` is NULL (dropped) for NULL input,
    // which would silently delete rows the caller never targeted.
    val kept = spark.read.parquet(affected: _*)
      .where(col(keyCol).isNull || !col(keyCol).isin(targets: _*))
    kept.write.mode("overwrite").parquet(stageDir.toString)
    val keptRows = spark.read.parquet(stageDir.toString).count()

    // publish: drop originals, rename staged parts in under unique names
    affected.foreach(f => fs.delete(new Path(f), false))
    val parts = fs.listStatus(stageDir)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    parts.zipWithIndex.foreach { case (s, i) =>
      val dst = new Path(root, s"$batchId-$i-${s.getPath.getName}")
      fs.delete(dst, false) // a retried publish overwrites itself
      require(fs.rename(s.getPath, dst),
        s"TargetedDelete: publish rename failed for ${s.getPath}")
    }
    fs.delete(new Path(root, "_staging_delete"), true)
    DeleteReport(files.length, affected.length, rowsBefore - keptRows)
  }
}
