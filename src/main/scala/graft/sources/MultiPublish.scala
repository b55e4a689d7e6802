package graft.sources

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table ATOMIC publish (A37) — the cross-table transaction the
  * single-table WAP (A29) cannot express: a pipeline that derives N
  * tables from one batch (facts + a dimension + an aggregate rollup)
  * must never expose table A's new snapshot beside table B's old one —
  * a reader joining the two would see a state that never existed.
  *
  * Construction: each table's snapshots live in versioned directories
  * `root/<table>/v<N>/` that readers NEVER list — the only way in is the
  * commit pointer `root/_COMMIT`, a one-line-per-table `table=version`
  * manifest. A publish stages every table's next version, audits each
  * staged snapshot AS READ BACK (the A29 rule: audit what would publish,
  * not the input frame), and then flips `_COMMIT` with ONE atomic rename
  * — the all-or-nothing point for every table at once. Any failure
  * before the flip deletes the staged versions and leaves the pointer —
  * and therefore every reader's view of every table — bit-identical.
  *
  * Retried publishes are idempotent: the pointer didn't move, so the
  * retry computes the same target versions and overwrites its own
  * abandoned stage dirs. Old versions stay readable (time travel per
  * table via an explicit version) until vacuumed.
  *
  * Scale shape: staging is the only data movement (one partitioned
  * write per table, batch-sized); audits read the staged snapshots
  * (batch-sized, never the table); the commit is one KB-sized file
  * rename regardless of table count or size. Nothing scans history.
  */
object MultiPublish {

  case class MultiReport(committed: Boolean, versions: Map[String, Int],
                         failures: Seq[String],
                         replaySkipped: Boolean = false)

  /** Reserved manifest key tracking the highest published stream batch —
    * `_` keeps it out of the table namespace (mirrors the FS hidden-path
    * convention).
    */
  private val BatchKey = "_batch"

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    FileSystem.get(new Path(root).toUri,
      spark.sparkContext.hadoopConfiguration)

  private def manifest(spark: SparkSession, root: String): Map[String, Int] = {
    val fs = fsOf(spark, root)
    val p = new Path(root, "_COMMIT")
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      try {
        scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.contains("=")).map { l =>
            val Array(t, v) = l.split("=", 2); t -> v.trim.toInt
          }.toMap
      } finally in.close()
    }
  }

  /** The committed (table → version) view; empty before first publish. */
  def commitVersions(spark: SparkSession, root: String): Map[String, Int] =
    manifest(spark, root) - BatchKey

  /** Read `table` at the committed version (the ONLY reader path —
    * version dirs are an implementation detail of the pointer).
    */
  def readCommitted(spark: SparkSession, root: String,
                    table: String): DataFrame = {
    val v = commitVersions(spark, root).getOrElse(table,
      throw new IllegalStateException(
        s"table '$table' has no committed version under $root"))
    spark.read.parquet(s"$root/$table/v$v")
  }

  /** Read `table` at an explicit historical version (time travel). */
  def readVersion(spark: SparkSession, root: String, table: String,
                  version: Int): DataFrame =
    spark.read.parquet(s"$root/$table/v$version")

  /** Does `table` have a version-`version` tree on disk? A QUIET probe
    * (one FS metadata call) for callers validating against a spec that
    * may legitimately not be published yet — the blue/green backfill
    * appends AHEAD of its spec's flip, and an exception-driven check
    * would log a spurious FileNotFoundException stack per append.
    */
  def versionExists(spark: SparkSession, root: String, table: String,
                    version: Int): Boolean =
    fsOf(spark, root).exists(
      new org.apache.hadoop.fs.Path(s"$root/$table/v$version"))

  /** Stage + audit + atomically commit every (table → frame, audits)
    * together. Either every table advances one version or none does.
    */
  def publishAll(spark: SparkSession,
                 staged: Map[String, (DataFrame, Seq[Wap.Audit])],
                 root: String,
                 batchId: Option[Long] = None): MultiReport = {
    require(staged.nonEmpty, "publishAll: nothing to publish")
    require(!staged.contains(BatchKey), s"'$BatchKey' is a reserved name")
    val fs = fsOf(spark, root)
    val raw = manifest(spark, root)
    val current = raw - BatchKey
    // exactly-once under at-least-once redelivery: the manifest records
    // the highest published batch; a replayed epoch is a structural
    // no-op — versions, data, and pointer all bit-identical (the D8
    // contract at the transaction level)
    batchId.foreach { id =>
      if (raw.get(BatchKey).exists(_ >= id))
        return MultiReport(committed = false, versions = current,
          failures = Nil, replaySkipped = true)
    }
    val next = staged.keys.map(t => t -> (current.getOrElse(t, 0) + 1)).toMap

    // STAGE: write each next version (invisible until the pointer flips;
    // overwrite semantics make a crashed attempt's dir self-healing)
    staged.foreach { case (t, (df, _)) =>
      df.write.mode("overwrite").parquet(s"$root/$t/v${next(t)}")
    }

    // AUDIT the staged snapshots as read back — all tables, so the
    // report names every violation, not just the first
    val failures = staged.toSeq.sortBy(_._1).flatMap { case (t, (_, audits)) =>
      val back = spark.read.parquet(s"$root/$t/v${next(t)}")
      audits.flatMap { case (name, check) =>
        check(back).map(msg => s"$t: $name: $msg")
      }
    }
    if (failures.nonEmpty) {
      staged.keys.foreach { t =>
        fs.delete(new Path(s"$root/$t/v${next(t)}"), true)
      }
      return MultiReport(committed = false, versions = current, failures)
    }

    // COMMIT: one atomic rename flips every table's version at once
    val merged = current ++ next
    val withBatch = batchId match {
      case Some(id) => merged + (BatchKey -> id.toInt)
      case None => merged ++ raw.get(BatchKey).map(BatchKey -> _)
    }
    val tmp = new Path(root, s"_COMMIT.tmp")
    val out = fs.create(tmp, true)
    try out.write(withBatch.toSeq.sortBy(_._1)
      .map { case (t, v) => s"$t=$v" }.mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    finally out.close()
    val fc = FileContext.getFileContext(new Path(root).toUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new Path(root, "_COMMIT"), Options.Rename.OVERWRITE)
    MultiReport(committed = true, versions = merged, failures = Nil)
  }

  /** Retention: drop each table's versions older than the last
    * `keepLast` committed ones (snapshot expiry — the A21 vacuum rule
    * applied to the version axis). The committed version and anything
    * newer are structurally untouchable: expiry reads the pointer and
    * only ever deletes BELOW `committed - keepLast + 1`, so no reader
    * following `_COMMIT` — nor any publish in flight, which only writes
    * versions ABOVE the pointer — can lose data. Returns the dropped
    * versions per table for the audit log.
    */
  def expireVersions(spark: SparkSession, root: String,
                     keepLast: Int = 2): Map[String, Seq[Int]] = {
    require(keepLast >= 1, "expireVersions: must keep at least the commit")
    val fs = fsOf(spark, root)
    commitVersions(spark, root).map { case (table, committed) =>
      val floor = committed - keepLast + 1
      val dir = new Path(s"$root/$table")
      val dropped =
        if (!fs.exists(dir)) Seq.empty[Int]
        else fs.listStatus(dir).toSeq
          .map(_.getPath.getName)
          .collect { case n if n.startsWith("v") &&
            n.drop(1).forall(_.isDigit) => n.drop(1).toInt }
          .filter(_ < floor).sorted
      dropped.foreach(v => fs.delete(new Path(s"$root/$table/v$v"), true))
      table -> dropped
    }
  }

  /** D22: the A37 transaction under a stream — every micro-batch derives
    * N tables (facts + rollups + whatever `derive` builds) and commits
    * them in ONE atomic flip, with the batch id recorded in the manifest
    * so redelivered epochs are structural no-ops. A reader joining the
    * published tables sees every epoch's output entirely or not at all —
    * the cross-table consistency foreachBatch's per-sink writes cannot
    * give (D8/D10 are exactly-once per SINK; this is exactly-once per
    * TRANSACTION).
    */
  def publishStream(stream: DataFrame, root: String, checkpoint: String,
                    derive: DataFrame => Map[String, (DataFrame, Seq[Wap.Audit])])
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        publishAll(b.sparkSession, derive(b), root, Some(id)); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
