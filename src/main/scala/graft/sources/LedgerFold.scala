package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The shared crash-safe epoch-ledger fold — the C135 compaction
  * machinery carved out of [[PairLedger]] (r18) so the span-extent
  * ledger ([[SpanLedger]], C137) and any future ledger tree reuse ONE
  * audited swap protocol instead of re-deriving it:
  *
  *   - **Crash-safe swap order** (the r16 advice's two high findings):
  *     the merged partition is written to an underscore-hidden temp,
  *     renamed INTO THE LIVE TREE FIRST, and only then are the folded
  *     partitions deleted — a crash before the rename leaves the live
  *     tree untouched; a crash after it leaves transient DUPLICATES
  *     (merged + not-yet-deleted folded partitions), which every
  *     key-distinct consumer absorbs and the next fold retires. At no
  *     instant is the only copy of a row under a path partition
  *     discovery ignores.
  *   - **Reserved negative sentinel**: the merged partition lands BELOW
  *     every existing epoch; deliverable epochs are ≥ 0 by contract
  *     (each ledger's append enforces it), so a post-compaction D8
  *     redelivery re-lands BESIDE folded history, never over it.
  *   - **Arrival-epoch provenance** (C138): deliverable partitions
  *     carry each row's arrival epoch as the D8 partition key; the fold
  *     PRESERVES it as a data column (`arr_epoch`) in the merged
  *     partition, so age-based retention stays decidable after any
  *     number of folds. Rows from a legacy merged partition written
  *     before this column existed read as their (negative) sentinel —
  *     "age unknown" counts as OLDEST, the conservative direction for
  *     a retention policy (expire, never resurrect).
  *   - **TTL retirement** (`olderThan`, C138): rows whose arrival epoch
  *     is strictly below the watermark are dropped from the merged
  *     partition. Physical only — a replayed folded epoch re-lands its
  *     expired rows beside the merged history, so serving must stay
  *     age-aware ([[readRetained]]) and the next fold re-expires the
  *     stragglers — the A36 merge-on-read contract, age edition.
  *   - **Single-pass accounting** (the r17 verdict's ask #4): the
  *     retired/expired counts ride an [[Observation]] on the SAME job
  *     that writes the merged partition — one scan of the ledger per
  *     fold, not the three the count-the-anti-join formulation paid
  *     (at crawl scale each extra action is a full shuffle of the
  *     all-time dup population).
  */
private[graft] object LedgerFold {

  /** The arrival-epoch data column the fold persists in merged
    * partitions (deliverable partitions carry it as the `__epoch`
    * partition key instead).
    */
  val ArrivalCol = "arr_epoch"

  case class FoldReport(folded: Seq[Long], into: Long,
                        retired: Long = 0L, expired: Long = 0L)

  /** Test-only failpoints for the two crash windows of the swap: after
    * the merged temp is written but BEFORE it renames in (the live
    * tree must be untouched), and after the rename but BEFORE the
    * folded partitions are deleted (duplicates, never loss). The
    * planted-crash specs throw at each and assert the readable set.
    */
  private[graft] var beforeSwapHook: () => Unit = () => ()
  private[graft] var afterSwapHook: () => Unit = () => ()

  private def fileSystem(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(dir).toUri,
      spark.sparkContext.hadoopConfiguration)

  /** Spark's own hidden-path rule (InMemoryFileIndex): a `.`-prefixed
    * component is always invisible; a `_`-prefixed one is invisible
    * unless it is partition-shaped (contains `=`). A data file only
    * counts if EVERY ancestor under the tree root is visible — the r17
    * advice's finding: a parquet leftover under a pre-rename
    * `__compact_tmp` must read as "empty tree", exactly as
    * `spark.read.parquet` will treat it.
    */
  private def visibleComponent(c: String): Boolean =
    !c.startsWith(".") && (!c.startsWith("_") || c.contains("="))

  /** Does the tree hold at least one parquet data file Spark's reader
    * would actually see (no hidden component anywhere on its path)?
    */
  private def hasDataFile(spark: SparkSession, dir: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = fileSystem(spark, dir)
    if (!fs.exists(root)) return false
    val base = root.toUri.getPath.stripSuffix("/")
    val it = fs.listFiles(root, true)
    var found = false
    while (!found && it.hasNext) {
      val p = it.next().getPath.toUri.getPath
      val rel = p.stripPrefix(base).stripPrefix("/")
      val comps = rel.split('/')
      found = comps.forall(visibleComponent) &&
        comps.last.endsWith(".parquet")
    }
    found
  }

  /** All epochs of one ledger tree as one frame over `cols`. A missing
    * tree, or one whose visible paths hold no data files yet, reads as
    * the typed empty relation — an empty crawl, not a missing table.
    * Any OTHER failure (corrupt footer, permissions, schema drift)
    * PROPAGATES: a broken ledger must never be indistinguishable from
    * an empty one (the r16 advice's finding).
    */
  def readKeys(spark: SparkSession, dir: String, schema: StructType,
               cols: Seq[String]): DataFrame =
    if (!hasDataFile(spark, dir))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(dir).select(cols.map(col): _*)

  /** [[readKeys]] restricted to rows whose ARRIVAL epoch is ≥
    * `retainFrom` — the age-aware serve the C138 TTL contract requires:
    * a replayed folded epoch re-lands its expired rows as a straggler
    * partition, and this read filters them by the partition key (the
    * merged partition filters by the persisted `arr_epoch` column), so
    * replay can never resurrect an expired row in the serve.
    * `mergeSchema` makes the merged partitions' data column visible
    * next to column-less deliverable partitions — a footer-sized cost.
    */
  def readRetained(spark: SparkSession, dir: String, schema: StructType,
                   cols: Seq[String], retainFrom: Long): DataFrame = {
    if (!hasDataFile(spark, dir))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val raw = spark.read.option("mergeSchema", "true").parquet(dir)
    val arrival =
      if (raw.columns.contains(ArrivalCol))
        coalesce(col(ArrivalCol).cast("long"), col("__epoch").cast("long"))
      else col("__epoch").cast("long")
    raw.where(arrival >= retainFrom).select(cols.map(col): _*)
  }

  /** Fold every epoch partition ≤ `upTo` — prior merged (negative)
    * partitions included — into ONE partition at a fresh reserved
    * sentinel below every existing epoch. The fold is key-DISTINCT
    * (group by `keyCols`, max arrival), which is what makes
    * crash/straggler duplicates converge instead of accreting.
    *
    * `flagRetired` (optional): adds a boolean `__retired` column to the
    * deduplicated frame (the caller owns the endpoint-matching shape);
    * flagged rows are dropped from the merged partition. `olderThan`
    * (optional): rows with arrival epoch < the watermark are dropped
    * too. Both counts are collected by an [[Observation]] riding the
    * merged partition's own write job — one ledger scan per fold.
    *
    * The merged partition is written size-targeted (the A18
    * `targetFileBytes` discipline), NOT coalesce(1). Epochs > `upTo`
    * are never read or touched (the in-flight D8 tail keeps arriving).
    */
  def fold(spark: SparkSession, dir: String, keyCols: Seq[String],
           upTo: Long,
           flagRetired: Option[DataFrame => DataFrame] = None,
           olderThan: Option[Long] = None,
           targetFileBytes: Long = 128L << 20): FoldReport = {
    import org.apache.hadoop.fs.Path
    val fs = fileSystem(spark, dir)
    if (!fs.exists(new Path(dir))) return FoldReport(Seq.empty, upTo)
    val parts = fs.listStatus(new Path(dir)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("__epoch="))
      .map(n => n.stripPrefix("__epoch=").toLong)
    val eligible = parts.filter(_ <= upTo).sorted
    val maintenance = flagRetired.isDefined || olderThan.isDefined
    // retire/TTL always rewrite, even a single already-compacted
    // partition (under a maintenance sink the no-maintenance case must
    // stay a cheap no-op)
    if (eligible.isEmpty || (eligible.size <= 1 && !maintenance))
      return FoldReport(Seq.empty, upTo)
    // the merged partition lands BELOW every existing epoch — reserved
    // space no deliverable epoch (≥ 0 by contract) can ever overwrite
    val sentinel = math.min(parts.min, 0L) - 1L
    val inputBytes = eligible.map { e =>
      fs.getContentSummary(new Path(s"$dir/__epoch=$e")).getLength
    }.sum
    val nFiles = math.max(1L,
      (inputBytes + targetFileBytes - 1) / targetFileBytes).toInt
    // arrival provenance: deliverable partitions read it off the D8
    // partition key; merged partitions off the persisted column; a
    // legacy merged partition without the column reads as its negative
    // sentinel — unknown age is OLDEST under any TTL
    val raw = spark.read.option("basePath", dir)
      .option("mergeSchema", "true")
      .parquet(eligible.map(e => s"$dir/__epoch=$e"): _*)
    val withArrival =
      if (raw.columns.contains(ArrivalCol))
        raw.withColumn(ArrivalCol,
          coalesce(col(ArrivalCol).cast("long"), col("__epoch").cast("long")))
      else raw.withColumn(ArrivalCol, col("__epoch").cast("long"))
    // key-distinct with max arrival: a straggler re-land of a folded
    // row carries the same real epoch its merged copy preserved, so
    // the fold is deterministic under crash duplicates
    val all = withArrival
      .groupBy(keyCols.map(col): _*)
      .agg(max(col(ArrivalCol)).as(ArrivalCol))
    val outCols = (keyCols :+ ArrivalCol).map(col)
    val (merged, obs) =
      if (!maintenance) (all.select(outCols: _*), None)
      else {
        val flagged0 = flagRetired.fold(
          all.withColumn("__retired", lit(false)))(f => f(all))
        val flagged = flagged0.withColumn("__expired",
          olderThan.fold(lit(false))(w => col(ArrivalCol) < w))
        val o = Observation()
        val observed = flagged.observe(o,
          coalesce(sum(when(col("__retired"), 1L).otherwise(0L)), lit(0L))
            .as("retired"),
          coalesce(sum(when(col("__expired") && !col("__retired"), 1L)
            .otherwise(0L)), lit(0L)).as("expired"))
        (observed.where(!col("__retired") && !col("__expired"))
          .select(outCols: _*), Some(o))
      }
    val tmp = s"$dir/__compact_tmp"
    fs.delete(new Path(tmp), true) // a pre-rename crash leftover: its
    // contents still live in the (undeleted) folded partitions
    merged.repartition(nFiles).write.mode("overwrite").parquet(tmp)
    val (retired, expired) = obs.fold((0L, 0L)) { o =>
      val m = o.get
      (m("retired").asInstanceOf[Long], m("expired").asInstanceOf[Long])
    }
    beforeSwapHook()
    // swap order is the crash contract: merged VISIBLE first …
    require(fs.rename(new Path(tmp), new Path(s"$dir/__epoch=$sentinel")),
      s"compaction swap failed for $dir/__epoch=$sentinel")
    afterSwapHook()
    // … then drop the folded partitions (a crash mid-loop leaves
    // duplicates, never a loss; the next key-distinct fold converges)
    eligible.foreach(e => fs.delete(new Path(s"$dir/__epoch=$e"), true))
    FoldReport(eligible, sentinel, retired, expired)
  }
}
