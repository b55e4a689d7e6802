package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** D49: the incremental PAIR LEDGER — the documented next step of the
  * D48 verdict maintenance (the r15 verdict's ask #3): instead of
  * re-running the corpus×corpus banded joins on every crawl epoch, each
  * epoch appends only its DELTA pairs — the pairs with at least one
  * endpoint among the epoch's arrivals (delta×corpus-so-far cross pairs
  * plus within-delta pairs, the C121/C128/C129 incremental shapes) —
  * under the D8 epoch-partition rule, one subtree per modality. The
  * full dup-pair relation so far is then the plain union of ledger
  * epochs: a verdict rebuild reads result-sized pair rows, with NO
  * banding, NO census, NO signature/code scan anywhere in its plan.
  *
  * Exactly-once: a redelivered epoch recomputes the same delta pairs
  * (the ref side excludes the delta's own keys, so first delivery and
  * replay see identical inputs) and overwrites its own `__epoch`
  * partition bit-identically — the D8 rule verbatim.
  *
  * Pairs land NORMALIZED (id_a < id_b), so cross pairs (ref, inc) and
  * within-delta pairs share one undirected key space and an arrival
  * epoch never flips a pair's identity.
  *
  * At 100 TB: a crawl epoch's ledger write is result-sized (pairs
  * involving the delta); the banded candidate work per epoch is
  * delta×corpus — the stored-signature serving cost — instead of the
  * corpus×corpus recompute the non-ledger D48 fold pays; and verdict
  * serving reads pair rows proportional to the DUP population, not the
  * corpus.
  */
object PairLedger {

  val Modalities: Seq[String] = Seq("text", "image", "audio")

  private val pairSchema = StructType(Seq(
    StructField("id_a", LongType), StructField("id_b", LongType)))

  /** Append one epoch's delta pairs for one modality (D8: a replayed
    * epoch overwrites its own partition).
    */
  def appendPairsEpoch(pairs: DataFrame, root: String, modality: String,
                       epoch: Long): Unit = {
    require(Modalities.contains(modality),
      s"unknown modality '$modality' (expected ${Modalities.mkString("/")})")
    graft.streaming.EventStreams.epochIdempotentSink(
      pairs.select(
        least(col("id_a"), col("id_b")).cast("long").as("id_a"),
        greatest(col("id_a"), col("id_b")).cast("long").as("id_b")),
      epoch, s"$root/$modality")
  }

  /** All ledger epochs for one modality as one undirected pair frame.
    * A modality no epoch has written yet (or whose epochs were all
    * empty) reads as the typed empty relation — an empty crawl has no
    * dup pairs, not a missing table.
    */
  def readPairs(spark: SparkSession, root: String,
                modality: String): DataFrame =
    scala.util.Try(
        spark.read.parquet(s"$root/$modality").select("id_a", "id_b"))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pairSchema))

  /** Compaction accounting: the epochs folded away and the partition
    * they were folded into.
    */
  case class CompactReport(modality: String, folded: Seq[Long],
                           into: Long)

  /** Fold every epoch partition ≤ `upTo` into ONE partition at
    * `__epoch=upTo` (C135 — the A18 small-file discipline on the
    * ledger: a long crawl accrues one partition per epoch, each
    * result-sized or empty; at 10k epochs the ledger read pays 10k
    * directory listings for KBs of pairs). The fold is
    * WRITE-TEMP-THEN-SWAP: the merged partition lands beside the live
    * tree, then the folded partitions are dropped and the merged one
    * renamed in — a crash before the swap leaves the live tree
    * untouched. Epochs > `upTo` are never read or touched (the
    * in-flight tail keeps arriving under D8).
    *
    * A post-compaction REPLAY of a folded epoch re-lands its own
    * partition beside the merged one; every ledger consumer is
    * doc/pair-distinct downstream, so verdicts are UNCHANGED, and the
    * next compaction folds the straggler away again — replay
    * converges, it never corrupts.
    */
  def compactEpochs(spark: SparkSession, root: String, modality: String,
                    upTo: Long): CompactReport = {
    require(Modalities.contains(modality),
      s"unknown modality '$modality'")
    import org.apache.hadoop.fs.Path
    val dir = s"$root/$modality"
    val fs = org.apache.hadoop.fs.FileSystem.get(new Path(dir).toUri,
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir)))
      return CompactReport(modality, Seq.empty, upTo)
    val eligible = fs.listStatus(new Path(dir)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("__epoch="))
      .map(n => n.stripPrefix("__epoch=").toLong)
      .filter(_ <= upTo)
      .sorted
    if (eligible.size <= 1)
      return CompactReport(modality, Seq.empty, upTo)
    val merged = spark.read.parquet(
        eligible.map(e => s"$dir/__epoch=$e"): _*)
      .select("id_a", "id_b")
      .coalesce(1)
    val tmp = s"$dir/__compact_tmp"
    fs.delete(new Path(tmp), true)
    merged.write.mode("overwrite").parquet(tmp)
    eligible.foreach(e => fs.delete(new Path(s"$dir/__epoch=$e"), true))
    require(fs.rename(new Path(tmp), new Path(s"$dir/__epoch=$upTo")),
      s"compaction swap failed for $dir/__epoch=$upTo")
    CompactReport(modality, eligible.filter(_ != upTo), upTo)
  }
}
