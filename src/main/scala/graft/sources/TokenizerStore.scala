package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.BpeTrain.Merge

/** Versioned TOKENIZER persistence (C96) — the [[ModelStore]] discipline
  * applied to the other training-adjacent artifact the engine still
  * carried in-session: C77's learned BPE merge list. A deployed
  * tokenizer is a MODEL ARTIFACT exactly like a classifier (the
  * sentencepiece/tiktoken `.model` file contract): training produces it
  * once, every encode pass LOADS a pinned version — because two corpus
  * shards encoded under two silently different merge lists are not the
  * same tokenization, and a model trained on the mix inherits the skew.
  * Before this store existed, C80's frozen-vocabulary encode received
  * its merge list in-session (BpeTrain.scala names this store as the
  * missing side of its contract).
  *
  * State is two KB-sized tables published together through
  * [[MultiPublish.publishAll]]'s ATOMIC two-table commit (A37):
  *
  *   - `bpe_merges` (rank, lhs, rhs): the learned merges IN TRAINING
  *     ORDER. Order is load-bearing twice over — merges apply
  *     sequentially, and a rank hole or swap changes every later
  *     segmentation;
  *   - `bpe_meta` (n_merges, trained_at_epoch): the declared depth and
  *     the training watermark, so a serving session can tell WHICH
  *     training state it encodes with.
  *
  * Merges are plain strings over the corpus alphabet (never the
  * delimiter/pair control characters — the trainer excludes them at the
  * word table), so they round-trip parquet bit-exactly and
  * encode-from-load ≡ encode-from-train by construction: the c96 oracle
  * reads the trajectory's own state at each published depth and the
  * loaded artifact must reproduce it.
  *
  * Publish audits (the ModelStore/AnnIndexStore dense rule — a torn
  * table fails the PUBLISH, not a query): ranks dense 1..n_merges with
  * no duplicates, no empty/control-character sides, meta a single row
  * agreeing with the merges table's depth.
  *
  * Version semantics are the C85 blue/green contract: each publish
  * advances both tables together; [[loadTokenizerAt]] pins a historical
  * version (encode a held-out shard under the PREVIOUS tokenizer
  * through a rollover; A/B two vocabulary depths), [[loadTokenizer]]
  * follows the committed pointer.
  *
  * At 100 TB: the artifact is KBs (n_merges rows + 1 meta row) —
  * publish and load are metadata-cost; corpus-scale cost lives in the
  * caller's encode join, unchanged.
  */
object TokenizerStore {

  val MergesTable = "bpe_merges"
  val MetaTable = "bpe_meta"

  /** A loaded tokenizer: merges in training order + the publisher's
    * training watermark.
    */
  final case class LoadedTokenizer(merges: Seq[Merge], trainedAtEpoch: Long)

  // the trainer's OWN control characters (not re-declared copies — the
  // audit must keep tracking the trainer if its delimiters ever
  // change; r13 advice)
  private val D = graft.operators.BpeTrain.D
  private val P = graft.operators.BpeTrain.P

  /** The merges table: (rank, lhs, rhs), rank 1-based in training order. */
  def mergesFrame(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank.toLong, m.left, m.right))
      .toDF("rank", "lhs", "rhs")
  }

  /** The meta table: (n_merges, trained_at_epoch), one row. */
  def metaFrame(spark: SparkSession, nMerges: Int,
                trainedAtEpoch: Long): DataFrame = {
    import spark.implicits._
    Seq((nMerges.toLong, trainedAtEpoch))
      .toDF("n_merges", "trained_at_epoch")
  }

  /** Publish one trained merge list (both tables, atomically) under
    * `root`. `trainedAtEpoch` is the training watermark (e.g. the depth
    * or the last folded corpus epoch).
    */
  def publishTokenizer(spark: SparkSession, root: String,
                       merges: Seq[Merge], trainedAtEpoch: Long,
                       batchId: Option[Long] = None)
      : MultiPublish.MultiReport = {
    require(merges.nonEmpty, "publishTokenizer: empty merge list")
    require(merges.map(_.rank) == (1 to merges.size),
      s"merge ranks not dense 1..${merges.size}: ${merges.map(_.rank)}")
    publishFrames(spark, root, mergesFrame(spark, merges),
      metaFrame(spark, merges.size, trainedAtEpoch), merges.size, batchId)
  }

  /** INTERNAL (TokenizerStoreSpec + the c96 refusal probe): publish
    * EXPLICIT frames under the tokenizer audits — the path a torn
    * writer (a rank hole, a duplicated rank, a corrupted side) takes,
    * and where it must be REFUSED: committed=false, failures named,
    * pointer and every reader's view untouched.
    */
  private[graft] def publishFrames(spark: SparkSession, root: String,
                                   mergesDf: DataFrame, metaDf: DataFrame,
                                   nMerges: Int,
                                   batchId: Option[Long] = None)
      : MultiPublish.MultiReport = {
    // ranks dense 1..n with no duplicates — merges apply sequentially,
    // so a hole or swap silently changes every later segmentation
    val rankAudit: Wap.Audit = (s"rank_dense(1..$nMerges)", df => {
      val r = df.agg(count(lit(1)).as("n"),
        countDistinct(col("rank")).as("nd"),
        min(col("rank")).as("lo"), max(col("rank")).as("hi")).collect().head
      if (r.getLong(0) != nMerges.toLong || r.getLong(1) != nMerges.toLong ||
          r.getLong(2) != 1L || r.getLong(3) != nMerges.toLong)
        Some(s"ranks not dense 1..$nMerges: n=${r.getLong(0)}, " +
          s"distinct=${r.getLong(1)}, min=${r.getLong(2)}, " +
          s"max=${r.getLong(3)}")
      else None
    })
    // a merge side containing the trainer's control characters (or
    // empty) can never have been learned — it would corrupt every
    // delimited segmentation it touches
    val sideAudit: Wap.Audit = ("sides_wellformed", df => {
      val bad = df.where(length(col("lhs")) === 0 ||
        length(col("rhs")) === 0 ||
        col("lhs").contains(D) || col("lhs").contains(P) ||
        col("rhs").contains(D) || col("rhs").contains(P)).count()
      if (bad > 0) Some(s"$bad merges with empty/control-char sides")
      else None
    })
    val metaAudit: Wap.Audit = ("meta_depth", df => {
      val rows = df.select(col("n_merges")).collect()
      if (rows.length != 1)
        Some(s"meta must be exactly one row, got ${rows.length}")
      else if (rows.head.getLong(0) != nMerges.toLong)
        Some(s"meta n_merges=${rows.head.getLong(0)}, staged $nMerges")
      else None
    })
    MultiPublish.publishAll(spark, Map(
      MergesTable -> ((mergesDf, Seq(Wap.minRows(1), rankAudit, sideAudit))),
      MetaTable -> ((metaDf, Seq(Wap.minRows(1), metaAudit)))),
      root, batchId)
  }

  /** The COMMITTED tokenizer version — both tables advance together
    * through the A37 atomic commit, so a split pointer is structural
    * corruption and fails loudly.
    */
  def committedTokenizerVersion(spark: SparkSession, root: String): Int = {
    val vs = MultiPublish.commitVersions(spark, root)
    val vm = vs.getOrElse(MergesTable, throw new IllegalStateException(
      s"no committed $MergesTable under $root"))
    val vt = vs.getOrElse(MetaTable, throw new IllegalStateException(
      s"no committed $MetaTable under $root"))
    require(vm == vt, s"torn tokenizer pointer: merges v$vm vs meta v$vt")
    vm
  }

  /** Load the COMMITTED tokenizer — what an encode session does instead
    * of retraining.
    */
  def loadTokenizer(spark: SparkSession, root: String): LoadedTokenizer =
    loadTokenizerAt(spark, root, committedTokenizerVersion(spark, root))

  /** Load an EXPLICIT tokenizer version (time-travel pin — encode under
    * the previous vocabulary through a rollover, or A/B two depths).
    * Loud on structural holes: a missing or duplicated rank would
    * silently change every later segmentation.
    */
  def loadTokenizerAt(spark: SparkSession, root: String,
                      version: Int): LoadedTokenizer = {
    val metaRows = MultiPublish.readVersion(spark, root, MetaTable, version)
      .select("n_merges", "trained_at_epoch").collect()
    require(metaRows.length == 1,
      s"$MetaTable v$version must be one row, got ${metaRows.length}")
    val nMerges = metaRows.head.getLong(0).toInt
    val mergeRows = MultiPublish
      .readVersion(spark, root, MergesTable, version)
      .select("rank", "lhs", "rhs").collect()
      .map(r => Merge(r.getLong(0).toInt, r.getString(1), r.getString(2)))
      .sortBy(_.rank).toSeq
    require(mergeRows.map(_.rank) == (1 to nMerges),
      s"$MergesTable v$version ranks not dense 1..$nMerges: " +
        s"${mergeRows.map(_.rank).mkString(",")}")
    LoadedTokenizer(mergeRows, metaRows.head.getLong(1))
  }
}
