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
    * epoch overwrites its own partition). Deliverable epochs are
    * non-negative BY CONTRACT — the negative range is reserved for
    * [[compactEpochs]]' merged partitions, which is what makes a
    * post-compaction redelivery unable to overwrite folded history
    * (the r16 advice's collision finding).
    */
  def appendPairsEpoch(pairs: DataFrame, root: String, modality: String,
                       epoch: Long): Unit = {
    require(Modalities.contains(modality),
      s"unknown modality '$modality' (expected ${Modalities.mkString("/")})")
    require(epoch >= 0,
      s"epoch $epoch: negative epochs are reserved for compaction folds")
    graft.streaming.EventStreams.epochIdempotentSink(
      pairs.select(
        least(col("id_a"), col("id_b")).cast("long").as("id_a"),
        greatest(col("id_a"), col("id_b")).cast("long").as("id_b")),
      epoch, s"$root/$modality")
  }

  /** All ledger epochs for one modality as one undirected pair frame.
    * A missing tree, or a tree whose VISIBLE paths hold no data files
    * yet (every written epoch was empty; hidden leftovers like a
    * pre-rename `__compact_tmp` don't count — the r17 advice), reads
    * as the typed empty relation — an empty crawl has no dup pairs,
    * not a missing table. Any OTHER read failure (corrupt footer,
    * permissions, schema drift) PROPAGATES: the r16 advice's finding
    * was that a blanket Try(...).getOrElse(empty) made a broken ledger
    * indistinguishable from an empty crawl and silently shipped
    * all-false verdicts.
    */
  def readPairs(spark: SparkSession, root: String,
                modality: String): DataFrame =
    LedgerFold.readKeys(spark, s"$root/$modality", pairSchema,
      Seq("id_a", "id_b"))

  /** [[readPairs]] restricted to pairs whose ARRIVAL epoch is ≥
    * `retainFrom` — the age-aware serve of the C138 TTL contract:
    * deliverable partitions filter on the D8 partition key, the merged
    * partition on the `arr_epoch` column [[compactEpochs]] persists,
    * so a replayed folded epoch can never resurrect an expired pair
    * in the serve (the next fold re-expires the straggler physically).
    */
  def readPairsRetained(spark: SparkSession, root: String,
                        modality: String, retainFrom: Long): DataFrame =
    LedgerFold.readRetained(spark, s"$root/$modality", pairSchema,
      Seq("id_a", "id_b"), retainFrom)

  /** Compaction accounting: the epoch partitions folded away, the
    * (reserved, negative) partition they were folded into, how many
    * stored pair rows the optional retirement flag removed, and how
    * many the optional age watermark expired.
    */
  case class CompactReport(modality: String, folded: Seq[Long],
                           into: Long, retired: Long = 0L,
                           expired: Long = 0L)

  /** Fold every epoch partition ≤ `upTo` — prior merged partitions
    * (negative epochs) included — into ONE partition at a fresh
    * RESERVED epoch below every existing one (C135 — the A18
    * small-file discipline on the ledger: a long crawl accrues one
    * partition per epoch, each result-sized or empty; at 10k epochs
    * the ledger read pays 10k directory listings for KBs of pairs).
    *
    * Crash-safe ORDER (the r16 advice's two high findings): the merged
    * partition is written to an underscore-hidden temp, RENAMED INTO
    * THE LIVE TREE FIRST, and only then are the folded partitions
    * deleted — a crash before the rename leaves the live tree
    * untouched; a crash after it leaves transient DUPLICATES (merged +
    * not-yet-deleted folded partitions), which every ledger consumer
    * (doc/pair-distinct) absorbs and the next fold — distinct by
    * construction — retires. At no instant is the only copy of a pair
    * under a path partition discovery ignores. The merged partition's
    * RESERVED negative epoch can never collide with a deliverable
    * epoch ([[appendPairsEpoch]] requires epoch ≥ 0), so a
    * post-compaction D8 redelivery of any real epoch re-lands BESIDE
    * the merged history and can never overwrite it.
    *
    * The fold is DISTINCT: epochs append each undirected pair once (a
    * pair is decided at its later endpoint's arrival), so on a clean
    * ledger distinct == the stored multiset, and it is exactly what
    * makes crash/straggler duplicates converge instead of accreting.
    *
    * `retire` (optional): doc/media endpoint ids whose documents were
    * deleted (A33/A36 — the C136 governance hook); pairs with EITHER
    * endpoint in the set are dropped from the merged partition, so
    * the ledger SHRINKS when the corpus does. Physical retirement
    * only — replay of a folded epoch re-lands retired pairs, so
    * serving must stay tombstone-aware (the A36 merge-on-read
    * contract); the next compaction retires the stragglers again.
    *
    * `olderThan` (optional, C138): an age watermark — pairs whose
    * ARRIVAL epoch (preserved across folds as the merged partition's
    * `arr_epoch` column) is strictly below it are dropped, so a long
    * crawl's ledger stops growing with the ALL-TIME dup population
    * once old epochs stop mattering for serving. Physical only, same
    * replay contract as `retire`: [[readPairsRetained]] keeps the
    * serve age-aware.
    *
    * The merged partition is written size-targeted (the A18
    * `targetFileBytes` discipline), NOT coalesce(1): at crawl scale
    * the all-time dup-pair relation is the dup population — many GB —
    * and one task/one file would bottleneck exactly the maintenance
    * pass that exists to keep reads cheap. Retired/expired accounting
    * rides an Observation on the merged write's own job — ONE ledger
    * scan per fold (the r17 verdict's ask #4).
    *
    * Epochs > `upTo` are never read or touched (the in-flight tail
    * keeps arriving under D8). The swap machinery (crash windows,
    * reserved sentinel, size targeting) is [[LedgerFold.fold]] — the
    * one audited implementation every ledger tree shares.
    */
  def compactEpochs(spark: SparkSession, root: String, modality: String,
                    upTo: Long, retire: Option[DataFrame] = None,
                    olderThan: Option[Long] = None,
                    targetFileBytes: Long = 128L << 20): CompactReport = {
    require(Modalities.contains(modality),
      s"unknown modality '$modality'")
    // endpoint retirement: a pair goes when EITHER endpoint is resolved
    val flag = retire.map { ids =>
      val r = ids.select(ids.columns.head).toDF("__rid").distinct()
      (df: DataFrame) => df
        .join(r.select(col("__rid").as("__ra_id")),
          col("id_a") === col("__ra_id"), "left")
        .join(r.select(col("__rid").as("__rb_id")),
          col("id_b") === col("__rb_id"), "left")
        .withColumn("__retired",
          col("__ra_id").isNotNull || col("__rb_id").isNotNull)
        .drop("__ra_id", "__rb_id")
    }
    val rep = LedgerFold.fold(spark, s"$root/$modality",
      Seq("id_a", "id_b"), upTo, flag, olderThan, targetFileBytes)
    CompactReport(modality, rep.folded, rep.into, rep.retired,
      rep.expired)
  }
}
