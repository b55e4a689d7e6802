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
}
