package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.GraftColumnBridge.{column => c, expression => x}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Cross-corpus membership flagging via a bloom filter — the Dolma/CCNet
  * "have we seen this document before" primitive for incremental corpus
  * builds: yesterday's crawl is summarized into ONE constant-size bit
  * array, and today's crawl is flagged against it with a map-only scan.
  * The alternatives at 100 TB are a full anti-join of two corpora (a
  * corpus-sized shuffle per increment) or keeping every historical
  * fingerprint hot; the bloom trades them for a sketch that is MBs per
  * BILLION documents (~14.4 bits/key at 1% fpp) with one-sided error:
  * NO false negatives ever — a true overlap is always flagged — and
  * false positives at a calibrated, bounded rate.
  *
  * Built on Spark's own mergeable `BloomFilterAggregate` (the runtime-
  * filter machinery of SPARK-32268, surfaced here as a first-class
  * operator): partials are built map-side per partition and bit-OR
  * merged, so the build is one pass, shuffle-free except the final
  * KB-MB merge. The probe side rides the plan as one binary literal —
  * the same constant-reference-object contract as the k-means
  * centroids and BPE merge ranks — and `might_contain` is a codegen'd
  * double-hash over it: no join, no shuffle, no per-row allocation.
  *
  * Keys are `xxhash64` of the content column on BOTH sides (the 64-bit
  * pre-hash the bloom expects); a cross-engine-checkable fingerprint
  * (md5) can be layered underneath when the flag itself must be
  * oracle-replicable — the c34 gate instead checks the CONTRACT: the
  * exact overlap is computed independently and the no-false-negative
  * equality + fp-rate bound ride the result row.
  */
object BloomDedup {

  /** Bits for `expectedItems` at `fpp` (standard -n·ln p / ln²2). */
  def bitsFor(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    math.ceil(-expectedItems * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong.max(64L)
  }

  /** One-pass bloom build over `key` (any type; xxhash64'd internally).
    * The returned sketch is constant-size driver state (~`bits/8`
    * bytes) — store it beside the corpus snapshot and reuse it for
    * every future increment.
    */
  def bloomOf(reference: DataFrame, key: Column, expectedItems: Long,
              fpp: Double = 0.01): Array[Byte] = {
    val agg = new BloomFilterAggregate(x(xxhash64(key.cast("string"))),
      Literal(expectedItems), Literal(bitsFor(expectedItems, fpp)))
      .toAggregateExpression()
    reference.select(c(agg).as("bf")).head.getAs[Array[Byte]](0)
  }

  /** Flag each probe row: `flagCol` is true iff `key` MIGHT be in the
    * reference (never-false-negative; false positives at the build's
    * fpp). Map-only — compose with a filter to drop, or keep the flag
    * for downstream exact verification of just the flagged slice.
    */
  def flagOverlap(probe: DataFrame, key: Column, bloom: Array[Byte],
                  flagCol: String = "maybe_seen"): DataFrame =
    probe.withColumn(flagCol, c(BloomFilterMightContain(
      Literal(bloom, BinaryType), x(xxhash64(key.cast("string"))))))
}
