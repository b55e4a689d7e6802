package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.BloomDedup

/** C34's cross-corpus bloom flag as a streaming stage (D18) — the shape an
  * incremental crawl actually runs at 100 TB: yesterday's corpus is
  * summarized ONCE into a constant-size bloom (driver state, MBs per
  * billion documents at 1% fpp), and today's crawl arrives as a stream
  * whose every micro-batch is flagged by a map-only codegen'd probe.
  *
  * STATELESS by design — the bloom rides the streaming plan as one binary
  * literal, so there is no state store, no watermark, no shuffle, and
  * throughput is scan speed. Contrast D5 (exact streaming dedup), which
  * keeps per-key state and needs a watermark to bound it: the bloom gate
  * trades exactness (bounded false-positive rate, zero false negatives)
  * for O(1) state — the right trade when the reference set is yesterday's
  * billion documents rather than today's in-flight window. The two compose:
  * D5 dedups WITHIN the stream, the bloom gates AGAINST history.
  *
  * Flag semantics are IDENTICAL to batch C34 — the same
  * [[BloomDedup.flagOverlap]] code object probes the same bloom bytes, so
  * a document flows through batch or stream to the same verdict
  * (batch ≡ stream locked in EventStreamsSpec).
  */
object BloomStream {

  /** Flag each streamed row against the reference bloom: `flagCol` true
    * iff the key MIGHT be in the reference corpus (never-false-negative).
    */
  def flagOverlapStream(stream: DataFrame, key: Column, bloom: Array[Byte],
                        flagCol: String = "maybe_seen"): DataFrame =
    BloomDedup.flagOverlap(stream, key, bloom, flagCol)

  /** D16-style routed delivery: fresh rows land in the corpus directory,
    * flagged rows in the review directory, each micro-batch delivered
    * with the D8 epoch-overwrite contract — a replayed epoch recomputes
    * the identical split and overwrites both of its own partitions, so
    * at-least-once redelivery converges to exactly-once on BOTH paths
    * and a document can never land in neither or both.
    */
  def bloomGatedSink(stream: DataFrame, key: Column, bloom: Array[Byte],
                     freshDir: String, seenDir: String,
                     checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val f = BloomDedup.flagOverlap(b, key, bloom, "maybe_seen")
        EventStreams.epochIdempotentSink(
          f.where(!col("maybe_seen")).drop("maybe_seen"), id, freshDir)
        EventStreams.epochIdempotentSink(
          f.where(col("maybe_seen")).drop("maybe_seen"), id, seenDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
