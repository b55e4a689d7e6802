package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.ImageDedup
import graft.sources.ImageCodeStore

/** D41: streaming IMAGE-CODE ingest — arriving image epochs decoded
  * and blockhash-coded as they land, appended to the C104 stored-code
  * table: the streaming delivery of the image store's incremental
  * maintenance, the way a live crawl keeps its perceptual-dedup
  * serving table current while paying decode only on the delta —
  * exactly D35's relationship to C82, on the image surface.
  *
  * Exactly-once under at-least-once delivery comes from composition,
  * not new machinery: each micro-batch is one mapPartitions-batched
  * [[ImageDedup.blockhashCodes]] pass (pixels never leave the
  * executor; ~36 bytes out per image), landed by
  * [[ImageCodeStore.appendCodesEpoch]] under the D8 epoch-partition
  * rule — decode is deterministic, so a replayed batch overwrites its
  * own partition with bit-identical rows and the code table converges
  * to exactly one row per image. Serving
  * ([[ImageDedup.perceptualPairs]] over `readCodes`) reads whatever
  * epochs have landed; stream ≡ batch-decode is spec-locked and the
  * batch twin (c104) carries the oracle row — the d35→c82 key-sharing
  * pattern.
  *
  * At 100 TB: per-epoch work is delta-sized decode (the one cost that
  * must never be per-query), driver state is the checkpoint only, and
  * the decode stage is stateless map-only — throughput scales with
  * the source's partition fan-out.
  */
object ImageCodesStream {

  /** @param specVersion the code-spec version the codes are produced
    *        under — keys the stored-code table (a spec change is a new
    *        version with its own key space, the C85 rule). May sit
    *        ABOVE the committed pointer: a C117 rollover backfills the
    *        NEXT version's key space through this sink while the old
    *        one keeps serving.
    * @param grid the block-grid side the target spec version declares
    *        — the caller reads it from [[ImageCodeStore.loadSpecAt]];
    *        codes under a different grid would silently never pair
    */
  def ingestSink(stream: DataFrame, root: String, checkpoint: String,
                 specVersion: Int = 1, grid: Int = 8): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        ImageCodeStore.appendCodesEpoch(
          ImageDedup.blockhashCodes(b.sparkSession, b, grid = grid), root,
          specVersion, id)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
