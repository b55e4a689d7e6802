package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.Audio
import graft.sources.AudioCodeStore

/** D42: streaming AUDIO-CODE ingest — arriving audio epochs decoded
  * and landmark-coded as they land, appended to the C115 stored-code
  * table: the streaming delivery of the audio store's incremental
  * maintenance, the way a live crawl keeps its fingerprint serving
  * table current while paying the WAV-decode + WHT chain only on the
  * delta — exactly D41's relationship to C104, on the audio surface.
  *
  * Exactly-once under at-least-once delivery comes from composition,
  * not new machinery: each micro-batch is one mapPartitions
  * [[Audio.chainedLandmarkRows]] pass (PCM never leaves the executor;
  * ~24 bytes out per landmark), landed by
  * [[AudioCodeStore.appendCodesEpoch]] under the D8 epoch-partition
  * rule — decode + WHT argmax are deterministic, so a replayed batch
  * overwrites its own partition with bit-identical rows and the code
  * table converges to exactly one meta row per clip. Serving
  * ([[Audio.chainedPairsFromCodes]] over `readCodes`) reads whatever
  * epochs have landed; stream ≡ batch-decode is spec-locked and the
  * batch twin (c115) carries the oracle row — the d41→c104
  * key-sharing pattern.
  *
  * At 100 TB: per-epoch work is delta-sized decode (the one cost that
  * must never be per-query), driver state is the checkpoint only, and
  * the decode stage is stateless map-only — throughput scales with
  * the source's partition fan-out.
  */
object AudioCodesStream {

  /** @param specVersion the committed code-spec version the landmarks
    *        are produced under — keys the stored-code table (a spec
    *        change is a new version with its own key space, the C85
    *        rule)
    * @param frame the WHT frame size the pinned spec version declares
    *        — the caller reads it from
    *        [[AudioCodeStore.loadSpecAt]]; codes under a different
    *        grid would silently never pair
    */
  def ingestSink(stream: DataFrame, root: String, checkpoint: String,
                 specVersion: Int = 1, frame: Int = 128): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        AudioCodeStore.appendCodesEpoch(
          Audio.chainedLandmarkRows(b.sparkSession, b, frame), root,
          specVersion, id)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
