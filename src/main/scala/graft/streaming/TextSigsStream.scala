package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.Dedup
import graft.sources.TextSigStore

/** D45: streaming TEXT-SIGNATURE ingest — arriving document epochs
  * tokenized and minhashed as they land, appended to the C119 stored
  * signature table: the streaming delivery of the text store's
  * incremental maintenance, the way a live crawl keeps its dedup
  * serving table current while paying the MinHashSigExpr pass only on
  * the delta — exactly D41's relationship to C104 and D42's to C115,
  * on the text surface.
  *
  * Exactly-once under at-least-once delivery comes from composition,
  * not new machinery: each micro-batch is one codegen'd
  * [[Dedup.minhashSigRows]] pass (raw text never leaves the stage;
  * 8·k bytes out per doc), landed by
  * [[TextSigStore.appendSigsEpoch]] under the D8 epoch-partition rule
  * — normalize/tokenize/minhash are deterministic, so a replayed batch
  * overwrites its own partition with bit-identical rows and the
  * signature table converges to exactly one row per doc. Serving
  * ([[Dedup.minhashPairsFromSigs]] over `readSigs`) reads whatever
  * epochs have landed; stream ≡ batch-compute is spec-locked and the
  * batch twin (c119) carries the oracle row — the d41→c104 key-sharing
  * pattern.
  *
  * At 100 TB: per-epoch work is delta-sized tokenization (the one cost
  * that must never be per-query), driver state is the checkpoint only,
  * and the signature stage is stateless map-only — throughput scales
  * with the source's partition fan-out.
  */
object TextSigsStream {

  /** @param specVersion the committed signature-spec version the sigs
    *        are produced under — keys the stored table (a spec change
    *        is a new version with its own key space, the C85 rule)
    * @param k the signature length the pinned spec version declares —
    *        the caller reads it from [[TextSigStore.loadSpecAt]];
    *        signatures of a different k would silently never band
    */
  def ingestSink(stream: DataFrame, root: String, checkpoint: String,
                 textCol: String = "text", idCol: String = "doc_id",
                 specVersion: Int = 1, k: Int = 64): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        TextSigStore.appendSigsEpoch(
          Dedup.minhashSigRows(b, textCol, idCol, k), root,
          specVersion, id)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
