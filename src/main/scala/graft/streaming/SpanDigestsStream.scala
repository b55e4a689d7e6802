package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.Dedup
import graft.sources.SpanStore

/** D47: streaming SPAN-DIGEST ingest — arriving document epochs
  * digested at every ladder width as they land, appended to the C125
  * stored-digest tables: the streaming delivery of the span store's
  * incremental maintenance, the way a live crawl keeps its span-dedup
  * serving tables current while paying the tokenize+digest passes —
  * the measured majority of the c76 100x profile — only on the delta.
  * Exactly D41/D42/D45's relationship to their stores, on the
  * sub-document surface.
  *
  * Exactly-once under at-least-once delivery comes from composition:
  * each micro-batch runs one codegen'd [[Dedup.spanDigestRows]] pass
  * per width (map-only posexplode; text never leaves the stage) landed
  * by [[SpanStore.appendDigestsEpoch]] under the D8 epoch-partition
  * rule — tokenize and md5 are deterministic, so a replayed batch
  * overwrites its own (version, width, epoch) partitions with
  * bit-identical rows. Serving
  * ([[Dedup.duplicatedSpansFromDigests]] over `readDigests`) reads
  * whatever epochs have landed; stream ≡ batch-compute is spec-locked
  * and the batch twin (c125) carries the oracle row.
  *
  * At 100 TB: per-epoch work is delta-sized digesting × the ladder
  * depth (k token-linear passes — the multiScaleSpans cost model),
  * driver state is the checkpoint only, and the digest stage is
  * stateless map-only.
  */
object SpanDigestsStream {

  /** @param specVersion the committed digest-spec version — keys the
    *        stored tables (a ladder change is a new version, C85 rule)
    * @param widths the ladder the pinned spec version declares — the
    *        caller reads it from [[SpanStore.loadSpecAt]]
    */
  def ingestSink(stream: DataFrame, root: String, checkpoint: String,
                 textCol: String = "text", idCol: String = "doc_id",
                 specVersion: Int = 1,
                 widths: Seq[Int] = Seq(8, 16, 32)): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        widths.foreach { w =>
          SpanStore.appendDigestsEpoch(
            Dedup.spanDigestRows(b, textCol, idCol, w), root,
            specVersion, w, id)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
