package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.{L2Cells, PqIndex, Similarity}
import graft.sources.AnnIndexStore

/** D35: streaming ANN ingest — arriving embedding epochs PQ-encoded
  * against a FROZEN index version (the C81 artifact) and appended to
  * the stored-code table as they land: the streaming delivery of C82's
  * incremental maintenance, the way a live corpus keeps its serving
  * index current without ever re-encoding history.
  *
  * Exactly-once under at-least-once delivery comes from composition,
  * not new machinery: each micro-batch is one map-only
  * [[Similarity.encodeCodes]] pass (the index rides the plan as
  * codegen reference objects — KBs, no join), landed by
  * [[AnnIndexStore.appendCodesEpoch]] under the D8 epoch-partition
  * rule — a replayed batch overwrites its own partition with
  * bit-identical rows (encode is deterministic), so the code table
  * converges to exactly one row per vector. Serving
  * ([[Similarity.ivfpqTopKFromCodes]]) reads whatever epochs have
  * landed — the stream ≡ batch-encode equality is spec-locked, and the
  * batch twin (c82) carries the oracle row, the d18→c34 key-sharing
  * pattern.
  *
  * At 100 TB: per-epoch work is delta-sized, driver state is the
  * checkpoint only (the index objects are immutable), and the encode
  * stage is stateless map-only — throughput scales with the source's
  * partition fan-out.
  */
object CodesStream {

  /** @param indexVersion the frozen index version the codes are encoded
    *        against — keys the stored-code table (C85's blue/green
    *        rule: codes are meaningless against any other codebooks)
    */
  def ingestSink(stream: DataFrame, idCol: String, vecCol: String,
                 cells: L2Cells, pq: PqIndex, root: String,
                 checkpoint: String, indexVersion: Int = 1): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        AnnIndexStore.appendCodesEpoch(
          Similarity.encodeCodes(b, idCol, vecCol, cells, pq), root,
          indexVersion, id)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
