package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.Drift

/** D24: streaming corpus-drift gate — C56's distribution check run as
  * each ingest micro-batch ARRIVES instead of between snapshots: every
  * epoch's stratum token distribution is compared against a FIXED
  * baseline and the full flagged report (vanished strata included — the
  * C56 contract) lands per epoch. This is the early-warning form: a
  * crawler that silently loses a source mid-run flags on the epoch it
  * happens, not at the next snapshot diff.
  *
  * Scale shape: the per-epoch work is C56's — one map-combined agg over
  * the batch, a stratum-sized join against the baseline side (pinned in
  * cache so its re-agg never re-reads the lake), a dim-sized window.
  * Delivery is
  * exactly-once per epoch via the D8 idempotent-partition rule: a
  * replayed epoch overwrites its own `__epoch` partition bit-identically.
  */
object DriftStream {

  /** Batch twin: the report [[driftGateSink]] writes for one epoch. */
  def driftEpoch(baseline: DataFrame, batch: DataFrame, strataCol: String,
                 tokens: Column, driftPpmLimit: Long): DataFrame =
    Drift.corpusDrift(baseline, batch, strataCol, tokens, driftPpmLimit)

  def driftGateSink(stream: DataFrame, baseline: DataFrame,
                    strataCol: String, tokens: Column,
                    driftPpmLimit: Long, path: String,
                    checkpoint: String): StreamingQuery = {
    // the baseline side is identical every epoch: pin it in the cache so
    // each epoch's re-aggregation scans memory, never the lake
    val baseCached = baseline.persist()
    baseCached.count()
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        EventStreams.epochIdempotentSink(
          driftEpoch(baseCached, b, strataCol, tokens, driftPpmLimit),
          id, path)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
