package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.sources.DeletionVectors

/** D37: streaming tombstone ingest — arriving delete-key events (A33's
  * GDPR right-to-be-forgotten requests, delivered continuously) landed
  * as A36 merge-on-read deletion vectors against a stored table
  * directory, C91's codes table being the motivating target: a delete
  * request propagates to ANN serving within one micro-batch, with no
  * re-encode, no republish, and no table rewrite.
  *
  * Exactly-once under at-least-once delivery is C91's composition rule
  * one level up: each micro-batch marks under the batch-id
  * `ep<epochId>`, and [[DeletionVectors.markDeleted]] OVERWRITES its own
  * sidecar per batch-id — a replayed batch rewrites the identical mark
  * set (marking is deterministic), so the sidecar state converges and
  * serving through `readCodesWithDeletes` is unchanged. Spec-locked
  * stream ≡ batch; the batch twin (c91) carries the oracle row — the
  * d18→c34 / d35→c82 key-sharing pattern.
  *
  * Scale shape: delete events are TARGETED key lists by contract
  * (markDeleted refuses corpus-sized sets — that is A33's filtered
  * rewrite), so the per-batch driver collect is bounded by
  * `maxTargets` and loud past it; the mark itself is a zone-map scan
  * plus one sidecar write, and the serving-side cost stays the
  * file-count-sized broadcast anti-join.
  */
object TombstoneStream {

  /** @param eventKeyCol the delete-key column in the event stream
    * @param tableKeyCol the key column in the target table's files
    *        (`neighbor_id` for the C91 codes directory)
    */
  def markSink(stream: DataFrame, eventKeyCol: String, tableDir: String,
               tableKeyCol: String, checkpoint: String,
               maxTargets: Int = 100000): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val keys = b.select(col(eventKeyCol).cast("long").as("k"))
          .where(col("k").isNotNull).distinct()
          .limit(maxTargets + 1) // bounded collect; loud just past the cap
          .collect().map(_.getLong(0)).toIndexedSeq
        require(keys.size <= maxTargets,
          s"delete batch $id exceeds $maxTargets targeted keys — " +
            "corpus-sized deletes are A33's filtered rewrite, not a DV mark")
        if (keys.nonEmpty) {
          DeletionVectors.markDeleted(b.sparkSession, tableDir,
            tableKeyCol, keys, s"ep$id", maxTargets)
          ()
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
