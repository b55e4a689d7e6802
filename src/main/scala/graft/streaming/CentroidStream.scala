package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.Clustering.IntCentroidState

/** D27 streaming delivery: the serving index's centroids maintained as
  * embedding epochs ARRIVE — each micro-batch assigns against the
  * centroids as of its start (the mini-batch rule), folds its sums into
  * the [[IntCentroidState]] (driver state, k·dim longs — the D12 sketch
  * layout), and lands its per-cell report under the D8 idempotent-
  * partition rule; a redelivered epoch returns the remembered report
  * and leaves the state untouched (exactly-once absorption). The d27
  * gate oracles the identical fold; the spec locks stream ≡ fold.
  */
object CentroidStream {

  def maintenanceSink(stream: DataFrame, state: IntCentroidState,
                      codeCol: String, path: String,
                      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val spark = b.sparkSession
        import spark.implicits._
        val rep = state.foldEpoch(id, b, codeCol)
          .toDF("cell", "n_assigned", "post_count", "post_sum_l1")
        EventStreams.epochIdempotentSink(rep, id, path)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
