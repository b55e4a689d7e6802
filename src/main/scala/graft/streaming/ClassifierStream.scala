package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.ClassifierTrain
import graft.operators.ClassifierTrain.OnlineClassifierState

/** D33 streaming delivery: the C75 quality-filter classifier maintained
  * as document epochs ARRIVE — each micro-batch is featurized (the same
  * one-scan hashed-feature extraction the batch trainer uses) and
  * folded as ONE gradient step into the [[OnlineClassifierState]]
  * (driver state: nBuckets longs + an epoch id, the D27 layout), and
  * the per-epoch report — post-step weights + exact integer loss —
  * lands under the D8 idempotent-partition rule. A redelivered epoch
  * returns the remembered report and leaves the weights untouched;
  * an out-of-order older epoch fails loudly. The d33 gate proves the
  * fold bit-identical to `train(epochs = 1)` against the unrolled
  * DuckDB trajectory oracle; the spec locks stream ≡ fold through this
  * sink.
  */
object ClassifierStream {

  def maintenanceSink(stream: DataFrame, state: OnlineClassifierState,
                      textCol: String, idCol: String, label: Column,
                      nBuckets: Int, path: String,
                      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val spark = b.sparkSession
        import spark.implicits._
        val feats = ClassifierTrain.featurize(b, textCol, idCol, label,
          nBuckets, nBatches = 1)
        val (n, loss) = state.foldEpoch(id, feats)
        val rep = (state.weights.zipWithIndex.toSeq
            .map { case (wv, bk) => ("w", bk.toLong, wv) } ++
          Seq(("loss", id, loss), ("n", id, n)))
          .toDF("kind", "k", "v")
        EventStreams.epochIdempotentSink(rep, id, path)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
