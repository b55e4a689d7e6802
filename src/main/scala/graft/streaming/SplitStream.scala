package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.Sampling

/** D30: streaming train/val/test router — C15's content-hash split as
  * the ingestion DELIVERY endpoint: every arriving document lands in
  * exactly one of three sinks, decided by the same md5-bucket contract
  * the batch split uses, so a document entering by stream or by batch
  * load gets the SAME split forever (content-deterministic,
  * order-invariant, growth-stable — the C15 guarantees, all already
  * spec-locked on the batch form). Delivery is the D8
  * idempotent-partition rule per sink and per epoch: a replayed epoch
  * recomputes the identical three-way routing and overwrites its own
  * partitions, so at-least-once redelivery converges to exactly-once
  * on ALL THREE sinks and a document can never land in zero or two.
  */
object SplitStream {

  def splitRouterSink(stream: DataFrame, textCol: String,
                      trainDir: String, valDir: String, testDir: String,
                      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val routed = Sampling.hashSplit(b, textCol)
        Seq("train" -> trainDir, "val" -> valDir, "test" -> testDir)
          .foreach { case (split, dir) =>
            EventStreams.epochIdempotentSink(
              routed.where(col("split") === split).drop("split"), id, dir)
          }
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
