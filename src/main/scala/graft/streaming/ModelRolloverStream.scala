package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.ClassifierTrain
import graft.operators.ClassifierTrain.OnlineMulticlassState
import graft.sources.ModelStore

/** D39: streaming MODEL ROLLOVER — the promise ModelStore's scaladoc
  * makes ("continued training publishes its snapshots as ordinary new
  * versions") actually exercised under arrival: each micro-batch of
  * labeled documents is featurized and folded as one D36 online
  * multi-class step, and the post-fold snapshot is PUBLISHED through
  * the C95 store's A37 atomic two-table commit — so a crawl-tracking
  * langid/quality model advances version by version while serving
  * sessions keep reading a consistent artifact.
  *
  * Exactly-once under redelivery rides [[MultiPublish]]'s batch
  * watermark, NOT the D8 partition rule: a publish is a POINTER FLIP,
  * so a redelivered epoch must be a structural no-op (same versions,
  * same bytes, pointer untouched) rather than an overwrite — the
  * `batchId` manifest key makes replay detection the store's job.
  * NOTE the fold-then-publish pair is only idempotent as a pair
  * because the [[OnlineMulticlassState]] remembers a replayed LATEST
  * epoch as a no-op first (its per-class contiguity rule), so the
  * snapshot a replayed publish would re-stage is bit-identical and
  * the store skips it by watermark before any staging I/O.
  *
  * Serving through the rollover is the C85 blue/green contract
  * unchanged ([[serveScores]]): a pinned session keeps scoring with
  * version v while the stream publishes v+1, v+2, …; flipping = reading
  * the committed pointer. The d39 gate shares c95's oracle key (the
  * batch-twin discipline: same fold depths, same hyperparameters —
  * the published v1/v2 ARE the c95 trajectory states); the spec locks
  * stream ≡ fold through this real sink, replay-skip included.
  *
  * At 100 TB: per-epoch work is one delta-sized featurize + k
  * margin aggs (the D36 shape); the publish is KB-sized staging + one
  * rename. Driver state: k·nBuckets longs + the epoch watermark.
  */
object ModelRolloverStream {

  /** One epoch's fold-then-publish — the unit both the streaming sink
    * and the d39 batch-twin gate share: featurize the arriving delta,
    * fold it as one D36 online step, publish the post-fold snapshot as
    * a new model version (batch id = the epoch id, so a redelivered
    * epoch is replay-skipped by the store before any staging I/O — the
    * state's own replayed-latest-epoch no-op keeps the fold side
    * idempotent too).
    */
  def foldAndPublish(state: OnlineMulticlassState, classes: Seq[String],
                     batch: DataFrame, epochId: Long, textCol: String,
                     idCol: String, classCol: String, nBuckets: Int,
                     root: String): graft.sources.MultiPublish.MultiReport = {
    // persist: the multi-class fold runs one margin agg PER CLASS over
    // this frame — without the cache each class re-pays the featurize
    // scan (k x the epoch's corpus cost for no reason)
    val feats = ClassifierTrain.featurizeMulti(batch, textCol, idCol,
      classCol, nBuckets, nBatches = 1).persist()
    try state.foldEpoch(epochId, feats)
    finally { feats.unpersist(); () }
    val snapshot = classes.map(c => c -> state.weights(c).clone)
    val rep = ModelStore.publishModel(batch.sparkSession, root, snapshot,
      trainedAtEpoch = epochId, batchId = Some(epochId))
    require(rep.committed || rep.replaySkipped,
      s"epoch $epochId snapshot publish failed: ${rep.failures}")
    rep
  }

  /** Fold each arriving epoch into `state`, then publish the post-fold
    * snapshot as a new model version under `root`.
    */
  def snapshotSink(stream: DataFrame, state: OnlineMulticlassState,
                   classes: Seq[String], textCol: String, idCol: String,
                   classCol: String, nBuckets: Int, root: String,
                   checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        foldAndPublish(state, classes, b, id, textCol, idCol, classCol,
          nBuckets, root)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Score `docs` with the model at `pin` (blue — a session holding
    * through the rollover) or at the committed pointer (green — the
    * flipped view). Loading is KB-sized; scoring is the one corpus
    * pass.
    */
  def serveScores(spark: SparkSession, root: String, docs: DataFrame,
                  textCol: String, idCol: String,
                  pin: Option[Int] = None): DataFrame = {
    val lm = pin match {
      case Some(v) => ModelStore.loadModelAt(spark, root, v)
      case None => ModelStore.loadModel(spark, root)
    }
    ClassifierTrain.scoreMulticlass(docs, textCol, idCol, lm.model,
      lm.nBuckets)
  }
}
