package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.functions.HashedClassifier
import graft.operators.{ClassifierTrain, Sampling}

/** D38: streaming budget-threshold maintenance — C92's decision table
  * kept current while documents ARRIVE: each micro-batch is scored
  * against the FROZEN deployed model (C79's weights — no training in
  * the hot path), reduced to a margin-bin histogram partial, and landed
  * under the D8 epoch-partition rule; the decision table is the rollup
  * of all landed partials swept by C92's rules. This is how a deployed
  * quality filter answers "where must the threshold sit TODAY to hold
  * the token budget" as the crawl grows — without rescoring history.
  *
  * Correctness by composition: histograms merge by plain addition, so
  * per-batch binning then summation ≡ global binning (spec-locked
  * stream ≡ batch, and after full delivery the decision table IS
  * c92's — the batch twin carries the oracle row, the d35→c82
  * pattern); scoring is deterministic, so a replayed epoch overwrites
  * its own partition bit-identically and the partial store converges.
  *
  * At 100 TB: per-batch work is delta-sized map + one nBins-row
  * partial; the stored state is bins × epochs rows (KBs); the sweep
  * window only ever sees the merged histogram — never the corpus.
  */
object ThresholdStream {

  /** Score a static frame into (bin, n_docs, bin_tokens) — the partial
    * both the sink and the batch path share.
    */
  def histogram(docs: DataFrame, textCol: String, idCol: String,
                model: Seq[(String, Array[Long])], nBuckets: Int,
                binWidth: Long): DataFrame = {
    val scored = ClassifierTrain.scoreMulticlass(docs, textCol, idCol,
      model, nBuckets)
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      HashedClassifier.tokenCount(col(textCol)).as("tokens"))
    val G = graft.functions.GraftExpressions
    scored.join(toks, "doc_id")
      .select(G.longDiv(col("margin").cast("long"), lit(binWidth))
        .as("bin"), col("tokens").as("tk"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("tk").as("bin_tokens"))
  }

  /** Land each arriving batch's histogram partial under the D8 rule. */
  def histogramSink(stream: DataFrame, textCol: String, idCol: String,
                    model: Seq[(String, Array[Long])], nBuckets: Int,
                    binWidth: Long, root: String,
                    checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        EventStreams.epochIdempotentSink(
          histogram(b, textCol, idCol, model, nBuckets, binWidth), id, root)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** The current decision table: merge every landed partial, sweep by
    * C92's rules. After full delivery this equals the batch
    * [[Sampling.budgetThresholdSweep]] row-for-row.
    */
  def decisionTable(spark: SparkSession, root: String,
                    budgetTokens: Long): DataFrame =
    Sampling.sweepHistogram(
      spark.read.parquet(root)
        .groupBy("bin")
        .agg(sum("n_docs").as("n_docs"),
          sum("bin_tokens").as("bin_tokens")),
      budgetTokens)
}
