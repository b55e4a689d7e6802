package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQueryListener, StreamingQueryProgress}

/** Streaming state-store observability — the judge of whether a stateful
  * query is 100 TB-safe is not its output but its STATE TRAJECTORY: a
  * watermark/TTL bug shows up as `numRowsTotal` growing without bound
  * batches before anything is wrong in the answers. This module surfaces
  * the per-operator state metrics Spark already tracks
  * (`StateOperatorProgress`) in two forms:
  *
  *   - [[StateMetrics.samples]]: pull-based — flatten a query's
  *     `recentProgress` into one row per (batch, state operator).
  *     Deterministic after `processAllAvailable()`, so specs assert on it
  *     directly.
  *   - [[StateMetrics.Listener]]: push-based — a `StreamingQueryListener`
  *     accumulating the same samples continuously, the shape a production
  *     monitor hooks into an alerting pipeline (listener delivery is
  *     async by contract; consumers poll [[Listener.samples]]).
  *
  * Eviction proof for a bounded-state operator: some batch reports
  * `numRowsRemoved > 0` and the post-eviction `numRowsTotal` is below the
  * pre-eviction peak — locked in EventStreamsSpec against the TTL
  * operator ([[EventStreams.userTotalsStreamTtl]]).
  */
object StateMetrics {

  /** One state-operator reading from one micro-batch progress. */
  case class StateSample(batchId: Long, operator: String, numRowsTotal: Long,
                         numRowsUpdated: Long, numRowsRemoved: Long,
                         memoryUsedBytes: Long)

  /** Flatten progress reports into per-(batch, operator) samples.
    * Batches with no state operator (empty micro-batches planned away)
    * contribute nothing.
    */
  def samples(progress: Seq[StreamingQueryProgress]): Seq[StateSample] =
    progress.flatMap { p =>
      p.stateOperators.toSeq.map { so =>
        StateSample(p.batchId, so.operatorName, so.numRowsTotal,
          so.numRowsUpdated, so.numRowsRemoved, so.memoryUsedBytes)
      }
    }

  /** Peak and final total state rows per operator — the pair a
    * boundedness assertion compares (final < peak proves eviction did
    * something; peak itself bounds the high-water memory).
    */
  def peakAndFinal(ss: Seq[StateSample]): Map[String, (Long, Long)] =
    ss.groupBy(_.operator).map { case (op, rows) =>
      val ordered = rows.sortBy(_.batchId)
      op -> (ordered.map(_.numRowsTotal).max, ordered.last.numRowsTotal)
    }

  /** Continuous collector (production shape). Thread-safe; listener
    * delivery is asynchronous — poll [[samples]] rather than assuming
    * arrival by any particular moment.
    */
  final class Listener extends StreamingQueryListener {
    private val buf =
      new java.util.concurrent.ConcurrentLinkedQueue[StateSample]()

    def samples: Seq[StateSample] = {
      val it = buf.iterator()
      val out = Seq.newBuilder[StateSample]
      while (it.hasNext) out += it.next()
      out.result()
    }

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
      StateMetrics.samples(Seq(e.progress)).foreach(buf.add)
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  /** In-flight observed metrics (D11): `Dataset.observe` rides guard
    * aggregates (row counts, null counts, domain sums) on the SAME pass
    * as the real job — the data-quality hook that costs zero extra
    * scans, where a separate validation query re-reads the table (at
    * 100 TB, observe is free and the re-scan is not). Batch actions
    * deliver them through a `QueryExecutionListener`
    * ([[ObservedCollector]], async — poll [[ObservedCollector.metrics]]);
    * streaming batches report them in each progress'
    * `observedMetrics` map. EventStreamsSpec locks both paths: the
    * observed row equals a directly-computed aggregate of the same
    * input, and a streaming observe surfaces per-batch.
    */
  final class ObservedCollector
      extends org.apache.spark.sql.util.QueryExecutionListener {
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, org.apache.spark.sql.Row)]()

    /** Latest observed row per observation name, across completed
      * actions so far. Listener delivery is asynchronous — poll.
      */
    def metrics: Map[String, org.apache.spark.sql.Row] = {
      val it = buf.iterator()
      var m = Map.empty[String, org.apache.spark.sql.Row]
      while (it.hasNext) { val (k, v) = it.next(); m += (k -> v) }
      m
    }

    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) => buf.add(name -> row) }
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        exception: Exception): Unit = ()
  }
}
