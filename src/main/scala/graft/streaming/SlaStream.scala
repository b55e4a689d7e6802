package graft.streaming

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.AsofJoin

/** D19 — streaming forward as-of with a deadline: the SLA monitor. Each
  * `fail` event (e.g. `error`) waits for the EARLIEST `fix` event (e.g.
  * the user's next `view`) with fix_ts ≥ fail_ts within a horizon; if
  * the watermark proves no fix can arrive in time, the fail is emitted
  * once as a BREACH. This is B42's forward as-of as a stream — the shape
  * Spark's interval join cannot express, because an interval join emits
  * EVERY right row in the window, not the earliest one, and cannot emit
  * the null row a breach needs.
  *
  * Mechanics: one keyed `flatMapGroupsWithState` over the two event
  * classes unioned (tagged) into a single stream. Per-key state holds
  * the pending fails and the fix candidates, both BOUNDED by the
  * horizon: a fail is resolvable exactly when the watermark passes
  * `fail_ts + horizon` (every candidate fix ts ≤ that is then final —
  * the earliest-candidate decision is safe, emitted via an event-time
  * timer so breaches fire without new traffic on the key), and a fix is
  * droppable once the watermark passes `fix_ts + horizon` (no
  * still-pending fail can claim it). State per key is O(events within
  * one horizon), constant in stream length — the D5/D6 bounded-state
  * discipline.
  *
  * Late fails (arriving after their own deadline passed the watermark)
  * resolve immediately against the surviving candidates — best effort,
  * the same late-data posture as the built-in stateful operators;
  * the spec drives only in-watermark data.
  */
object SlaStream {

  /** Batch twin (oracle-checkable): B42's asofForward + the horizon
    * verdict. `fixes` are deduped to one per (key, ts) — smallest id —
    * the forward-as-of right-side contract; ties at equal ts are
    * inclusive on both paths.
    *
    * @return (fail_id, user_id, fail_ts, fix_id, wait_us, breach) —
    *         fix columns null on breach
    */
  def slaBatch(events: DataFrame, failType: String = "error",
               fixType: String = "view",
               horizonUs: Long = 3600L * 1000000L): DataFrame = {
    val fails = events.where(col("event_type") === failType)
      .select(col("event_id").as("fail_id"), col("user_id"),
        col("ts").as("fail_ts"))
    val fixes = events.where(col("event_type") === fixType)
      .groupBy(col("user_id"), col("ts").as("fix_ts"))
      .agg(F.min("event_id").as("fix_id"))
    val j = AsofJoin.asofForward(fails, fixes, Seq("user_id"),
      "fail_ts", "fix_ts", Seq("fix_id", "fix_ts"))
    val waitUs = unix_micros(col("fix_ts")) - unix_micros(col("fail_ts"))
    val within = col("fix_ts").isNotNull && waitUs <= horizonUs
    j.select(col("fail_id"), col("user_id"), col("fail_ts"),
      when(within, col("fix_id")).as("fix_id"),
      when(within, waitUs).as("wait_us"),
      (!coalesce(within, lit(false))).as("breach"))
  }

  /** Streaming form. `events` must be a streaming frame with a watermark
    * NOT yet applied (it is set here, on `ts`). Output (append):
    * (fail_id, user_id, fix_id, wait_us, breach), one row per fail,
    * emitted when its deadline is provably decided.
    */
  def slaStream(events: DataFrame, failType: String = "error",
                fixType: String = "view",
                horizonUs: Long = 3600L * 1000000L,
                watermarkDelay: String = "0 seconds"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val horizon = horizonUs

    events
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("event_type"), col("ts").cast("timestamp"))
      .where(col("event_type").isin(failType, fixType))
      .withWatermark("ts", watermarkDelay)
      .select(col("event_id"), col("user_id"),
        (col("event_type") === lit(failType)).as("is_fail"), col("ts"))
      .as[(Long, Long, Boolean, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, rows: Iterator[(Long, Long, Boolean, java.sql.Timestamp)],
         state: GroupState[(List[(Long, Long)], List[(Long, Long)])]) => {
          // state: (pending fails as (failUs, fail_id),
          //         fix candidates as (fixUs, fix_id))
          var (fails, fixes) = state.getOption.getOrElse(
            (List.empty[(Long, Long)], List.empty[(Long, Long)]))
          if (!state.hasTimedOut) rows.foreach { r =>
            val us = r._4.getTime * 1000L + (r._4.getNanos % 1000000) / 1000L
            if (r._3) fails ::= ((us, r._1)) else fixes ::= ((us, r._1))
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // a fail is decided once the watermark strictly clears its
          // deadline: every fix with ts ≤ deadline has arrived
          val (due, pending) = fails.partition { case (fUs, _) =>
            wmUs > fUs + horizon }
          val out = due.sortBy(identity).iterator.map { case (fUs, fid) =>
            val cand = fixes.filter { case (xUs, _) =>
              xUs >= fUs && xUs <= fUs + horizon }
            if (cand.isEmpty) (fid, uid, Option.empty[Long],
              Option.empty[Long], true)
            else {
              val (xUs, xid) = cand.min
              (fid, uid, Some(xid), Some(xUs - fUs), false)
            }
          }.toList
          // a fix outlives every fail that could still claim it only
          // until wm clears fix_ts + horizon
          fixes = fixes.filter { case (xUs, _) => wmUs <= xUs + horizon }
          if (pending.isEmpty && fixes.isEmpty) state.remove()
          else {
            state.update((pending, fixes))
            if (pending.nonEmpty) {
              // fire when the earliest open deadline passes the watermark
              val nextMs = (pending.map(_._1).min + horizon) / 1000L + 1L
              state.setTimeoutTimestamp(nextMs)
            } else {
              // no open fails: self-clean the fix buffer when the last
              // candidate expires, so a key that goes silent leaks no
              // state (the D4 TTL discipline)
              val nextMs = (fixes.map(_._1).max + horizon) / 1000L + 1L
              state.setTimeoutTimestamp(nextMs)
            }
          }
          out.iterator
        })
      .toDF("fail_id", "user_id", "fix_id", "wait_us", "breach")
  }
}
