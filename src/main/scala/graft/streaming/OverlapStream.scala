package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D34: stream-stream interval-OVERLAP join — B56's operator class
  * (concurrent sessions, double-booked resources, co-occurring
  * incidents) under continuous arrival, where D6's attribution join is
  * point-in-window and this is window-against-window.
  *
  * The batch form buckets both sides; streaming instead leans on
  * Spark's stream-stream join machinery, which needs a TIME-RANGE
  * predicate between the two watermarked event-time columns to bound
  * state. That bound comes from a DECLARED maximum interval length L:
  * two intervals of length ≤ L overlap only if their starts lie within
  * L of each other, so
  *
  *   `b_lo BETWEEN a_lo - L AND a_lo + L`  (the state-GC range)
  *   `AND a_lo <= b_hi AND b_lo <= a_hi`   (the exact inclusive overlap)
  *
  * is both sufficient for correctness and enough for Spark to expire
  * state at `watermark + L` per side. L is a CONTRACT, not a hint:
  * rows whose interval exceeds it are routed out loudly (the A13
  * dead-letter rule — silently keeping them would produce silently
  * MISSING pairs, the worst failure mode a join can have; callers
  * split them to a quarantine sink or chunk them upstream). At 100 TB
  * this is the same promise every streaming session store makes —
  * bounded per-key horizon — applied to interval state.
  *
  * Inputs: left (a_id, a_lo, a_hi), right (b_id, b_lo, b_hi), all
  * times TIMESTAMP. Output: the overlapping (a_id, b_id) pairs with
  * both intervals, each pair exactly once — Spark's stream-stream
  * join demands an EQUALITY predicate, so the B56 bucket trick
  * carries over (width = L ⇒ ≤ 2 buckets per in-contract interval)
  * together with its greatest(lo, lo) exactly-once ownership rule.
  */
object OverlapStream {

  /** The in-contract predicate — exposed so callers can route the
    * complement to a dead-letter sink with the same definition.
    */
  def withinContract(lo: String, hi: String, maxLenSec: Long) =
    col(hi).cast("long") - col(lo).cast("long") <= maxLenSec &&
      col(lo) <= col(hi)

  def overlapStream(left: DataFrame, right: DataFrame,
                    maxLenSec: Long,
                    watermark: String = "10 minutes"): DataFrame = {
    require(maxLenSec > 0, "maxLenSec must be positive")
    // Spark stream-stream joins REQUIRE an equality predicate, so the
    // B56 bucket trick carries over: bucket width = L means an
    // in-contract interval covers AT MOST TWO buckets (explode ≤ 2
    // rows per event — bounded, map-side), the equi-key is the bucket,
    // and each overlapping pair still emits EXACTLY once via the
    // greatest(lo, lo) ownership rule. The time-range predicate stays
    // alongside for state GC.
    // Exact integer bucket ids (the RangeJoin rule): double division is
    // silently wrong past 2^53 — fine for epoch seconds, but bucket math
    // is exact everywhere in this repo, so the streaming twin matches.
    def bucketed(df: DataFrame, tag: String, lo: String, hi: String) =
      df.withColumn(s"__${tag}bucket", explode(sequence(
        graft.operators.RangeJoin.floorBucket(col(lo), maxLenSec),
        graft.operators.RangeJoin.floorBucket(col(hi), maxLenSec))))
    val l = bucketed(left.where(withinContract("a_lo", "a_hi", maxLenSec)),
      "a", "a_lo", "a_hi").withWatermark("a_lo", watermark)
    val r = bucketed(right.where(withinContract("b_lo", "b_hi", maxLenSec)),
      "b", "b_lo", "b_hi").withWatermark("b_lo", watermark)
    l.join(r, expr(
      s"""__abucket = __bbucket AND
         |b_lo >= a_lo - INTERVAL $maxLenSec SECONDS AND
         |b_lo <= a_lo + INTERVAL $maxLenSec SECONDS AND
         |a_lo <= b_hi AND b_lo <= a_hi AND
         |__abucket = (CAST(greatest(a_lo, b_lo) AS LONG)
         |             - pmod(CAST(greatest(a_lo, b_lo) AS LONG),
         |                    $maxLenSec)) div $maxLenSec""".stripMargin))
      .drop("__abucket", "__bbucket")
  }

  /** Batch twin with identical contract semantics (same in-contract
    * filter, same exact predicate) — what the spec compares the
    * streamed pairs against, pair-set for pair-set.
    */
  def overlapBatch(left: DataFrame, right: DataFrame,
                   maxLenSec: Long): DataFrame =
    left.where(withinContract("a_lo", "a_hi", maxLenSec))
      .join(right.where(withinContract("b_lo", "b_hi", maxLenSec)),
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
}
