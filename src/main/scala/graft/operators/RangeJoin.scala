package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, bucketed: Spark's native answer to a
  * non-equi `point BETWEEN lo AND hi` join is BroadcastNestedLoopJoin
  * (fine only while one side broadcasts) or a cartesian product (never
  * fine). This operator turns the range predicate into an EQUI-join both
  * sides can shuffle-partition on:
  *
  *   - each interval row explodes to the fixed-width buckets it overlaps
  *     (`sequence(floor(lo/w), floor(hi/w))`),
  *   - each point row maps to its single bucket,
  *   - equi-join on bucket, then the exact `BETWEEN` residual filter.
  *
  * Shuffle is keyed on bucket id: distributable, AQE-skew-splittable,
  * works big-to-big where BNLJ dies. Interval-side blowup = average
  * interval span / bucketWidth — pick bucketWidth near the median span
  * (blowup ≤ 2 for spans ≤ width). Every matched pair appears exactly
  * once: a (point, interval) pair co-occurs only in the point's bucket.
  */
object RangeJoin {

  /** @param points      point side
    * @param intervals   interval side with [loCol, hiCol] (inclusive ends)
    * @param pointCol    numeric point column
    * @param bucketWidth bucket width in the point/interval unit
    * @return points ⋈ intervals rows satisfying lo ≤ point ≤ hi
    */
  /** Integer floor-division bucket id (r8 advice): the earlier
    * `floor(value.cast(double) / width)` form is exact only for
    * |value| < 2^53 — a silent-wrong path for very large long domains
    * (nanosecond epochs, bit-packed ids). `(v - pmod(v, w)) div w` is
    * exact floor division over the FULL long range: pmod is always
    * non-negative for positive w, the numerator is an exact multiple of
    * w, and SQL `div` is long-typed — no double ever appears. Identical
    * bucket ids to the old form wherever the old form was exact.
    */
  /** Exact integer floor-bucket: `(v - pmod(v, w)) / w` over longs —
    * no double division, so ids are exact past 2^53 (shared with
    * [[graft.streaming.OverlapStream]]'s D34 bucketing).
    */
  def floorBucket(c: Column, bucketWidth: Long): Column = {
    val w = lit(bucketWidth)
    graft.functions.GraftExpressions.longDiv((c.cast("long") - pmod(c.cast("long"), w)), w)
  }

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", floorBucket(col(pointCol), bucketWidth))
    val iv = intervals
      // an inverted interval (hi < lo) contains nothing — and fed to
      // sequence() it would silently generate a DESCENDING bucket list
      // (r8 advice). Dropped explicitly: empty-interval semantics, not
      // silent corruption.
      .where(col(loCol) <= col(hiCol))
      .withColumn("__bucket",
        explode(sequence(
          floorBucket(col(loCol), bucketWidth),
          floorBucket(col(hiCol), bucketWidth))))
    p.join(iv, Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join (B56): pairs of intervals from two tables
    * that overlap in time — the temporal-concurrency operator class
    * (concurrent sessions, double-booked resources, co-occurring
    * incidents) where [[pointInInterval]]'s point side becomes a second
    * interval table. Same bucketing trick, extended: BOTH sides explode
    * to their covered buckets, equi-join on bucket, exact overlap
    * residual (`loA ≤ hiB AND loB ≤ hiA`, inclusive) — and each
    * overlapping pair is kept EXACTLY once without a distinct: a pair
    * co-occurs in every shared bucket, so only the bucket containing
    * `greatest(loA, loB)` (the overlap's start, which is always a
    * shared bucket) emits it. Shuffle keyed on bucket: big-to-big
    * safe, AQE-skew-splittable; blowup = span/width per side. Result
    * volume is the TRUE overlap count — workload-owned, like every
    * join.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  loL: String, hiL: String, loR: String, hiR: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(lo: String, hi: String) = sequence(
      floorBucket(col(lo), bucketWidth), floorBucket(col(hi), bucketWidth))
    // inverted intervals (hi < lo) contain nothing: dropped (empty-
    // interval semantics) instead of silently exploding to a descending
    // bucket list — same contract as pointInInterval's interval side
    val l = left.where(col(loL) <= col(hiL))
      .withColumn("__bucket", explode(buckets(loL, hiL)))
    val r = right.where(col(loR) <= col(hiR))
      .withColumn("__bucket", explode(buckets(loR, hiR)))
    l.join(r, Seq("__bucket"))
      .where(col(loL) <= col(hiR) && col(loR) <= col(hiL) &&
        col("__bucket") === floorBucket(greatest(col(loL), col(loR)),
          bucketWidth))
      .drop("__bucket")
  }

  /** Broadcast variant for DIM-SIZED interval tables: no bucket explode, no
    * shuffle at all — the interval table ships to every executor and the
    * point side is streamed through a BroadcastNestedLoopJoin with the raw
    * `BETWEEN` predicate. Cheaper than the bucketed form whenever the
    * interval side fits the broadcast threshold: the bucketed form pays an
    * interval-row blowup (span / bucketWidth) plus a full two-sided shuffle
    * to win shuffle-partitionability the broadcast case never needed.
    * Never use for big-to-big (per-row interval scan is O(|I|) without an
    * index; that's what the bucketed form is for).
    */
  def pointInIntervalBroadcast(points: DataFrame, intervals: DataFrame,
                               pointCol: String, loCol: String,
                               hiCol: String): DataFrame =
    points.join(broadcast(intervals),
      col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))

  /** Size-dispatched entry point: broadcast-NLJ when Catalyst's estimate of
    * the interval side fits the session's broadcast threshold, bucketed
    * equi-join otherwise — the same decision [[graft.plans.RangeJoinRewrite]]
    * makes for auto-rewritten SQL joins (it declines to fire when a side is
    * broadcastable, leaving Spark's own BNLJ-broadcast plan standing).
    */
  def pointInIntervalAuto(points: DataFrame, intervals: DataFrame,
                          pointCol: String, loCol: String, hiCol: String,
                          bucketWidth: Long): DataFrame = {
    val thr = points.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold")
    val thrBytes = // "-1" disables broadcasting; sizes may carry a unit
      if (thr.trim.startsWith("-")) -1L
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(thr)
    val ivBytes =
      intervals.queryExecution.optimizedPlan.stats.sizeInBytes
    if (thrBytes >= 0 && ivBytes <= thrBytes)
      pointInIntervalBroadcast(points, intervals, pointCol, loCol, hiCol)
    else
      pointInInterval(points, intervals, pointCol, loCol, hiCol, bucketWidth)
  }
}
