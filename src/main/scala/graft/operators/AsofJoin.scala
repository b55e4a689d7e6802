package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: every left row is matched to the single right row with the
  * greatest right-time ≤ the left row's time, per key — the canonical
  * "most recent state at event time" lookup (trades joined to quotes,
  * events to the dimension version in force). Spark has no built-in as-of
  * operator; the naive formulations are a range join (O(n·m) candidate
  * explosion, then a per-left-row argmax) or a windowed self-join — both
  * shuffle far more than needed.
  *
  * This implementation is the union-and-carry form: tag both sides, union
  * on (key, time), and let one window pass per key carry the latest right
  * payload forward onto each left row —
  *
  *   shuffle cost = ONE exchange of |L| + |R| rows keyed on the join key,
  *   no candidate pairs, no range explosion, payload carried as a struct.
  *
  * At equal timestamps the right row sorts first (`__src` 0 < 1), so a
  * state change taking effect AT t is visible to an event AT t — i.e.
  * inclusive `left.time >= right.time` semantics, matching DuckDB/kdb
  * ASOF JOIN. Left rows with no earlier right row keep a null payload
  * (left-outer semantics).
  *
  * The right side must be unique per (key, time) — enforce upstream (e.g.
  * keep the max-id row per instant) or results are tie-ambiguous; this is
  * the same contract DuckDB's ASOF JOIN leaves unspecified.
  *
  * At 100 TB: the single exchange is keyed on the join key, so AQE skew
  * splitting applies; a hot key degrades to one sorted partition-local
  * scan, never a pair blowup. Both inputs are scanned exactly once.
  */
object AsofJoin {

  /** @param left         probe side (events)
    * @param right        state side (versions); unique per (key, time)
    * @param keys         equi-join key column names (present on both sides)
    * @param leftTime     left timestamp column
    * @param rightTime    right timestamp column
    * @param rightPayload right columns to carry onto matched left rows
    * @return all left columns + rightPayload columns (null when unmatched)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightPayload: Seq[String]): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, rightPayload,
      forward = false)

  /** Forward as-of (B42): every left row matched to the single right row
    * with the SMALLEST right-time ≥ the left row's time, per key — the
    * "next scheduled event after" lookup (next maintenance window after
    * a failure, next order on/after a touchpoint). Identical machinery
    * to [[asof]] with the carry direction reversed: the union sorts
    * time-DESCENDING so the window carries the nearest LATER payload
    * backward onto each left row. Same single-exchange cost, same
    * inclusive-at-equal-times rule (a right row AT t matches a left row
    * AT t), same unique-per-(key, time) right-side contract.
    */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  rightPayload: Seq[String]): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, rightPayload,
      forward = true)

  /** Nearest-event as-of (B53): each left row matched to the right row
    * minimizing |Δt| per key — the sensor/trace-alignment form, where
    * "most recent" ([[asof]]) or "next" ([[asofForward]]) alone biases
    * the alignment by half an arrival interval. Both carries run over
    * ONE union and ONE keyed exchange: the ascending pass carries the
    * latest earlier payload, the descending pass the earliest later one
    * (two partition-local sorts, no second shuffle), then an exact
    * integer-micros comparison picks the nearer side — ties to the
    * EARLIER row, the deterministic DuckDB-replicable rule. Adds
    * `delta_us` (null when no right row exists for the key at all).
    * Same unique-per-(key, time) right contract as [[asof]].
    */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(
      rightPayload.map(col) :+ col(rightTime).as("__rt"): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftStruct = struct(leftCols.map(col): _*)
    val leftType = left.select(leftStruct).schema.head.dataType

    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__src"),
        payloadStruct.as("__pay"),
        lit(null).cast(leftType).as("__lrow")): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__src"),
        lit(null).cast(payloadType).as("__pay"),
        leftStruct.as("__lrow")): _*)

    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rTagged.unionByName(lTagged)
      .withColumn("__back", last(col("__pay"), ignoreNulls = true).over(wB))
      .withColumn("__fwd", last(col("__pay"), ignoreNulls = true).over(wF))
      .where(col("__src") === 1)

    val dBack = unix_micros(col("__t")) -
      unix_micros(col("__back").getField("__rt"))
    val dFwd = unix_micros(col("__fwd").getField("__rt")) -
      unix_micros(col("__t"))
    val pick = when(col("__back").isNull, col("__fwd"))
      .when(col("__fwd").isNull, col("__back"))
      .when(dFwd < dBack, col("__fwd"))
      .otherwise(col("__back"))
    val delta = when(col("__back").isNull, dFwd)
      .when(col("__fwd").isNull, dBack)
      .otherwise(least(dBack, dFwd))

    val outLeft = leftCols.map(c => col("__lrow").getField(c).as(c))
    val outPay = rightPayload.map(c => col("__pick").getField(c).as(c))
    carried
      .withColumn("__pick", pick)
      .withColumn("delta_us", delta)
      .select(outLeft ++ outPay :+ col("delta_us"): _*)
  }

  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String,
                       rightPayload: Seq[String],
                       forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftStruct = struct(leftCols.map(col): _*)
    val leftType = left.select(leftStruct).schema.head.dataType

    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__src"),
        payloadStruct.as("__pay"),
        lit(null).cast(leftType).as("__lrow")): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__src"),
        lit(null).cast(payloadType).as("__pay"),
        leftStruct.as("__lrow")): _*)

    // right rows first at equal __t: inclusive (>= backward, <= forward)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (forward) col("__t").desc else col("__t").asc,
        col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rTagged.unionByName(lTagged)
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__src") === 1)

    val outLeft = leftCols.map(c => col("__lrow").getField(c).as(c))
    val outPay = rightPayload.map(c => col("__asof").getField(c).as(c))
    carried.select(outLeft ++ outPay: _*)
  }

  /** Skew-proof variant for heavy-tailed keys. The plain form sorts all
    * |L|+|R| rows of a key in ONE task; when one user holds half the
    * events, that task is the job. Here the carry is computed per
    * (key, TIME-BUCKET) — the hot key spreads across buckets — and bucket
    * boundaries are stitched by a carry-in table with one row per
    * (key, bucket): its size is bounded by keys × active buckets,
    * INDEPENDENT of events-per-key, so the per-key window over it cannot
    * be hot. Three exchanges instead of one, all keyed (key, bucket)
    * except the tiny boundary table — the classic salting trade: pay a
    * bounded extra shuffle to cap the max task.
    *
    * Semantics are IDENTICAL to [[asof]] (spec-locked): within a bucket
    * the window carry applies; a left row with no earlier right row in
    * its own bucket falls back to the last right payload of any earlier
    * bucket (strictly — same-bucket-later right rows can't leak in,
    * because the boundary table is consulted only for buckets < b).
    *
    * @param bucketOf maps a time column to a bucket id — e.g.
    *        `c => (unix_timestamp(c) / 86400).cast("long")` for daily
    *        buckets. Pick a width so a hot key's per-bucket row count is
    *        task-sized; at 100 TB that's the skew knob.
    */
  def asofBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   rightPayload: Seq[String],
                   bucketOf: Column => Column): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftStruct = struct(leftCols.map(col): _*)
    val leftType = left.select(leftStruct).schema.head.dataType

    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__src"),
        payloadStruct.as("__pay"),
        lit(null).cast(leftType).as("__lrow")): _*)
      .withColumn("__b", bucketOf(col("__t")))
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__src"),
        lit(null).cast(payloadType).as("__pay"),
        leftStruct.as("__lrow")): _*)
      .withColumn("__b", bucketOf(col("__t")))

    // boundary table: last right payload per (key, bucket) — the max of
    // (__t, __pay) structs picks the latest row (right side unique per
    // (key, time) by the operator's contract)
    val rBuckLast = rTagged
      .groupBy(keys.map(col) :+ col("__b"): _*)
      .agg(max(struct(col("__t"), col("__pay"))).as("__m"))
      .select(keys.map(col) ++ Seq(col("__b"),
        lit(0).as("__bsrc"), col("__m.__pay").as("__bpay")): _*)
    // one marker per distinct LEFT (key, bucket); sorts BEFORE same-bucket
    // right rows so the carry-in it picks up is strictly from buckets < b
    val lBuckMarks = lTagged
      .select(keys.map(col) :+ col("__b"): _*).distinct()
      .select(keys.map(col) ++ Seq(col("__b"),
        lit(1).as("__bsrc"), lit(null).cast(payloadType).as("__bpay")): _*)
    // NOTE __bsrc inverted vs the row-level __src: the marker must see
    // only EARLIER buckets, so it sorts first (-1 excludes same-bucket
    // right aggregates that come after it)
    val wKey = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__b").asc, col("__bsrc").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = rBuckLast.unionByName(lBuckMarks)
      .withColumn("__cin", last(col("__bpay"), ignoreNulls = true).over(wKey))
      .where(col("__bsrc") === 1)
      .select(keys.map(c => col(c).as(s"__ck_$c")) ++
        Seq(col("__b").as("__ck_b"), col("__cin")): _*)

    // main pass: carry WITHIN (key, bucket) — the hot key is spread
    val wBuck = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col("__t").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joinCond = keys.map(c => col(c) <=> col(s"__ck_$c"))
      .reduce(_ && _) && (col("__b") <=> col("__ck_b"))
    val carried = rTagged.unionByName(lTagged)
      .withColumn("__within", last(col("__pay"), ignoreNulls = true).over(wBuck))
      .where(col("__src") === 1)
      .join(carryIn, joinCond, "left")
      .withColumn("__asof", coalesce(col("__within"), col("__cin")))

    val outLeft = leftCols.map(c => col("__lrow").getField(c).as(c))
    val outPay = rightPayload.map(c => col("__asof").getField(c).as(c))
    carried.select(outLeft ++ outPay: _*)
  }
}
