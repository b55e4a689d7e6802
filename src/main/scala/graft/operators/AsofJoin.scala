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
           rightPayload: Seq[String]): DataFrame = {
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

    // right rows first at equal __t: inclusive >= semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rTagged.unionByName(lTagged)
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__src") === 1)

    val outLeft = leftCols.map(c => col("__lrow").getField(c).as(c))
    val outPay = rightPayload.map(c => col("__asof").getField(c).as(c))
    carried.select(outLeft ++ outPay: _*)
  }
}
