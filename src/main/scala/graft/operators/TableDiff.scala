package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — row-level diff of two versions of a table
  * sharing a key (the data-quality twin of the A17/A23 merge surface:
  * merge WRITES a new version, diff EXPLAINS one).
  *
  * Output is one row per key present in either version: `status` ∈
  * {added, removed, changed, same} and `changed_cols` — the
  * comma-joined, name-sorted list of value columns whose NULL-SAFE
  * comparison differs ('' unless status = changed). Column comparison
  * is `<=>` so a null→value or value→null flip counts as a change and
  * null==null does not.
  *
  * Plan shape: ONE full-outer hash join on the key — the only shuffle;
  * presence flags and the per-column compare mask are map-side
  * projections on the joined row. At 100 TB both sides shuffle once on
  * the key (or zero times if the snapshots are bucketed on it — the B17
  * layout); the change mask adds no exchange. This is the
  * delta-lake-style `table_changes` answer computable WITHOUT a change
  * feed — full-snapshot reconciliation when only the data survives.
  */
object TableDiff {

  def diff(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = left.columns.toSeq.intersect(right.columns.toSeq)
      .filterNot(keys.contains).sorted
    val l = left.withColumn("__l", lit(true)).alias("l")
    val r = right.withColumn("__r", lit(true)).alias("r")
    val joinCond = keys.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _)
    val joined = l.join(r, joinCond, "full_outer")
    val diffs = valueCols.map(c => !(col(s"l.$c") <=> col(s"r.$c")))
    val anyDiff = diffs.reduceOption(_ || _).getOrElse(lit(false))
    val status = when(col("l.__l").isNull, lit("added"))
      .when(col("r.__r").isNull, lit("removed"))
      .when(anyDiff, lit("changed"))
      .otherwise(lit("same"))
    val mask = concat_ws(",",
      valueCols.zip(diffs).map { case (c, d) => when(d, lit(c)) }: _*)
    joined.select(
      keys.map(k => coalesce(col(s"l.$k"), col(s"r.$k")).as(k)) ++ Seq(
        status.as("status"),
        when(status === "changed", mask).otherwise(lit(""))
          .as("changed_cols")): _*)
  }

  /** Derive a delta-CDF-shaped change feed from two full snapshots —
    * the Debezium-style snapshot diff for tables whose writer did NOT
    * record changes (A23's `upsertWithChanges` emits the feed natively
    * at merge time; this reconstructs the identical feed after the
    * fact, and `UpsertSpec` locks the two row-for-row). Same change
    * vocabulary: `insert`, `update_preimage` + `update_postimage` (only
    * for rows that actually differ — identical rows emit NOTHING, the
    * A23 no-op contract), `delete`.
    *
    * Cost: the same ONE full-outer key join as [[diff]] — but over two
    * FULL snapshots, which is exactly why a native feed is preferred
    * when the writer can emit one (O(table) here vs O(changes) there).
    */
  def changeFeed(left: DataFrame, right: DataFrame,
                 keys: Seq[String]): DataFrame = {
    require(left.columns.sorted.sameElements(right.columns.sorted),
      "TableDiff.changeFeed: snapshots must share a schema")
    val cols = left.columns.toSeq
    val valueCols = cols.filterNot(keys.contains)
    val l = left.withColumn("__l", lit(true)).alias("l")
    val r = right.withColumn("__r", lit(true)).alias("r")
    val joinCond = keys.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _)
    val joined = l.join(r, joinCond, "full_outer")
    val anyDiff = valueCols.map(c => !(col(s"l.$c") <=> col(s"r.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    def side(s: String, tag: String) =
      struct(cols.map(c => col(s"$s.$c").as(c)) :+
        lit(tag).as("_change_type"): _*)
    val feedRows = when(col("l.__l").isNull, array(side("r", "insert")))
      .when(col("r.__r").isNull, array(side("l", "delete")))
      .when(anyDiff, array(side("l", "update_preimage"),
        side("r", "update_postimage")))
      // typed empty array (no-op rows emit nothing): filter-to-empty
      // keeps the struct element type without naming it
      .otherwise(filter(array(side("l", "noop")), _ => lit(false)))
    joined.select(explode(feedRows).as("__row")).select(col("__row.*"))
  }
}
