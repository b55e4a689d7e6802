package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational upsert (merge): apply a batch of keyed updates/inserts to a
  * target snapshot — the incremental-ingestion primitive behind the
  * reference's year-diff idempotence (etl/dags/censo_escolar.py:39-48
  * re-runs only missing years; a revision within a year needs row-level
  * merge, which this provides).
  *
  * Whole-row replace semantics, anti-join + union:
  *   target rows whose key appears in `updates` are dropped (left_anti),
  *   then all update rows are appended. One shuffle per side keyed on the
  *   merge key; no full-outer join, no per-column coalesce (which breaks
  *   the moment a legitimate null update arrives). New keys insert,
  *   existing keys replace — MERGE WHEN MATCHED THEN UPDATE / WHEN NOT
  *   MATCHED THEN INSERT, with the whole row as the update set.
  *
  * `updates` must be unique per key (the usual CDC compaction contract —
  * dedupe upstream with e.g. max-version-wins). Schemas must match by
  * name; unionByName enforces it.
  *
  * At 100 TB: both shuffles key on the merge key, so co-bucketing target
  * and updates by that key (CatalogTables bucketed writes) removes the
  * target-side shuffle entirely — the update batch is typically tiny and
  * AQE broadcasts the anti-join's build side.
  */
object Upsert {

  def upsert(target: DataFrame, updates: DataFrame,
             keys: Seq[String]): DataFrame =
    target
      .join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(updates)

  /** Slowly-changing-dimension type-2 apply: fold a batch of attribute
    * observations into a versioned history — one row per (key, version)
    * with `valid_from` / `valid_to` / `is_current`, a new version opened
    * only when the tracked attributes actually changed (consecutive
    * identical observations compact away). The incremental counterpart of
    * the reference's full-snapshot dimension reload: re-running a year
    * revises history instead of duplicating it.
    *
    * Contract: each batch's observations for a key must be at-or-after
    * that key's latest `valid_from` (the standard forward-in-time CDC
    * feed). Under that contract, applying batches incrementally is
    * EXACTLY equivalent to one-shot processing of all events (spec-locked
    * in UpsertSpec) — the compaction of closed versions loses nothing
    * because later batches never interleave before them. Late-arriving
    * history needs a replay from the event log, as in every SCD2 store.
    *
    * Same-instant duplicate observations resolve deterministically
    * (max attribute struct wins). Scale shape: one shuffle keyed on
    * (keys, valid_from) for the dedup and one keyed on (keys) for the
    * versioning windows; per-key state after compaction is version
    * counts, not observation counts, so the window partitions stay small
    * no matter how hot a key's feed is.
    */
  def scd2Apply(history: Option[DataFrame], updates: DataFrame,
                keys: Seq[String], effectiveCol: String,
                attrCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyCols = keys.map(col)
    val u = updates.select(
      keyCols ++ attrCols.map(col) :+ col(effectiveCol).as("valid_from"): _*)
    val ev = history.fold(u)(h => h.select(
      keyCols ++ attrCols.map(col) :+ col("valid_from"): _*).unionByName(u))
    val attrStruct = struct(attrCols.map(col): _*)
    val uniq = ev.groupBy(keyCols :+ col("valid_from"): _*)
      .agg(max(attrStruct).as("__a"))
    val w = Window.partitionBy(keyCols: _*).orderBy(col("valid_from"))
    val changes = uniq
      .withColumn("__prev", lag(col("__a"), 1).over(w))
      .where(col("__prev").isNull || !(col("__a") <=> col("__prev")))
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keyCols ++
        attrCols.map(a => col("__a").getField(a).as(a)) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** `merged` is the post-merge snapshot; `changes` is the CDF frame:
    * target schema plus `_change_type`.
    */
  case class MergeResult(merged: DataFrame, changes: DataFrame)

  /** Merge with a change data feed — the merge above, plus the delta-CDF
    * row-level diff downstream consumers subscribe to instead of
    * re-diffing snapshots (names from the public Delta protocol:
    * `insert`, `update_preimage`, `update_postimage`, `delete`).
    *
    * Semantics on top of [[upsert]]'s whole-row replace:
    *   - update rows with an unmatched key emit `insert`;
    *   - matched keys whose row DIFFERS from the target's (null-safe,
    *     any non-key column) emit `update_preimage` + `update_postimage`;
    *     a matched-but-identical update is a no-op and emits NOTHING —
    *     re-delivering an unchanged batch produces an empty feed, which
    *     is what makes the feed idempotent for its consumers;
    *   - `deletes` keys remove their target row and emit `delete`
    *     carrying the removed row.
    *
    * `updates` and `deletes` key sets must be disjoint (checked loudly —
    * one semi-join on the two BATCH inputs, never the target).
    *
    * At 100 TB: one target-keyed join per change kind, all on the merge
    * key, so a co-bucketed target pays zero target shuffles; the pre/post
    * pair comes from ONE inner join (a 2-struct explode), not two. The
    * feed itself is batch-sized — proportional to the changes, never the
    * target.
    */
  def upsertWithChanges(target: DataFrame, updates: DataFrame,
                        keys: Seq[String],
                        deletes: Option[DataFrame] = None): MergeResult = {
    val keyCols = keys.map(col)
    val delKeys = deletes.map(_.select(keyCols: _*).distinct())
    delKeys.foreach { d =>
      require(updates.select(keyCols: _*).join(d, keys, "left_semi")
        .isEmpty, "upsertWithChanges: a key appears in both updates and " +
        "deletes — split the batch, the merge order would be ambiguous")
    }

    val dropKeys = delKeys.fold(updates.select(keyCols: _*).distinct())(
      _.unionByName(updates.select(keyCols: _*)).distinct())
    val merged = target.join(dropKeys, keys, "left_anti")
      .unionByName(updates)

    val cols = target.columns.toSeq
    val dataCols = cols.filterNot(keys.contains)
    val inserted = updates
      .join(target.select(keyCols: _*).distinct(), keys, "left_anti")
      .select(cols.map(col) :+ lit("insert").as("_change_type"): _*)
    val joinCond = keys.map(k => col(s"t.$k") <=> col(s"u.$k"))
      .reduce(_ && _)
    val differs = dataCols.map(c => !(col(s"t.$c") <=> col(s"u.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val pre = struct(cols.map(c => col(s"t.$c").as(c)) :+
      lit("update_preimage").as("_change_type"): _*)
    val post = struct(cols.map(c => col(s"u.$c").as(c)) :+
      lit("update_postimage").as("_change_type"): _*)
    val updated = target.as("t").join(updates.as("u"), joinCond)
      .where(differs)
      .select(explode(array(pre, post)).as("r"))
      .select(col("r.*"))
    val deleted = delKeys.map(d => target.join(d, keys, "left_semi")
        .select(cols.map(col) :+ lit("delete").as("_change_type"): _*))
      .getOrElse(inserted.where(lit(false)))

    MergeResult(merged,
      inserted.unionByName(updated).unionByName(deleted))
  }
}
