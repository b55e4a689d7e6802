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
}
