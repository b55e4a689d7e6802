package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Count-balanced salted repartition: write partitioned output where every
  * file holds ≈ `rowsPerFile` rows, even under heavy key skew.
  *
  * Re-expression of the reference's `get_partition_balanced`
  * (/root/reference/etl/censo_escolar/transform/transform.py:155-169), with
  * three scale fixes:
  *   - the per-key count frame is tiny (one row per partition value), so we
  *     BROADCAST it back instead of shuffling the full fact table through a
  *     sort-merge join as the reference does;
  *   - the salt is a content hash (`xxhash64` over the row) mod the key's
  *     group count, not `rand()`: fully deterministic under task retries,
  *     speculative execution, and AQE re-planning — the reference's
  *     non-deterministic salt can double or lose rows when a task replays;
  *   - the count join uses null-safe equality, so null-keyed rows survive
  *     (an inner EqualTo join silently drops every null partition key).
  *
  * At 100 TB the shuffle this produces is keyed on (partition cols, salt) —
  * uniform ≤ rowsPerFile-sized reducer inputs regardless of skew.
  */
object BalancedRepartition {

  def apply(df: DataFrame, partitionCols: Seq[String],
            rowsPerFile: Long = 2000000L): DataFrame = {
    val keyCols = partitionCols.map(col)
    // tiny (one row per key value); persisted because it feeds BOTH the
    // group-count scalar below and the broadcast join
    val counts = df.groupBy(keyCols: _*).agg(count(lit(1)).as("__key_count"))
      .persist()
    val countsAliased = counts.select(
      (partitionCols.map(c => col(c).as(s"__k_$c")) :+ col("__key_count")): _*)
    val joinCond = partitionCols
      .map(c => col(c) <=> col(s"__k_$c"))
      .reduce(_ && _)
    val nGroups = greatest(
      ceil(col("__key_count").cast("double") / rowsPerFile.toDouble), lit(1.0))
      .cast("long")
    val rowHash = xxhash64(df.columns.map(col).toSeq: _*)
    // Shuffle-partition count = the number of (key, salt) groups, so each
    // group ≈ one reducer ≈ one output file regardless of
    // spark.sql.shuffle.partitions (the reference inherits whatever the
    // session default is — 200 groups into 200 partitions only by luck).
    // The count is a one-row driver-side scalar, same class of action as
    // AQE's statistics collection.
    val totalGroups = counts.agg(
      sum(greatest(ceil(col("__key_count").cast("double") / rowsPerFile.toDouble),
        lit(1.0))).cast("long")).head().getLong(0).toInt.max(1)
    df.join(F.broadcast(countsAliased), joinCond)
      .withColumn("__salt", pmod(rowHash, nGroups))
      .repartition(totalGroups, (keyCols :+ col("__salt")): _*)
      .drop((partitionCols.map(c => s"__k_$c") :+ "__key_count" :+ "__salt"): _*)
  }
}
