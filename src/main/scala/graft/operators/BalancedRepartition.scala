package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Count-balanced salted repartition: write partitioned output where every
  * file holds ≈ `rowsPerFile` rows, even under heavy key skew.
  *
  * Re-expression of the reference's `get_partition_balanced`
  * (/root/reference/etl/censo_escolar/transform/transform.py:155-169), with
  * two scale fixes:
  *   - the per-key count frame is tiny (one row per partition value), so we
  *     BROADCAST it back instead of shuffling the full fact table through a
  *     sort-merge join as the reference does;
  *   - rand() is seeded, so the plan is deterministic and retryable (a task
  *     retry in the reference can double/lose rows because the salt is
  *     non-deterministic across replays).
  *
  * At 100 TB the shuffle this produces is keyed on (partition cols, salt) —
  * uniform ≤ rowsPerFile-sized reducer inputs regardless of skew.
  */
object BalancedRepartition {

  def apply(df: DataFrame, partitionCols: Seq[String],
            rowsPerFile: Long = 2000000L, seed: Long = 42L): DataFrame = {
    val keyCols = partitionCols.map(col)
    val counts = df.groupBy(keyCols: _*).agg(count(lit(1)).as("__key_count"))
    val salted = df
      .join(F.broadcast(counts), partitionCols)
      .withColumn("__salt",
        (rand(seed) * col("__key_count") / rowsPerFile).cast("int"))
    salted
      .repartition((keyCols :+ col("__salt")): _*)
      .drop("__key_count", "__salt")
  }
}
