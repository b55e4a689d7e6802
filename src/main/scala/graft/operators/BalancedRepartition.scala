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
            rowsPerFile: Long = 2000000L, maxKeys: Int = 100000): DataFrame = {
    val keyCols = partitionCols.map(col)
    // one aggregation job; the per-key counts land on the driver (one row
    // per partition value — partition columns are low-cardinality by
    // contract, same assumption hive-partitioning itself makes). The
    // collected rows come back as a local relation, so the join below
    // broadcasts driver-local data: no cache to leak, no second job.
    val spark = df.sparkSession
    // Fail fast on high-cardinality keys BEFORE collecting: cap the count
    // frame at maxKeys+1 rows so a mis-chosen partition column (say, a
    // document id) aborts with a clear message instead of OOMing the driver.
    val countRows = df.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__key_count")).limit(maxKeys + 1).collect()
    require(countRows.length <= maxKeys,
      s"BalancedRepartition: > $maxKeys distinct values in partition " +
        s"columns ${partitionCols.mkString(",")} — partition columns must " +
        "be low-cardinality (hive-partitioning contract)")
    val countSchema = org.apache.spark.sql.types.StructType(
      df.select(keyCols: _*).schema.fields.map(f =>
        f.copy(name = s"__k_${f.name}")) :+
        org.apache.spark.sql.types.StructField("__key_count",
          org.apache.spark.sql.types.LongType, nullable = false))
    val countsLocal = spark.createDataFrame(
      java.util.Arrays.asList(countRows: _*), countSchema)
    def groupsOf(n: Long): Long = math.max((n + rowsPerFile - 1) / rowsPerFile, 1L)
    // toIntExact: an Int overflow here must fail loudly — a silent wrap
    // once collapsed this to 1 shuffle partition (the opposite of balance)
    val totalGroups = math.toIntExact(
      countRows.map(r => groupsOf(r.getLong(r.length - 1))).sum).max(1)

    val joinCond = partitionCols
      .map(c => col(c) <=> col(s"__k_$c"))
      .reduce(_ && _)
    val nGroups = greatest(
      ceil(col("__key_count").cast("double") / rowsPerFile.toDouble), lit(1.0))
      .cast("long")
    val rowHash = xxhash64(df.columns.map(col).toSeq: _*)
    // Shuffle-partition count = the number of (key, salt) groups, sized so
    // reducers ≈ output files of ≈ rowsPerFile rows regardless of
    // spark.sql.shuffle.partitions (the reference inherits whatever the
    // session default is). Hash collisions can co-locate a minority of
    // groups (bounded small multiple of rowsPerFile — spec-checked);
    // note bit-identical duplicate rows share a salt by construction —
    // determinism over spread is the right trade HERE because the salt
    // decides output file placement under replay (contrast SkewJoin).
    df.join(F.broadcast(countsLocal), joinCond)
      .withColumn("__salt", pmod(rowHash, nGroups))
      .repartition(totalGroups, (keyCols :+ col("__salt")): _*)
      .drop((partitionCols.map(c => s"__k_$c") :+ "__key_count" :+ "__salt"): _*)
  }
}
