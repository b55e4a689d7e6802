package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-ingest bookkeeping — the reference DAG's idempotence rule
  * (etl/dags/censo_escolar.py diffs the years already present in the
  * target bucket and processes only the missing ones) re-expressed as an
  * engine operator over hive-partitioned parquet.
  *
  * The "ledger" is the target's own partition layout: `have` comes from
  * one FS directory listing (pure metadata — no data files are opened,
  * no scan planned), `want` from the source frame's distinct partition
  * values (a bounded aggregate: partition-value cardinality, guarded).
  * Ingest appends ONLY the missing partitions' rows; a re-run finds
  * nothing missing and writes nothing, so at-least-once orchestration
  * (the Airflow retry model) converges to exactly-once state without a
  * transaction log — the same idempotence the reference gets from its
  * bucket diff, minus the driver-side Python.
  *
  * At 100 TB: cost of the no-op path is one `listStatus` + one
  * map-side-combined distinct over the source's partition column; the
  * write path touches exactly the missing partitions' rows, never the
  * table.
  */
object IngestLedger {

  /** Partition values in `source` not yet present in the target layout.
    * Values are compared in their hive-dir string form (the layout is
    * the ledger); ordering is lexicographic for determinism.
    */
  def missingPartitions(spark: SparkSession, targetRoot: String,
                        source: DataFrame, partCol: String,
                        maxPartitions: Int = 10000): Seq[String] = {
    val rootPath = new Path(targetRoot)
    val fs = FileSystem.get(rootPath.toUri,
      spark.sparkContext.hadoopConfiguration)
    val have: Set[String] =
      if (!fs.exists(rootPath)) Set.empty
      else fs.listStatus(rootPath)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partCol="))
        // hive escapes special chars in partition dir names (%xx); the
        // ledger must compare RAW values or an escaped value re-ingests
        // forever
        .map(s => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(s.getPath.getName.split("=", 2)(1)))
        .toSet
    val wantRows = source.select(col(partCol).cast("string").as("p"))
      .where(col("p").isNotNull).distinct()
      .limit(maxPartitions + 1).collect()
    require(wantRows.length <= maxPartitions,
      s"ingest ledger: source has > $maxPartitions distinct '$partCol' " +
        "values — not a partition column; raise the bound explicitly")
    wantRows.map(_.getString(0)).filterNot(have).sorted.toSeq
  }

  /** Append exactly the missing partitions' rows; returns what was added.
    * Safe to re-run: the second call lists the freshly written partition
    * dirs and finds nothing missing.
    */
  def ingestMissing(spark: SparkSession, source: DataFrame,
                    targetRoot: String, partCol: String): Seq[String] = {
    val missing = missingPartitions(spark, targetRoot, source, partCol)
    if (missing.nonEmpty)
      source.where(col(partCol).cast("string").isin(missing: _*))
        .write.mode("append").partitionBy(partCol).parquet(targetRoot)
    missing
  }
}
