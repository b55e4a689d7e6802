package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog registration over hive-partitioned parquet — the Spark-native
  * equivalent of the reference's load step (/root/reference/etl/
  * censo_escolar/load/load_external_tables.sql: DROP TABLE + CREATE
  * EXTERNAL TABLE ... WITH PARTITION COLUMNS over the processing bucket).
  *
  * DROP + CREATE + recoverPartitions is idempotent: re-running after new
  * partitions land re-discovers them, exactly like the reference's
  * scheduled reload. The table is external (LOCATION-backed): dropping it
  * never touches data files.
  */
object CatalogTables {

  /** Register `path` (parquet, optionally hive-partitioned on
    * `partitionCols`) as external table `name`. Schema and partition
    * values are discovered from the files; partition columns become
    * catalog partitions (partition pruning applies to `WHERE` filters on
    * them).
    */
  def registerExternal(spark: SparkSession, name: String, path: String,
                       partitionCols: Seq[String] = Nil): Unit = {
    val discovered = spark.read.parquet(path)
    val missing = partitionCols.filterNot(discovered.columns.contains)
    require(missing.isEmpty, s"partition columns not present in data: $missing")

    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val colsDdl = discovered.schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val partDdl =
      if (partitionCols.isEmpty) ""
      else partitionCols.mkString("PARTITIONED BY (`", "`, `", "`)")
    spark.sql(
      s"CREATE TABLE `$name` ($colsDdl) USING PARQUET $partDdl LOCATION '$path'")
    if (partitionCols.nonEmpty) spark.catalog.recoverPartitions(name)
  }

  /** Bucketed catalog table for repeated co-located joins: two tables
    * bucketed by the same key into the same bucket count join with NO
    * shuffle exchange on either side — at 100 TB, pre-bucketing the fact
    * tables turns every subsequent key join from a full-corpus shuffle
    * into a bucket-wise merge (pay the shuffle once at write time,
    * amortize over every downstream join). `sortBy` additionally lets the
    * merge skip the per-task sort.
    */
  def writeBucketed(df: DataFrame, name: String, bucketCol: String,
                    nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    // a previous SESSION may have left the managed location on disk with
    // no catalog entry — saveAsTable refuses that orphan; remove it
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(name)
  }

  /** Collect table + column statistics into the catalog (ANALYZE TABLE
    * … COMPUTE STATISTICS [FOR COLUMNS …]) — what turns Spark's
    * cost-based optimizer on for this table. Without stats the planner
    * sees only file sizes; with rowCount + per-column NDV/min/max it can
    * pick broadcast sides after selective filters, reorder multi-way
    * joins, and size shuffles — at 100 TB the difference between the
    * plan you'd write by hand and the one a cold catalog produces.
    * Stats-driven broadcast flipping is locked in `SourcesSpec`.
    */
  def analyze(spark: SparkSession, name: String,
              columns: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE `$name` COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE `$name` COMPUTE STATISTICS FOR COLUMNS " +
        columns.map(c => s"`$c`").mkString(", "))
  }
}
