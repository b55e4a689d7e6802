package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema-driven delimited-text source + partitioned parquet sink — the
  * engine's ingest/egress surface, re-expressing the reference's
  * `load_csv` / `save` (/root/reference/etl/censo_escolar/transform/
  * transform.py:53-65,172-175).
  *
  * The schema arrives as StructType JSON (same format the reference keeps
  * under transform/schemas/) so ingestion never infers types — at 100 TB a
  * schema-inference pass is a full extra read of the data.
  */
object SchemaCsv {

  def schemaFromJson(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]

  /** Read `|`-delimited (or any delimiter) CSV with an explicit schema.
    * PERMISSIVE mode + a corrupt-record column would be the production
    * setting; FAILFAST here so tests catch schema drift loudly.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           delimiter: String = "|", header: Boolean = true,
           encoding: String = "UTF-8", mode: String = "FAILFAST"): DataFrame =
    spark.read
      .options(Map(
        "header" -> header.toString,
        "delimiter" -> delimiter,
        "encoding" -> encoding,
        "mode" -> mode))
      .schema(schema)
      .csv(path)

  /** Streaming twin of [[read]] — the reference's file-arrival model
    * (yearly census drops landing in a bucket, detected by an Airflow
    * diff) expressed Spark-native: new files in `path` flow through the
    * SAME transform chain incrementally. Every censo transform is a pure
    * projection, so [[graft.pipeline.CensoPipeline.run]] applies to this
    * streaming frame verbatim (spec-locked equal to the batch result);
    * pair with an append parquet sink + checkpoint for exactly-once
    * ingest of each drop, replacing the external orchestrator's
    * bookkeeping.
    */
  def readStream(spark: SparkSession, path: String, schema: StructType,
                 delimiter: String = "|", header: Boolean = true,
                 encoding: String = "UTF-8"): DataFrame =
    spark.readStream
      .options(Map(
        "header" -> header.toString,
        "delimiter" -> delimiter,
        "encoding" -> encoding))
      .schema(schema)
      .csv(path)

  /** Production ingest mode: PERMISSIVE parse with the raw line of every
    * malformed record captured in `_corrupt_record` — bad rows become
    * data you can count/quarantine instead of a failed 100 TB job (the
    * FAILFAST variant above is for tests, where schema drift should be
    * loud). Callers filter `col("_corrupt_record").isNotNull` into a
    * quarantine sink and drop the column on the clean path. Note Spark
    * refuses projections that reference ONLY `_corrupt_record` straight
    * off raw files — persist the parsed frame first (one pass), then
    * split clean/quarantine from the cached result.
    */
  def readPermissive(spark: SparkSession, path: String, schema: StructType,
                     delimiter: String = "|", header: Boolean = true,
                     encoding: String = "UTF-8"): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    spark.read
      .options(Map(
        "header" -> header.toString,
        "delimiter" -> delimiter,
        "encoding" -> encoding,
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record"))
      .schema(withCorrupt)
      .csv(path)
  }

  /** Hive-partitioned parquet sink (transform.py:172-175): snappy parquet,
    * directory-partitioned on low-cardinality keys. Combine with
    * [[graft.operators.BalancedRepartition]] upstream so each task writes
    * one ≈uniform file per (partition, salt) group.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: String = "overwrite"): Unit =
    df.write
      .partitionBy(partitionCols: _*)
      .option("compression", "snappy")
      .mode(mode)
      .parquet(path)

  /** Idempotent partitioned sink: appends new partition values, but
    * re-running the SAME partition value REPLACES it instead of
    * duplicating rows (dynamic partition overwrite — only partitions
    * present in `df` are touched). The reference gets idempotence only
    * from an Airflow-side diff of years already in the bucket
    * (etl/dags/censo_escolar.py:39-48) and silently double-loads if that
    * guard is bypassed; here a replayed year is safe by construction.
    */
  def writePartitionedIdempotent(df: DataFrame, path: String,
                                 partitionCols: Seq[String]): Unit = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = conf.getOption(key)
    conf.set(key, "dynamic")
    try
      df.write
        .partitionBy(partitionCols: _*)
        .option("compression", "snappy")
        .mode("overwrite")
        .parquet(path)
    finally prev match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  /** Partition-discovery read of a hive-partitioned dataset — the engine-side
    * equivalent of the reference's BigQuery external tables
    * (load/load_external_tables.sql: `WITH PARTITION COLUMNS`).
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
