package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory: the configuration this engine expects at
  * scale, in code instead of tribal knowledge. Local runs pass a
  * `local[n]` master; on a cluster the same builder applies with master
  * left to spark-submit.
  */
object GraftSession {

  def builder(appName: String, master: Option[String] = None,
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      // engine Catalyst extensions (e.g. non-equi range-join rewrite)
      .withExtensions(new graft.plans.GraftExtensions)
      // AQE re-plans at runtime: coalesces small shuffle partitions,
      // splits skewed ones — both essential when input stats are wrong
      // by 100x, which at 100 TB they always are somewhere
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // 256 MB scan splits: big enough to amortize parquet footer/dict
      // overhead, small enough that one task's columnar batches fit in
      // executor memory alongside shuffle buffers
      .config("spark.sql.files.maxPartitionBytes", "256m")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.sql.session.timeZone", "UTC")
      // ENGINE POLICY for INT64 TIMESTAMP(NANOS) parquet (Spark 4 rejects
      // it outright): such columns surface as raw nanos longs and are
      // converted in-plan (Tables.withTsFromNanos). Deciding this once at
      // session build means no operator ever mutates session conf at
      // runtime — previously the streaming source had to set this
      // session-wide mid-flight, silently changing later reads.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // RocksDB streaming state store as the ENGINE DEFAULT: the
      // HDFS-backed provider keeps every key in executor heap, capping
      // streaming state (dedup sets, session windows, sketch shards) at
      // memory size and stalling GC long before that. RocksDB spills to
      // local disk with bounded block-cache memory — at 100 TB keyspaces
      // this is the difference between a streaming job that runs and one
      // that OOMs. Ships in spark-sql (rocksdbjni bundled); same
      // exactly-once semantics via checkpoint + changelog files.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    master.foreach(b.master)
    shufflePartitions.foreach(n =>
      b.config("spark.sql.shuffle.partitions", n.toString))
    b
  }
}
