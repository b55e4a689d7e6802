import org.apache.spark.sql.SparkSession

/** Throwaway b25 probe harness (deleted before round close): times
  * b25_fuzzy_join on the existing 10-/100-copy replicas the way Bench
  * does (clearCache + pre-GC + toRdd.count, best-of-2).
  */
object Smoke {
  private def timed(spark: SparkSession, name: String, dir: String): Double = {
    spark.sqlContext.clearCache()
    System.gc(); Thread.sleep(50)
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession
      .builder("graft-smoke-b25", Some("local[32]"), Some(32))
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup at tiny SF
    graft.SparkEntry.queries("b25_fuzzy_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.toRdd.count()
    for (dir <- args) {
      val a = timed(spark, "b25_fuzzy_join", dir)
      val b = timed(spark, "b25_fuzzy_join", dir)
      println(f"SMOKE b25 $dir best=${math.min(a, b)}%.2f runs=($a%.2f,$b%.2f)")
    }
    spark.stop()
  }
}
