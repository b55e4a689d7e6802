import org.apache.spark.sql.SparkSession

/** Throwaway probe harness (deleted before round close): times named
  * queries on a given dir the way Bench does (clearCache + pre-GC +
  * toRdd.count, best-of-2).
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
    val dir = args.head
    val names = args.tail
    val spark = graft.GraftSession
      .builder("graft-smoke", Some("local[32]"), Some(32))
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n => // warmup at tiny SF
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    }
    names.foreach { n =>
      val a = timed(spark, n, dir)
      val b = timed(spark, n, dir)
      println(f"SMOKE $n $dir best=${math.min(a, b)}%.2f runs=($a%.2f,$b%.2f)")
    }
    spark.stop()
  }
}
