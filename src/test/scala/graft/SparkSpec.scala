package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** Shared local session for all suites (one JVM, sequential suites). */
trait SparkSpec { self: Suite =>
  lazy val spark: SparkSession = SparkSpec.session
  def sfDir(sf: String = "sf0.001"): String = s"/root/testdata/$sf"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
