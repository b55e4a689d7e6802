package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** Shared local session for all suites (one JVM, sequential suites). */
trait SparkSpec { self: Suite =>
  lazy val spark: SparkSession = SparkSpec.session
  def sfDir(sf: String = "sf0.001"): String = s"/root/testdata/$sf"
}

object SparkSpec {
  // the engine's own factory: specs run against the DEFAULT session an
  // engine user gets (extensions, AQE, nanos policy) — not a bespoke one
  lazy val session: SparkSession = {
    val s = GraftSession
      .builder("graft-test", Some("local[4]"), Some(4))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
