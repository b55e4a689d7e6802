package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access. All graft operators are table-agnostic; this is just
  * the harness-side loader for the driver-generated TPC-H-ish parquet.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scratch dir for sink/roundtrip operators (kept inside the repo tree). */
  def scratch(sub: String): String = {
    val p = s"/root/repo/target/scratch/$sub"
    new java.io.File(p).getParentFile.mkdirs()
    p
  }
}
