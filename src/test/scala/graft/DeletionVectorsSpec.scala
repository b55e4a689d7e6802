package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DeletionVectors

class DeletionVectorsSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft_dv").toString
    Tables(spark, sfDir(), "orders")
      .withColumn("okey", when(col("o_orderkey") % 7 === 0,
        lit(null).cast("long")).otherwise(col("o_orderkey")))
      .drop("o_orderkey")
      .repartitionByRange(4, col("okey"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("mark is zero-write-amplification (no data file touched), read " +
       "merges marks out, NULL keys always survive") {
    val dir = freshTable()
    val before = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.lastModified, f.length)).toMap
    val targets = Seq(1L, 2L, 3L, 5L, 32L, 33L)
    val rep = DeletionVectors.markDeleted(spark, dir, "okey", targets, "b1")
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.lastModified, f.length)).toMap
    assert(after === before, "mark must not touch any data file")
    assert(rep.filesScanned < rep.filesTotal,
      "zone pruning must skip files disjoint from the targets")

    val total = spark.read.parquet(dir).count()
    val present = spark.read.parquet(dir)
      .where(col("okey").isin(targets: _*)).count()
    assert(rep.rowsMarked === present)
    val mor = DeletionVectors.readWithDeletes(spark, dir, "okey")
    assert(mor.count() === total - present)
    assert(mor.where(col("okey").isin(targets: _*)).count() === 0L)
    // NULL keys are structurally unmarkable and survive the merge
    val nulls = spark.read.parquet(dir).where(col("okey").isNull).count()
    assert(nulls > 0 &&
      mor.where(col("okey").isNull).count() === nulls)
  }

  test("apply compacts marks away: plain read equals the MoR read, " +
       "sidecars drop, second apply is a no-op, remark overwrites itself") {
    val dir = freshTable()
    val targets = (1L to 50L).filter(_ % 7 != 0)
    DeletionVectors.markDeleted(spark, dir, "okey", targets, "b1")
    // a retried mark of the same batch overwrites, not duplicates
    DeletionVectors.markDeleted(spark, dir, "okey", targets, "b1")
    val morRows = DeletionVectors.readWithDeletes(spark, dir, "okey")
      .agg(count(lit(1)), round(sum("o_totalprice"), 2)).collect()(0)
    val rep = DeletionVectors.applyDeletes(spark, dir, "okey", "a1")
    assert(rep.rowsRemoved > 0)
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)
    assert(!fsys.exists(new Path(dir, "_deletes")))
    assert(!fsys.exists(new Path(dir, "_staging_dv")))
    val plainRows = spark.read.parquet(dir)
      .agg(count(lit(1)), round(sum("o_totalprice"), 2)).collect()(0)
    assert(plainRows === morRows,
      "post-apply plain read must equal the pre-apply MoR read")
    assert(DeletionVectors.applyDeletes(spark, dir, "okey", "a2")
      === DeletionVectors.ApplyReport(0, 0L))
    // and the MoR reader over a clean table is just the table
    assert(DeletionVectors.readWithDeletes(spark, dir, "okey").count()
      === spark.read.parquet(dir).count())
  }
}
