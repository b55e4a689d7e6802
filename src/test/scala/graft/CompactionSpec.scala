package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compaction

/** Delta-OPTIMIZE-style small-file compaction: fragmented partitions are
  * rewritten to target-sized files, content survives byte-for-byte at the
  * row level, untouched partitions keep their files, and a second pass is
  * a no-op.
  */
class CompactionSpec extends AnyFunSuite with SparkSpec {

  private def parquetFiles(root: String, part: String): Seq[Path] = {
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(root, part))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).toSeq
  }

  test("compaction merges fragments, preserves rows, and is idempotent") {
    val docs = Tables(spark, sfDir("sf0.01"), "documents")
    val base = Tables.scratch("compaction_spec")
    docs.repartition(7).write.partitionBy("lang").mode("overwrite")
      .parquet(base)

    val beforeAgg = spark.read.parquet(base).groupBy("lang")
      .agg(count(lit(1)).as("cnt"), sum("doc_id").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val langs = beforeAgg.map(_._1)
    langs.foreach(l =>
      assert(parquetFiles(base, s"lang=$l").size === 7, s"fixture lang=$l"))

    val r1 = Compaction.compactPartitioned(spark, base, "lang",
      targetFileBytes = 64L << 20)
    assert(r1.size === langs.size && r1.forall(_.rewritten))
    langs.foreach(l =>
      assert(parquetFiles(base, s"lang=$l").size === 1,
        s"lang=$l should compact to one target-sized file"))

    val afterAgg = spark.read.parquet(base).groupBy("lang")
      .agg(count(lit(1)).as("cnt"), sum("doc_id").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(afterAgg === beforeAgg, "content must survive the rewrite")

    // second pass: nothing left fragmented → no-op, files untouched
    val filesAfter1 = langs.map(l => parquetFiles(base, s"lang=$l"))
    val r2 = Compaction.compactPartitioned(spark, base, "lang",
      targetFileBytes = 64L << 20)
    assert(r2.forall(!_.rewritten))
    assert(langs.map(l => parquetFiles(base, s"lang=$l")) === filesAfter1)
  }

  test("only fragmented partitions are rewritten; compact ones keep files") {
    val docs = Tables(spark, sfDir("sf0.01"), "documents")
    val base = Tables.scratch("compaction_partial")
    // one compact partition, the rest fragmented
    val one = docs.where(col("lang") === "en")
    val rest = docs.where(col("lang") =!= "en")
    one.coalesce(1).write.partitionBy("lang").mode("overwrite").parquet(base)
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.sources.partitionOverwriteMode")
    conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rest.repartition(5).write.partitionBy("lang").mode("overwrite")
      .parquet(base)
    finally prev match {
      case Some(v) => conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val enFiles = parquetFiles(base, "lang=en")
    val r = Compaction.compactPartitioned(spark, base, "lang",
      targetFileBytes = 64L << 20)
    assert(!r.find(_.partition == "lang=en").get.rewritten)
    assert(r.count(_.rewritten) === 4)
    assert(parquetFiles(base, "lang=en") === enFiles,
      "compact partition's files must not be touched")
  }
}
