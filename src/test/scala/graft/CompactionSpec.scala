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

  test("vacuum removes expired aborted-write staging, never live data " +
       "or young staging, and readers never saw the orphan") {
    val docs = Tables(spark, sfDir("sf0.01"), "documents")
    val base = Tables.scratch("vacuum_spec")
    docs.write.partitionBy("lang").mode("overwrite").parquet(base)
    val fs = new Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val cleanCount = spark.read.parquet(base).count()

    // plant an aborted write: task output stranded under _temporary at
    // the root AND inside a partition dir, plus a hidden stray file —
    // exactly what a killed job leaves behind under the v1 committer
    val orphan1 = new Path(base, "_temporary/0/task_000/part-0.parquet")
    val orphan2 = new Path(base, "lang=en/_temporary/0/part-1.parquet")
    val stray = new Path(base, ".part-dead.parquet.inprogress")
    Seq(orphan1, orphan2, stray).foreach { p =>
      val out = fs.create(p, true)
      out.write("not a real parquet file".getBytes)
      out.close()
    }
    // readers never see committer staging or hidden files — the planted
    // garbage changes nothing even BEFORE vacuum (this is the visibility
    // rule that makes log-less vacuum sound)
    assert(spark.read.parquet(base).count() === cleanCount)

    // young orphans survive a 7-day retention (in-flight writer guard)
    val kept = Compaction.vacuum(spark, base)
    assert(kept.orphansFound.size === 3, kept.orphansFound.toString)
    assert(kept.removed.isEmpty, "young staging must survive retention")
    assert(fs.exists(orphan1) && fs.exists(orphan2) && fs.exists(stray))

    // age them past the window; dryRun reports but deletes nothing
    val old = System.currentTimeMillis() - 8L * 24 * 3600 * 1000
    Seq(new Path(base, "_temporary"), new Path(base, "lang=en/_temporary"),
      stray).foreach(p => fs.setTimes(p, old, -1))
    val dry = Compaction.vacuum(spark, base, dryRun = true)
    assert(dry.orphansFound.size === 3 && fs.exists(orphan1))

    val swept = Compaction.vacuum(spark, base)
    assert(swept.removed.size === 3, swept.removed.toString)
    assert(!fs.exists(new Path(base, "_temporary")) &&
      !fs.exists(new Path(base, "lang=en/_temporary")) && !fs.exists(stray))
    // _SUCCESS markers and every data file are untouched
    assert(fs.exists(new Path(base, "_SUCCESS")))
    assert(spark.read.parquet(base).count() === cleanCount)
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
