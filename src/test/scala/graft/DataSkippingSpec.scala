package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DataSkipping

/** Zone-map data skipping: the manifest reads only footers, pruning is
  * provably result-neutral (pruned result == full-scan result on every
  * probed range), disjoint files ARE skipped, and everything the
  * manifest can't prove safe (missing stats, unknown files, all-null
  * edge) keeps the conservative side.
  */
class DataSkippingSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // layout under test: date-clustered files, the shape an incremental
  // ingest (A15) naturally produces — each file covers a narrow key range
  private lazy val base: String = {
    val dir = Tables.scratch("dataskip_spec")
    Tables(spark, sfDir("sf0.01"), "lineitem")
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("ship"),
        col("l_returnflag"), col("l_quantity"))
      .repartitionByRange(8, col("ship"))
      .sortWithinPartitions("ship")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private lazy val stats =
    DataSkipping.collectStats(spark, base,
      Seq("l_orderkey", "ship", "l_returnflag")).cache()

  test("manifest: one row per file x column, typed families, full stats") {
    val files = DataSkipping.listVisibleParquet(spark, base)
    val zones = stats.collect()
    assert(files.nonEmpty && zones.length === files.size * 3)
    assert(zones.forall(_.hasStats))
    val byFam = zones.groupBy(_.family).view.mapValues(_.length).toMap
    assert(byFam("long") === files.size * 2) // orderkey + date
    assert(byFam("string") === files.size)   // returnflag
    // row counts in the manifest must equal the table's, per file
    assert(zones.filter(_.column == "ship").map(_.rows).sum ===
      spark.read.parquet(base).count())
    // date-clustered layout → per-file date ranges are narrow and ordered
    val ranges = zones.filter(_.column == "ship")
      .map(z => (z.minLong.get, z.maxLong.get)).sortBy(_._1).toSeq
    assert(ranges.sliding(2).forall {
      case Seq((_, hi), (lo2, _)) => hi <= lo2
      case _ => true
    }, "range-partitioned files must not interleave date ranges")
  }

  test("pruning is result-neutral and actually skips disjoint files") {
    val full = spark.read.parquet(base)
    // probe several ranges, including empty and all-covering ones
    val probes = Seq(
      (Date.valueOf("1996-01-01"), Date.valueOf("1996-03-31")),
      (Date.valueOf("1995-01-01"), Date.valueOf("2001-12-31")),
      (Date.valueOf("2005-01-01"), Date.valueOf("2005-12-31")), // empty
      (Date.valueOf("1997-06-01"), Date.valueOf("1997-06-02")))
    probes.foreach { case (lo, hi) =>
      val pr = DataSkipping.readPrunedDate(spark, base, stats.toDF,
        "ship", lo, hi)
      val expect = full.where(col("ship").between(lo, hi))
        .agg(count(lit(1)), coalesce(sum("l_orderkey"), lit(0L)))
        .as[(Long, Long)].first()
      val got = pr.df.where(col("ship").between(lo, hi))
        .agg(count(lit(1)), coalesce(sum("l_orderkey"), lit(0L)))
        .as[(Long, Long)].first()
      assert(got === expect, s"pruned result must match full scan [$lo,$hi]")
      assert(pr.report.filesRead + pr.report.filesSkipped ===
        pr.report.filesTotal)
    }
    // narrow IN-RANGE quarter on the clustered column: most files are
    // provably disjoint, yet at least one must actually be read
    val narrow = DataSkipping.readPrunedDate(spark, base, stats.toDF,
      "ship", Date.valueOf("1996-01-01"), Date.valueOf("1996-03-31"))
    assert(narrow.report.filesSkipped > 0, "disjoint files must be skipped")
    assert(narrow.report.filesRead > 0 &&
      narrow.df.where(col("ship")
        .between("1996-01-01", "1996-03-31")).count() > 0,
      "the quarter has data — the pruned read must still see it")
    // fully-disjoint range: everything skipped, empty frame, schema kept
    val none = DataSkipping.readPrunedDate(spark, base, stats.toDF,
      "ship", Date.valueOf("2005-01-01"), Date.valueOf("2005-12-31"))
    assert(none.report.filesRead === 0 && none.df.count() === 0L)
    assert(none.df.columns.toSeq ===
      Seq("l_orderkey", "ship", "l_returnflag", "l_quantity"))
  }

  test("string-family pruning uses UTF8 bounds") {
    val dir = Tables.scratch("dataskip_str")
    Seq(("alpha", 1L), ("beta", 2L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Seq(("kappa", 3L), ("mu", 4L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val st = DataSkipping.collectStats(spark, dir, Seq("k"))
    val hit = DataSkipping.readPrunedString(spark, dir, st.toDF,
      "k", "a", "c")
    assert(hit.report.filesRead === 1 && hit.report.filesSkipped === 1)
    assert(hit.df.select("k").as[String].collect().sorted ===
      Array("alpha", "beta"))
  }

  test("conservative side: unknown files read, all-null files skipped, " +
       "family mismatch read") {
    val dir = Tables.scratch("dataskip_cons")
    Seq((1L, Some(10L)), (2L, Some(20L))).toDF("id", "x")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // all-null file: provably no row can match a range predicate
    Seq((3L, None: Option[Long]), (4L, None)).toDF("id", "x")
      .coalesce(1).write.mode("append").parquet(dir)
    val st = DataSkipping.collectStats(spark, dir, Seq("x")).cache()
    val zones = st.collect()
    assert(zones.exists(z => z.hasStats && z.minLong.isEmpty),
      "all-null file must carry a provable empty zone")
    val pruned = DataSkipping.readPrunedLong(spark, dir, st.toDF,
      "x", 0L, 100L)
    assert(pruned.report.filesSkipped === 1,
      "all-null file is skippable under a null-rejecting range predicate")
    assert(pruned.df.where(col("x").between(0L, 100L)).count() === 2L)

    // a file written AFTER stats collection is not in the manifest → read
    Seq((5L, Some(999L))).toDF("id", "x")
      .coalesce(1).write.mode("append").parquet(dir)
    val late = DataSkipping.readPrunedLong(spark, dir, st.toDF,
      "x", 900L, 1000L)
    assert(late.df.where(col("x").between(900L, 1000L)).count() === 1L,
      "files unknown to the manifest must always be read")

    // pruning on a family the stats don't carry for that column → read all
    val mismatch = DataSkipping.readPrunedDouble(spark, dir, st.toDF,
      "x", 0.0, 1.0)
    assert(mismatch.report.filesSkipped === 0,
      "family mismatch proves nothing — every file must be read")
  }

  test("a33 targeted delete: disjoint files keep their exact bytes, " +
       "targets vanish, keepers survive, disjoint targets are a no-op") {
    import graft.sources.TargetedDelete
    import org.apache.hadoop.fs.{FileSystem, Path}
    val dir = Tables.scratch("targeted_delete_spec")
    val fs = FileSystem.get(new Path(dir).toUri,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dir), true)
    // 4 range-clustered files over keys 0..399
    spark.range(0, 400).toDF("k").withColumn("v", col("k") * 7)
      .repartitionByRange(4, col("k"))
      .write.mode("overwrite").parquet(dir)
    def snapshot(): Map[String, Long] = fs.listStatus(new Path(dir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap
    val before = snapshot()

    // targets cluster in the first file's range
    val rep = TargetedDelete.deleteKeys(spark, dir, "k",
      Seq(3L, 17L, 42L), batchId = "t1")
    assert(rep.rowsDeleted === 3L && rep.filesRewritten === 1 &&
      rep.filesTotal === 4)
    val after = snapshot()
    // every surviving original file is untouched — same name, same mtime
    val untouched = before.keySet.intersect(after.keySet)
    assert(untouched.size === 3, s"expected 3 untouched files: $after")
    untouched.foreach(f => assert(before(f) === after(f),
      s"file $f was rewritten despite being provably disjoint"))
    val got = spark.read.parquet(dir)
    assert(got.count() === 397L)
    assert(got.where(col("k").isin(3L, 17L, 42L)).count() === 0L)
    // keepers in the REWRITTEN file survived with their values
    assert(got.where(col("k") === 5L).head.getLong(1) === 35L)

    // a target set provably outside every zone rewrites nothing
    val noop = TargetedDelete.deleteKeys(spark, dir, "k",
      Seq(100000L), batchId = "t2")
    assert(noop.filesRewritten === 0 && noop.rowsDeleted === 0L)
    assert(spark.read.parquet(dir).count() === 397L)
  }
}
