package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Wap

class WapSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def fs(p: String): FileSystem =
    FileSystem.get(new Path(p).toUri, spark.sparkContext.hadoopConfiguration)

  private def freshTable(name: String): String = {
    val p = Tables.scratch(s"wap_spec_$name")
    fs(p).delete(new Path(p), true)
    Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "A", 30.0))
      .toDF("k", "part", "v")
      .write.mode("overwrite").partitionBy("part").parquet(p)
    p
  }

  private def tableFiles(p: String): Set[String] = {
    val f = fs(p)
    f.listStatus(new Path(p))
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .flatMap(d => f.listStatus(d.getPath))
      .map(st => s"${st.getPath.getName}:${st.getLen}")
      .toSet
  }

  test("failed audit leaves the table bit-identical and no staging") {
    val p = freshTable("fail")
    val before = tableFiles(p)
    val bad = Seq[(java.lang.Long, String, Double)]((4L, "A", 1.0),
        (null, "B", 2.0))
      .toDF("k", "part", "v")
    val r = Wap.writeAuditPublish(spark, bad, p, "part", "b1",
      Seq(Wap.noNulls("k")))
    assert(!r.published)
    assert(r.failures.exists(_.contains("noNulls")))
    assert(tableFiles(p) === before)
    assert(!fs(p).exists(new Path(p, "_staging")))
    assert(spark.read.parquet(p).count() === 3)
  }

  test("staged-but-unpublished data is invisible to readers") {
    val p = freshTable("invisible")
    // simulate an in-flight stage: data parked under the hidden dir
    Seq((9L, "A", 99.0)).toDF("k", "part", "v")
      .write.mode("overwrite").partitionBy("part")
      .parquet(s"$p/_staging/inflight")
    assert(spark.read.parquet(p).count() === 3)
    assert(spark.read.parquet(p).agg(sum("k")).head().getLong(0) === 6L)
  }

  test("good batch publishes; replayed batchId does not duplicate") {
    val p = freshTable("replay")
    val batch = Seq((4L, "A", 40.0), (5L, "C", 50.0)).toDF("k", "part", "v")
    val r1 = Wap.writeAuditPublish(spark, batch, p, "part", "b42",
      Seq(Wap.minRows(1), Wap.noNulls("k"), Wap.uniqueKey("k")))
    assert(r1.published && r1.stagedRows === 2 && r1.publishedFiles > 0)
    assert(spark.read.parquet(p).count() === 5)
    // at-least-once delivery: the SAME batch retried must overwrite
    // itself (batchId-prefixed files replaced), never append twice
    val r2 = Wap.writeAuditPublish(spark, batch, p, "part", "b42",
      Seq(Wap.minRows(1), Wap.noNulls("k"), Wap.uniqueKey("k")))
    assert(r2.published)
    assert(spark.read.parquet(p).count() === 5)
    assert(spark.read.parquet(p).where(col("part") === "C").count() === 1)
  }

  test("distinct batches accumulate") {
    val p = freshTable("accumulate")
    val b1 = Seq((4L, "A", 40.0)).toDF("k", "part", "v")
    val b2 = Seq((5L, "B", 50.0)).toDF("k", "part", "v")
    assert(Wap.writeAuditPublish(spark, b1, p, "part", "d1",
      Seq(Wap.noNulls("k"))).published)
    assert(Wap.writeAuditPublish(spark, b2, p, "part", "d2",
      Seq(Wap.noNulls("k"))).published)
    assert(spark.read.parquet(p).count() === 5)
    assert(!fs(p).exists(new Path(p, "_staging")))
  }

  test("a35 readAsOf: snapshots see base + visible batches only; an " +
       "unknown prefix is conservatively included") {
    val p = freshTable("timetravel")
    val all = Seq("t1", "t2")
    Wap.writeAuditPublish(spark,
      Seq((10L, "A", 1.0)).toDF("k", "part", "v"), p, "part", "t1",
      Seq(Wap.minRows(1)))
    Wap.writeAuditPublish(spark,
      Seq((20L, "B", 2.0)).toDF("k", "part", "v"), p, "part", "t2",
      Seq(Wap.minRows(1)))
    def keys(vis: Seq[String]): Set[Long] =
      Wap.readAsOf(spark, p, all, vis).select("k")
        .collect().map(_.getLong(0)).toSet
    assert(keys(Seq.empty) === Set(1L, 2L, 3L), "v0 = base only")
    assert(keys(Seq("t1")) === Set(1L, 2L, 3L, 10L))
    assert(keys(Seq("t2")) === Set(1L, 2L, 3L, 20L),
      "visibility is per batch, not prefix-ordered")
    assert(keys(all) === Set(1L, 2L, 3L, 10L, 20L))
    // a batch NOT in allBatches (forgotten history) is included in
    // every snapshot — conservative, never a silent drop
    Wap.writeAuditPublish(spark,
      Seq((30L, "A", 3.0)).toDF("k", "part", "v"), p, "part", "t9",
      Seq(Wap.minRows(1)))
    assert(keys(Seq.empty).contains(30L))
  }

  test("a37 multi-publish: a failed audit blocks EVERY table, aborted " +
       "stages self-clean, old versions stay readable, retry is " +
       "idempotent") {
    import graft.sources.MultiPublish
    val root = java.nio.file.Files
      .createTempDirectory("graft_multi_pub").toString
    val fs = FileSystem.get(new Path(root).toUri,
      spark.sparkContext.hadoopConfiguration)
    val audits = Seq(Wap.minRows(1))
    val t1v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val t2v1 = Seq((10L, 1.0)).toDF("k", "x")
    val r1 = MultiPublish.publishAll(spark,
      Map("t1" -> ((t1v1, audits)), "t2" -> ((t2v1, audits))), root)
    assert(r1.committed && r1.versions === Map("t1" -> 1, "t2" -> 1))
    // failed attempt: t1's batch is fine, t2's violates — NEITHER moves
    val t1v2 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val t2bad = Seq((Option.empty[java.lang.Long], 2.0))
      .toDF("k", "x")
    val r2 = MultiPublish.publishAll(spark,
      Map("t1" -> ((t1v2, audits)),
          "t2" -> ((t2bad, Seq(Wap.noNulls("k"))))), root)
    assert(!r2.committed && r2.failures.nonEmpty)
    assert(MultiPublish.commitVersions(spark, root) ===
      Map("t1" -> 1, "t2" -> 1),
      "pointer must not move for ANY table on a partial failure")
    // the aborted stage dirs are gone — no v2 debris awaiting vacuum
    assert(!fs.exists(new Path(s"$root/t1/v2")) &&
           !fs.exists(new Path(s"$root/t2/v2")))
    assert(MultiPublish.readCommitted(spark, root, "t1").count() === 2L)
    // retry with both good: lands v2 for both in one flip
    val t2v2 = Seq((10L, 1.0), (11L, 2.0)).toDF("k", "x")
    val r3 = MultiPublish.publishAll(spark,
      Map("t1" -> ((t1v2, audits)), "t2" -> ((t2v2, audits))), root)
    assert(r3.committed && r3.versions === Map("t1" -> 2, "t2" -> 2))
    assert(MultiPublish.readCommitted(spark, root, "t1").count() === 3L)
    assert(MultiPublish.readCommitted(spark, root, "t2").count() === 2L)
    // old versions stay readable (per-table time travel)
    assert(MultiPublish.readVersion(spark, root, "t1", 1).count() === 2L)
    // unknown table fails loudly, never returns an empty frame
    intercept[IllegalStateException] {
      MultiPublish.readCommitted(spark, root, "t3")
    }
  }

  test("d22 streaming atomic publish: every micro-batch commits its " +
       "derived tables in one flip; redelivered epochs are no-ops") {
    import graft.sources.MultiPublish
    val staged = java.nio.file.Files
      .createTempDirectory("graft_d22_src")
    val epochs = Seq(Seq(("a", 1L), ("b", 2L)), Seq(("a", 3L)),
      Seq(("b", 4L), ("c", 5L)))
    epochs.zipWithIndex.foreach { case (rows, e) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_d22_ep$e")
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        staged.resolve(f"ep$e%02d.parquet"))
    }
    val root = java.nio.file.Files
      .createTempDirectory("graft_d22_root").toString
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    def derive(b: org.apache.spark.sql.DataFrame) = Map(
      "by_key" -> ((b.groupBy("k").agg(sum("v").as("s")),
        Seq(Wap.minRows(1)))),
      "totals" -> ((b.agg(sum("v").as("total")), Seq(Wap.minRows(1)))))
    val q = MultiPublish.publishStream(src, root,
      root + "/_ckpt", derive)
    q.awaitTermination(120000)
    // three epochs → both tables at v3, versions locked together
    val vs = MultiPublish.commitVersions(spark, root)
    assert(vs === Map("by_key" -> 3, "totals" -> 3))
    // committed content = epoch 3's derivation (snapshot semantics)
    val byKey = MultiPublish.readCommitted(spark, root, "by_key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey === Map("b" -> 4L, "c" -> 5L))
    assert(MultiPublish.readCommitted(spark, root, "totals")
      .head.getLong(0) === 9L)
    // every historical epoch stays readable and internally consistent
    assert(MultiPublish.readVersion(spark, root, "totals", 1)
      .head.getLong(0) === 3L)
    // a redelivered epoch (any id <= the recorded high-water mark) is a
    // structural no-op: no version moves, content bit-identical
    val replay = MultiPublish.publishAll(spark,
      derive(epochs(0).toDF("k", "v")), root, batchId = Some(0L))
    assert(replay.replaySkipped && !replay.committed)
    assert(MultiPublish.commitVersions(spark, root) === vs)
    assert(MultiPublish.readCommitted(spark, root, "by_key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap === byKey)
    // retention: keepLast=2 drops exactly v1, keeps v2 + the commit;
    // committed readers never notice
    val dropped = MultiPublish.expireVersions(spark, root, keepLast = 2)
    assert(dropped === Map("by_key" -> Seq(1), "totals" -> Seq(1)))
    assert(MultiPublish.readVersion(spark, root, "totals", 2)
      .head.getLong(0) === 3L)
    assert(MultiPublish.readCommitted(spark, root, "by_key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap === byKey)
    intercept[Exception] {
      MultiPublish.readVersion(spark, root, "totals", 1).collect()
    }
    // a second expire is a no-op (nothing left below the floor)
    assert(MultiPublish.expireVersions(spark, root, keepLast = 2)
      .values.forall(_.isEmpty))
  }
}
