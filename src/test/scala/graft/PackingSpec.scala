package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunking

/** C100 contracts: whole documents never split, bins respect the budget
  * except the flagged own-bin oversized case, bin ids are dense per
  * shard in next-fit-decreasing order, and the fold is deterministic
  * across partitionings.
  */
class PackingSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  test("c100: hand corpus packs exactly as next-fit decreasing says, " +
    "oversized doc gets its own flagged bin") {
    import s.implicits._
    // one shard (source a, band 0): tokens desc = 300!, 90, 80, 50, 40
    // budget 100 → [300] overflow, [90], [80], [50,40]
    val docs = Seq(
      (0L, "a", 90L), (4L, "a", 50L), (8L, "a", 80L),
      (12L, "a", 40L), (16L, "a", 300L)).toDF("doc_id", "source", "tk")
    val out = Chunking.packWholeDocs(docs, "doc_id", "tk", "source",
        nBands = 1, budget = 100L)
      .orderBy("bin", "doc_id")
      .collect().map(r => (r.getLong(2), r.getLong(4))).toSeq
    assert(out === Seq((16L, 0L), (0L, 1L), (8L, 2L), (4L, 3L),
      (12L, 3L)))
  }

  test("c100: every document lands in exactly one bin; non-oversized " +
    "bins respect the budget; bin ids are dense per shard") {
    val docs = Tables(s, sfDir(), "documents").select(
      col("doc_id").cast("long").as("doc_id"), col("source"),
      graft.functions.TextFunctions.tokenCount(col("text"))
        .cast("long").as("tk"))
    val packed = Chunking.packWholeDocs(docs, "doc_id", "tk", "source",
      nBands = 4, budget = 256L).cache()
    val n = docs.count()
    assert(packed.count() === n, "documents lost or duplicated")
    assert(packed.select("doc_id").distinct().count() === n,
      "a document appears in more than one row")
    val bins = packed.groupBy("source", "band", "bin")
      .agg(sum("tk").as("fill"), count(lit(1)).as("nd"))
    assert(bins.where(col("fill") > 256 && col("nd") > 1).count() === 0L,
      "a multi-doc bin exceeded the budget")
    val holes = bins.groupBy("source", "band")
      .agg(count(lit(1)).as("nb"), max("bin").as("mx"))
      .where(col("mx") =!= col("nb") - 1).count()
    assert(holes === 0L, "bin ids must be dense 0..n-1 per shard")
    packed.unpersist()
  }

  test("c100: the fold is partitioning-invariant (repartition degree " +
    "does not change any assignment)") {
    import s.implicits._
    val docs = (0L until 200L).map(i =>
      (i, s"src${i % 3}", 10L + (i * 37) % 90)).toDF("doc_id", "source", "tk")
    def run(df: org.apache.spark.sql.DataFrame) =
      Chunking.packWholeDocs(df, "doc_id", "tk", "source", 2, 128L)
        .orderBy("source", "band", "doc_id")
        .collect().map(_.toSeq).toSeq
    assert(run(docs.repartition(1)) === run(docs.repartition(13)),
      "packing drifted with the input partitioning")
  }
}
