package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashedClassifier
import graft.operators.{ClassifierTrain, Sampling}
import graft.streaming.ThresholdStream

/** D38 contracts: streamed histogram partials roll up to the batch C92
  * decision table row-for-row, and a replayed epoch converges.
  */
class ThresholdStreamSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  test("d38: streamed partials ≡ the batch decision table; epoch " +
    "replay converges; the selected threshold moves as data arrives") {
    val docs = Tables(spark, sfDir(), "documents")
    val classes = Seq("de", "en", "es", "fr", "zh")
    val feats = ClassifierTrain.featurizeMulti(
      docs, "text", "doc_id", "lang", 128, 2).persist()
    val model = try {
      ClassifierTrain.trainMulticlass(feats, classes, 128, 1, 2, 64L)
        .map { case (c, r) => (c, r.weights) }
    } finally { feats.unpersist() }
    // the batch (c92) path
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
      HashedClassifier.tokenCount(col("text")).as("tokens"))
    val scored = ClassifierTrain.scoreMulticlass(
      docs, "text", "doc_id", model, 128)
    val batchTable = Sampling.budgetThresholdSweep(
        scored.join(toks, "doc_id"), "margin", "tokens",
        budgetTokens = 8000L, binWidth = 50000L)
      .orderBy(col("bin").desc).collect().map(_.toSeq).toSeq
    // stage the corpus as three single-file arrivals (the d35 pattern)
    val staged = Files.createTempDirectory("graft_d38_src")
    (0 until 3).foreach { e =>
      val tmp = Files.createTempDirectory(s"graft_d38_ep$e")
      docs.where(col("doc_id") % 3 === e).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, staged.resolve(f"ep$e%02d.parquet"))
    }
    val root = Files.createTempDirectory("graft_d38_hist").toString
    val src = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val q = ThresholdStream.histogramSink(src, "text", "doc_id", model,
      128, 50000L, root, Files.createTempDirectory("graft_d38_ck").toString)
    q.awaitTermination(120000)
    // full delivery: the maintained decision table IS the batch table
    val streamed = ThresholdStream.decisionTable(s, root, 8000L)
      .orderBy(col("bin").desc).collect().map(_.toSeq).toSeq
    assert(streamed === batchTable,
      "streamed decision table diverged from the batch sweep")
    // at-least-once: re-land epoch 1's partial directly — bit-identical
    // overwrite, nothing changes
    graft.streaming.EventStreams.epochIdempotentSink(
      ThresholdStream.histogram(docs.where(col("doc_id") % 3 === 1),
        "text", "doc_id", model, 128, 50000L), 1L, root)
    val again = ThresholdStream.decisionTable(s, root, 8000L)
      .orderBy(col("bin").desc).collect().map(_.toSeq).toSeq
    assert(again === batchTable, "replayed epoch must be a no-op")
    // partial delivery decides differently: with only epoch 0 landed,
    // less mass is above any threshold, so the selected bin can only
    // be LOWER (or the fallback) — assert it differs from the full
    // table's selection in the expected direction
    val root1 = Files.createTempDirectory("graft_d38_p1").toString
    graft.streaming.EventStreams.epochIdempotentSink(
      ThresholdStream.histogram(docs.where(col("doc_id") % 3 === 0),
        "text", "doc_id", model, 128, 50000L), 0L, root1)
    val selFull = batchTable.find(_(5) == true).get.head
      .asInstanceOf[Long]
    val selPart = ThresholdStream.decisionTable(s, root1, 8000L)
      .where(col("selected")).collect().head.getLong(0)
    assert(selPart <= selFull,
      s"one-third of the data cannot support a HIGHER threshold " +
        s"($selPart vs $selFull)")
  }
}
