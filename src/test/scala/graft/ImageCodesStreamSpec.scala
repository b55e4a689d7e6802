package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ImageDedup
import graft.sources.ImageCodeStore

/** D41 contracts through the REAL sink: arriving image epochs are
  * decoded and coded as they land; the streamed code table is
  * row-identical to the one-shot batch decode; a fresh-checkpoint
  * re-run (at-least-once redelivery) converges to the same table; and
  * serving pairs from the streamed table equals pairs from decode.
  */
class ImageCodesStreamSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  test("d41: stream ≡ batch decode through the real sink; redelivery " +
    "converges; serving reads the streamed table") {
    val docs = Tables(s, sfDir(), "documents").select("doc_id").limit(60)
    val packed = ImageDedup.packImageVariants(s, docs, "doc_id").cache()
    // stage the corpus as two single-file epoch arrivals by id parity
    val staged = Files.createTempDirectory("graft_d41_src")
    (0 until 2).foreach { e =>
      val tmp = Files.createTempDirectory(s"graft_d41_ep$e")
      packed.where(pmod(col("media_id"), lit(2)) === e).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, staged.resolve(f"ep$e%02d.parquet"))
    }
    val root = Files.createTempDirectory("graft_d41_store").toString
    assert(ImageCodeStore.publishSpec(s, root, "blockhash", 8, 4).committed)
    def runSink(): Unit = {
      val src = s.readStream.schema(packed.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged.toString)
      ImageCodesStreamRun.run(src, root)
    }
    runSink()
    val batch = ImageDedup.blockhashCodes(s, packed)
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    def storedRows() = ImageCodeStore.readCodes(s, root, 1)
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(storedRows() === batch,
      "streamed code table diverged from the one-shot batch decode")
    // at-least-once redelivery: a FRESH checkpoint replays both epochs;
    // the D8 partition rule converges the table, not duplicates it
    runSink()
    assert(storedRows() === batch, "redelivery must converge, not append")
    // serving from the streamed table answers the decode question
    val fromStream = ImageDedup
      .perceptualPairs(ImageCodeStore.readCodes(s, root, 1), 3, 64)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    val fromDecode = ImageDedup
      .perceptualPairs(ImageDedup.blockhashCodes(s, packed), 3, 64)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    assert(fromStream === fromDecode && fromStream.nonEmpty)
  }
}

/** Isolates the sink start/await so the spec body reads as contracts. */
private object ImageCodesStreamRun {
  def run(src: org.apache.spark.sql.DataFrame, root: String): Unit = {
    val q = graft.streaming.ImageCodesStream.ingestSink(src, root,
      Files.createTempDirectory("graft_d41_ck").toString)
    q.awaitTermination(120000)
    ()
  }
}
