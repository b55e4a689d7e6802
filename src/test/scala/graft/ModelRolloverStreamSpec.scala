package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ClassifierTrain
import graft.sources.ModelStore
import graft.streaming.ModelRolloverStream

/** D39 contracts through the REAL sink: a file-arrival stream folds
  * epochs and publishes one model version per epoch; the streamed
  * versions are bit-identical to the batch fold; a blue pin keeps
  * serving the SAME scores through the rollover while the committed
  * pointer flips; a replayed epoch is a structural no-op.
  */
class ModelRolloverStreamSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  test("d39: stream ≡ batch fold through the real sink; one version " +
    "per epoch; blue pin stable through the flip; replay is a no-op") {
    val docs = Tables(s, sfDir(), "documents").limit(160).cache()
    val classes = Seq("de", "en", "es")
    // stage the corpus as two single-file epoch arrivals (epoch e =
    // pmod(doc_id, 2) = e, the d39 gate's delivery contract)
    val staged = Files.createTempDirectory("graft_d39_src")
    (0 until 2).foreach { e =>
      val tmp = Files.createTempDirectory(s"graft_d39_ep$e")
      docs.where(pmod(col("doc_id"), lit(2)) === e).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, staged.resolve(f"ep$e%02d.parquet"))
    }
    val root = Files.createTempDirectory("graft_d39_store").toString
    val st = new ClassifierTrain.OnlineMulticlassState(classes, 64, 64L)
    val src = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val q = ModelRolloverStream.snapshotSink(src, st, classes, "text",
      "doc_id", "lang", 64, root,
      Files.createTempDirectory("graft_d39_ck").toString)
    q.awaitTermination(120000)
    // one version per epoch, watermarks recorded
    assert(ModelStore.committedModelVersion(s, root) === 2)
    val v1 = ModelStore.loadModelAt(s, root, 1)
    val v2 = ModelStore.loadModel(s, root)
    assert(v1.trainedAtEpoch === 0L && v2.trainedAtEpoch === 1L)
    // stream ≡ batch: replay the same folds on a fresh state
    val batchSt = new ClassifierTrain.OnlineMulticlassState(classes, 64, 64L)
    (0 until 2).foreach { e =>
      val feats = ClassifierTrain.featurizeMulti(
        docs.where(pmod(col("doc_id"), lit(2)) === e),
        "text", "doc_id", "lang", 64, 1)
      batchSt.foldEpoch(e.toLong, feats)
    }
    classes.foreach { c =>
      assert(v2.model.toMap.apply(c).toSeq === batchSt.weights(c).toSeq,
        s"streamed v2 weights diverged from the batch fold for $c")
    }
    // blue pin through the rollover: scores pinned at v1 are identical
    // whether read before or after v2 exists (versions are immutable),
    // and the flipped view serves the deeper fold
    val blue = ModelRolloverStream.serveScores(s, root, docs, "text",
      "doc_id", pin = Some(1)).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val blueAgain = ClassifierTrain.scoreMulticlass(docs, "text",
      "doc_id", v1.model, v1.nBuckets).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(blue === blueAgain, "pinned serving drifted across the flip")
    val green = ModelRolloverStream.serveScores(s, root, docs, "text",
      "doc_id").orderBy("doc_id").collect().map(_.toSeq).toSeq
    val greenExpect = ClassifierTrain.scoreMulticlass(docs, "text",
      "doc_id", v2.model, v2.nBuckets).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(green === greenExpect,
      "committed serving must follow the flipped pointer")
    assert(blue !== green,
      "v1 and v2 scores coincided — the rollover test is vacuous")
    // replayed latest epoch: watermark-skipped, pointer and state frozen
    val replay = ModelRolloverStream.foldAndPublish(st, classes,
      docs.where(pmod(col("doc_id"), lit(2)) === 1), 1L,
      "text", "doc_id", "lang", 64, root)
    assert(replay.replaySkipped && !replay.committed)
    assert(ModelStore.committedModelVersion(s, root) === 2)
    classes.foreach { c =>
      assert(st.weights(c).toSeq === batchSt.weights(c).toSeq,
        s"replay mutated the state for $c")
    }
    docs.unpersist()
  }
}
