package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain
import graft.sources.TokenizerStore
import graft.streaming.TokenizerRolloverStream
import graft.streaming.TokenizerRolloverStream.TokenizerTrainState

/** D40 contracts through the REAL sink: each arriving schedule epoch
  * deepens the vocabulary by depthPerEpoch merges and publishes one
  * tokenizer version; the streamed versions are bit-identical to the
  * ONE-SHOT trainer at the same depths (continuation ≡ one-shot — the
  * c96 prefix-stability made operational); a pinned encode session is
  * byte-stable through the flip; a replayed epoch is a structural
  * no-op and a delivery gap is refused.
  */
class TokenizerRolloverStreamSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  test("d40: stream ≡ one-shot trainer through the real sink; one " +
    "version per epoch; pinned encode stable through the flip; replay " +
    "no-op; gap refused") {
    val docs = Tables(s, sfDir(), "documents").limit(120).cache()
    // two single-row tick files → two micro-batches (epochs 0, 1)
    val staged = Files.createTempDirectory("graft_d40_src")
    val one = s.range(1).toDF("tick")
    (0 until 2).foreach { e =>
      val tmp = Files.createTempDirectory(s"graft_d40_ep$e")
      one.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, staged.resolve(f"tick$e%02d.parquet"))
    }
    val root = Files.createTempDirectory("graft_d40_store").toString
    val st = new TokenizerTrainState(docs, "text", depthPerEpoch = 6)
    val src = s.readStream.schema(one.schema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val q = TokenizerRolloverStream.snapshotSink(src, st, root,
      Files.createTempDirectory("graft_d40_ck").toString)
    q.awaitTermination(120000)
    assert(TokenizerStore.committedTokenizerVersion(s, root) === 2)
    val v1 = TokenizerStore.loadTokenizerAt(s, root, 1)
    val v2 = TokenizerStore.loadTokenizer(s, root)
    assert(v1.merges.size === 6 && v1.trainedAtEpoch === 6L)
    assert(v2.merges.size === 12 && v2.trainedAtEpoch === 12L)
    // stream ≡ one-shot: the streamed v2 IS the 12-merge trajectory,
    // and v1 its depth-6 prefix (prefix stability, by construction)
    val oneShot = BpeTrain.train(docs, "text", numMerges = 12)
    assert(v2.merges === oneShot,
      "streamed depth-12 vocabulary diverged from the one-shot trainer")
    assert(v1.merges === oneShot.take(6),
      "streamed v1 is not the one-shot prefix")
    // pinned encode byte-stable through the flip; flipped view deeper
    val blue = TokenizerRolloverStream.serveFertility(s, root, docs,
      "text", "source", pin = Some(1)).orderBy("source")
      .collect().map(_.toSeq).toSeq
    val blueExpect = BpeTrain
      .fertilityUnderMerges(docs, "text", "source", v1.merges)
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(blue === blueExpect, "pinned encode drifted across the flip")
    val green = TokenizerRolloverStream.serveFertility(s, root, docs,
      "text", "source").orderBy("source").collect().map(_.toSeq).toSeq
    assert(blue !== green,
      "v1 and v2 fertility coincided — the rollover test is vacuous")
    // replayed latest epoch: fold no-op + watermark-skipped publish
    val replay = TokenizerRolloverStream.foldAndPublish(s, st, 1L, root)
    assert(replay.replaySkipped && !replay.committed)
    assert(st.merges.size === 12, "replay must not deepen the state")
    assert(TokenizerStore.committedTokenizerVersion(s, root) === 2)
    // a delivery GAP is refused loudly (the r10 contiguity rule)
    intercept[IllegalArgumentException] {
      TokenizerRolloverStream.foldAndPublish(s, st, 5L, root)
    }
    st.close()
  }

  test("d40 restart: a FRESH driver state resuming the streaming " +
    "checkpoint refolds the deterministic trajectory before the new " +
    "epoch (r14 advice: the advertised checkpointLocation is actually " +
    "recoverable — no publishes for the catch-up epochs, the new " +
    "version is the one-shot state at its depth)") {
    val docs = Tables(s, sfDir(), "documents").limit(120).cache()
    val staged = Files.createTempDirectory("graft_d40r_src")
    val one = s.range(1).toDF("tick")
    def addTick(e: Int): Unit = {
      val tmp = Files.createTempDirectory(s"graft_d40r_ep$e")
      one.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, staged.resolve(f"tick$e%02d.parquet"))
      ()
    }
    (0 until 2).foreach(addTick)
    val root = Files.createTempDirectory("graft_d40r_store").toString
    val ck = Files.createTempDirectory("graft_d40r_ck").toString
    def run(st: TokenizerTrainState): Unit = {
      val src = s.readStream.schema(one.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged.toString)
      val q = TokenizerRolloverStream.snapshotSink(src, st, root, ck)
      q.awaitTermination(120000)
      ()
    }
    val st1 = new TokenizerTrainState(docs, "text", depthPerEpoch = 6)
    run(st1)
    st1.close()
    assert(TokenizerStore.committedTokenizerVersion(s, root) === 2)
    // RESTART: the driver died (state gone), a new schedule tick lands,
    // and the SAME checkpoint resumes at batch 2 against a fresh state
    addTick(2)
    val st2 = new TokenizerTrainState(docs, "text", depthPerEpoch = 6)
    run(st2)
    assert(st2.lastFoldedEpoch === 2L,
      "the resumed sink must refold 0..1 then fold 2")
    assert(TokenizerStore.committedTokenizerVersion(s, root) === 3,
      "exactly one NEW version — catch-up refolds must not republish")
    val v3 = TokenizerStore.loadTokenizerAt(s, root, 3)
    assert(v3.merges === BpeTrain.train(docs, "text", numMerges = 18),
      "post-restart vocabulary diverged from the one-shot trajectory")
    assert(TokenizerStore.loadTokenizerAt(s, root, 2).merges ===
      v3.merges.take(12), "pre-restart versions must be untouched")
    st2.close()
  }
}
