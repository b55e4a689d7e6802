package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain
import graft.operators.BpeTrain.Merge
import graft.sources.TokenizerStore

/** C96 contracts: publish/load round-trips the merge list in training
  * order, structural tears (rank hole, duplicate rank, meta mismatch,
  * control-char sides) are refused with the pointer untouched, version
  * pins serve historical depths — and the PREFIX-STABILITY property the
  * c96 query rests on (the first k merges of a deeper run ARE the
  * k-merge tokenizer) holds on a real corpus slice.
  */
class TokenizerStoreSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft_tokstore_$tag").toString

  private val merges8 = Seq(
    Merge(1, "t", "h"), Merge(2, "th", "e"), Merge(3, "a", "n"),
    Merge(4, "an", "d"), Merge(5, "i", "n"), Merge(6, "o", "r"),
    Merge(7, "e", "r"), Merge(8, "s", "t"))

  test("c96: publish/load round-trips merges in training order with " +
    "the watermark; pins serve historical versions") {
    val root = freshRoot("roundtrip")
    assert(TokenizerStore.publishTokenizer(s, root, merges8.take(4),
      trainedAtEpoch = 4L).committed)
    assert(TokenizerStore.publishTokenizer(s, root, merges8,
      trainedAtEpoch = 8L).committed)
    assert(TokenizerStore.committedTokenizerVersion(s, root) === 2)
    val t1 = TokenizerStore.loadTokenizerAt(s, root, 1)
    val t2 = TokenizerStore.loadTokenizer(s, root)
    assert(t1.merges === merges8.take(4) && t1.trainedAtEpoch === 4L)
    assert(t2.merges === merges8 && t2.trainedAtEpoch === 8L)
  }

  test("c96: rank hole, duplicate rank, meta depth mismatch, and " +
    "control-char sides are each REFUSED; pointer untouched") {
    val root = freshRoot("refusal")
    assert(TokenizerStore.publishTokenizer(s, root, merges8, 8L).committed)
    val good = TokenizerStore.mergesFrame(s, merges8)
    val meta8 = TokenizerStore.metaFrame(s, 8, 9L)
    val hole = TokenizerStore.publishFrames(s, root,
      good.where(col("rank") =!= 5), meta8, 8)
    assert(!hole.committed && hole.failures.exists(_.contains("dense")),
      s"rank hole must fail: $hole")
    val dup = TokenizerStore.publishFrames(s, root,
      good.where(col("rank") =!= 5).unionByName(
        good.where(col("rank") === 4)), meta8, 8)
    assert(!dup.committed, s"duplicate rank must fail: $dup")
    val mismatch = TokenizerStore.publishFrames(s, root, good,
      TokenizerStore.metaFrame(s, 6, 9L), 6)
    assert(!mismatch.committed, s"depth mismatch must fail: $mismatch")
    val ctl = TokenizerStore.publishFrames(s, root,
      good.where(col("rank") =!= 8).unionByName(
        TokenizerStore.mergesFrame(s, Seq(Merge(8, "a\u0001b", "c")))),
      meta8, 8)
    assert(!ctl.committed && ctl.failures.exists(_.contains("sides")),
      s"control-char side must fail: $ctl")
    assert(TokenizerStore.committedTokenizerVersion(s, root) === 1)
    assert(TokenizerStore.loadTokenizer(s, root).merges === merges8)
  }

  test("c96: BPE merges are prefix-stable — the first k merges of a " +
    "deeper run ARE the k-merge tokenizer (the c96 v1-from-prefix rule)") {
    val docs = Tables(s, sfDir(), "documents").limit(80)
    val deep = BpeTrain.train(docs, "text", numMerges = 10)
    val shallow = BpeTrain.train(docs, "text", numMerges = 5)
    assert(deep.take(5) === shallow,
      "a 10-round trajectory's first 5 merges diverged from a 5-round run")
  }

  test("c96: encode under the LOADED pin reproduces encode under the " +
    "in-session merges (load ≡ train state at each version)") {
    val root = freshRoot("encode")
    val docs = Tables(s, sfDir(), "documents").limit(80).cache()
    val merges = BpeTrain.train(docs, "text", numMerges = 6)
    assert(TokenizerStore.publishTokenizer(s, root, merges.take(3), 3L)
      .committed)
    assert(TokenizerStore.publishTokenizer(s, root, merges, 6L).committed)
    val pinned = TokenizerStore.loadTokenizerAt(s, root, 1)
    val fromLoad = BpeTrain
      .fertilityUnderMerges(docs, "text", "source", pinned.merges)
      .orderBy("source").collect().map(_.toSeq).toSeq
    val fromTrain = BpeTrain
      .fertilityUnderMerges(docs, "text", "source", merges.take(3))
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(fromLoad === fromTrain,
      "encode under the loaded pin diverged from the in-session merges")
    docs.unpersist()
  }
}
