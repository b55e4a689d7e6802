package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashedClassifier

class HashedClassifierSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private val D = 512

  /** Independent reference: same contract, none of the operator's code. */
  private def md5hex(str: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(str.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  private def refBucket(f: String): Int =
    (java.lang.Long.parseLong(md5hex(f).substring(0, 8), 16) % D).toInt

  private def refLogit(text: String, w: Array[Double]): Double = {
    if (text.trim.isEmpty) 0.0
    else {
      val t = text.trim.toLowerCase.split("\\s+").toSeq
      val feats = t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      feats.map(f => w(refBucket(f))).sum
    }
  }

  private lazy val w = HashedClassifier.hashWeights("spec:", D)

  test("logit matches an independent reference EXACTLY (no tolerance)") {
    val docs = Seq(
      "the cat sat on the mat",
      "single",
      "Mixed CASE   collapses  whitespace",
      "numbers 123 and punct !!! survive tokenizing",
      "a b a b a b").toDF("text")
    val got = HashedClassifier.score(docs, "text", w.toSeq, D)
      .select("text", "logit", "n_feats", "keep").collect()
    got.foreach { r =>
      val expect = refLogit(r.getString(0), w)
      assert(r.getDouble(1) === expect,
        s"logit mismatch for '${r.getString(0)}'")
      assert(r.getBoolean(3) === (expect > 0.0))
    }
  }

  test("bag semantics: a repeated feature votes once per occurrence") {
    // hand-built model: weight 1/1024 at the bucket of "dup", 0 elsewhere
    val wv = Array.fill(D)(0.0)
    wv(refBucket("dup")) = 1.0 / 1024
    // strip bigram contributions by zeroing their buckets too (they are
    // zero already unless a bigram collides with "dup"'s bucket — then
    // this test would still count exact multiples, so assert multiples)
    val logit3 = Seq("dup dup dup").toDF("text")
      .select(HashedClassifier.logit(col("text"), wv.toSeq, D)).head.getDouble(0)
    val bigramHits = if (refBucket("dup dup") == refBucket("dup")) 2 else 0
    assert(logit3 === (3 + bigramHits) / 1024.0)
  }

  test("degenerate docs: empty and blank score zero and are dropped") {
    val got = Seq("", "   ").toDF("text")
    val rows = HashedClassifier.score(got, "text", w.toSeq, D)
      .select("n_feats", "logit", "keep").collect()
    rows.foreach { r =>
      assert(r.getInt(0) === 0)
      assert(r.getDouble(1) === 0.0)
      assert(!r.getBoolean(2))
    }
  }

  test("weights are quantized to k/1024 in [-1, 1] (exactness contract)") {
    w.foreach { x =>
      assert(x >= -1.0 && x <= 1.0)
      val k = x * 1024
      assert(k === math.rint(k), s"weight $x is not a multiple of 1/1024")
    }
  }

  test("scoring is map-only: no exchange, no UDF in the plan") {
    val docs = Seq("one small doc", "and another").toDF("text")
    val plan = HashedClassifier.score(docs, "text", w.toSeq, D)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "classifier scoring must not shuffle")
    assert(!plan.toLowerCase.contains("batchevalpython") &&
      !plan.contains("ScalaUDF"), "classifier scoring must stay codegen")
  }
}
