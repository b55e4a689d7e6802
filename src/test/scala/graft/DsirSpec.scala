package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

class DsirSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private val D = 256

  // two disjoint vocabularies: target-flavored and off-target
  private def corpus = Seq(
    (1L, "alpha beta gamma alpha beta"),
    (2L, "beta gamma alpha gamma"),
    (3L, "alpha alpha beta gamma beta"),
    (4L, "zork quux blarg zork quux"),
    (5L, "quux blarg zork blarg"),
    (6L, "")).toDF("doc_id", "text")

  private def md5hex(str: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(str.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  private def refBucket(f: String): Int =
    (java.lang.Long.parseLong(md5hex(f).substring(0, 8), 16) % D).toInt

  private def refFeats(text: String): Seq[String] =
    if (text.trim.isEmpty) Seq.empty
    else {
      val t = text.trim.toLowerCase.split("\\s+").toSeq
      t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }

  test("logw matches an independent end-to-end reference EXACTLY") {
    val docs = corpus.where(length(col("text")) > 0 || col("doc_id") === 6L)
    val target = corpus.where(col("doc_id") <= 3L)
    // independent model: count buckets with none of the operator's code
    val ct = Array.fill(D)(0L); val cr = Array.fill(D)(0L)
    var nt = 0L; var nr = 0L
    corpus.collect().foreach { r =>
      val id = r.getLong(0); val fs = refFeats(r.getString(1))
      fs.foreach { f =>
        val b = refBucket(f)
        cr(b) += 1; nr += 1
        if (id <= 3L) { ct(b) += 1; nt += 1 }
      }
    }
    val refLr = Array.tabulate(D) { j =>
      math.log((ct(j) + 0.5) / (nt + 0.5 * D)) -
        math.log((cr(j) + 0.5) / (nr + 0.5 * D))
    }
    val lr = Dsir.logRatios(target, corpus, "text", D)
    assert(lr.toSeq === refLr.toSeq, "model arrays diverge")
    val got = Dsir.score(corpus, "text", lr.toSeq, D)
      .select("doc_id", "text", "logw").collect()
    got.foreach { r =>
      val expect = refFeats(r.getString(1)).map(f => refLr(refBucket(f))).sum
      assert(r.getDouble(2) === expect, s"doc ${r.getLong(0)} logw diverges")
    }
  }

  test("one-pass logRatiosByFlag equals the two-pass form EXACTLY") {
    val twoPass = Dsir.logRatios(corpus.where(col("doc_id") <= 3L),
      corpus, "text", D)
    val onePass = Dsir.logRatiosByFlag(corpus, col("doc_id") <= 3L,
      "text", D)
    assert(onePass.toSeq === twoPass.toSeq)
  }

  test("target-flavored docs outscore off-target docs; empty doc is 0") {
    val lr = Dsir.logRatios(corpus.where(col("doc_id") <= 3L), corpus,
      "text", D)
    val rows = Dsir.score(corpus, "text", lr.toSeq, D)
      .select("doc_id", "logw", "keep").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    val tMin = (1L to 3L).map(rows(_)._1).min
    val oMax = (4L to 5L).map(rows(_)._1).max
    assert(tMin > oMax,
      s"every target doc must outscore every off-target doc ($tMin <= $oMax)")
    // absolute sign for target docs depends on bucket collisions at a
    // 256-bucket space, so only the off-target side is sign-asserted:
    // purely off-target vocabulary must always score negative (its
    // buckets carry no target mass beyond smoothing)
    (4L to 5L).foreach(id => assert(!rows(id)._2, s"doc $id must drop"))
    assert(rows(6L) === ((0.0, false)), "empty doc scores 0 and drops")
  }

  test("gumbel top-k: deterministic, partition-invariant, follows logw") {
    val lr = Dsir.logRatios(corpus.where(col("doc_id") <= 3L), corpus,
      "text", D)
    val scored = Dsir.score(corpus, "text", lr.toSeq, D)
    def kept(df: org.apache.spark.sql.DataFrame) =
      Dsir.sampleTopK(df, "doc_id", 3, "g6")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = kept(scored)
    val b = kept(scored.repartition(7).orderBy(desc("doc_id")))
    assert(a === b, "kept set must not depend on partitioning or order")
    assert(a.size === 3)
    // widen the gap so noise cannot flip the selection: ±40 nats means
    // exp-weight ratios of e^80 — the 3 boosted docs MUST win
    val forced = scored.withColumn("logw",
      when(col("doc_id") <= 3L, lit(40.0)).otherwise(lit(-40.0)))
    assert(kept(forced) === Set(1L, 2L, 3L))
  }

  test("scoring is map-only and selection is TakeOrdered (no global sort)") {
    val lr = Seq.fill(D)(0.1)
    val scored = Dsir.score(corpus, "text", lr, D)
    val p = scored.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "scoring must not shuffle")
    val sel = Dsir.sampleTopK(scored, "doc_id", 2, "s")
    val sp = sel.queryExecution.executedPlan.toString
    assert(sp.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n${sp.take(500)}")
  }
}
