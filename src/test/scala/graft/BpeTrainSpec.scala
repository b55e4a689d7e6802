package graft

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain

/** C77 trainer contracts, checked against an INDEPENDENT sequential
  * reference: the same (count DESC, pair ASC) ranking and the same
  * fixed-pass delimited-string merge, implemented with a plain Scala
  * map instead of DataFrames — a second implementation of the declared
  * semantics, not a replay of the Spark code.
  */
class BpeTrainSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private val D = "\u0001"
  private val P = "\u0002"

  /** Sequential reference trainer over a word-count map. */
  private def refTrain(texts: Seq[String],
                       numMerges: Int): Seq[(String, String)] = {
    var words: Map[String, Long] = texts
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) =>
        (D + w.toCharArray.map(_ + D).mkString) -> g.size.toLong
      }
    (1 to numMerges).map { _ =>
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((s0, cnt) <- words) {
        val syms = s0.split(D).filter(_.nonEmpty)
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          val k = p(0) + P + p(1)
          counts(k) = counts.getOrElse(k, 0L) + cnt
        }
      }
      val best = counts.toSeq.minBy { case (pair, n) => (-n, pair) }._1
      val Array(a, b) = best.split(P, 2)
      val pat = D + a + D + b + D
      val rep = D + a + b + D
      words = words.toSeq.map { case (s0, cnt) =>
        var cur = s0
        (1 to BpeTrain.MergePasses).foreach(_ => cur = cur.replace(pat, rep))
        cur -> cnt
      }.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
      (a, b)
    }
  }

  test("learned merges equal the sequential reference on a classic corpus") {
    val texts = Seq("low low low lower lower lowest",
      "new newer newest", "low new")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = BpeTrain.train(docs, "text", numMerges = 8)
      .map(m => (m.left, m.right))
    assert(got === refTrain(texts, 8))
    // the most frequent pair of this corpus must be learned first:
    // 'l o' appears in low(4 incl. "low new")+lower(2)+lowest = 7 times
    assert(got.head === (("l", "o")))
  }

  test("ties break on the exact pair byte order, deterministically") {
    // 'ab' and 'cd' each appear exactly 3 times; (a,b) < (c,d)
    val docs = Seq((1L, "ab ab ab cd cd cd")).toDF("doc_id", "text")
    val got = BpeTrain.train(docs, "text", numMerges = 2)
      .map(m => (m.left, m.right))
    assert(got === Seq(("a", "b"), ("c", "d")))
    val again = BpeTrain.train(docs, "text", numMerges = 2)
      .map(m => (m.left, m.right))
    assert(got === again)
  }

  test("learned merges drive the C23 tokenizer losslessly") {
    val docs = Seq((1L, "the theme then the then theme"),
      (2L, "other the them")).toDF("doc_id", "text")
    val merges = BpeTrain.train(docs, "text", numMerges = 6)
      .map(m => (m.left, m.right)).toArray
    val toks = docs.select(org.apache.spark.sql.functions.col("text"),
      graft.functions.Bpe.tokens(
        org.apache.spark.sql.functions.col("text"), merges).as("t"))
      .collect()
    toks.foreach { r =>
      assert(r.getSeq[String](1).mkString("") ===
        r.getString(0).replaceAll("\\s+", ""))
    }
  }

  test("c78: fertility falls as the vocabulary grows, chars are " +
    "invariant, and every word costs at least one token") {
    val docs = Seq(
      (1L, "low low low lower lowest new newer", "a"),
      (2L, "low lower newest new low", "b"),
      (3L, "low low new", "a")).toDF("doc_id", "text", "source")
    def report(k: Int) = BpeTrain
      .fertilityReport(docs, "text", "source", numMerges = k)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val small = report(2)
    val big = report(10)
    assert(small.keySet === Set("a", "b"))
    small.keySet.foreach { src =>
      // chars don't depend on the vocab; token counts only shrink
      assert(small(src)._3 === big(src)._3, "n_chars must be invariant")
      assert(big(src)._2 <= small(src)._2, "more merges → fewer tokens")
      assert(big(src)._4 < small(src)._4, "fertility must fall")
      assert(big(src)._4 >= 1000000L, ">= one token per word always")
    }
    // zero merges is degenerate for train(); the fertility floor is
    // exercised instead: with a big vocab every corpus word is common
    // enough to collapse far below character fertility
    val charFertility = small("a")._3 * 1000000L / small("a")._1
    assert(big("a")._4 < charFertility)
  }

  test("degenerate configurations fail loudly") {
    assertThrows[IllegalArgumentException] {
      BpeTrain.train(Seq((1L, "a b")).toDF("doc_id", "text"), "text", 0)
    }
    // single-char vocabulary exhausts after its only pairs are merged
    assertThrows[IllegalArgumentException] {
      BpeTrain.train(Seq((1L, "ab")).toDF("doc_id", "text"), "text", 5)
    }
  }

  test("c80: frozen-merge encode reproduces the C78 report on the " +
    "training corpus and degrades on a shifted one") {
    val docs = Seq(
      (1L, "low low low lower lowest new newer", "a"),
      (2L, "low lower newest new low", "b"),
      (3L, "low low new", "a")).toDF("doc_id", "text", "source")
    val k = 8
    val merges = BpeTrain.train(docs, "text", numMerges = k)
    val c78 = BpeTrain.fertilityReport(docs, "text", "source", k)
      .collect().map(r => r.toSeq).toSeq
    val encoded = BpeTrain
      .fertilityUnderMerges(docs, "text", "source", merges)
      .collect().map(r => r.toSeq).toSeq
    assert(encoded === c78,
      "re-encoding the training corpus must reproduce the C78 report")
    // shifted corpus: every word reversed — same chars, alien pair
    // statistics → fertility strictly rises for every source
    val shifted = docs.withColumn("text",
      org.apache.spark.sql.functions.reverse(col("text")))
    val shiftRep = BpeTrain
      .fertilityUnderMerges(shifted, "text", "source", merges)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val trainRep = c78.map(s =>
      s.head.asInstanceOf[String] -> s(4).asInstanceOf[Long]).toMap
    trainRep.foreach { case (src, fppm) =>
      assert(shiftRep(src) > fppm,
        s"shifted fertility must exceed training fertility for $src: " +
          s"${shiftRep(src)} vs $fppm")
    }
  }

  test("c80b: frozen fallback counts OOV words at character fertility") {
    val train = Seq((1L, "low low lower low new")).toDF("doc_id", "text")
      .withColumn("source", lit("s"))
    // eval: 'low' in-vocab, 'zzzz' OOV (4 chars → 4 fallback tokens)
    val eval = Seq((10L, "low zzzz")).toDF("doc_id", "text")
      .withColumn("source", lit("s"))
    val k = 2 // merges: (l,o) then (lo,w) → 'low' is one token
    val rep = BpeTrain
      .frozenFertilityReport(train, eval, "text", "source", k)
      .collect().head
    assert(rep.getLong(1) === 2L, "two eval words")
    assert(rep.getLong(2) === 1L, "one OOV word")
    // tokens: low = 1, zzzz = 4 (char fallback) → 5
    assert(rep.getLong(3) === 5L, s"token total: $rep")
    assert(rep.getLong(5) === 2500000L, "fertility = 5/2 words = 2.5")
  }
}
