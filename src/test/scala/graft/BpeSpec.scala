package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

/** Real-BPE tokenizer: training determinism, textbook merge behavior,
  * agreement with an independent reference apply, and the lossless
  * contract through the codegen path on real documents.
  */
class BpeSpec extends AnyFunSuite with SparkSpec {

  test("training learns the textbook merges on a toy corpus") {
    // classic Sennrich example shape: "low" dominates, so (l,o) then (lo,w)
    val corpus = Seq("low low low low low lower lower lowest")
    val merges = Bpe.train(corpus, 3)
    assert(merges.take(2).toSeq === Seq(("l", "o"), ("lo", "w")),
      merges.toSeq.toString)
  }

  test("training is deterministic, ties break lexicographically") {
    val corpus = Seq("ab cd ab cd") // (a,b) and (c,d) tie at 2 — (a,b) wins
    val m1 = Bpe.train(corpus, 1)
    val m2 = Bpe.train(corpus, 1)
    assert(m1.toSeq === m2.toSeq)
    assert(m1.head === ("a", "b"))
  }

  /** Independent reference: recursive highest-priority-merge splitting —
    * a structurally different algorithm from the codec's iterative
    * lowest-rank loop, same defined result.
    */
  private def refSegment(word: String,
                         ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = word.map(_.toString).toVector
    var changed = true
    while (changed && syms.length > 1) {
      val best = syms.zip(syms.tail).zipWithIndex
        .flatMap { case (p, i) => ranks.get(p).map(r => (r, i)) }
        .sortBy(identity).headOption
      best match {
        case Some((_, i)) =>
          syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
        case None => changed = false
      }
    }
    syms
  }

  test("distributed apply agrees with the reference on real documents") {
    val docs = Tables(spark, sfDir(), "documents").orderBy("doc_id").limit(60)
    val sample = docs.select("text").collect().map(_.getString(0)).toSeq
    val merges = Bpe.train(sample, 150)
    val ranks = merges.zipWithIndex.toMap
    val got = docs.select(col("doc_id"),
        Bpe.tokens(col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    sample.zipWithIndex.take(20).foreach { case (text, i) =>
      val expected = text.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => refSegment(w, ranks)).toSeq
      assert(got(i.toLong) === expected, s"doc $i")
    }
  }

  test("losslessness holds across the corpus via the codegen path") {
    val docs = Tables(spark, sfDir("sf0.01"), "documents")
    val sample = docs.orderBy("doc_id").limit(100)
      .select("text").collect().map(_.getString(0)).toSeq
    val merges = Bpe.train(sample, 200)
    // training may converge early (every frequent word fully merged) —
    // that's the trainer's min-count cutoff working, not a failure
    assert(merges.length >= 50, s"vocab too small: ${merges.length}")
    val bad = docs.select(
        Bpe.tokens(col("text"), merges).as("toks"), col("text"))
      .where(concat_ws("", col("toks")) =!=
        regexp_replace(col("text"), "\\s+", ""))
      .count()
    assert(bad === 0L)
  }

  test("the training contract holds beyond the toy bound: 1000 docs, " +
       "500 merges") {
    // sf0.1: 5000 docs — a 1000-doc deterministic sample through the
    // corpus-level entry point (the gate's 100-doc bound is a cheapness
    // choice, not a ceiling)
    val docs = Tables(spark, sfDir("sf0.1"), "documents")
    val merges = Bpe.trainFromCorpus(docs, "text", "doc_id",
      sampleDocs = 1000, numMerges = 500)
    // the synthetic corpus draws from a small word vocabulary, so the
    // trainer's min-count cutoff converges well before 500 merges (~90:
    // every frequent word fully merged) — the bound is the BUDGET, the
    // cutoff decides how much of it the data supports
    assert(merges.length >= 80, s"vocab too small: ${merges.length}")
    // same determinism as the small bound
    assert(Bpe.trainFromCorpus(docs, "text", "doc_id", 1000, 500).toSeq
      === merges.toSeq)
    // lossless across the FULL corpus, through the codegen apply
    val bad = docs.select(
        Bpe.tokens(col("text"), merges).as("toks"), col("text"))
      .where(concat_ws("", col("toks")) =!=
        regexp_replace(col("text"), "\\s+", ""))
      .count()
    assert(bad === 0L)
    // a bigger vocab on more data compresses at least as well as the gate's
    val r = docs.select(
        sum(size(Bpe.tokens(col("text"), merges))).as("toks"),
        sum(length(regexp_replace(col("text"), "\\s+", ""))).as("chars"))
      .head
    assert(r.getLong(0).toDouble / r.getLong(1) < 0.6)
  }

  test("a trained vocab actually compresses: tokens well under chars") {
    val docs = Tables(spark, sfDir(), "documents")
    val sample = docs.orderBy("doc_id").limit(100)
      .select("text").collect().map(_.getString(0)).toSeq
    val merges = Bpe.train(sample, 200)
    val r = docs.select(
        sum(size(Bpe.tokens(col("text"), merges))).as("toks"),
        sum(length(regexp_replace(col("text"), "\\s+", ""))).as("chars"))
      .head
    val ratio = r.getLong(0).toDouble / r.getLong(1)
    assert(ratio < 0.6, s"BPE should merge aggressively on its own " +
      s"training distribution: $ratio")
  }
}
