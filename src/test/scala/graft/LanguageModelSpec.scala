package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LanguageModel

/** Bigram-LM perplexity: hand-computed smoothed probabilities on a tiny
  * corpus (the oracle-checked query locks the full-corpus replica; these
  * lock the formula itself), the unseen-gram smoothing path, and the
  * short-doc contract.
  */
class LanguageModelSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  // uni: a=3 b=3 x=1 ""=1 → V=4;  bi: "a b"=3, "b a"=1
  private def corpus = Seq(
    (1L, "a b a b"), (2L, "a b"), (3L, "x"), (4L, "")
  ).toDF("doc_id", "text")

  private lazy val lm = LanguageModel.train(corpus, "text")

  private def ppl(df: org.apache.spark.sql.DataFrame) =
    LanguageModel.perplexity(df, "doc_id", "text", lm)
      .as[(Long, Long, Option[Double])].collect()
      .map { case (id, n, p) => id -> ((n, p)) }.toMap

  test("smoothed bigram perplexity matches the hand formula") {
    val out = ppl(corpus)
    // α=0.5, V=4: p(b|a) = (3+0.5)/(3+0.5·5) = 3.5/5.5
    val pAB = 3.5 / 5.5
    val pBA = 1.5 / 5.5
    val (n2, Some(p2)) = out(2L)
    assert(n2 === 1L)
    assert(math.abs(p2 - 1.0 / pAB) < 1e-9)
    val (n1, Some(p1)) = out(1L)
    assert(n1 === 3L)
    assert(math.abs(p1 - math.pow(pAB * pAB * pBA, -1.0 / 3.0)) < 1e-9)
  }

  test("docs with fewer than two tokens: n_bigrams = 0, NULL ppl") {
    val out = ppl(corpus)
    assert(out(3L) === ((0L, None)))
    assert(out(4L) === ((0L, None)))
  }

  test("unseen grams score through smoothing, never crash or NaN") {
    val other = Seq((9L, "q q q")).toDF("doc_id", "text")
    val out = ppl(other)
    // every "q q" bigram: cb=0, cu=0 → p = 0.5/(0.5·5) = 0.2 → ppl = 5
    val (n9, Some(p9)) = out(9L)
    assert(n9 === 2L)
    assert(math.abs(p9 - 5.0) < 1e-9)
  }

  test("repetitive text scores lower perplexity than novel text") {
    val docs = Seq((1L, "a b a b a b a b"), (2L, "m n o p q r s t"))
      .toDF("doc_id", "text")
    val m = LanguageModel.train(docs, "text")
    val out = LanguageModel.perplexity(docs, "doc_id", "text", m)
      .as[(Long, Long, Option[Double])].collect()
      .map { case (id, _, p) => id -> p.get }.toMap
    assert(out(1L) < out(2L))
  }

  test("plan is UDF-free and cartesian-free (1-row stats ride a broadcast)") {
    val plan = LanguageModel.perplexity(corpus, "doc_id", "text", lm)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(500))
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }
}
