package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

/** BM25 semantics on a hand-checkable corpus, plus the plan contract:
  * no corpus explode, top-k via TakeOrdered.
  */
class Bm25Spec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark shuffle join join join"),      // dense in 'join'
    (2L, "spark join"),                        // short, one hit
    (3L, "filter scan filter scan filter scan"), // no hits
    (4L, "join " * 5 + "padding " * 495))      // long doc: length-normalized
    .toDF("id", "text")

  test("ranking: tf saturation and length normalization behave") {
    val r = Bm25.rank(corpus, "id", "text", Seq("join"), topK = 10)
      .as[(Long, Double)].collect()
    // doc 3 (no hits) is filtered entirely
    assert(r.map(_._1).toSet === Set(1L, 2L, 4L))
    val byId = r.toMap
    // doc 1 (3 hits in 5 tokens) must outrank doc 2 (1 hit in 2 tokens)
    assert(byId(1L) > byId(2L))
    // the 500-token doc's 5 hits (more raw hits than doc 1's 3) are
    // length-normalized below doc 1's dense short doc — BM25's whole
    // point vs raw tf
    assert(byId(1L) > byId(4L))
    // scores are positive and rank order is the collect order
    assert(r.map(_._2).toSeq === r.map(_._2).sorted(Ordering[Double].reverse))
  }

  test("multi-term queries sum per-term contributions; idf favors rarity") {
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common common common"),
      (3L, "common other words here")).toDF("id", "text")
    val r = Bm25.rank(docs, "id", "text", Seq("common", "rare"), topK = 3)
      .as[(Long, Double)].collect().toMap
    // 'rare' appears in 1 of 3 docs — its idf outweighs an extra 'common'
    assert(r(1L) > r(2L))
  }

  test("plan: no corpus explode; top-k is TakeOrdered, not global sort") {
    val p = Bm25.rank(Tables(spark, sfDir(), "documents"),
        "doc_id", "text", Seq("hash", "vector"), topK = 10)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Generate"),
      s"per-term tf must be array filters, not a token explode:\n${p.take(600)}")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort the corpus:\n${p.take(600)}")
  }
}
