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

  test("rankMany == one rank() call per query, in a shared-scan plan") {
    val docs = Tables(spark, sfDir(), "documents")
    val queries = Map(0L -> Seq("hash", "vector", "stream"),
      1L -> Seq("join", "sort", "merge"))
    val many = graft.operators.Bm25.rankMany(docs, "doc_id", "text",
      queries, topK = 12)
    queries.foreach { case (qid, terms) =>
      val single = Bm25.rank(docs, "doc_id", "text", terms, topK = 12)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val ours = many.where(org.apache.spark.sql.functions.col("query_id")
          === qid).orderBy("rank")
        .collect().map(r => (r.getLong(1), r.getDouble(2)))
      assert(ours.toSeq === single.toSeq,
        s"query $qid diverges from the single-query entry point")
    }
    // the economics: one tf/score scan for ALL queries (plus the stats
    // pass) — not one per query. partialTopK's mapPartitions sits
    // between scan and exchange, so everything upstream is one pass.
    val scans = many.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 1, s"scoring stage must scan the corpus once, saw $scans")
  }

  test("c45 rrfFuse: single-list docs score one term, both-list docs " +
       "sum, ties break to doc id, topK truncates per query") {
    import graft.operators.HybridRetrieval
    import org.apache.spark.sql.functions.col
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3),
                  (1L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((0L, 11L, 1), (0L, 13L, 2),
                  (1L, 21L, 1)).toDF("query_id", "doc_id", "rank")
    val got = HybridRetrieval.rrfFuse(lex, vec, k0 = 60, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3)))
    val q0 = got.filter(_._1 == 0L).sortBy(_._4)
    // doc 11: 1/62 + 1/61 = the only both-list doc — must rank first
    assert(q0.map(_._2).toSeq === Seq(11L, 10L, 13L))
    assert(math.abs(q0.head._3 - BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // lex rank-1 (1/61) beats vec rank-2 (1/62)
    assert(q0(1)._2 === 10L && q0(1)._3 > q0(2)._3)
    // doc 12 (rank 3 lexical only, 1/63) fell off at topK=3
    assert(!q0.map(_._2).contains(12L))
    // per-query independence
    val q1 = got.filter(_._1 == 1L).sortBy(_._4)
    assert(q1.map(_._2).toSeq === Seq(20L, 21L))
    // a doc in NEITHER list never appears (full-outer, not cross)
    assert(got.length === 5)
  }
}
