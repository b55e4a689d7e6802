package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mmr

class MmrSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def vecs(vs: (Long, Array[Float])*) =
    vs.toSeq.toDF("vec_id", "embedding")

  private def cands(cs: (Long, Long, Double)*) =
    cs.toSeq.toDF("query_id", "doc_id", "rel")

  private def run(c: org.apache.spark.sql.DataFrame,
                  v: org.apache.spark.sql.DataFrame, kOut: Int,
                  lambda: Double): Seq[(Long, Int)] =
    Mmr.mmrRerank(c, v, "vec_id", "embedding", kOut, lambda)
      .orderBy("query_id", "mmr_rank")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("mmr_rank")))
      .toSeq

  test("diversity beats redundancy: the near-duplicate of the #1 pick " +
    "drops below an orthogonal lower-relevance candidate") {
    val v = vecs(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(1f, 0.01f, 0f, 0f), // cos(v1,v2) ≈ 1
      3L -> Array(0f, 1f, 0f, 0f))    // orthogonal to both
    val c = cands((0L, 1L, 0.99), (0L, 2L, 0.98), (0L, 3L, 0.5))
    // λ=0.5: pick 1 (rel max); then 2 scores .49 − .5·1 < 0 while 3
    // scores .25 − 0 — diversity wins; 2 last
    assert(run(c, v, 3, 0.5) === Seq((1L, 1), (3L, 2), (2L, 3)))
  }

  test("λ = 1 degenerates to pure relevance order") {
    val v = vecs(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(1f, 0.01f, 0f, 0f),
      3L -> Array(0f, 1f, 0f, 0f))
    val c = cands((0L, 1L, 0.5), (0L, 2L, 0.9), (0L, 3L, 0.7))
    assert(run(c, v, 3, 1.0) === Seq((2L, 1), (3L, 2), (1L, 3)))
  }

  test("kOut beyond the candidate count returns every candidate once; " +
    "ties break to the smaller doc_id") {
    val v = vecs(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(1f, 0f, 0f, 0f), // identical vector AND rel to doc 1
      3L -> Array(0f, 0f, 1f, 0f))
    val c = cands((0L, 2L, 0.8), (0L, 1L, 0.8), (0L, 3L, 0.3))
    // step 1 ties 1 vs 2 → smaller id first; step 2: 2 is fully
    // redundant (sim 1) so 3 wins; 2 comes last
    assert(run(c, v, 9, 0.5) === Seq((1L, 1), (3L, 2), (2L, 3)))
  }

  test("queries rerank independently (no cross-query state)") {
    val v = vecs(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0f, 1f, 0f, 0f),
      3L -> Array(0f, 0f, 1f, 0f))
    val c = cands(
      (0L, 1L, 0.9), (0L, 2L, 0.5),
      (7L, 2L, 0.9), (7L, 3L, 0.5))
    val out = run(c, v, 1, 0.7)
    assert(out === Seq((1L, 1), (2L, 1)))
  }

  test("negative pairwise sims are NOT clamped at zero for non-empty " +
    "selected sets (anti-correlated candidates get a diversity BONUS)") {
    val v = vecs(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(-1f, 0f, 0f, 0f), // cos(v1,v2) = −1
      3L -> Array(0f, 1f, 0f, 0f))  // cos(v1,v3) = 0
    // rel equal: after picking 1, doc 2 scores .4 − .5·(−1) = .9 while
    // doc 3 scores .4 − 0 = .4 → the anti-correlated one ranks ahead
    val c = cands((0L, 1L, 0.9), (0L, 2L, 0.8), (0L, 3L, 0.8))
    assert(run(c, v, 3, 0.5) === Seq((1L, 1), (2L, 2), (3L, 3)))
  }
}
