package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions

/** Maximal Marginal Relevance reranking (Carbonell & Goldstein 1998,
  * public) — the diversity stage after retrieval: from a per-query
  * candidate list (C6/C14 ANN or C45 fused), greedily select `kOut` items
  * maximizing `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` so the final list
  * trades raw relevance against redundancy with what is already picked.
  *
  * Scale shape: everything downstream of the candidate generator is
  * dim-sized by construction — candidates are (queries × k) rows, the
  * pairwise similarity matrix is (queries × k²) rows computed in ONE
  * map-only codegen projection (the FloatCosineExpr self-join within the
  * query key — never a corpus join), and the greedy loop runs per query
  * over ≤k candidates inside `mapGroups` (bounded group state, the
  * partialTopK precedent for typed per-group logic; a k-step sequential
  * argmax is inherently ordered, so unrolling it as k shuffled window
  * rounds would buy nothing but exchanges).
  *
  * Determinism contract: rel and every pairwise sim are rounded to 6
  * decimals BEFORE the greedy (both are c6-gate-proven equal cross-engine
  * at that grid), the MMR score is combined in fixed operand order on
  * those rounded inputs, and ties break by doc_id asc — so the selected
  * set and order are engine-independent, replayable step-for-step in SQL.
  */
object Mmr {

  /** @param candidates (query_id, doc_id, rel) — rel on a 1e-6 grid;
    *                    a candidate whose doc_id is absent from
    *                    `vectors` cannot be similarity-compared and is
    *                    dropped (inner fetch join — the generator and
    *                    the vector table are the same corpus in every
    *                    composition here, so absence means a stale list)
    * @param vectors    (idCol, vecCol) — embedding source for pairwise sims
    * @return (query_id, doc_id, mmr, mmr_rank) — kOut rows per query in
    *         selection order
    */
  def mmrRerank(candidates: DataFrame, vectors: DataFrame, idCol: String,
                vecCol: String, kOut: Int, lambda: Double = 0.7): DataFrame = {
    require(kOut >= 1, "kOut must be >= 1")
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    val spark = candidates.sparkSession
    import spark.implicits._

    val vecs = vectors.select(col(idCol).as("doc_id"), col(vecCol).as("v"))
    // dim-sized candidate lists fetch their vectors via one broadcast
    // semi-shaped join against the corpus-sized vector table
    val cand = candidates.select(col("query_id").cast("long"),
        col("doc_id").cast("long"), col("rel").cast("double"))
      .join(vecs, "doc_id")

    // (queries × k²) pairwise sims, map-only codegen scoring after the
    // dim-sized self-join; rounded to the cross-engine-proven grid
    val a = cand.select(col("query_id"), col("doc_id").as("doc_a"),
      col("rel").as("rel_a"), col("v").as("va"))
    val b = cand.select(col("query_id"), col("doc_id").as("doc_b"),
      col("v").as("vb"))
    val pairs = a.join(b, Seq("query_id"))
      .select(col("query_id"), col("doc_a"), col("rel_a"), col("doc_b"),
        when(col("doc_a") === col("doc_b"), lit(1.0))
          .otherwise(F.round(
            GraftExpressions.floatCosine(col("va"), col("vb")), 6))
          .as("sim"))

    val lam = lambda
    val out = pairs
      .as[(Long, Long, Double, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (qid, it) =>
        val rows = it.toArray
        // candidate universe with rel, sims as a nested map
        val rel = scala.collection.mutable.LinkedHashMap.empty[Long, Double]
        val sim = scala.collection.mutable.Map.empty[(Long, Long), Double]
        rows.foreach { case (_, da, ra, db, s) =>
          rel(da) = ra; sim((da, db)) = s
        }
        val ids = rel.keys.toArray.sorted
        val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
        val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
        val n = math.min(kOut, ids.length)
        while (picks.length < n) {
          var bestId = -1L
          var bestScore = Double.NegativeInfinity
          ids.foreach { d =>
            if (!selected.contains(d)) {
              // max over the selected set (empty set → 0, the SQL
              // coalesce(max(...), 0) contract — NOT clamped at 0 for
              // non-empty sets, so all-negative sims stay faithful)
              var pen = 0.0
              if (selected.nonEmpty) {
                pen = Double.NegativeInfinity
                selected.foreach { s =>
                  val sm = sim((d, s))
                  if (sm > pen) pen = sm
                }
              }
              // fixed operand order on 1e-6-grid inputs → the score is
              // bit-reproducible cross-engine
              val score = lam * rel(d) - (1.0 - lam) * pen
              if (score > bestScore ||
                  (score == bestScore && (bestId < 0 || d < bestId))) {
                bestScore = score; bestId = d
              }
            }
          }
          selected += bestId
          picks += ((bestId, bestScore))
        }
        (qid, picks.toArray)
      }
      .flatMap { case (qid, picks) =>
        picks.iterator.zipWithIndex.map { case ((d, s), i) =>
          (qid, d, s, i + 1) }
      }
      .toDF("query_id", "doc_id", "mmr", "mmr_rank")
    // mmr ships RAW: with rel/sim on the 1e-6 grid the score is within
    // ~1e-9 of (7·rel − 3·pen)/1e7, so callers wanting a cross-engine-
    // stable display should scale to that integer grid (the c50 gate
    // does) — a decimal round here can straddle a half-boundary the two
    // engines resolve differently (Spark rounds the shortest decimal
    // repr, DuckDB the raw double)
    out
  }
}
