package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion (RRF; Cormack et al. 2009)
  * of a lexical ranking (C35 BM25) and a vector ranking (C6/C14 ANN)
  * per query: `rrf(d) = Σ_lists 1/(k0 + rank_list(d))`, the standard
  * rank-level combiner that needs NO score calibration between lists
  * (BM25 scores and cosines live on incomparable scales — fusing ranks
  * sidesteps that entirely).
  *
  * Scale shape: the heavy work is UPSTREAM in the candidate generators
  * (BM25's two corpus passes, ANN's partition-local scan) — by the time
  * fusion runs, each list is (queries × topK) rows, dim-sized by
  * construction. The fusion itself is one full-outer join on
  * (query_id, doc_id) over those dim-sized lists plus a per-query
  * window — broadcast-sized however big the corpus is. rrf is computed
  * on raw doubles in a fixed (lex + vec) operand order, so the ranking
  * is bit-reproducible cross-engine; display rounding happens after.
  */
object HybridRetrieval {

  /** Fuse two per-query rankings. Inputs carry (query_id, doc_id, rank)
    * with rank 1-based within each query; a doc absent from a list
    * contributes 0 to the sum.
    */
  def rrfFuse(lex: DataFrame, vec: DataFrame,
              k0: Int = 60, topK: Int = 10): DataFrame = {
    val l = lex.select(col("query_id"), col("doc_id"), col("rank").as("__lr"))
    val v = vec.select(col("query_id"), col("doc_id"), col("rank").as("__vr"))
    val fused = l.join(v, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(k0) + col("__lr")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("__vr")), lit(0.0)))
    val w = Window.partitionBy("query_id").orderBy(desc("rrf"), col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("doc_id"),
        round(col("rrf"), 6).as("rrf"), col("rank"))
  }
}
