package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BM25 ranked retrieval — keyword search over the corpus, the lexical
  * complement of the embedding ANN stack (C6/C7/C14): Robertson's
  * probabilistic term weighting with tf saturation (`k1`) and document-
  * length normalization (`b`), the default ranking function of every
  * major search engine (public formula, e.g. Robertson & Zaragoza 2009).
  *
  * Execution shape, built for a corpus-sized `docs`: per-term tf columns
  * are map-only `filter(tokens, = term)` projections (query term sets
  * are human-sized — bounded at 64 — so this is |terms| codegen'd
  * passes over each row's token array, no explode of the corpus into a
  * token table and no posting-list shuffle); corpus statistics (N,
  * total length, per-term document frequencies) come from ONE
  * map-side-combined aggregate whose output is a single driver row —
  * the same KB-state contract as the k-means centroids; idf weights
  * then ride the scoring projection as literals. The only wide work is
  * the final top-k, which the optimizer runs as TakeOrdered (per-
  * partition heaps + driver merge of k·parts rows), never a global
  * sort. Whitespace tokens via [[TextFunctions.wsTokens]] — the
  * c10-proven cross-engine contract, so the whole ranking is
  * DuckDB-replicable.
  *
  * Scores are rounded to 4 decimals BEFORE the ordering so the
  * (score, id) tie-break is deterministic across engines; ranking
  * shifts from the rounding are confined to genuinely ~1e-4-close
  * scores, where no ranking is meaningfully better.
  */
object Bm25 {

  def rank(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], topK: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 64,
      "Bm25.rank: terms must be a human-sized query (1..64 terms)")
    require(terms.distinct == terms, "Bm25.rank: duplicate query terms")
    val tf = docs.select(col(idCol),
      TextFunctions.wsTokens(lower(col(textCol))).as("__toks"))
      .withColumn("__len", size(col("__toks")))
      .select(col(idCol) +: col("__len") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("__toks"), x => x === lit(t))).as(s"__tf_$i")
        }: _*)

    val st = tf.agg(
      count(lit(1)).as("__n"),
      (sum(col("__len")) +:
        terms.indices.map(i => sum(when(col(s"__tf_$i") > 0, 1L)
          .otherwise(0L)).as(s"__df_$i"))): _*).head()
    val n = st.getAs[Long]("__n").max(1L)
    val avgLen = st.getAs[Long](1).toDouble / n
    val idf = terms.indices.map { i =>
      val dfi = st.getAs[Long](s"__df_$i").toDouble
      math.log((n - dfi + 0.5) / (dfi + 0.5) + 1.0)
    }

    val score: Column = terms.indices.map { i =>
      lit(idf(i)) * col(s"__tf_$i") * lit(k1 + 1.0) /
        (col(s"__tf_$i") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("__len") / lit(avgLen)))
    }.reduce(_ + _)

    tf.select(col(idCol), round(score, 4).as("score"))
      .where(col("score") > 0)
      .orderBy(desc("score"), col(idCol))
      .limit(topK)
  }

  /** Multi-query ranking in ONE corpus pass per stage instead of one
    * [[rank]] call per query (N queries must not mean N corpus scans):
    * the tf projection carries the UNION of all query term sets, the
    * stats aggregate lands every term's df in the same single driver
    * row, and per-query scores are `stack`ed to (query_id, doc_id,
    * score) rows MAP-SIDE — constant fan-out of |queries| per doc,
    * before any exchange. Per-query top-k then runs exactly like the
    * ANN scan: per-partition bounded heaps ([[Similarity.partialTopK]])
    * so the only shuffled rows are k·partitions·|queries| candidates,
    * merged by one window over that dim-sized remainder.
    *
    * Scores are bit-identical to per-query [[rank]] calls (same stats,
    * same formula, same rounding) — only the plan changes, which is why
    * c45's oracle needs no knowledge of which entry point ran.
    */
  def rankMany(docs: DataFrame, idCol: String, textCol: String,
               queries: Map[Long, Seq[String]], topK: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "Bm25.rankMany: no queries")
    queries.foreach { case (q, ts) =>
      require(ts.nonEmpty && ts.distinct == ts,
        s"Bm25.rankMany: query $q terms must be non-empty and distinct") }
    val allTerms = queries.values.flatten.toSeq.distinct.sorted
    require(allTerms.size <= 64,
      "Bm25.rankMany: union of query terms must stay human-sized (<= 64)")
    val termIdx = allTerms.zipWithIndex.toMap

    val tf = docs.select(col(idCol),
      TextFunctions.wsTokens(lower(col(textCol))).as("__toks"))
      .withColumn("__len", size(col("__toks")))
      .select(col(idCol) +: col("__len") +:
        allTerms.zipWithIndex.map { case (t, i) =>
          size(filter(col("__toks"), x => x === lit(t))).as(s"__tf_$i")
        }: _*)
    val st = tf.agg(
      count(lit(1)).as("__n"),
      (sum(col("__len")) +:
        allTerms.indices.map(i => sum(when(col(s"__tf_$i") > 0, 1L)
          .otherwise(0L)).as(s"__df_$i"))): _*).head()
    val n = st.getAs[Long]("__n").max(1L)
    val avgLen = st.getAs[Long](1).toDouble / n
    val idf = allTerms.indices.map { i =>
      val dfi = st.getAs[Long](s"__df_$i").toDouble
      math.log((n - dfi + 0.5) / (dfi + 0.5) + 1.0)
    }
    def scoreOf(terms: Seq[String]): Column = terms.map { t =>
      val i = termIdx(t)
      lit(idf(i)) * col(s"__tf_$i") * lit(k1 + 1.0) /
        (col(s"__tf_$i") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("__len") / lit(avgLen)))
    }.reduce(_ + _)

    val qids = queries.keys.toSeq.sorted
    val scored = tf.select(col(idCol) +: qids.map(q =>
      round(scoreOf(queries(q)), 4).as(s"__s_$q")): _*)
    val stacked = qids.map(q => s"CAST($q AS BIGINT), __s_$q").mkString(", ")
    val long = scored.selectExpr(idCol,
        s"stack(${qids.size}, $stacked) AS (query_id, score)")
      .where(col("score") > 0)

    val pruned = Similarity.partialTopK(
      long.select(col("query_id"), col(idCol).as("neighbor_id"),
        col("score").as("cos")), topK)
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), col("neighbor_id"))
    pruned.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id").as(idCol),
        col("cos").as("score"), col("rank"))
  }
}
