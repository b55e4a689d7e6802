package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity filtering — the CCNet/"quality by LM
  * surprise" stage of an LLM data pipeline: train a smoothed bigram model
  * on a reference corpus, score every document by per-bigram perplexity,
  * keep documents below a threshold. (CCNet uses a 5-gram KenLM over
  * Wikipedia; the contract here is the same shape with a bigram model
  * and add-α smoothing so the whole pipeline stays deterministic and
  * SQL-replicable end-to-end.)
  *
  * Everything is lazy, declarative DataFrames — the "model" is two count
  * tables, not driver state:
  *  - training: one explode + groupBy per n-gram order (map-side
  *    combined; token-linear shuffle of (gram, 1) pairs);
  *  - scoring: the doc bigram stream joins the count tables keyed on the
  *    gram itself. At 100 TB both sides of those joins are big, so they
  *    shuffle-hash-join on the gram key — the general shape; a model
  *    pruned to top-M grams would broadcast instead, a one-line change
  *    at the call site;
  *  - the only driver-visible scalar (vocab size) rides a broadcast
  *    1-row cross join, never a collect.
  *
  * Tokenization is the engine-wide whitespace contract
  * ([[graft.functions.TextFunctions.wsTokens]] over trim(lower(text))),
  * so DuckDB reproduces token streams bit-identically.
  */
object LanguageModel {

  /** Lazy bigram LM: unigram counts, bigram counts, and the 1-row vocab
    * stats frame. All three are unevaluated plans over the corpus.
    */
  final case class BigramLm(uni: DataFrame, bi: DataFrame, stats: DataFrame)

  private def toks(textCol: String): Column =
    split(trim(lower(col(textCol))), "\\s+")

  /** (w1, bigram) pairs of consecutive tokens; empty for docs with fewer
    * than two tokens (sequence() would flip descending on size-1 docs —
    * guarded explicitly).
    */
  private val pairsExpr =
    """CASE WHEN size(lm_toks) < 2 THEN array()
      |ELSE transform(sequence(1, size(lm_toks) - 1),
      |  i -> struct(lm_toks[i-1] AS w1,
      |              concat(lm_toks[i-1], ' ', lm_toks[i]) AS bg))
      |END""".stripMargin

  /** Train the bigram LM on `corpus`. */
  def train(corpus: DataFrame, textCol: String): BigramLm = {
    val t = corpus.select(toks(textCol).as("lm_toks"))
    val uni = t.select(explode(col("lm_toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("double").as("cu"))
    val bi = t.select(explode(expr(pairsExpr)).as("p"))
      .select(col("p.bg").as("bg"))
      .groupBy("bg").agg(count(lit(1)).cast("double").as("cb"))
    val stats = uni.agg(count(lit(1)).cast("double").as("v"))
    BigramLm(uni, bi, stats)
  }

  /** Per-document bigram perplexity under `lm` with add-α smoothing:
    * p(w2|w1) = (c(w1 w2) + α) / (c(w1) + α·(V+1)), ppl = exp(−mean ln p).
    * Unseen grams are smoothed, not crashed (left joins + coalesce), so a
    * model trained on corpus A scores corpus B. Docs with fewer than two
    * tokens return n_bigrams = 0 and NULL ppl — stated contract, both
    * engines.
    */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
                 lm: BigramLm, alpha: Double = 0.5): DataFrame = {
    val pairs = docs
      .select(col(idCol).as("lm_id"), toks(textCol).as("lm_toks"))
      .select(col("lm_id"), explode(expr(pairsExpr)).as("p"))
      .select(col("lm_id"), col("p.w1").as("w1"), col("p.bg").as("bg"))
    val scored = pairs
      .join(lm.bi, Seq("bg"), "left")
      .join(lm.uni.withColumnRenamed("w", "w1"), Seq("w1"), "left")
      .crossJoin(broadcast(lm.stats))
      .select(col("lm_id"),
        log((coalesce(col("cb"), lit(0.0)) + lit(alpha)) /
          (coalesce(col("cu"), lit(0.0)) + lit(alpha) * (col("v") + lit(1.0))))
          .as("lp"))
      .groupBy("lm_id")
      .agg(count(lit(1)).as("n_bigrams"),
        exp(-sum("lp") / count(lit(1))).as("ppl"))
    docs.select(col(idCol).as("lm_id"))
      .join(scored, Seq("lm_id"), "left")
      .select(col("lm_id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("ppl"))
  }
}
