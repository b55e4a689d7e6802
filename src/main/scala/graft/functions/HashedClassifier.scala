package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear classifier scoring — model-based quality
  * filtering, the stage modern training-data pipelines run AFTER the
  * heuristic gates (C17) and BEFORE mixing: fastText's hashing trick
  * (Joulin et al. 2016 "Bag of Tricks for Efficient Text Classification")
  * as used by CCNet/DCLM/FineWeb-Edu-style model filters. A document's
  * word unigrams + bigrams are hashed into a fixed-width bucket space and
  * the classifier is one dot product against a weight vector indexed by
  * bucket.
  *
  * Spark-first shape: the whole scorer is ONE codegen'd map-only
  * projection — tokenize, hash, look up, sum — with the model shipped as
  * a single array literal (`nBuckets` doubles, KBs), so there is no model
  * table, no join, no shuffle, and corpus cost is exactly one scan. This
  * is the plan that survives 100 TB: scoring parallelism is file-split
  * parallelism.
  *
  * Cross-engine contract: buckets come from the first 8 hex chars of
  * `md5(feature)` (both engines agree bit-for-bit on md5), and weights are
  * quantized to multiples of 1/1024 in [-1, 1], so every per-document
  * logit is a sum of exactly-representable doubles — associativity-proof,
  * hash-exact across engines with NO rounding fudge.
  */
object HashedClassifier {

  /** Lowercased whitespace tokens — the same token contract as c10/C30. */
  private def toks(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Word unigrams + space-joined bigrams; empty array for blank docs.
    *
    * Bigrams pair two SLICES of the token array with `zip_with` — the
    * slices are HOF *arguments*, evaluated once per row. The obvious
    * `transform(sequence(1, n-1), i => element_at(t, i) ...)` phrasing
    * re-evaluates the full tokenizing split PER ELEMENT (codegen
    * subexpression elimination does not reach inside lambda bodies),
    * which made feature extraction O(words²) re-tokenizations per
    * document — a measured 40x slowdown on the corpus scan.
    */
  def features(text: Column): Column = {
    val t = toks(text)
    val n = size(t)
    val bigrams = when(n >= 2,
      zip_with(slice(t, lit(1), n - 1), slice(t, lit(2), n - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(concat(t, bigrams))
  }

  /** Token mass under [[features]]' own tokenizer (whitespace words,
    * blank docs count 0) — the denominator a token-budget decision
    * (C92/D38) weighs documents by. Kept HERE so budget math and
    * feature math can never disagree about what a token is.
    */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(toks(text)).cast("long"))

  /** Feature → bucket in [0, nBuckets): first 32 md5 bits mod nBuckets.
    * 8 hex chars < 2^32 always fit a long, so no sign handling needed.
    */
  def bucket(feature: Column, nBuckets: Int): Column =
    conv(substring(md5(feature), 1, 8), 16, 10).cast("long") % nBuckets

  /** Per-document logit: Σ weights(bucket(f)) over the feature bag
    * (bag semantics — a repeated feature votes once per occurrence,
    * exactly fastText's bag-of-ngrams). `weights` rides the plan as one
    * array literal; `element_at` is 1-based.
    */
  def logit(text: Column, weights: Seq[Double], nBuckets: Int): Column = {
    require(weights.length == nBuckets,
      s"weights.length=${weights.length} must equal nBuckets=$nBuckets")
    val w = typedlit(weights)
    aggregate(features(text), lit(0.0),
      (acc, f) => acc + element_at(w, (bucket(f, nBuckets) + 1).cast("int")))
  }

  /** Score a corpus: n_feats, exact logit, sigmoid probability, and the
    * keep verdict (logit > 0 ⇔ p > 0.5 — gated on the exact logit so the
    * verdict never depends on transcendental rounding).
    */
  def score(df: DataFrame, textCol: String, weights: Seq[Double],
            nBuckets: Int): DataFrame =
    df.withColumn("n_feats", size(features(col(textCol))))
      .withColumn("logit", logit(col(textCol), weights, nBuckets))
      .withColumn("p_keep", lit(1.0) / (lit(1.0) + exp(-col("logit"))))
      .withColumn("keep", col("logit") > 0.0)

  /** Deterministic synthetic model for gates and specs: weight j is
    * derived from md5(prefix ++ j) and quantized to k/1024 with
    * k ∈ [-1024, 1024] — every weight (and so every logit) is exactly
    * representable, and DuckDB can rebuild the identical model from the
    * same two md5 calls. Real deployments pass trained weights instead.
    */
  def hashWeights(prefix: String, nBuckets: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nBuckets) { j =>
      val hex = md.digest(s"$prefix$j".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      md.reset()
      ((java.lang.Long.parseLong(hex, 16) % 2049) - 1024) / 1024.0
    }
  }
}
