package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.functions.HashedClassifier

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023):
  * select raw-corpus documents that LOOK LIKE a target domain, with
  * probability ∝ exp(log p_target(x) − log p_raw(x)) under hashed
  * bag-of-ngrams models. The third leg of the quality stack: C17 gates on
  * heuristics, C37 on a trained discriminator, DSIR matches a target
  * DISTRIBUTION — no labels, no classifier, just two count vectors.
  *
  * Spark-first shape: both "models" are D-bucket count vectors (the C37
  * feature/bucket contract — unigrams+bigrams, md5-hashed), built with one
  * map-side-combined aggregate each over ≤ D keys and collected driver-side
  * (bounded by construction: D rows). The per-bucket log-ratio array then
  * ships back as ONE plan literal, so scoring — like C37 — is a joinless
  * map-only codegen pass, and Gumbel-top-k selection is a TakeOrdered, not
  * a global sort. Nothing in the pipeline shuffles more than D rows.
  *
  * Cross-engine: bucket counts are integers, the smoothed probabilities
  * are IEEE divisions of identical rationals, and ln differs across
  * engines by ≤ 1 ulp per term — the gate rounds the summed log-weight to
  * 4 decimals (the c30 transcendental contract).
  */
object Dsir {

  /** Dense bucket-count vector + total feature mass of a corpus.
    * The groupBy key space is ≤ nBuckets, so the shuffle and the collect
    * are constant-size regardless of corpus size.
    */
  private def bucketCounts(df: DataFrame, textCol: String,
                           nBuckets: Int): (Array[Long], Long) = {
    val rows = df
      .select(explode(HashedClassifier.features(col(textCol))).as("f"))
      .select(HashedClassifier.bucket(col("f"), nBuckets).cast("int").as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect()
    val arr = Array.fill(nBuckets)(0L)
    var total = 0L
    rows.foreach { r => arr(r.getInt(0)) = r.getLong(1); total += r.getLong(1) }
    (arr, total)
  }

  /** Per-bucket ln(p_target) − ln(p_raw) under add-α smoothing — the whole
    * importance model as D doubles. For the common DSIR case where the
    * target is a predicate over the raw corpus, use [[logRatiosByFlag]]
    * (one corpus pass instead of two).
    */
  def logRatios(target: DataFrame, raw: DataFrame, textCol: String,
                nBuckets: Int = 4096, alpha: Double = 0.5): Array[Double] = {
    val (ct, nt) = bucketCounts(target, textCol, nBuckets)
    val (cr, nr) = bucketCounts(raw, textCol, nBuckets)
    ratios(ct, nt, cr, nr, nBuckets, alpha)
  }

  /** [[logRatios]] when target ⊆ raw is selected by a predicate: BOTH
    * models come out of ONE tokenize+hash pass (a conditional count beside
    * the raw count) — half the corpus scans, identical result
    * (spec-locked equal to the two-pass form).
    */
  def logRatiosByFlag(docs: DataFrame, targetCond: Column, textCol: String,
                      nBuckets: Int = 4096,
                      alpha: Double = 0.5): Array[Double] = {
    val rows = docs
      .select(explode(HashedClassifier.features(col(textCol))).as("f"),
        targetCond.as("is_t"))
      .select(HashedClassifier.bucket(col("f"), nBuckets).cast("int").as("b"),
        col("is_t"))
      .groupBy("b")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
      .collect()
    val ct = Array.fill(nBuckets)(0L); val cr = Array.fill(nBuckets)(0L)
    var nt = 0L; var nr = 0L
    rows.foreach { r =>
      val b = r.getInt(0)
      cr(b) = r.getLong(1); nr += r.getLong(1)
      ct(b) = r.getLong(2); nt += r.getLong(2)
    }
    ratios(ct, nt, cr, nr, nBuckets, alpha)
  }

  private def ratios(ct: Array[Long], nt: Long, cr: Array[Long], nr: Long,
                     nBuckets: Int, alpha: Double): Array[Double] =
    Array.tabulate(nBuckets) { j =>
      math.log((ct(j) + alpha) / (nt + alpha * nBuckets)) -
        math.log((cr(j) + alpha) / (nr + alpha * nBuckets))
    }

  /** Score a corpus against a prebuilt log-ratio model: adds `n_feats`,
    * `logw` (Σ logRatio(bucket(f)) over the feature bag; 0.0 for empty
    * docs), and `keep` = logw > 0 (doc more target-like than raw-like).
    * One map-only pass; the model is a single array literal.
    */
  def score(df: DataFrame, textCol: String, logRatio: Seq[Double],
            nBuckets: Int = 4096): DataFrame = {
    require(logRatio.length == nBuckets,
      s"logRatio.length=${logRatio.length} must equal nBuckets=$nBuckets")
    val w = typedlit(logRatio)
    val feats = HashedClassifier.features(col(textCol))
    df.withColumn("n_feats", size(feats))
      .withColumn("logw", aggregate(feats, lit(0.0), (acc, f) => acc +
        element_at(w, (HashedClassifier.bucket(f, nBuckets) + 1).cast("int"))))
      .withColumn("keep", col("logw") > 0.0)
  }

  /** r18 featurize-once: the bucket ids of a doc's feature bag as an
    * ordered array column — `transform` preserves the feature order, so
    * summing log-ratios over this array is bit-identical (same fp
    * order) to [[score]]'s aggregate over the features themselves.
    * Computing it once into a persisted frame lets the model build and
    * the scoring pass share ONE tokenize+md5 pass (c38's shape: both
    * run over the same corpus).
    */
  def bucketize(textCol: Column, nBuckets: Int = 4096): Column =
    transform(HashedClassifier.features(textCol),
      f => HashedClassifier.bucket(f, nBuckets).cast("int"))

  /** [[logRatiosByFlag]] over a pre-bucketed frame ([[bucketize]]
    * output) — identical counts (the exploded bucket multiset is the
    * same), no second featurization.
    */
  def logRatiosFromBuckets(bucketed: DataFrame, bucketsCol: String,
                           isTargetCol: String, nBuckets: Int = 4096,
                           alpha: Double = 0.5): Array[Double] = {
    val rows = bucketed
      .select(explode(col(bucketsCol)).as("b"), col(isTargetCol).as("is_t"))
      .groupBy("b")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
      .collect()
    val ct = Array.fill(nBuckets)(0L); val cr = Array.fill(nBuckets)(0L)
    var nt = 0L; var nr = 0L
    rows.foreach { r =>
      val b = r.getInt(0)
      cr(b) = r.getLong(1); nr += r.getLong(1)
      ct(b) = r.getLong(2); nt += r.getLong(2)
    }
    ratios(ct, nt, cr, nr, nBuckets, alpha)
  }

  /** [[score]] over a pre-bucketed frame — same n_feats (array size),
    * same logw (same per-doc summation order through the ordered
    * bucket array), same keep verdict.
    */
  def scoreBuckets(df: DataFrame, bucketsCol: String,
                   logRatio: Seq[Double],
                   nBuckets: Int = 4096): DataFrame = {
    require(logRatio.length == nBuckets,
      s"logRatio.length=${logRatio.length} must equal nBuckets=$nBuckets")
    val w = typedlit(logRatio)
    df.withColumn("n_feats", size(col(bucketsCol)))
      .withColumn("logw", aggregate(col(bucketsCol), lit(0.0),
        (acc, b) => acc + element_at(w, b + 1)))
      .withColumn("keep", col("logw") > 0.0)
  }

  /** Gumbel-top-k importance resampling: keeping the k largest
    * `logw + Gumbel(seed, id)` samples k docs WITHOUT replacement with
    * probability ∝ exp(logw) — the DSIR selection step, exactly. The
    * noise is a pure function of (seed, id) (52 md5 bits → u ∈ (0,1) →
    * −ln(−ln u)), so the kept set is deterministic, order-invariant, and
    * resumable; top-k plans as TakeOrdered, never a global sort.
    */
  def sampleTopK(scored: DataFrame, idCol: String, k: Int,
                 seed: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit(seed), lit(":"),
        col(idCol).cast("string"))), 1, 13), 16, 10).cast("double") +
      lit(0.5)) / lit(4503599627370496.0) // 2^52
    scored.withColumn("gumbel_key", col("logw") - log(-log(u)))
      .orderBy(desc("gumbel_key")).limit(k)
  }
}
