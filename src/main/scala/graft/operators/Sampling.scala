package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * The split is a pure function of row CONTENT (md5 prefix mod 100), not
  * of row order, partitioning, or a random seed: re-running on re-shuffled
  * or incrementally-grown data keeps every existing document in the same
  * split — the property that keeps eval sets uncontaminated across
  * pipeline re-runs. Cross-engine reproducible (md5 is md5 everywhere),
  * so the assignment itself is DuckDB-oracle-checked.
  *
  * The 16-bit prefix mod 100 is non-uniform by < 0.2% (65536 % 100 ≠ 0) —
  * irrelevant for split sizing, and the determinism is worth it.
  */
object Sampling {

  /** Percentile bucket [0,100) from the md5 of `key`'s string form. */
  def hashBucket(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 4), 16, 10)
      .cast("int") % 100)

  /** train/val/test label with the given integer percentages. Null keys
    * route to "train" EXPLICITLY: an unkeyable row must never land in an
    * eval split (silent null-propagation through when() would have sent
    * every null-text document to "test", skewing eval toward garbage).
    */
  def splitCol(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct + valPct <= 100)
    val b = hashBucket(key)
    when(key.isNull, "train")
      .when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  def hashSplit(df: DataFrame, keyCol: String, trainPct: Int = 80,
                valPct: Int = 10): DataFrame =
    df.withColumn("split", splitCol(col(keyCol), trainPct, valPct))

  /** Deterministic stratified downsampling: keep a row iff its content
    * hash-bucket falls below the stratum's percentage — per-language (or
    * any stratum) quotas with the SAME determinism contract as
    * [[hashSplit]]: order-invariant, growth-stable (a kept document stays
    * kept when the corpus grows), seed-free, cross-engine reproducible.
    * Strata missing from `pctByStratum` fall back to `defaultPct`;
    * null keys are never kept (an unkeyable row has no stable identity).
    *
    * One codegen'd filter over a map literal — no shuffle, no sampleBy
    * RNG (whose output depends on partitioning and retries).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       pctByStratum: Map[String, Int],
                       defaultPct: Int = 0): DataFrame = {
    require((pctByStratum.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100))
    val pct = coalesce(
      try_element_at(typedLit(pctByStratum), col(strataCol)),
      lit(defaultPct))
    df.where(col(keyCol).isNotNull && hashBucket(col(keyCol)) < pct)
  }
}
