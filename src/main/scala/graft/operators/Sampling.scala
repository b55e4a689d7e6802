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

  /** Fine [0, 10000) bucket — rate-style sampling needs more resolution
    * than the percentile split (a 24-bit md5 prefix mod 10⁴).
    */
  def hashBucket10k(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 6), 16, 10)
      .cast("long") % 10000)

  /** Weighted source mixing (Pile/Dolma-style): downsample each stratum so
    * the KEPT token mass follows `weights`, at the largest total the
    * corpus supports — the stratum scarcest relative to its weight keeps
    * everything (k = min over strata of tokens_s / w_s; rate_s =
    * k·w_s / tokens_s), every other stratum downsamples to match.
    * Strata not in `weights` are dropped. The filter is the same
    * content-hash determinism contract as [[stratifiedSample]]
    * (order-invariant, seed-free, cross-engine reproducible), so the
    * whole computation — totals, k, rates, filter — is
    * DuckDB-oracle-replicable.
    *
    * Scale shape: one map-side-combined aggregate for the per-stratum
    * token totals (rows = |strata|, driver-bounded like
    * BalancedRepartition's counts), then one codegen'd filter over a rate
    * map literal — no shuffle of the corpus, no RNG.
    */
  def mixSources(df: DataFrame, strataCol: String, keyCol: String,
                 tokensCol: Column, weights: Map[String, Double],
                 maxStrata: Int = 10000): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixSources: weights must be positive")
    // The weights map IS the strata universe: restrict BEFORE the totals
    // aggregate so the collect below is bounded by |weights| regardless of
    // the column's true cardinality (a caller pointing this at a document-id
    // column must not collect the corpus to the driver). Belt-and-braces:
    // cap the weights map itself and the collected row count, mirroring
    // BalancedRepartition's fail-fast guard.
    require(weights.size <= maxStrata,
      s"mixSources: ${weights.size} weights exceed maxStrata=$maxStrata — " +
        "source mixing is a per-corpus operation, not a per-document one")
    val inWeights = col(strataCol).isin(weights.keySet.toSeq: _*)
    val totals = df.where(inWeights).groupBy(col(strataCol))
      .agg(sum(tokensCol).as("__toks"))
      .limit(maxStrata + 1)
      .collect()
      .flatMap(r => Option(r.get(0)).map(s => s.toString -> r.getLong(1).toDouble))
      .toMap
    val missing = weights.keySet.filterNot(s => totals.getOrElse(s, 0.0) > 0)
    require(missing.isEmpty,
      s"mixSources: strata with no tokens in the data: $missing")
    val k = weights.map { case (s, w) => totals(s) / w }.min
    val rates: Map[String, Int] = weights.map { case (s, w) =>
      s -> math.floor(k * w / totals(s) * 10000).toInt
    }
    df.where(inWeights &&
      col(keyCol).isNotNull &&
      hashBucket10k(col(keyCol)) <
        coalesce(try_element_at(typedLit(rates), col(strataCol)), lit(0)))
  }

  /** Deterministic seeded global shuffle + sharding — the
    * training-order randomizer. Every row gets a `shard` in [0,nShards)
    * and a dense `pos` within its shard, both pure functions of
    * (seed, id): re-running on re-partitioned, re-ordered, or re-read
    * data reproduces the EXACT order (the property that makes a
    * training run resumable and an ablation comparable), and changing
    * the seed is a fresh permutation. md5-keyed, so the full assignment
    * AND order are DuckDB-oracle-checkable like [[hashSplit]].
    *
    * Scale shape: the hash is a map-only projection; the only exchange
    * keys on `shard` (nShards ≈ output file count), and `pos` is a
    * per-shard window sort — there is deliberately NO global
    * row_number/orderBy, which would serialize the corpus through one
    * partition. Consumers read shards round-robin: concat(shard files)
    * ordered by (shard, pos) is the permutation.
    *
    * `idCol` must be unique and non-null (it names the row's identity —
    * same contract as [[hashSplit]]'s key); ties beyond an md5 collision
    * are broken by the id itself, so the order is total either way.
    */
  def seededShuffle(df: DataFrame, idCol: String, seed: String,
                    nShards: Int): DataFrame = {
    require(nShards >= 1, "seededShuffle: nShards must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__graft_h"), col(idCol).cast("string"))
    df.withColumn("__graft_h", h)
      .withColumn("shard",
        (conv(substring(col("__graft_h"), 1, 8), 16, 10)
          .cast("long") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w) - 1)
      .drop("__graft_h")
  }

  /** Exact per-group quota cap — head-domain downsampling (C54): keep at
    * most `cap` rows per group, selected by seeded content hash so the
    * kept set is order-invariant, re-run-stable, and cross-engine
    * replicable (the [[seededShuffle]] determinism contract applied to
    * selection). This is what a web-scale corpus does to its head
    * domains: a handful of hosts contribute millions of pages each, and
    * an UNCAPPED corpus lets them dominate training; a RATE-based
    * downsample ([[stratifiedSample]]) cannot promise "at most N per
    * host" — this does, exactly.
    *
    * Scale shape: `row_number <= cap` over a per-group window is
    * recognized by Spark's `WindowGroupLimit` rewrite (SPARK-37099) —
    * each map task keeps a cap-sized heap per group BEFORE the exchange,
    * so a 10M-page host ships ~cap·n_tasks rows into the shuffle, not
    * 10M, and no full per-group sort ever runs. Spec-locked by plan
    * audit (the node must appear, partial on the map side).
    */
  def quotaCap(df: DataFrame, groupCol: String, keyCol: String, cap: Int,
               seed: String = "quota"): DataFrame = {
    require(cap >= 1, "quotaCap: cap must be at least 1")
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit(seed), lit(":"), col(keyCol).cast("string")))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(h, col(keyCol).cast("string"))
    df.withColumn("__graft_qr", row_number().over(w))
      .where(col("__graft_qr") <= cap).drop("__graft_qr")
  }

  /** Leakage-proof train/val/test split (C55): duplicate CLUSTERS are
    * atomic — every member of a near-dup cluster lands in the SAME split
    * as its cluster representative, so a test document can never have a
    * near-copy in train (the contamination [[hashSplit]] alone cannot
    * prevent: content-hash splitting sends two near-identical documents
    * to independent splits, and eval silently measures memorization).
    * Clusters come from any pair source (C2 MinHash, C3 SimHash, C12k/m
    * audio, ...) resolved by [[Dedup.dupClusters]]; the split keys on
    * the representative's id (singletons on their own id), inheriting
    * hashSplit's order-invariant, growth-stable, md5-replicable
    * contract.
    *
    * Scale shape: the cluster table is duplicate-volume-sized (≪ corpus)
    * and joins broadcast under AQE; everything else is the map-only
    * splitCol. The CC loop's cost profile is C13's (edge list shuffled
    * once for the whole loop).
    */
  def leakProofSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                     trainPct: Int = 80, valPct: Int = 10,
                     idA: String = "id_a", idB: String = "id_b")
      : DataFrame = {
    val clusters = Dedup.dupClusters(pairs, idA, idB)
      .withColumnRenamed("id", idCol)
    df.join(clusters, Seq(idCol), "left")
      .withColumn("split",
        splitCol(coalesce(col("cluster_id"), col(idCol)),
          trainPct, valPct))
      .drop("cluster_id")
  }

  /** Budget-targeted quality-threshold selection (C92) — the FineWeb-Edu
    * decision made measurable: a trained quality classifier (C75/C79)
    * scores every document, and the pipeline must pick the score
    * threshold that keeps a TARGET TOKEN BUDGET of the best material.
    * This emits the decision table: margins bucketed into `binWidth`
    * bins, per bin the doc count and token mass, the top-down cumulative
    * totals, and `selected` marking the chosen threshold bin — the
    * HIGHEST bin whose top-down cumulative token mass reaches
    * `budgetTokens` (keep every doc with bin ≥ selected), falling back
    * to the lowest bin when even the full corpus cannot fill the budget
    * (keep everything — the caller sees cum_tokens < budget and knows).
    *
    * Scale shape: one corpus-wide map + one histogram aggregate — the
    * margin domain collapses to ≲ thousands of bins BEFORE any window,
    * so the cumulative sweep runs over a driver-small frame (the c68
    * rule: never a window over an unbounded domain). Binning is exact
    * TRUNCATING integer division — the semantics Spark's `div` and
    * DuckDB's integer `//` share on negatives (both round toward zero;
    * measured, not assumed), so the engines agree bin-for-bin. The one
    * consequence: bin 0 straddles zero when margins are mixed-sign —
    * a granularity nuance of the decision table, not a correctness one
    * (selection operates on bin boundaries either way).
    *
    * Returns (bin, n_docs, bin_tokens, cum_docs, cum_tokens, selected),
    * one row per occupied bin.
    */
  def budgetThresholdSweep(scored: DataFrame, marginCol: String,
                           tokensCol: String, budgetTokens: Long,
                           binWidth: Long = 50000L): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens $budgetTokens <= 0")
    require(binWidth > 0, s"binWidth $binWidth <= 0")
    val G = graft.functions.GraftExpressions
    val bin = G.longDiv(col(marginCol).cast("long"), lit(binWidth))
      .as("bin")
    val binned = scored.select(bin, col(tokensCol).cast("long").as("tk"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("tk").as("bin_tokens"))
    sweepHistogram(binned, budgetTokens)
  }

  /** The sweep half of [[budgetThresholdSweep]], entered at the
    * HISTOGRAM: `binned` is (bin, n_docs, bin_tokens), one row per bin —
    * the shape per-epoch streaming partials roll up to (D38), since
    * histograms merge by plain addition. Emits the same decision table.
    */
  def sweepHistogram(binned: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens $budgetTokens <= 0")
    import org.apache.spark.sql.expressions.Window
    val topDown = Window.orderBy(col("bin").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    binned
      .withColumn("cum_docs", sum("n_docs").over(topDown))
      .withColumn("cum_tokens", sum("bin_tokens").over(topDown))
      .withColumn("selected",
        col("bin") === coalesce(
          max(when(col("cum_tokens") >= budgetTokens, col("bin"))).over(all),
          min(col("bin")).over(all)))
  }
}
