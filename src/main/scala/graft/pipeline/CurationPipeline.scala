package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.QualityFilters
import graft.operators.{Decontaminate, Dedup, Sampling}

/** The composed training-data curation pipeline (C39) — the C-surface
  * equivalent of A11's full censo transform: heuristic quality gate (C17)
  * → exact dedup (C1) → eval-set decontamination (C24) → deterministic
  * split (C15), as ONE lazy plan from individually-gated operators.
  *
  * What the composition proves that the per-stage gates can't: the stages
  * agree on contracts (token/fingerprint normalization, null policy, id
  * semantics) when chained, and the whole pipeline stays a DAG of scans,
  * map-only projections, and three bounded shuffles — no stage
  * materializes the corpus or collects beyond sketch/model size.
  *
  * Stage costs at 100 TB:
  *  - gate: map-only codegen filter (per-doc metrics, no shuffle);
  *  - dedup: one map-combined shuffle of (fingerprint, id) pairs — text
  *    never shuffles; survivors return via a left-semi hash join on id;
  *  - decontamination: eval shingles broadcast (eval sets are dim-sized),
  *    corpus grams probe map-side, only overlap hits shuffle to count;
  *  - split: a pure hash function of content, zero state.
  */
object CurationPipeline {

  /** docs → the kept corpus with its split column. `evalDocs` is the
    * decontamination reference (benchmark/eval texts).
    *
    * Cache ownership (r18 ADVICE): the returned lazy frame DEPENDS on an
    * internal corpus-sized persist of the gate verdict (it is what makes
    * the three consuming branches share one scan). The caller owns the
    * result's lifetime: after materializing every derived result, release
    * the pipeline's cache with `spark.sqlContext.clearCache()` or by
    * unpersisting through [[graft.operators.Dedup.freeState]]-style
    * handling of the returned frame's cached ancestors. In the declared
    * queries this is moot — each bench/verify invocation runs in a
    * bounded session and the timed run pays the cache build (nothing
    * crosses runs) — but a long-lived session calling curate() in a loop
    * must release between calls or cached RDDs accumulate.
    */
  def curate(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    // r18: persisted — the gated frame is scanned by the dedup
    // election, the semi-join's left side, and the decontamination
    // probe; without the cache each branch re-evaluates the C17 metric
    // expressions over the corpus (3x the gate's regex work)
    val gated = docs.where(QualityFilters.keep(col("text"))).persist()
    val keepIds = Dedup.exactDedup(gated, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    val deduped = gated.join(keepIds, Seq("doc_id"), "left_semi")
    val contaminated = Decontaminate
      .flagContaminated(deduped, evalDocs, "text", "doc_id")
      .where(col("contaminated")).select("doc_id")
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    clean.withColumn("split", Sampling.splitCol(col("text")))
  }

  /** Drop-reason ledger (C93) — the lineage answer to "why did my
    * document disappear": every input document attributed to the FIRST
    * stage of [[curate]]'s order that drops it — `quality` (failed the
    * C17 gate), `duplicate` (gated but lost the C1 canonical election),
    * `contaminated` (canonical but C24-flagged) — or `kept_<split>`.
    * The attribution order IS the pipeline order, so the kept_*
    * dispositions partition exactly as [[curate]]'s output does
    * (spec-locked reconciliation), and the rollup digests make one
    * misattributed document anywhere flip a hash.
    *
    * At 100 TB this is what a curation run ships NEXT TO the corpus:
    * per-disposition mass is the budget report, and the same plan with
    * the rollup removed is the per-doc lineage table a debugging session
    * filters. Cost over C39: the same three bounded shuffles, plus two
    * dim-sized id sets (canonicals, contaminated) joined back id-keyed —
    * no new corpus-sized shuffle, text still never shuffles.
    *
    * Cache ownership: same contract as [[curate]] — the returned frame
    * rides an internal persist of the per-doc gate verdict; the caller
    * releases it after materialization (see curate's note).
    */
  def ledger(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    // r18: the gate verdict is computed ONCE into a persisted frame —
    // the canonical election, the survivor semi-join, the
    // decontamination probe, and the final attribution scan all branch
    // from it (previously each branch re-ran the C17 metric regexes
    // over the corpus — 4x the gate's work)
    val qd = docs.withColumn("__q", QualityFilters.keep(col("text")))
      .persist()
    val gated = qd.where(col("__q"))
    val canon = Dedup.exactDedup(gated, "text", "doc_id")
      .select(col("keep_id").as("doc_id"), lit(true).as("__canon"))
    val surv = gated.join(canon.select("doc_id"), Seq("doc_id"), "left_semi")
    val contam = Decontaminate
      .flagContaminated(surv, evalDocs, "text", "doc_id")
      .where(col("contaminated"))
      .select(col("doc_id"), lit(true).as("__cont"))
    qd
      .join(canon, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("disposition",
        when(!col("__q"), lit("quality"))
          .when(col("__canon").isNull, lit("duplicate"))
          .when(col("__cont").isNotNull, lit("contaminated"))
          .otherwise(concat(lit("kept_"), Sampling.splitCol(col("text")))))
      .groupBy("disposition")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars"),
        md5(array_join(transform(array_sort(collect_list(col("doc_id"))),
          x => x.cast("string")), ",")).as("id_digest"))
      .orderBy("disposition")
  }

  /** Compact per-(split, lang) report over the curated corpus; id_digest
    * is md5 over the kept ids in ascending order, so ONE wrongly kept or
    * dropped document anywhere flips a digest.
    */
  def report(curated: DataFrame): DataFrame =
    curated.groupBy("split", "lang").agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars"),
        md5(array_join(transform(array_sort(collect_list(col("doc_id"))),
          x => x.cast("string")), ",")).as("id_digest"))
      .orderBy("split", "lang")
}
