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
    */
  def curate(docs: DataFrame, evalDocs: DataFrame): DataFrame = {
    val gated = docs.where(QualityFilters.keep(col("text")))
    val keepIds = Dedup.exactDedup(gated, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    val deduped = gated.join(keepIds, Seq("doc_id"), "left_semi")
    val contaminated = Decontaminate
      .flagContaminated(deduped, evalDocs, "text", "doc_id")
      .where(col("contaminated")).select("doc_id")
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    clean.withColumn("split", Sampling.splitCol(col("text")))
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
