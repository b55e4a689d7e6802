package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CurationPipeline

class CurationPipelineSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private val good1 =
    "the quick brown fox jumps over the lazy dog near the river bank"
  private val good2 =
    "students read many good books during quiet evenings in the old library"
  private val spam = "click here click here click here"
  private val leaked = "every student should carefully review the official " +
    "exam guidelines before the final test day"

  // one doc per drop reason + two survivors; n_chars mirrors the table
  private def docs = Seq(
    (1L, good1, "en"), // kept
    (2L, good1, "en"), // exact dup of 1 → dropped (min id survives)
    (3L, good2, "en"), // kept
    (4L, spam, "en"),  // fails the C17 gate (dup-word fraction 0.67)
    (5L, leaked, "en") // verbatim in the eval set → decontaminated away
  ).toDF("doc_id", "text", "lang")
    .withColumn("n_chars", length(col("text")).cast("long"))

  private def evalDocs = Seq((100L, leaked)).toDF("doc_id", "text")

  test("each stage drops exactly its planted doc; survivors keep going") {
    val kept = CurationPipeline.curate(docs, evalDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L),
      "gate must drop 4, dedup must drop 2 (not 1), decon must drop 5")
  }

  test("the pipeline is deterministic under repartitioning") {
    val a = CurationPipeline.curate(docs, evalDocs)
      .select("doc_id", "split").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet
    val b = CurationPipeline.curate(
        docs.repartition(7).orderBy(desc("doc_id")), evalDocs)
      .select("doc_id", "split").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
  }

  test("report digests flip when a single membership changes") {
    val base = CurationPipeline.report(
      CurationPipeline.curate(docs, evalDocs))
    val withoutLeak = CurationPipeline.report(
      CurationPipeline.curate(docs, evalDocs.limit(0)))
    val baseRows = base.collect()
    assert(baseRows.map(_.getAs[Long]("n_docs")).sum === 2L)
    // an empty eval set lets doc 5 through: some group's digest must move
    val a = baseRows.map(r => (r.getString(0), r.getString(1),
      r.getAs[String]("id_digest"))).toSet
    val b = withoutLeak.collect().map(r => (r.getString(0), r.getString(1),
      r.getAs[String]("id_digest"))).toSet
    assert(a !== b, "doc 5's membership must be visible in the digests")
  }

  test("c93 ledger: every doc gets its first-failing stage, totals " +
    "reconcile with the corpus, kept mass reconciles with curate") {
    val led = CurationPipeline.ledger(docs, evalDocs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the planted corpus: 4 fails quality, 2 loses the canonical
    // election, 5 is contaminated, 1 and 3 are kept
    assert(led("quality") === 1L)
    assert(led("duplicate") === 1L)
    assert(led("contaminated") === 1L)
    assert(led.filter(_._1.startsWith("kept_")).values.sum === 2L)
    // attribution is a PARTITION of the input: totals reconcile
    assert(led.values.sum === docs.count())
    // kept dispositions agree with curate's split column doc-for-doc
    val curSplits = CurationPipeline.curate(docs, evalDocs)
      .groupBy("split").count().collect()
      .map(r => s"kept_${r.getString(0)}" -> r.getLong(1)).toMap
    assert(led.filter(_._1.startsWith("kept_")) === curSplits)
    // first-failing wins: a doc that is BOTH spam and duplicated
    // attributes to quality, not duplicate
    val led2 = CurationPipeline.ledger(
      docs.union(Seq((6L, spam, "en", spam.length.toLong))
        .toDF("doc_id", "text", "lang", "n_chars")), evalDocs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(led2("quality") === 2L && led2("duplicate") === 1L,
      "both spam copies fail at the gate; neither reaches dedup")
  }

  test("the composed plan never shuffles text for dedup (ids only)") {
    val p = CurationPipeline.curate(docs, evalDocs)
      .queryExecution.executedPlan.toString
    // the dedup exchange carries (fingerprint, partial-min id) — the
    // min must combine map-side BEFORE the fingerprint exchange, and no
    // shuffle may be keyed on the text column itself
    assert(p.contains("partial_min(doc_id"),
      s"dedup min must combine map-side before the exchange:\n${p.take(600)}")
    assert(!p.contains("Exchange hashpartitioning(text"),
      s"the corpus text must never be a shuffle key:\n${p.take(600)}")
  }
}
