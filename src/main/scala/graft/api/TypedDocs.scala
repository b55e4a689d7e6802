package graft.api

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Sampling

/** Typed facade over the document-processing surface: users who want
  * case-class safety compose `Dataset[Document] → Dataset[ScoredDocument]`
  * while the underlying plan stays 100% Catalyst columns (the case
  * classes bound schemas via Encoders; no typed lambdas in the hot path,
  * so pushdown and codegen are untouched).
  */
object TypedDocs {

  case class Document(doc_id: Long, text: String, lang: String)

  case class ScoredDocument(doc_id: Long, lang_pred: String,
                            quality: Double, tokens: Int, split: String)

  def score(ds: Dataset[Document]): Dataset[ScoredDocument] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.select(
      col("doc_id"),
      TextFunctions.langId(col("text")).as("lang_pred"),
      TextFunctions.qualityScore(col("text")).as("quality"),
      TextFunctions.bpeishTokenCount(col("text")).as("tokens"),
      Sampling.splitCol(col("text")).as("split")
    ).as[ScoredDocument]
  }

  /** Column-predicate filter (NOT a typed lambda — a lambda would black-box
    * the predicate and kill scan pushdown at scale).
    */
  def keepQuality(ds: Dataset[ScoredDocument], minQuality: Double): Dataset[ScoredDocument] =
    ds.filter(col("quality") >= minQuality)
}
