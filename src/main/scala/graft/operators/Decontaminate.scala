package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Training-data decontamination: flag training documents that share any
  * width-`n` word shingle with an evaluation/benchmark set — the standard
  * n-gram-overlap check (GPT-3 appendix C / PaLM style) run before a
  * training corpus ships.
  *
  * Scale shape: the eval set is the SMALL side by definition (benchmarks
  * are KBs–MBs, the corpus is the 100 TB side), so its distinct shingle
  * hashes broadcast; the corpus is scanned once, map-side, through the
  * codegen'd [[graft.functions.ShingleHashesExpr]] (distinct hashes per
  * doc, no per-gram string allocation), and only matched (id, gram) pairs
  * ever reach the aggregation. No corpus-sized shuffle: the groupBy
  * carries overlap hits only, and clean docs rejoin via their ids.
  */
object Decontaminate {

  /** Per-doc overlap report: (id, n_overlap, contaminated).
    *
    * @param n shingle width in words — 8 is the common contamination
    *          definition (13 for GPT-3's dedup; smaller = stricter)
    */
  def flagContaminated(docs: DataFrame, evalDocs: DataFrame,
                       textCol: String, idCol: String,
                       n: Int = 8): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(Dedup.shingleHashes(col(textCol), n)).as("gram"))
      .distinct()
    val docGrams = docs.select(col(idCol).as("id"),
      explode(Dedup.shingleHashes(col(textCol), n)).as("gram"))
    // shingle hashes are DISTINCT per doc, so count(*) == distinct overlap
    val overlaps = docGrams.join(F.broadcast(evalGrams), Seq("gram"))
      .groupBy("id").agg(count(lit(1)).as("n_overlap"))
    docs.select(col(idCol))
      .join(overlaps, col(idCol) === col("id"), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }
}
