package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher/C4-style repetition and quality filters — the document-level
  * signals large-scale training-data pipelines gate on (Rae et al. 2021
  * "Scaling Language Models" §A1.1; Raffel et al. 2020 C4 heuristics),
  * re-expressed as pure Catalyst expressions: per-document metrics are one
  * codegen'd projection pass, no shuffle, no UDF. The within-document
  * n-gram statistics are O(words²) higher-order-function loops — bounded
  * by document length, independent of corpus size, so the operator's
  * scale behavior is a flat map over the corpus.
  *
  * Every metric is replicated in the DuckDB oracle (list_transform /
  * list_filter have identical semantics), so the keep/drop verdict is
  * cross-engine checked bit-for-bit.
  */
object QualityFilters {

  /** Lowercased whitespace tokens (the unit all ratios are over). */
  private def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  def nWords(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(toks(c)))

  /** Fraction of words that are repeats of an earlier word:
    * 1 − distinct/total. High values = word-soup / keyword stuffing.
    */
  def dupWordFrac(c: Column): Column = {
    val t = toks(c)
    when(length(trim(c)) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(t)).cast("double") /
        size(t).cast("double"))
  }

  /** Fraction of all word bigrams occupied by the single most frequent
    * bigram — the Gopher "top-2-gram fraction" repetition signal.
    * 0.0 for documents of fewer than two words.
    *
    * Shape matters here: bigrams come from `zip_with` over two token
    * SLICES (HOF arguments — one evaluation), and the top count is the
    * longest equal-run of the SORTED bigram array via one `aggregate`
    * scan. The obvious count-each-distinct-bigram nesting references the
    * bigram expression inside lambda bodies, where codegen performs no
    * subexpression elimination — re-tokenizing the document once per
    * element per comparison, O(words²) full splits per document (a
    * measured 75x slowdown as the C39 gate).
    */
  def topBigramFrac(c: Column): Column = {
    val t = toks(c)
    val n = size(t)
    val bigrams = zip_with(slice(t, lit(1), n - 1), slice(t, lit(2), n - 1),
      (a, b) => concat_ws(" ", a, b))
    val zero = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("best"))
    val topCount = aggregate(array_sort(bigrams), zero,
      (acc, x) => {
        val run = when(acc.getField("prev") === x, acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(length(trim(c)) === 0 || n < 2, lit(0.0))
      .otherwise(topCount.cast("double") / (n - 1).cast("double"))
  }

  /** Mean word length in characters (0 for empty docs). */
  def meanWordLen(c: Column): Column = {
    val t = toks(c)
    when(length(trim(c)) === 0, lit(0.0)).otherwise(
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") /
        size(t).cast("double"))
  }

  /** Gopher-style keep/drop verdict over the UNROUNDED metrics (both
    * engines evaluate the identical IEEE expressions, so the comparisons
    * agree exactly). Thresholds follow the published filter suite, scaled
    * to short synthetic docs: ≥ 5 words, mean word length in [3,12],
    * duplicate-word fraction ≤ 0.6, top-bigram fraction ≤ 0.18.
    */
  def keep(c: Column): Column =
    (nWords(c) >= 5) && meanWordLen(c).between(3.0, 12.0) &&
      (dupWordFrac(c) <= 0.6) && (topBigramFrac(c) <= 0.18)
}
