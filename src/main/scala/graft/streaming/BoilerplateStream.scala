package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** D28: streaming boilerplate-line gate — C64's per-source
  * line-frequency rule for a crawl that never sees the whole corpus at
  * once: the line→document-frequency table C64 materializes is replaced
  * by ONE mergeable count-min sketch over (source, line) keys plus a
  * dim-sized per-source doc counter, both accumulated across epochs —
  * constant state no matter how many epochs arrive (the D12/D21 trade).
  *
  * Per epoch: distinct (doc, line-key) pairs fold into the sketch and
  * the source counters FIRST, then the epoch's lines are flagged
  * against the UPDATED state — boilerplate is a FREQUENCY property, so
  * unlike D25's novelty (flag-then-insert) an epoch's own mass must
  * count: a template header reaching 100% of its source's docs in
  * epoch 0 is stripped already in epoch 0.
  *
  * Approximation contract (the c34/b22 direction): the CMS only
  * OVER-counts, so every line that exactly exceeds the threshold on
  * the retained history is ALWAYS stripped — no false negatives — and
  * a clean line can only be wrongly stripped if its true df sits
  * within eps·N of the threshold (spec asserts the planted margins
  * make this impossible, deterministically). The per-epoch candidate
  * collect is micro-batch-bounded and guarded loudly (the
  * CmsHeavyHitters rule), never trusted.
  */
object BoilerplateStream {

  final class LineFreqState(eps: Double = 1e-4, confidence: Double = 0.999,
                            seed: Int = 42, maxCandidates: Int = 1000000)
      extends Serializable {
    private var cms: CountMinSketch = null
    private val docsPerSource = mutable.Map.empty[String, Long]
    private var lastFolded: Long = Long.MinValue

    /** C64's line synthesis: planted per-source header + 12-word body
      * windows, keyed by xxhash64(source, line).
      */
    private def lines(docs: DataFrame): DataFrame = {
      val words = split(trim(regexp_replace(lower(col("text")),
        "\\s+", " ")), " ")
      val nLines = floor((size(words) + lit(11)) / lit(12)).cast("int")
      val lineArr = transform(sequence(lit(0), nLines - 1),
        i => concat_ws(" ", slice(words, i * 12 + 1, lit(12))))
      docs.select(col("doc_id"), col("source"),
          explode(concat(array(concat(lit("from "), col("source"),
            lit(" crawl header"))), lineArr)).as("line"))
        .withColumn("k", xxhash64(col("source"), col("line")))
    }

    /** Fold one epoch of (doc_id, source, text): absorb, then flag;
      * returns the per-doc report (doc_id, n_lines, n_stripped).
      * Replayed epochs flag against the unchanged state (the D21 rule:
      * flags can only over-strip on redelivery, never under-strip).
      */
    def fold(epoch: Long, docs: DataFrame): DataFrame = {
      val spark = docs.sparkSession
      val ln = lines(docs)
      if (epoch > lastFolded) {
        val pairs = ln.select("doc_id", "k").distinct()
        val bytes = pairs
          .agg(count_min_sketch(col("k"), lit(eps), lit(confidence),
            lit(seed)).as("cms")).head().getAs[Array[Byte]](0)
        val epochCms = CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(bytes))
        if (cms == null) cms = epochCms else cms = cms.mergeInPlace(epochCms)
        docs.groupBy("source").count().collect().foreach { r =>
          val s = r.getString(0)
          docsPerSource(s) = docsPerSource.getOrElse(s, 0L) + r.getLong(1)
        }
        lastFolded = epoch
      }
      // estimates for THIS epoch's distinct keys only (micro-batch-
      // bounded); the bound is asserted loudly, never assumed
      val cand = ln.select("source", "k").distinct()
        .limit(maxCandidates + 1).collect()
      require(cand.length <= maxCandidates,
        s"LineFreqState: > $maxCandidates distinct lines in one epoch — " +
          "shard the micro-batch or raise the bound explicitly")
      val snapshot = cms
      val nDocs = docsPerSource.toMap
      val flaggedKeys = cand.iterator.map { r =>
        val s = r.getString(0); val k = r.getLong(1)
        val est = snapshot.estimateCount(java.lang.Long.valueOf(k))
        // a source absent from the doc counter (state loss, out-of-order
        // delivery) is NEVER boilerplate: with n=0 the old `est*100 >=
        // 0*30` form was trivially true and would have stripped every
        // line of that source — fail safe toward keeping text
        val n = nDocs.getOrElse(s, 0L)
        (k, n > 0 && est * 100 >= n * 30)
      }.collect { case (k, true) => k }.toSet
      import spark.implicits._
      val flagDf = flaggedKeys.toSeq.toDF("k")
        .withColumn("boiler", lit(true))
      ln.join(broadcast(flagDf), Seq("k"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("boiler"), 1L).otherwise(0L)).as("n_stripped"))
    }
  }
}
