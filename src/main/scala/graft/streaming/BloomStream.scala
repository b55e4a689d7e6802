package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.BloomDedup

/** C34's cross-corpus bloom flag as a streaming stage (D18) — the shape an
  * incremental crawl actually runs at 100 TB: yesterday's corpus is
  * summarized ONCE into a constant-size bloom (driver state, MBs per
  * billion documents at 1% fpp), and today's crawl arrives as a stream
  * whose every micro-batch is flagged by a map-only codegen'd probe.
  *
  * STATELESS by design — the bloom rides the streaming plan as one binary
  * literal, so there is no state store, no watermark, no shuffle, and
  * throughput is scan speed. Contrast D5 (exact streaming dedup), which
  * keeps per-key state and needs a watermark to bound it: the bloom gate
  * trades exactness (bounded false-positive rate, zero false negatives)
  * for O(1) state — the right trade when the reference set is yesterday's
  * billion documents rather than today's in-flight window. The two compose:
  * D5 dedups WITHIN the stream, the bloom gates AGAINST history.
  *
  * Flag semantics are IDENTICAL to batch C34 — the same
  * [[BloomDedup.flagOverlap]] code object probes the same bloom bytes, so
  * a document flows through batch or stream to the same verdict
  * (batch ≡ stream locked in EventStreamsSpec).
  */
object BloomStream {

  /** Flag each streamed row against the reference bloom: `flagCol` true
    * iff the key MIGHT be in the reference corpus (never-false-negative).
    */
  def flagOverlapStream(stream: DataFrame, key: Column, bloom: Array[Byte],
                        flagCol: String = "maybe_seen"): DataFrame =
    BloomDedup.flagOverlap(stream, key, bloom, flagCol)

  /** Generational bloom state for UNBOUNDED ingest (D21) — the D18 gate
    * assumes yesterday's corpus is one frozen sketch; a crawl that runs
    * forever also has to ABSORB each epoch into history, and one
    * ever-growing bloom saturates (fpp → 1 as inserts pass capacity).
    * The standard fix is age generations: keys insert into the CURRENT
    * generation's filter; every `rotateEvery` epochs the current filter
    * is sealed as PREVIOUS and a fresh one starts; probes check
    * prev ∪ curr. Memory stays at 2 constant-size filters forever, each
    * sized for `rotateEvery` epochs of keys, and a key stays visible for
    * at least `rotateEvery` and at most 2·`rotateEvery` epochs after
    * last sight — a sliding-window dedup horizon, the trade that keeps
    * 100 TB/day ingest in MBs of state.
    *
    * Contract, per epoch fold (flag-THEN-insert, so same-epoch repeats
    * are not flagged): a key seen in a RETAINED earlier epoch e'
    * (e' < e and gen(e') ≥ gen(e) − 1) is ALWAYS flagged — rotation
    * never eats a live no-false-negative obligation, because a sealed
    * generation stays probed for one full generation more. Keys older
    * than the window may or may not flag (their bits are gone with the
    * dropped filter — that is the horizon, documented, spec-locked).
    *
    * Replay (at-least-once foreachBatch): an epoch ≤ the last folded one
    * re-flags against state that already contains its keys — the insert
    * is skipped (idempotent) but the flags can only OVER-flag, so the
    * no-false-negative contract survives redelivery; the fp bound is
    * what loosens, exactly as in D5's bounded-state trade.
    */
  final class BloomGenerations(expectedPerGen: Long, fpp: Double,
                               rotateEvery: Int) extends Serializable {
    require(rotateEvery >= 1, "rotateEvery must be at least 1")
    private var prev: Array[Byte] = null // sealed generation (probed)
    private var curr: Array[Byte] = null // filling generation (probed)
    private var currGen: Long = Long.MinValue
    private var lastFolded: Long = Long.MinValue

    private def genOf(epoch: Long): Long = Math.floorDiv(epoch, rotateEvery.toLong)

    private def advanceTo(epoch: Long): Unit = {
      val g = genOf(epoch)
      if (currGen == Long.MinValue) currGen = g
      else if (g == currGen + 1) { prev = curr; curr = null; currGen = g }
      else if (g > currGen + 1) { prev = null; curr = null; currGen = g }
      // g <= currGen: replayed/straggler epoch — state unchanged
    }

    private def flagAgainst(df: DataFrame, key: Column,
                            flagCol: String): DataFrame = {
      val withPrev =
        if (prev == null) df.withColumn(flagCol, lit(false))
        else BloomDedup.flagOverlap(df, key, prev, flagCol)
      if (curr == null) withPrev
      else BloomDedup.flagOverlap(withPrev, key, curr, "__graft_curr")
        .withColumn(flagCol, col(flagCol) || col("__graft_curr"))
        .drop("__graft_curr")
    }

    /** Fold one epoch: rotate if `epoch` opens a new generation, flag
      * the frame against the retained generations (the flags bind to
      * the PRE-insert sketch bytes via broadcast, however lazily the
      * result is consumed), then absorb the epoch's keys into the
      * current generation. Replayed epochs flag but do not re-insert.
      */
    def fold(epoch: Long, df: DataFrame, key: Column,
             flagCol: String = "maybe_seen"): DataFrame = {
      advanceTo(epoch)
      val flagged = flagAgainst(df, key, flagCol)
      if (epoch > lastFolded) {
        val b = BloomDedup.bloomOf(df, key, expectedPerGen, fpp)
        if (b != null)
          curr = if (curr == null) b else BloomDedup.mergeBlooms(curr, b)
        lastFolded = epoch
      }
      flagged
    }
  }

  /** Batch twin of the D21 generational gate: fold time-ordered epoch
    * frames through one [[BloomGenerations]] and return the union of the
    * flagged epochs (an `epoch` column marks each). This is the same
    * code path the streaming sink runs per micro-batch — the d21 gate
    * oracles THIS, the spec locks stream ≡ fold.
    */
  def generationalFlagFold(epochs: Seq[(Long, DataFrame)], key: Column,
                           expectedPerGen: Long, fpp: Double,
                           rotateEvery: Int,
                           flagCol: String = "maybe_seen"): DataFrame = {
    require(epochs.nonEmpty, "at least one epoch")
    val st = new BloomGenerations(expectedPerGen, fpp, rotateEvery)
    epochs.sortBy(_._1).map { case (e, df) =>
      st.fold(e, df, key, flagCol).withColumn("epoch", lit(e))
    }.reduce(_ unionByName _)
  }

  /** D21 streaming delivery: every micro-batch is flagged against the
    * retained generations, routed fresh/seen with the D8 epoch-overwrite
    * contract, and absorbed into the current generation — D18's gate
    * with the reference set LIVE instead of frozen. `state` is driver
    * state exactly like D12's sketch shards: constant-size, survives
    * across batches, rotates on generation boundaries.
    */
  def generationalGatedSink(stream: DataFrame, key: Column,
                            state: BloomGenerations,
                            freshDir: String, seenDir: String,
                            checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val f = state.fold(id, b, key)
        EventStreams.epochIdempotentSink(
          f.where(!col("maybe_seen")).drop("maybe_seen"), id, freshDir)
        EventStreams.epochIdempotentSink(
          f.where(col("maybe_seen")).drop("maybe_seen"), id, seenDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** D25: streaming NOVELTY scoring against rolling history — C57's
    * graded "how much of this page is new text" signal with the exact
    * reference-gram set replaced by the D21 bloom generations, which is
    * what an unbounded crawl can actually afford: per epoch the batch's
    * shingle hashes are flagged against prev ∪ curr (flag-THEN-insert,
    * so same-epoch repeats read as novel against HISTORY — the C57
    * reference semantics), then absorbed; per-doc seen-counts aggregate
    * to the same integer-ppm ratio as C57.
    *
    * Approximation contract (inherits D18/D21's): the bloom never
    * false-negatives, so `n_seen_max` can only OVER-count and
    * `novelty_ppm` is a LOWER bound on true novelty — the safe
    * direction for a crawl budget (you may under-spend on a page that
    * was actually novel at the fp rate, you never over-spend on one
    * that was provably seen). Exact-repeat documents therefore score
    * exactly 0. Spec-locked against the exact-join twin both ways.
    * `expectedPerGen` sizes the generation filters in GRAMS, not docs.
    */
  def noveltyFold(state: BloomGenerations, epoch: Long, docs: DataFrame,
                  idCol: String, textCol: String,
                  n: Int = 8): DataFrame = {
    import graft.operators.Dedup
    val grams = docs.select(col(idCol),
      explode(Dedup.shingleHashes(col(textCol), n)).as("__g"))
    state.fold(epoch, grams, col("__g"), "__seen")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen"), 1L).otherwise(0L)).as("n_seen_max"))
      .select(col(idCol), col("n_grams"), col("n_seen_max"),
        ((col("n_grams") - col("n_seen_max")) * lit(1000000L) /
          col("n_grams")).cast("long").as("novelty_ppm"))
  }

  /** [[noveltyFold]] wired as a streaming per-epoch report sink with
    * the D8 idempotent-partition delivery (a replayed epoch flags-only —
    * the generation state skips its insert — and overwrites its own
    * report partition).
    */
  def noveltyReportSink(stream: DataFrame, state: BloomGenerations,
                        idCol: String, textCol: String, n: Int,
                        path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        EventStreams.epochIdempotentSink(
          noveltyFold(state, id, b, idCol, textCol, n), id, path)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** D16-style routed delivery: fresh rows land in the corpus directory,
    * flagged rows in the review directory, each micro-batch delivered
    * with the D8 epoch-overwrite contract — a replayed epoch recomputes
    * the identical split and overwrites both of its own partitions, so
    * at-least-once redelivery converges to exactly-once on BOTH paths
    * and a document can never land in neither or both.
    */
  def bloomGatedSink(stream: DataFrame, key: Column, bloom: Array[Byte],
                     freshDir: String, seenDir: String,
                     checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val f = BloomDedup.flagOverlap(b, key, bloom, "maybe_seen")
        EventStreams.epochIdempotentSink(
          f.where(!col("maybe_seen")).drop("maybe_seen"), id, freshDir)
        EventStreams.epochIdempotentSink(
          f.where(col("maybe_seen")).drop("maybe_seen"), id, seenDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
