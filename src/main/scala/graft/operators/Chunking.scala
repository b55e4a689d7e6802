package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Document chunking and sequence packing — the two transforms between a
  * cleaned corpus and a training batch: long documents are split into
  * bounded token windows (context-length fit), and the resulting pieces
  * are packed into fixed-token-budget training sequences.
  *
  * Both are pure relational transforms: chunking is a projection +
  * posexplode (map-only, no shuffle); packing is one window pass
  * partitioned by a shard key, so the cumulative-sum state never
  * serializes through a single task at corpus scale.
  */
object Chunking {

  /** Split each document into whitespace-token windows of `chunkSize`
    * tokens advancing by `chunkSize - overlap` (so consecutive chunks
    * share `overlap` tokens). The last window may be short; documents of
    * ≤ chunkSize tokens yield exactly one chunk; empty/blank docs yield
    * none. Emits (…, chunk_idx, chunk_tokens, chunk_text).
    *
    * One posexplode over an in-expression sequence — no shuffle, no UDF;
    * at 100 TB this is a flat map whose output rows ≈ input tokens /
    * (chunkSize − overlap).
    */
  def chunkTokens(df: DataFrame, textCol: String, chunkSize: Int = 512,
                  overlap: Int = 64): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      "need chunkSize > overlap >= 0")
    val step = chunkSize - overlap
    // the token array must be a bound COLUMN before the slicing lambda
    // references it: lambda bodies get no codegen subexpression
    // elimination, so an inline tokenize expression would re-split the
    // document once per chunk
    val toks = col("__graft_toks")
    val n = size(toks)
    // ceil((n - overlap) / step), at least 1 — integer inputs are far
    // below 2^53, so the double division is exact and engine-agnostic
    val nChunks = greatest(
      ceil((n - lit(overlap)).cast("double") / lit(step.toDouble)), lit(1.0))
      .cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1), j =>
      concat_ws(" ", slice(toks, j * step + 1, lit(chunkSize))))
    df.where(length(trim(col(textCol))) > 0)
      .withColumn("__graft_toks", TextFunctions.wsTokens(col(textCol)))
      .select(df.columns.map(col) :+
        posexplode(chunks).as(Seq("chunk_idx", "chunk_text")): _*)
      .withColumn("chunk_tokens", size(TextFunctions.wsTokens(col("chunk_text"))))
  }

  /** Concat-and-cut sequence packing: within each shard, documents are
    * laid end-to-end in `orderCol` order and the stream is cut every
    * `budget` tokens; a document belongs to the pack where it STARTS
    * (GPT-style packing, where sequences may span cut points). Adds
    * `pack_id`, consecutive from 0 per shard.
    *
    * The shard column is what makes this scale: packing is sequential by
    * nature (a running sum), so the corpus is packed per shard in
    * parallel — one window exchange keyed on the shard, never a global
    * single-task sort. Determinism comes from (shardCol, orderCol) being
    * a total order.
    */
  /** Content-defined chunking (C47) — Rabin-style CDC at the token
    * level: a chunk boundary falls after token p+w-1 wherever the
    * w-token window digest starting at p satisfies
    * `hash ≡ 0 (mod modulus)`, so boundaries are decided by CONTENT,
    * not position — an edit re-chunks only its neighborhood, where
    * [[chunkTokens]]'s fixed windows shift every downstream chunk
    * (the property `ChunkingSpec` locks). Expected chunk length ≈
    * modulus + w − 1 tokens; the tail chunk always closes at n.
    *
    * Window digests ride the codegen'd
    * [[graft.functions.GraftExpressions.spanMd5s]] (the c27 engine
    * rule: lambdas only consume BOUND columns); boundary selection and
    * segmentation are pure array ops. Map-only, fan-out = chunks.
    * Emits (idCol, chunk_idx, n_tokens, fp).
    */
  /** Auto-tune the CDC modulus for a target mean chunk length (the §7
    * knob): expected chunk length is ≈ modulus + w − 1, so the modulus
    * is the power of two nearest `target − w + 1` — EXCEPT when the
    * corpus's median document is shorter than ~2 chunks of that size, in
    * which case the target is pulled down to median/2 (a modulus far
    * beyond doc length degenerates every document to one tail chunk and
    * CDC's insertion stability buys nothing). The median comes from ONE
    * map-combined `percentile_approx` pass — a single driver row, never
    * a sample collect; power-of-two restriction keeps the boundary test
    * a mask-equivalent modulo across re-runs of differently-sized
    * corpora (stable chunk edges between pipeline versions matter more
    * than hitting the target exactly).
    */
  def cdcAutoModulus(df: DataFrame, textCol: String,
                     targetTokens: Int = 64, w: Int = 8): Int = {
    require(targetTokens > w, s"targetTokens ($targetTokens) must exceed w ($w)")
    val med = df.where(length(trim(col(textCol))) > 0)
      .select(percentile_approx(
        size(split(trim(col(textCol)), "\\s+")).cast("double"),
        lit(0.5), lit(1000)).as("m"))
      .head.getDouble(0)
    val effective = math.max(w + 1.0,
      math.min(targetTokens.toDouble, med / 2.0))
    val exp = math.round(math.log(effective - w + 1) / math.log(2)).toInt
    math.max(2, math.min(1 << 20, 1 << math.max(1, exp)))
  }

  /** [[cdcChunks]] with the modulus tuned by [[cdcAutoModulus]]. */
  def cdcChunksAuto(df: DataFrame, idCol: String, textCol: String,
                    targetTokens: Int = 64, w: Int = 8): DataFrame =
    cdcChunks(df, idCol, textCol, w,
      cdcAutoModulus(df, textCol, targetTokens, w))

  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                w: Int = 8, modulus: Int = 64): DataFrame = {
    import graft.functions.GraftExpressions
    val base = df
      .where(length(trim(col(textCol))) > 0)
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .withColumn("__n", size(col("__toks")))
      .withColumn("__md5s", GraftExpressions.spanMd5s(col("__toks"), w))
    val boundaryEnds = when(size(col("__md5s")) > 0,
        transform(
          filter(sequence(lit(1), size(col("__md5s"))), p =>
            conv(substring(element_at(col("__md5s"), p), 1, 8),
              16, 10).cast("long") % modulus === 0),
          p => p + lit(w - 1)))
      .otherwise(array().cast("array<int>"))
    // the whole chunk row set is ONE transform evaluated once per doc,
    // exploded once: __ends/__toks are multiply-referenced attributes,
    // which keeps CollapseProject from inlining the expensive boundary
    // pipeline across the Generate (the original posexplode phrasing
    // re-evaluated it per consumer — measured 7.4 s vs 2.9 s at sf0.1)
    val chunkStructs = {
      val ends = col("__ends")
      transform(sequence(lit(1), size(ends)), i => {
        val prev = when(i === 1, lit(0)).otherwise(element_at(ends, i - 1))
        val e = element_at(ends, i)
        struct((i - 1).as("chunk_idx"), (e - prev).as("n_tokens"),
          md5(array_join(slice(col("__toks"), prev + 1, e - prev), " "))
            .as("fp"))
      })
    }
    base.withColumn("__ends",
        array_distinct(concat(boundaryEnds, array(col("__n")))))
      .select(col(idCol), explode(chunkStructs).as("__c"))
      .select(col(idCol), col("__c.chunk_idx").as("chunk_idx"),
        col("__c.n_tokens").as("n_tokens"), col("__c.fp").as("fp"))
  }

  def packSequences(df: DataFrame, orderCol: String, tokensCol: String,
                    shardCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(tokensCol)) / lit(budget.toDouble)).cast("long"))
      .drop("__cum")
  }

  /** C100: WHOLE-document bin packing — the variant [[packSequences]]
    * (C22) deliberately is not: C22 cuts at the budget boundary (a
    * document may straddle two training sequences), which is the right
    * call for causal-LM pretraining but wrong wherever a document must
    * stay intact (contrastive pairs, instruction tuning, eval sets,
    * retrieval shards). Here each document lands WHOLE in exactly one
    * bin: within a shard, documents are taken in (tokens DESC, id)
    * order — next-fit decreasing — and a document that no longer fits
    * CLOSES the open bin and starts the next; a document alone larger
    * than the budget gets its own bin, flagged by the caller via
    * fill > budget rather than dropped (the A13 posture: overweight is
    * visible, not silent).
    *
    * Next-fit (one open bin, O(1) fold state) rather than best-fit
    * (open-bin MULTISET state) is the deliberate trade: the fold is a
    * strict sequential recurrence either way — no window form exists,
    * because each verdict depends on the running fill — and next-fit's
    * scalar state is what lets (a) the executor side run as one
    * sorted-partition streaming pass with nothing materialized, and
    * (b) the whole fold replay in a rank-synchronous recursive-CTE
    * oracle (the d32 discipline). Decreasing order recovers most of
    * best-fit's utilization on heavy-tailed document lengths.
    *
    * Parallelism is the C22 shard contract: packing is sequential PER
    * SHARD (source × an id band), shards pack independently — one
    * repartition + in-partition sort, state resets at each shard
    * boundary. At 100 TB: shuffle is one exchange of (id, tokens)
    * pairs, the fold is O(1) memory per task, and bins never straddle
    * shards, so output order is reproducible run to run.
    *
    * Returns one row per document: (shard cols…, doc id, tokens, bin,
    * fill_after) with bin numbering local to the shard.
    */
  def packWholeDocs(df: DataFrame, idCol: String, tokensCol: String,
                    sourceCol: String, nBands: Int,
                    budget: Long): DataFrame = {
    require(budget > 0 && nBands > 0, "need budget > 0 and nBands > 0")
    import org.apache.spark.sql.types._
    val in = df.select(col(sourceCol).cast("string").as("source"),
      pmod(col(idCol).cast("long"), lit(nBands.toLong)).as("band"),
      col(idCol).cast("long").as("doc_id"),
      col(tokensCol).cast("long").as("tk"))
    val sorted = in.repartition(col("source"), col("band"))
      .sortWithinPartitions(col("source"), col("band"),
        col("tk").desc, col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("source", StringType),
      StructField("band", LongType),
      StructField("doc_id", LongType),
      StructField("tk", LongType),
      StructField("bin", LongType),
      StructField("fill_after", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    sorted.mapPartitions { rows =>
      var curSource: String = null
      var curBand = Long.MinValue
      var bin = 0L
      var fill = 0L
      rows.map { r =>
        val src = r.getString(0)
        val band = r.getLong(1)
        val id = r.getLong(2)
        val tk = r.getLong(3)
        if (src != curSource || band != curBand) {
          curSource = src; curBand = band
          bin = 0L; fill = tk
        } else if (fill + tk > budget) {
          bin += 1L; fill = tk
        } else fill += tk
        org.apache.spark.sql.Row(src, band, id, tk, bin, fill)
      }
    }(enc)
  }

  /** C106: whole-document BEST-FIT-DECREASING packing with a BOUNDED
    * open-bin set — the fill-rate upgrade over [[packWholeDocs]]'s
    * next-fit: NFD closes a bin the moment ONE document misses, so a
    * bin left at 60% never gets the small document that would have
    * topped it off. Classical bounded-space best-fit keeps up to
    * `openBins` bins open per shard; each document (descending token
    * order, the BFD rule) goes to the FULLEST open bin it still fits
    * (ties → lowest bin id). When nothing fits: a new bin opens, and if
    * the open set is full the FULLEST open bin is closed first (it is
    * the least likely to ever accept another doc). An oversized
    * document (> budget) gets its own immediately-closed bin — visible
    * as an overflow row, never dropped, and never wasting an open slot
    * (the c100 posture).
    *
    * The state is O(openBins) per shard — a strict sequential
    * recurrence like NFD's, so the engine shape is identical:
    * repartition by (source, band), sortWithinPartitions, one
    * mapPartitions fold. No window-over-everything, no driver state;
    * the oracle replays the slot machine as a k-column rank-synchronous
    * recursive CTE (the d32/c100 discipline). Same output contract as
    * [[packWholeDocs]] minus `fill_after` (a doc's bin can keep filling
    * after its row is emitted, so "fill so far" is not well-defined
    * per row under best-fit).
    *
    * At 100 TB: identical scale story to c100 — the sort is per-shard
    * within partitions, the fold is O(1) memory in corpus size, bins
    * never cross shards, and shard count (sources × bands) sets the
    * parallelism.
    */
  /** C113: [[packWholeDocsBounded]] with a PER-SOURCE budget column —
    * heterogeneous downstream sequence lengths (a code source packed
    * at 8k beside a chat source at 2k) without splitting the job per
    * source. The budget is a COLUMN, constant per source by contract;
    * the fold enforces the contract loudly (a source with two budgets
    * is a config bug that would silently mis-pack, not a data shape).
    * Same slot machine, same rollup — `budget` rides the output so
    * util_ppm stays meaningful per shard.
    */
  def packWholeDocsBudgeted(df: DataFrame, idCol: String,
                            tokensCol: String, sourceCol: String,
                            budgetCol: String, nBands: Int, openBins: Int,
                            firstFit: Boolean = false): DataFrame = {
    require(nBands > 0, "need nBands > 0")
    require(openBins >= 1, s"openBins $openBins < 1")
    import org.apache.spark.sql.types._
    val in = df.select(col(sourceCol).cast("string").as("source"),
      pmod(col(idCol).cast("long"), lit(nBands.toLong)).as("band"),
      col(idCol).cast("long").as("doc_id"),
      col(tokensCol).cast("long").as("tk"),
      col(budgetCol).cast("long").as("bg"))
    // validate the per-source-constant contract GLOBALLY up front (r14
    // advice): the in-fold require below sees only one (source, band)
    // shard, so a source carrying different budgets in different BANDS
    // would pass the engine while the oracle's DISTINCT(source, budget)
    // join fans out — a silent divergence where the contract promises a
    // loud failure. One small agg (map-side combined, one row per
    // source) buys the loud check; at 100 TB it is dwarfed by the
    // repartition that follows.
    val badSources = in.groupBy("source")
      .agg(countDistinct(col("bg")).as("__nbg"))
      .where(col("__nbg") > 1)
      .select("source").limit(5).collect().map(_.getString(0))
    require(badSources.isEmpty,
      s"sources ${badSources.mkString(", ")} carry more than one " +
        "budget — the per-source-constant contract is broken")
    val sorted = in.repartition(col("source"), col("band"))
      .sortWithinPartitions(col("source"), col("band"),
        col("tk").desc, col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("source", StringType),
      StructField("band", LongType),
      StructField("doc_id", LongType),
      StructField("tk", LongType),
      StructField("budget", LongType),
      StructField("bin", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val k = openBins
    sorted.mapPartitions { rows =>
      var curSource: String = null
      var curBand = Long.MinValue
      var curBg = Long.MinValue
      val slots = new BinSlots(k)
      rows.map { r =>
        val src = r.getString(0)
        val band = r.getLong(1)
        val id = r.getLong(2)
        val tk = r.getLong(3)
        val bg = r.getLong(4)
        if (src != curSource || band != curBand) {
          curSource = src; curBand = band; curBg = bg
          require(bg > 0, s"source $src: budget $bg must be positive")
          slots.reset()
        } else require(bg == curBg,
          s"source $src carries two budgets ($curBg and $bg) — the " +
            "per-source-constant contract is broken")
        org.apache.spark.sql.Row(src, band, id, tk, bg,
          slots.place(tk, curBg, firstFit))
      }
    }(enc)
  }

  /** The k-slot open-bin state machine shared by EVERY bounded-space
    * packing fold (C106/C111/C113 batch, D44 streaming): parallel
    * arrays of open bin ids and fills (slot i open iff binIds(i) ≥ 0),
    * plus the next bin id. [[place]] is the whole election: best-fit
    * (fullest eligible, tie lowest id) or first-fit (lowest-id
    * eligible); an oversized doc gets its own immediately-closed bin;
    * on a miss with a full slot set the FULLEST open bin is evicted.
    * O(k) state — exactly what a streaming GroupState must carry per
    * (source, band) shard for the fold to survive micro-batch
    * boundaries.
    */
  final class BinSlots(val k: Int) extends Serializable {
    val binIds = new Array[Long](k)
    val fills = new Array[Long](k)
    var nextBin = 0L
    reset()

    def reset(): Unit = {
      java.util.Arrays.fill(binIds, -1L)
      java.util.Arrays.fill(fills, 0L)
      nextBin = 0L
    }

    /** Place one document of `tk` tokens under `budget`; returns the
      * bin id it lands in (mutating the open-slot state).
      */
    def place(tk: Long, budget: Long, firstFit: Boolean): Long = {
      // election: best fit = fullest open bin that still fits (tie →
      // lowest id); first fit = oldest (lowest-id) open bin that fits
      var tgt = -1
      var i = 0
      while (i < k) {
        if (binIds(i) >= 0 && fills(i) + tk <= budget &&
            (tgt < 0 ||
              (if (firstFit) binIds(i) < binIds(tgt)
               else fills(i) > fills(tgt) ||
                 (fills(i) == fills(tgt) && binIds(i) < binIds(tgt)))))
          tgt = i
        i += 1
      }
      if (tgt >= 0) { fills(tgt) += tk; binIds(tgt) }
      else if (tk > budget) { nextBin += 1L; nextBin - 1L } // own bin, closed
      else {
        // place the new bin: an empty slot if any, else evict the
        // FULLEST open bin (tie → lowest id)
        var slot = -1
        var j = 0
        while (j < k && slot < 0) { if (binIds(j) < 0) slot = j; j += 1 }
        if (slot < 0) {
          slot = 0
          var m = 1
          while (m < k) {
            if (fills(m) > fills(slot) ||
                (fills(m) == fills(slot) && binIds(m) < binIds(slot)))
              slot = m
            m += 1
          }
        }
        binIds(slot) = nextBin
        fills(slot) = tk
        nextBin += 1L
        binIds(slot)
      }
    }
  }

  object BinSlots {
    /** Rehydrate from a streaming GroupState snapshot. */
    def restore(binIds: Array[Long], fills: Array[Long],
                nextBin: Long): BinSlots = {
      val s = new BinSlots(binIds.length)
      Array.copy(binIds, 0, s.binIds, 0, binIds.length)
      Array.copy(fills, 0, s.fills, 0, fills.length)
      s.nextBin = nextBin
      s
    }
  }

  /** C124: LPT shard BALANCING — the other packing question: C106
    * minimizes bins under a budget; a training-data export needs the
    * dual — spread a shard's documents over a FIXED set of k output
    * shards so the heaviest shard is as light as possible (equal-work
    * workers downstream: tokenizer passes, epoch shuffles, loader
    * threads). Classical longest-processing-time: documents descending
    * by tokens, each to the currently LIGHTEST shard (tie → lowest
    * shard id) — the 4/3-approximation whose pre-sort the packers
    * already pay. Mechanically it is [[packWholeDocsBounded]] with all
    * k bins PRE-OPENED, no budget, and a least-loaded election — the
    * same O(k) slot fold, so the engine shape is identical
    * (repartition by (source, band), sortWithinPartitions, one
    * mapPartitions fold) and the oracle is the same rank-synchronous
    * recursive CTE with the election CASE flipped to min-fill.
    *
    * Returns (source, band, doc_id, tk, shard) — shard ∈ [0, k).
    * At 100 TB: the c100/c106 scale story verbatim (per-shard
    * in-partition sort, O(k) fold state, shard sets never cross
    * (source, band) boundaries, parallelism = sources × bands).
    */
  def lptShards(df: DataFrame, idCol: String, tokensCol: String,
                sourceCol: String, nBands: Int, shards: Int): DataFrame = {
    require(nBands > 0, "need nBands > 0")
    require(shards >= 1, s"shards $shards < 1")
    import org.apache.spark.sql.types._
    val in = df.select(col(sourceCol).cast("string").as("source"),
      pmod(col(idCol).cast("long"), lit(nBands.toLong)).as("band"),
      col(idCol).cast("long").as("doc_id"),
      col(tokensCol).cast("long").as("tk"))
    val sorted = in.repartition(col("source"), col("band"))
      .sortWithinPartitions(col("source"), col("band"),
        col("tk").desc, col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("source", StringType),
      StructField("band", LongType),
      StructField("doc_id", LongType),
      StructField("tk", LongType),
      StructField("shard", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val k = shards
    sorted.mapPartitions { rows =>
      var curSource: String = null
      var curBand = Long.MinValue
      val fills = new Array[Long](k)
      rows.map { r =>
        val src = r.getString(0)
        val band = r.getLong(1)
        val id = r.getLong(2)
        val tk = r.getLong(3)
        if (src != curSource || band != curBand) {
          curSource = src; curBand = band
          java.util.Arrays.fill(fills, 0L)
        }
        // least-loaded election, tie → lowest shard id
        var tgt = 0
        var i = 1
        while (i < k) { if (fills(i) < fills(tgt)) tgt = i; i += 1 }
        fills(tgt) += tk
        org.apache.spark.sql.Row(src, band, id, tk, tgt.toLong)
      }
    }(enc)
  }

  /** @param firstFit C111's election instead of C106's: the OLDEST
    *        (lowest-id) open bin that fits, rather than the fullest —
    *        classical bounded first-fit-decreasing. Eviction on a miss
    *        is the fullest bin under both policies (it is the least
    *        likely to accept anything again).
    */
  def packWholeDocsBounded(df: DataFrame, idCol: String, tokensCol: String,
                           sourceCol: String, nBands: Int, budget: Long,
                           openBins: Int,
                           firstFit: Boolean = false): DataFrame = {
    require(budget > 0 && nBands > 0, "need budget > 0 and nBands > 0")
    require(openBins >= 1, s"openBins $openBins < 1")
    import org.apache.spark.sql.types._
    val in = df.select(col(sourceCol).cast("string").as("source"),
      pmod(col(idCol).cast("long"), lit(nBands.toLong)).as("band"),
      col(idCol).cast("long").as("doc_id"),
      col(tokensCol).cast("long").as("tk"))
    val sorted = in.repartition(col("source"), col("band"))
      .sortWithinPartitions(col("source"), col("band"),
        col("tk").desc, col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("source", StringType),
      StructField("band", LongType),
      StructField("doc_id", LongType),
      StructField("tk", LongType),
      StructField("bin", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val k = openBins
    val B = budget
    sorted.mapPartitions { rows =>
      var curSource: String = null
      var curBand = Long.MinValue
      val slots = new BinSlots(k)
      rows.map { r =>
        val src = r.getString(0)
        val band = r.getLong(1)
        val id = r.getLong(2)
        val tk = r.getLong(3)
        if (src != curSource || band != curBand) {
          curSource = src; curBand = band
          slots.reset()
        }
        org.apache.spark.sql.Row(src, band, id, tk,
          slots.place(tk, B, firstFit))
      }
    }(enc)
  }

  /** D44's batch twin: [[packWholeDocsBounded]] with an explicit
    * ARRIVAL-EPOCH column — the fold a continuously-arriving corpus
    * actually runs. The slot state resets on a (source, band) shard
    * change ONLY, never on an epoch boundary: a bin opened by epoch 0
    * stays open for a small doc arriving in epoch 2 — exactly the
    * cross-micro-batch state [[graft.streaming.PackingStream]] carries
    * in its GroupState, so streamed assignments ≡ this fold on the
    * same arrival order BY CONSTRUCTION (both drive
    * [[BinSlots.place]]). Within an epoch the descending-token BFD
    * rule still applies (a trigger's arrivals are packed
    * best-fit-decreasing); ACROSS epochs order is arrival, which is
    * the whole point — global BFD needs the future.
    *
    * Output carries `epoch` so a twin comparison can key on it; the
    * rollup contract is otherwise [[packWholeDocsBounded]]'s.
    */
  def packWholeDocsBoundedEpochs(df: DataFrame, idCol: String,
                                 tokensCol: String, sourceCol: String,
                                 epochCol: String, nBands: Int,
                                 budget: Long, openBins: Int,
                                 firstFit: Boolean = false): DataFrame = {
    require(budget > 0 && nBands > 0, "need budget > 0 and nBands > 0")
    require(openBins >= 1, s"openBins $openBins < 1")
    import org.apache.spark.sql.types._
    val in = df.select(col(sourceCol).cast("string").as("source"),
      pmod(col(idCol).cast("long"), lit(nBands.toLong)).as("band"),
      col(epochCol).cast("long").as("epoch"),
      col(idCol).cast("long").as("doc_id"),
      col(tokensCol).cast("long").as("tk"))
    val sorted = in.repartition(col("source"), col("band"))
      .sortWithinPartitions(col("source"), col("band"), col("epoch"),
        col("tk").desc, col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("source", StringType),
      StructField("band", LongType),
      StructField("epoch", LongType),
      StructField("doc_id", LongType),
      StructField("tk", LongType),
      StructField("bin", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val k = openBins
    val B = budget
    sorted.mapPartitions { rows =>
      var curSource: String = null
      var curBand = Long.MinValue
      val slots = new BinSlots(k)
      rows.map { r =>
        val src = r.getString(0)
        val band = r.getLong(1)
        val ep = r.getLong(2)
        val id = r.getLong(3)
        val tk = r.getLong(4)
        if (src != curSource || band != curBand) {
          curSource = src; curBand = band
          slots.reset()
        }
        org.apache.spark.sql.Row(src, band, ep, id, tk,
          slots.place(tk, B, firstFit))
      }
    }(enc)
  }
}
