package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Event-stream operators. Each has a batch form (oracle-checkable) and a
  * Structured Streaming form sharing the same aggregation logic — the
  * streaming plan adds only watermark + state management.
  */
object EventStreams {

  /** Batch tumbling-window aggregate: events per (hour, event_type).
    * Whole-second flooring keeps the oracle engine-agnostic.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        approx_count_distinct("user_id").as("approx_users"))

  /** Streaming parquet source that accepts the raw ns-timestamp files and
    * converts ts in-plan. Schemas with a proper timestamp ts pass through
    * untouched.
    *
    * Reading TIMESTAMP(NANOS) parquet relies on the engine's session-level
    * `nanosAsLong` policy ([[graft.GraftSession]]) — a streaming query
    * snapshots session conf at `.start()`, so the policy MUST be a
    * session-build decision; this function performs no conf mutation
    * (earlier revisions set it here session-wide mid-flight, silently
    * changing every later parquet read).
    */
  private def eventsSource(spark: SparkSession, dir: String,
                           schema: StructType): DataFrame =
    graft.Tables.withTsFromNanos(spark.readStream.schema(schema).parquet(dir))

  /** Streaming twin of [[hourlyAgg]]: file source → watermark → windowed
    * state → append. Used by the streaming spec with Trigger.AvailableNow.
    */
  def hourlyAggStream(spark: SparkSession, dir: String,
                      schema: StructType): DataFrame =
    eventsSource(spark, dir, schema)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization (batch): a new session starts when the gap to
    * the previous event of the same user exceeds `gapSeconds`. Timestamps
    * are floored to whole seconds BEFORE the gap compare so the DuckDB
    * oracle computes bit-identical breaks. Returns one row per session.
    *
    * Scale: one shuffle on user_id (the window partition); session ids are
    * running sums inside the partition — no self-join, no iteration.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("sec", "event_id")
    val sessions = events
      .select(col("user_id"), col("event_id"), col("value"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("prev_sec", lag("sec", 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_sec").isNull ||
          (col("sec") - col("prev_sec")) > gapSeconds, 1).otherwise(0))
      .withColumn("session_idx", sum("is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions.groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        min("sec").as("start_sec"), max("sec").as("end_sec"))
  }

  /** Batch twin of [[userTotalsStream]]: lifetime per-user totals. */
  def userTotals(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))

  /** D23 streaming sequence-pattern detection: the B49 funnel/burst
    * report maintained INCREMENTALLY — per-key
    * [[graft.operators.SeqPattern.FoldState]] advanced char-by-char in
    * `flatMapGroupsWithState`, so a pattern split across micro-batches
    * ('v','c' this trigger, 'p' the next) still counts: the regex scan
    * the batch form runs cannot resume mid-match, the O(1) automaton
    * state can. Update mode: each trigger emits the refreshed report for
    * the keys it saw. Within a trigger the group's rows fold in
    * (sec, event_id) order; across triggers the source's event-time
    * order is the delivery contract (the D15 arrival-order rule).
    * State is one 5-field struct per key — constant, watermark-free.
    */
  def patternStream(events: DataFrame,
                    startC: Char = 'v', midC: Char = 'c',
                    endC: Char = 'p', runC: Char = 'e'): DataFrame = {
    import graft.operators.SeqPattern
    import SeqPattern.FoldState
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"),
        unix_timestamp(col("ts")).as("sec"),
        col("event_id").cast("long"),
        substring(col("event_type"), 1, 1).as("code"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[FoldState]) => {
          var st = state.getOption.getOrElse(FoldState.zero)
          rows.toArray.sortBy(r => (r._2, r._3)).foreach { r =>
            if (r._4.nonEmpty)
              st = SeqPattern.advance(st, r._4.charAt(0),
                startC, midC, endC, runC)
          }
          state.update(st)
          Iterator((uid, st.seqLen.toInt, st.matches, st.maxRun))
        })
      .toDF("user_id", "seq_len", "n_matches", "longest_run")
  }

  /** D26 streaming admission cap: at most `cap` events per key admitted
    * over the stream's LIFETIME, decided in event order — the frontier
    * rate limiter (crawl budgets per host, free-tier caps per account)
    * where C54's seeded-sample cap cannot apply because admission must
    * be decided AS EVENTS ARRIVE, first-come: a batch resample would
    * revoke already-granted admissions. State per key is ONE counter;
    * within a trigger rows fold in (sec, event_id) order, across
    * triggers event-time delivery is the contract (the D15 rule). Every
    * event is emitted with its verdict, so downstream routing composes
    * with D16's quarantine split.
    */
  def admissionCapStream(events: DataFrame, cap: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"),
        unix_timestamp(col("ts")).as("sec"),
        col("event_id").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[Long]) => {
          var admitted = state.getOption.getOrElse(0L)
          val out = rows.toArray.sortBy(r => (r._2, r._3)).map { r =>
            val ok = admitted < cap
            if (ok) admitted += 1
            (r._3, uid, ok)
          }
          state.update(admitted)
          out.iterator
        })
      .toDF("event_id", "user_id", "admitted")
  }

  /** Batch twin of [[admissionCapStream]]: the same first-`cap`-per-key
    * verdicts as one window rank over the full history — what the
    * d26 gate oracles; the spec locks stream ≡ batch including an
    * admission budget that exhausts MID-trigger and across triggers.
    */
  def admissionCapBatch(events: DataFrame, cap: Long): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("sec"), col("event_id"))
    events
      .select(col("user_id").cast("long"),
        unix_timestamp(col("ts")).as("sec"),
        col("event_id").cast("long"))
      .withColumn("admitted", row_number().over(w) <= cap)
      .select("event_id", "user_id", "admitted")
  }

  /** D29 streaming debounce (kept-based): an event is admitted iff at
    * least `gapSec` has passed since the last ADMITTED event of its
    * (user, type) — the time-axis rate limiter completing D26's
    * count-axis cap (alert throttling, notification dedup, sensor
    * downsampling). Kept-based semantics are a sequential per-key FOLD
    * (the next verdict depends on the last KEPT time, not the previous
    * event), which no window function expresses — exactly the
    * flatMapGroupsWithState shape, one timestamp of state per key. The
    * batch twin [[debounceBatchKept]] runs the same fold via
    * mapGroups; the spec locks stream ≡ fold AND the semantic gap to
    * the window-expressible raw-predecessor form (`d29_debounce`):
    * under a sustained sub-gap event train, raw-based keeps only the
    * first event ever, kept-based keeps one per ~gap.
    */
  def debounceStream(events: DataFrame, gapSec: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"),
        substring(col("event_type"), 1, 1).as("ty"),
        unix_timestamp(col("ts")).as("sec"),
        col("event_id").cast("long"))
      .as[(Long, String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: (Long, String), rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[Long]) => {
          var lastKept = state.getOption.getOrElse(Long.MinValue)
          val out = rows.toArray.sortBy(r => (r._3, r._4)).map { r =>
            val keep = lastKept == Long.MinValue || r._3 - lastKept > gapSec
            if (keep) lastKept = r._3
            (r._4, key._1, keep)
          }
          state.update(lastKept)
          out.iterator
        })
      .toDF("event_id", "user_id", "kept")
  }

  /** Batch twin of [[debounceStream]]: the same kept-based fold over
    * full histories (mapGroups, (sec, event_id) order).
    */
  def debounceBatchKept(events: DataFrame, gapSec: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"),
        substring(col("event_type"), 1, 1).as("ty"),
        unix_timestamp(col("ts")).as("sec"),
        col("event_id").cast("long"))
      .as[(Long, String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (Long, String),
                        rows: Iterator[(Long, String, Long, Long)]) =>
        var lastKept = Long.MinValue
        rows.toArray.sortBy(r => (r._3, r._4)).iterator.map { r =>
          val keep = lastKept == Long.MinValue || r._3 - lastKept > gapSec
          if (keep) lastKept = r._3
          (r._4, key._1, keep)
        }
      }
      .toDF("event_id", "user_id", "kept")
  }

  /** D32 frontier-ingest composition — D26's admission cap, D29's
    * kept-based debounce and D16's quality route fused into ONE
    * streaming operator, the production crawl-frontier shape
    * (budget → throttle → content gate). The composition is the point:
    * the three per-key state contracts must hold SIMULTANEOUSLY in one
    * state machine —
    *
    *   - stage order is semantic, not cosmetic: the cap counts every
    *     arriving event (it protects the pipeline from VOLUME, so a
    *     debounced or quarantined event still spends budget — a host
    *     hammering you with junk exhausts its allowance, which is what
    *     a frontier wants); the debounce clock advances only on events
    *     that passed the cap; the quality verdict routes but never
    *     touches state (content must not perturb admission timing, or
    *     replaying with a new quality model would change history);
    *   - state per key is ONE counter + one last-kept timestamp per
    *     type initial ((1 + |types|) longs — the D26 and D29 states
    *     side by side, keyed once by user instead of twice);
    *   - within a trigger rows fold in (sec, event_id) order; across
    *     triggers event-time delivery is the contract (the D15 rule).
    *
    * Emits every event with the full verdict triple so downstream
    * splits stay composable; [[frontierGateBatch]] runs the identical
    * fold over full histories (the spec locks stream ≡ batch with
    * budgets dying mid-trigger and debounce state crossing triggers).
    */
  def frontierGateStream(events: DataFrame, cap: Long,
                         gapSec: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    frontierPrepped(events)
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, String, Long, Long, Boolean)],
         state: GroupState[(Long, Map[String, Long])]) => {
          val (st, out) = frontierFold(uid, rows,
            state.getOption.getOrElse((0L, Map.empty[String, Long])),
            cap, gapSec)
          state.update(st)
          out.iterator
        })
      .toDF("event_id", "user_id", "admitted", "kept", "quarantined")
  }

  /** Batch twin of [[frontierGateStream]]: the same composed fold over
    * full per-user histories.
    */
  def frontierGateBatch(events: DataFrame, cap: Long,
                        gapSec: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    frontierPrepped(events)
      .groupByKey(_._1)
      .flatMapGroups {
        (uid: Long, rows: Iterator[(Long, String, Long, Long, Boolean)]) =>
          frontierFold(uid, rows, (0L, Map.empty[String, Long]),
            cap, gapSec)._2.iterator
      }
      .toDF("event_id", "user_id", "admitted", "kept", "quarantined")
  }

  private def frontierPrepped(events: DataFrame) = {
    val spark = events.sparkSession
    import spark.implicits._
    gateVerdict(events).select(
      col("user_id").cast("long"),
      substring(col("event_type"), 1, 1).as("ty"),
      unix_timestamp(col("ts")).as("sec"),
      col("event_id").cast("long"),
      col("quarantined"))
      .as[(Long, String, Long, Long, Boolean)]
  }

  /** The composed per-key fold shared by stream and batch: admission
    * first (every event spends budget), debounce on admitted events
    * only, quality routed through unchanged.
    */
  private def frontierFold(uid: Long,
                           rows: Iterator[(Long, String, Long, Long, Boolean)],
                           st0: (Long, Map[String, Long]),
                           cap: Long, gapSec: Long)
      : ((Long, Map[String, Long]),
         Array[(Long, Long, Boolean, Boolean, Boolean)]) = {
    var admitted = st0._1
    var lastKept = st0._2
    val out = rows.toArray.sortBy(r => (r._3, r._4)).map { r =>
      val adm = admitted < cap
      if (adm) admitted += 1
      val keep = adm && {
        val lk = lastKept.get(r._2)
        val k = lk.isEmpty || r._3 - lk.get > gapSec
        if (k) lastKept = lastKept.updated(r._2, r._3)
        k
      }
      (r._4, uid, adm, keep, r._5)
    }
    ((admitted, lastKept), out)
  }

  /** Custom-state streaming aggregation: per-user lifetime totals kept in
    * a `GroupState[(count, sum)]` via `flatMapGroupsWithState` — the
    * pattern for state Spark's built-in aggregates can't express (decayed
    * counters, per-key ML state, custom eviction). Update mode: each
    * trigger emits the refreshed totals for the users it saw; state size
    * is O(distinct users), partitioned by the group key across executors.
    */
  def userTotalsStream(spark: SparkSession, dir: String,
                       schema: StructType): DataFrame = {
    import spark.implicits._
    eventsSource(spark, dir, schema)
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) => {
          var (n, sum) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { r => n += 1; sum += r._2 }
          state.update((n, sum))
          Iterator((uid, n, sum))
        })
      .toDF("user_id", "n_events", "sum_raw")
      .select(col("user_id"), col("n_events"),
        round(col("sum_raw"), 2).as("sum_value"))
  }

  /** [[userTotalsStream]] with EVENT-TIME TTL eviction — the pattern that
    * bounds state size on an unbounded key space (users churn; their
    * state must not live forever). State idle past `ttl` of event time is
    * dropped when the watermark passes it, emitting one final row with
    * `evicted = true`. Takes the (streaming) events frame as an argument
    * so tests can drive it from a MemoryStream with controlled
    * watermarks.
    */
  def userTotalsStreamTtl(events: DataFrame,
                          ttlMillis: Long = 3600000L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"),
        col("ts").cast("timestamp"))
      .withWatermark("ts", "0 seconds")
      .as[(Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, rows: Iterator[(Long, Double, java.sql.Timestamp)],
         state: GroupState[(Long, Double, Long)]) => {
          if (state.hasTimedOut) {
            val (n, sum, _) = state.get
            state.remove()
            Iterator((uid, n, sum, true))
          } else {
            var (n, sum, maxTs) = state.getOption.getOrElse((0L, 0.0, 0L))
            rows.foreach { r =>
              n += 1; sum += r._2; maxTs = math.max(maxTs, r._3.getTime)
            }
            state.update((n, sum, maxTs))
            state.setTimeoutTimestamp(maxTs + ttlMillis)
            Iterator((uid, n, sum, false))
          }
        })
      .toDF("user_id", "n_events", "sum_raw", "evicted")
      .select(col("user_id"), col("n_events"),
        round(col("sum_raw"), 2).as("sum_value"), col("evicted"))
  }

  /** Exactly-once micro-batch delivery into a partitioned parquet table:
    * each epoch (micro-batch) lands in its own `__epoch=<batchId>`
    * partition via dynamic-overwrite, so a REPLAYED epoch — Structured
    * Streaming's failure contract is at-least-once re-delivery of the
    * last uncommitted batch — overwrites its own partition with identical
    * content instead of appending duplicates. Idempotence by construction,
    * no transaction log: the (checkpoint, epoch-partition) pair is the
    * commit protocol, the same recipe the Delta sink implements with a
    * log. Readers see each input row exactly once
    * ([[SchemaCsv.readPartitioned]] over the table; drop `__epoch`).
    *
    * At scale each epoch write is one partition directory — no
    * read-modify-write of the table, no contention with readers, and
    * compaction of old epochs is A18's job.
    */
  def epochIdempotentSink(batch: DataFrame, batchId: Long,
                          path: String): Unit =
    graft.sources.SchemaCsv.writePartitionedIdempotent(
      batch.withColumn("__epoch", lit(batchId)), path, Seq("__epoch"))

  /** Wire [[epochIdempotentSink]] under a streaming query (foreachBatch).
    * The spec drives replay explicitly by invoking the sink function
    * twice with one batch id — the failure case a running query only
    * exhibits under an injected crash.
    */
  def exactlyOnceFileSink(stream: DataFrame, path: String,
                          checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) =>
        epochIdempotentSink(b, id, path))
      .trigger(Trigger.AvailableNow())
      .start()

  /** D16 row-check verdict — the A32 expectation surface applied per
    * event: pass = known non-error type AND value in [0, 300] AND a
    * user to attribute to. `quarantined` is never null (a null under
    * any check quarantines — the A32 null contract), so every row
    * routes to exactly one sink.
    */
  def gateVerdict(events: DataFrame): DataFrame = {
    val pass = col("user_id").isNotNull &&
      col("value").between(0, 300) &&
      col("event_type").isin("click", "view", "purchase", "signup")
    events.withColumn("quarantined", !coalesce(pass, lit(false)))
  }

  /** D16 epoch body: one micro-batch split into table + dead-letter
    * quarantine, EACH delivered with the D8 epoch-overwrite contract —
    * a replayed epoch recomputes the identical split and overwrites
    * both of its own partitions, so at-least-once redelivery converges
    * to exactly-once on BOTH paths and a row can never land in neither
    * or both. This is the DLT `expect ... ON VIOLATION` discipline as
    * a log-less streaming sink: bad rows stay queryable for repair
    * (the A13 quarantine rule) instead of poisoning the table or
    * silently vanishing.
    */
  def gatedEpochSink(batch: DataFrame, batchId: Long,
                     passDir: String, quarantineDir: String): Unit = {
    val v = gateVerdict(batch)
    epochIdempotentSink(v.where(!col("quarantined")).drop("quarantined"),
      batchId, passDir)
    epochIdempotentSink(v.where(col("quarantined")).drop("quarantined"),
      batchId, quarantineDir)
  }

  /** Wire [[gatedEpochSink]] under a streaming query. */
  def qualityGatedSink(stream: DataFrame, passDir: String,
                       quarantineDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) =>
        gatedEpochSink(b, id, passDir, quarantineDir))
      .trigger(Trigger.AvailableNow())
      .start()

  /** The newest committed snapshot version strictly below `beforeEpoch`
    * (None = newest overall) of a [[mergeEpoch]] table. Driver-side FS
    * listing bounded by the epoch count — the same metadata-scan budget
    * as [[graft.sources.Compaction]]; old versions are A21-vacuum fodder.
    */
  def readSnapshot(spark: SparkSession, tableRoot: String,
                   beforeEpoch: Option[Long] = None)
      : Option[(Long, DataFrame)] = {
    val dirs = Option(new java.io.File(tableRoot).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.drop(2).toLong)
      .filter(v => beforeEpoch.forall(v < _))
    dirs.sorted.lastOption
      .map(v => v -> spark.read.parquet(s"$tableRoot/v=$v"))
  }

  /** Streaming keyed MERGE sink (D10): fold one micro-batch of keyed
    * updates into a TABLE — the upsert counterpart of
    * [[epochIdempotentSink]]'s append-only delivery, for streams that
    * revise rows (CDC tails, dimension feeds) instead of only adding
    * them. Each epoch merges against the newest snapshot version BELOW
    * its own id and writes snapshot `v=<batchId>` plus the A23 change
    * feed for that epoch (feed partitioned by `__epoch`).
    *
    * Exactly-once by construction, same recipe as D8: a REPLAYED epoch
    * (Structured Streaming's at-least-once failure contract) reads the
    * same pre-state — versions below its id are immutable — recomputes
    * the identical merge, and overwrites its own snapshot version and
    * feed partition. No transaction log; the version directory IS the
    * commit. Readers take the newest version for the current table or
    * replay the feed (A23's contract) for row-level diffs.
    *
    * In-batch duplicates per key compact deterministically first
    * (max-struct wins — the same-instant rule SCD2 uses): foreachBatch
    * hands over raw at-least-once micro-batches, and
    * [[graft.operators.Upsert.upsertWithChanges]] requires unique keys.
    *
    * At scale: the merge is A17/A23's key-partitioned join shape; each
    * epoch rewrites the snapshot ONCE (sequential micro-batches, never
    * concurrent), the feed write is batch-sized, and old versions are
    * retention/vacuum work (A21), not read-path work.
    */
  def mergeEpoch(batch: DataFrame, batchId: Long, tableRoot: String,
                 feedRoot: String, keys: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val dataCols = batch.columns.filterNot(keys.contains).toSeq
    val updates = batch
      .groupBy(keys.map(col): _*)
      .agg(max(struct(dataCols.map(col): _*)).as("__m"))
      .select(keys.map(col) ++
        dataCols.map(c => col("__m").getField(c).as(c)): _*)
    val target = readSnapshot(spark, tableRoot, Some(batchId))
      .map(_._2.select(updates.columns.map(col): _*))
      .getOrElse(updates.where(lit(false)))
    val r = graft.operators.Upsert.upsertWithChanges(target, updates, keys)
    r.merged.write.mode("overwrite").parquet(s"$tableRoot/v=$batchId")
    epochIdempotentSink(r.changes, batchId, feedRoot)
  }

  /** Wire [[mergeEpoch]] under a streaming query. Spec-locked: the final
    * snapshot equals a one-shot batch merge of the same updates, and an
    * explicitly replayed epoch changes neither snapshot nor feed.
    */
  def mergeSink(stream: DataFrame, tableRoot: String, feedRoot: String,
                keys: Seq[String], checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) =>
        mergeEpoch(b, id, tableRoot, feedRoot, keys))
      .trigger(Trigger.AvailableNow())
      .start()

  /** Batch twin of [[dedupStream]]: keep one row per event_id. Rows
    * sharing an event_id are byte-identical retransmissions (at-least-once
    * delivery), so which survives is immaterial.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Streaming exact dedup with BOUNDED state: dropDuplicatesWithinWatermark
    * keeps an event_id in state only until the watermark passes its event
    * time — the at-least-once → exactly-once repair that plain
    * dropDuplicates (state grows forever on an unbounded stream) cannot
    * provide. Takes the streaming frame as an argument so tests drive it
    * from a MemoryStream with controlled duplicate injection.
    */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch twin of [[attributionStream]]: every purchase joined to the
    * same user's views in the preceding `windowSeconds` (inclusive both
    * ends), left-outer so zero-view purchases survive with n_views = 0.
    * Timestamps floor to whole seconds (unix_timestamp) so the DuckDB
    * oracle computes bit-identical window edges — same contract as
    * [[sessionize]].
    *
    * Scale: one shuffle of each side keyed on user_id; the range predicate
    * rides as a join residual. AQE skew handling applies to the exchange;
    * a per-user time sort never concentrates in one task beyond that
    * user's own events (and the streaming form bounds it further).
    */
  def attributionBatch(events: DataFrame,
                       windowSeconds: Long = 1800L): DataFrame = {
    val v = events.where(col("event_type") === "view")
      .select(col("user_id").as("vuid"), col("event_id").as("view_id"),
        unix_timestamp(col("ts")).as("vsec"))
    val p = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_timestamp(col("ts")).as("psec"), col("value"))
    p.join(v, col("user_id") === col("vuid") &&
        col("vsec") >= col("psec") - windowSeconds &&
        col("vsec") <= col("psec"), "left")
      .groupBy("purchase_id")
      .agg(count(col("view_id")).as("n_views"),
        round(max("value"), 2).as("value"))
  }

  /** Pair-level LEFT-OUTER batch twin of [[attributionStream]]'s
    * `leftOuter` mode: one row per (purchase, matching view) plus a
    * (purchase_id, NULL) row for zero-view purchases — exactly the row
    * set the streaming outer join converges to once the watermark passes
    * every purchase. [[attributionBatch]] aggregates this shape away
    * (n_views = 0), so the null rows themselves — the part whose
    * emission timing is the hard streaming problem — were previously
    * only spec-checked; this form puts them under the DuckDB oracle.
    * Second-floored timestamps, same cross-engine contract as
    * [[attributionBatch]].
    */
  def attributionPairs(events: DataFrame,
                       windowSeconds: Long = 1800L): DataFrame = {
    val v = events.where(col("event_type") === "view")
      .select(col("user_id").as("vuid"), col("event_id").as("view_id"),
        unix_timestamp(col("ts")).as("vsec"))
    val p = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_timestamp(col("ts")).as("psec"))
    p.join(v, col("user_id") === col("vuid") &&
        col("vsec") >= col("psec") - windowSeconds &&
        col("vsec") <= col("psec"), "left")
      .select(col("purchase_id"), col("view_id"))
  }

  /** Stream-stream INTERVAL join: purchases stream ⋈ views stream on
    * user within a trailing event-time window — the missing two-stream
    * shape next to the one-stream aggregations above. Both sides carry a
    * watermark and the join condition bounds event-time distance, so
    * Spark derives a state watermark for EACH side: view state older than
    * (watermark − windowSeconds) and purchase state older than the
    * watermark are evicted — bounded state on two unbounded streams.
    * Inner join (the default) is append-safe: pairs emit as both sides
    * arrive. `leftOuter` additionally emits (purchase_id, null) for a
    * purchase once the watermark proves no matching view can still
    * arrive — the streaming twin of the batch form's zero-view rows,
    * delayed by exactly the watermark.
    */
  def attributionStream(spark: SparkSession, dir: String, schema: StructType,
                        windowSeconds: Long = 1800L,
                        watermark: String = "2 hours",
                        joinType: String = "inner"): DataFrame = {
    val v = eventsSource(spark, dir, schema)
      .where(col("event_type") === "view")
      .select(col("user_id").as("vuid"), col("event_id").as("view_id"),
        col("ts").as("vts"))
      .withWatermark("vts", watermark)
    val p = eventsSource(spark, dir, schema)
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("puid"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
      .withWatermark("pts", watermark)
    p.join(v, col("puid") === col("vuid") &&
        col("vts") >= col("pts") - expr(s"INTERVAL $windowSeconds SECONDS") &&
        col("vts") <= col("pts"), joinType)
      .select(col("purchase_id"), col("view_id"))
  }

  /** Streaming sessionization via session_window — state-backed native
    * session windows with watermark eviction (the streaming-scale answer;
    * the batch twin above is the oracle-checkable one).
    */
  def sessionizeStream(spark: SparkSession, dir: String, schema: StructType,
                       gap: String = "30 minutes"): DataFrame =
    eventsSource(spark, dir, schema)
      // floor to whole seconds BEFORE windowing, same as the batch twin —
      // keeps session boundaries bit-identical between the two forms
      .withColumn("ts", date_trunc("second", col("ts")))
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))

  /** Batch twin of [[enrichedHourlyStream]]: events enriched against the
    * customer dimension — the stream-static join, the single most common
    * production streaming shape — then aggregated per (hour, market
    * segment).
    *
    * Scale: the dimension side is broadcast, so the fact side never
    * shuffles for the join (a dimension of millions of rows is still MBs
    * next to a 100 TB fact stream); the only exchange is the final
    * (hour, segment) aggregate over a tiny key space, map-side combined.
    */
  def enrichedHourly(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))

  /** Streaming stream-static enrichment: the file-source event stream
    * joins the static customer dimension inside each micro-batch —
    * stateless for the join (the engine re-plans the static side per
    * batch; broadcast keeps it shuffle-free), state only in the
    * watermarked windowed aggregate that finalizes (hour, segment) rows
    * in append mode. Unlike stream-stream joins (D6) no watermark is
    * needed on the dimension: static rows never expire.
    */
  def enrichedHourlyStream(spark: SparkSession, dir: String,
                           schema: StructType, dim: DataFrame): DataFrame =
    eventsSource(spark, dir, schema)
      .withWatermark("ts", "2 hours")
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("hour"),
        col("c_mktsegment").as("segment"),
        col("n_events"), col("sum_value"))

  // ------------------------------------------------- D14: trending top-k

  /** Rank-on-read finalizer over a (hour, event_type, n) counts table:
    * top-`k` types per hour, ties broken by type name. The window
    * partitions the DIM-SIZED counts table (hours × types), never the
    * event stream.
    */
  def trendingOnRead(counts: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("hour").orderBy(desc("n"), col("event_type"))
    counts.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("hour"), col("rnk"), col("event_type"), col("n"))
  }

  /** Batch twin of the trending pipeline: hourly (hour, type) counts +
    * [[trendingOnRead]].
    */
  def trendingBatch(events: DataFrame, k: Int = 3): DataFrame =
    trendingOnRead(
      events.groupBy(date_trunc("hour", col("ts")).as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n")), k)

  /** Batch twin of [[zscoreStream]] (D15): each event scored against the
    * running statistics of STRICTLY EARLIER same-type events — frame =
    * unbounded preceding .. 1 preceding in (ts, event_id) order, so an
    * event never sees itself and the first two of a type have no defined
    * deviation (null z). The frame sort never leaves the type partition.
    */
  def zscoreBatch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events.select(col("event_id"), col("event_type"), col("value"),
        avg("value").over(w).as("mu"),
        stddev_samp("value").over(w).as("sd"))
      .select(col("event_id"), col("event_type"),
        when(col("sd") > 0,
          round((col("value") - col("mu")) / col("sd"), 4)).as("z"))
  }

  /** Streaming z-score anomaly scorer (D15): per-type Welford state
    * (n, mean, M2 — 3 numbers per key, constant in stream length) in a
    * GroupState; each event is scored against the state BEFORE its own
    * update, the exact semantics of the batch twin's 1-PRECEDING frame.
    * In-batch rows fold in (ts, event_id) order so replays are
    * deterministic; Welford vs the window aggregate differ only in fp
    * associativity (spec bounds the drift at 1e-6).
    */
  def zscoreStream(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id").cast("long"), col("event_type"),
        col("value").cast("double"), col("ts").cast("timestamp"))
      .as[(Long, String, Double, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (typ: String,
         rows: Iterator[(Long, String, Double, java.sql.Timestamp)],
         state: GroupState[(Long, Double, Double)]) => {
          var (n, mean, m2) = state.getOption.getOrElse((0L, 0.0, 0.0))
          // Full-precision instant (ms + nanos), then id — the exact
          // sort key of the batch twin's (ts, event_id) frame; getTime
          // alone is ms-truncated and can reorder sub-ms neighbours.
          val out = rows.toSeq
            .sortBy(r => (r._4.getTime, r._4.getNanos, r._1)).map { r =>
            val z: Option[Double] =
              if (n >= 2) {
                val sd = math.sqrt(m2 / (n - 1))
                if (sd > 0) Some((r._3 - mean) / sd) else None
              } else None
            n += 1
            val d = r._3 - mean
            mean += d / n
            m2 += d * (r._3 - mean)
            (r._1, typ, z)
          }
          state.update((n, mean, m2))
          out.iterator
        })
      .toDF("event_id", "event_type", "z")
  }

  /** Streaming half of the trending pipeline: watermarked hourly
    * (hour, type) counts in APPEND mode. Ranking is deliberately NOT in
    * the stream: a top-k is not incrementally emittable under append
    * semantics (one late event can reorder a whole window), so the
    * production shape is this exactly-once counts stream + rank-on-read
    * — the same split D12/D13 use for sketch state vs probe.
    */
  def trendingCountsStream(spark: SparkSession, dir: String,
                           schema: StructType): DataFrame =
    eventsSource(spark, dir, schema)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"))
}
