package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Structured Streaming twins run with Trigger.AvailableNow against a
  * parquet copy of the events table, then compared row-for-row with the
  * (DuckDB-oracle-checked) batch forms. Append mode: the watermark ends at
  * max(event time) - 2h, so a tail of unfinalized windows is legitimately
  * absent — every EMITTED row must match the batch twin exactly.
  */
class EventStreamsSpec extends AnyFunSuite with SparkSpec {

  private lazy val events = Tables(spark, sfDir(), "events")

  // stage the RAW nanosecond parquet (byte-for-byte copy): the streaming
  // sources must eat the same INT64 TIMESTAMP(NANOS) files the batch
  // loader does, via nanosAsLong + in-plan conversion
  private lazy val stagedDir: String = {
    val d = Files.createTempDirectory("graft_stream_events")
    Files.copy(java.nio.file.Paths.get(sfDir(), "events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  // schema as the raw file presents under nanosAsLong: ts is LongType
  private lazy val rawSchema = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(stagedDir).schema
  }

  private def runToCompletion(stream: org.apache.spark.sql.DataFrame,
                              name: String): org.apache.spark.sql.DataFrame = {
    val q = stream.writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("hourlyAggStream(AvailableNow) rows all match the batch twin") {
    val streamed = runToCompletion(
      EventStreams.hourlyAggStream(spark, stagedDir, rawSchema), "hourly_mem")
    val batch = EventStreams.hourlyAgg(events)
      .select("hour", "event_type", "n_events", "sum_value")
    val n = streamed.count()
    assert(n > 0, "no finalized windows emitted")
    val unmatched = streamed.join(batch,
      Seq("hour", "event_type", "n_events", "sum_value"), "left_anti").count()
    assert(unmatched === 0L)
    // watermark holdback only: batch row count bounds the streamed one
    assert(n <= batch.count())
  }

  test("userTotalsStream custom state equals the batch totals exactly") {
    val streamed = runToCompletion2(
      EventStreams.userTotalsStream(spark, stagedDir, rawSchema),
      "user_totals_mem", "update")
    val batch = EventStreams.userTotals(events)
    // single AvailableNow batch → one final state emission per user
    assert(streamed.count() === batch.count())
    val unmatched = streamed.join(batch,
      Seq("user_id", "n_events", "sum_value"), "left_anti").count()
    assert(unmatched === 0L)
  }

  private def runToCompletion2(stream: org.apache.spark.sql.DataFrame,
                               name: String, mode: String): org.apache.spark.sql.DataFrame = {
    val q = stream.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("userTotalsStreamTtl evicts idle state when the watermark passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def ts(h: Int, m: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    val input = MemoryStream[(Long, Double, java.sql.Timestamp)]
    val stream = EventStreams.userTotalsStreamTtl(
      input.toDF().toDF("user_id", "value", "ts"), ttlMillis = 3600000L)
    val q = stream.writeStream.format("memory").queryName("ttl_mem")
      .outputMode("update").start()
    try {
      input.addData((1L, 10.0, ts(10)), (1L, 5.0, ts(10, 30)))
      q.processAllAvailable() // watermark → 10:30; user 1 timeout = 11:30
      input.addData((2L, 7.0, ts(14)))
      q.processAllAvailable() // watermark → 14:00 (checked NEXT batch)
      input.addData((2L, 1.0, ts(14, 5)))
      q.processAllAvailable() // timeout fires: watermark 14:00 > 11:30
      val out = spark.table("ttl_mem").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      val evicted = out.filter(_._4)
      assert(evicted.toSeq === Seq((1L, 2L, 15.0, true)),
        s"got: ${out.toSeq}")
      // user 2 is live, never evicted
      assert(out.filter(r => r._1 == 2L).forall(!_._4))
    } finally q.stop()
  }

  test("epoch-idempotent sink delivers exactly once under batch replay") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_eos").toString
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val b1 = Seq((3L, "c")).toDF("k", "v")
    EventStreams.epochIdempotentSink(b0, 0L, dir)
    EventStreams.epochIdempotentSink(b1, 1L, dir)
    // at-least-once failure contract: the last epoch is re-delivered
    EventStreams.epochIdempotentSink(b0, 0L, dir)
    val got = spark.read.parquet(dir).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a"), (2L, "b"), (3L, "c")),
      "replayed epoch must overwrite itself, not append")

    // end-to-end wiring: a real streaming query lands every input row
    // exactly once through the same sink
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_eos2").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_eos_ckpt").toString
    val input = MemoryStream[(Long, String)]
    input.addData((10L, "x"), (11L, "y"))
    val q = EventStreams.exactlyOnceFileSink(
      input.toDF().toDF("k", "v"), dir2, ckpt)
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(dir2).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === Set((10L, "x"), (11L, "y")))
  }

  test("d16: gated sink routes every event to exactly one sink, " +
       "replay duplicates neither path, split matches the batch twin") {
    val passDir = java.nio.file.Files
      .createTempDirectory("graft_gate_pass").toString
    val quarDir = java.nio.file.Files
      .createTempDirectory("graft_gate_quar").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_gate_ckpt").toString
    val src = graft.Tables.withTsFromNanos(
      spark.readStream.schema(rawSchema).parquet(stagedDir))
    val q = EventStreams.qualityGatedSink(src, passDir, quarDir, ckpt)
    q.awaitTermination(120000)

    val pass = spark.read.parquet(passDir).select("event_id")
    val quar = spark.read.parquet(quarDir).select("event_id")
    val twin = EventStreams.gateVerdict(events)
    // exactly-one-sink: union == input, intersection empty
    assert(pass.count() + quar.count() === events.count())
    assert(pass.intersect(quar).count() === 0L)
    // the split is the batch twin's verdict, id for id
    val wantQuar = twin.where(col("quarantined")).select("event_id")
    assert(quar.exceptAll(wantQuar).count() === 0L &&
      wantQuar.exceptAll(quar).count() === 0L)
    assert(quar.count() > 0L, "gate must actually quarantine something")

    // at-least-once replay against fresh sinks: delivering one epoch
    // TWICE must equal delivering it once — on both paths
    val p2 = java.nio.file.Files
      .createTempDirectory("graft_gate_p2").toString
    val q2 = java.nio.file.Files
      .createTempDirectory("graft_gate_q2").toString
    val epoch = events.orderBy("event_id").limit(100)
    EventStreams.gatedEpochSink(epoch, 0L, p2, q2)
    EventStreams.gatedEpochSink(epoch, 0L, p2, q2)
    assert(spark.read.parquet(p2).count() +
      spark.read.parquet(q2).count() === 100L,
      "replayed epoch must overwrite itself on both paths")
  }

  test("d17: a materialized view advanced from the STREAMING merge " +
       "sink's change feed equals a rebuild from the final snapshot") {
    val s = spark
    import s.implicits._
    import graft.operators.MaterializedView
    val tableRoot = java.nio.file.Files
      .createTempDirectory("graft_d17_table").toString
    val feedRoot = java.nio.file.Files
      .createTempDirectory("graft_d17_feed").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_d17_ckpt").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    // epoch 0: three inserts; epoch 1: revise k=1, delete-less insert k=4
    input.addData((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
    val q1 = EventStreams.mergeSink(input.toDF().toDF("k", "g", "v"),
      tableRoot, feedRoot, Seq("k"), ckpt)
    q1.awaitTermination(120000)
    input.addData((1L, "a", 11.0), (4L, "b", 40.0))
    val q2 = EventStreams.mergeSink(input.toDF().toDF("k", "g", "v"),
      tableRoot, feedRoot, Seq("k"), ckpt)
    q2.awaitTermination(120000)

    val snapshot = EventStreams.readSnapshot(spark, tableRoot).get._2
    // fold the feed epoch-by-epoch through the B26 incremental apply
    val feed = spark.read.parquet(feedRoot)
    // __epoch is a discovered partition column: inferred int
    val epochs = feed.select(col("__epoch").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(epochs.length >= 2, s"expected >=2 epochs, got ${epochs.toSeq}")
    val empty = Seq.empty[(Long, String, Double)].toDF("k", "g", "v")
    var view = MaterializedView.build(empty, Seq("g"), Seq("v"))
    epochs.foreach { e =>
      view = MaterializedView.applyChanges(view,
        feed.where(col("__epoch") === e).drop("__epoch"),
        Seq("g"), Seq("v"))
    }
    val rebuilt = MaterializedView.build(snapshot, Seq("g"), Seq("v"))
    assert(view.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(view).isEmpty,
      s"incremental:\n${view.collect().mkString("\n")}\n" +
        s"rebuilt:\n${rebuilt.collect().mkString("\n")}")
  }

  test("merge sink: epochs fold forward, replay changes nothing, " +
       "stream equals one-shot merge") {
    val s = spark
    import s.implicits._
    val tableRoot = java.nio.file.Files
      .createTempDirectory("graft_ms_table").toString
    val feedRoot = java.nio.file.Files
      .createTempDirectory("graft_ms_feed").toString
    val b0 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
    // epoch 1 revises k=1, inserts k=3 with an in-batch duplicate
    // (max-struct compaction must keep 31.0), leaves k=2 untouched
    val b1 = Seq((1L, "a", 11.0), (3L, "c", 30.0), (3L, "c", 31.0))
      .toDF("k", "s", "v")
    EventStreams.mergeEpoch(b0, 0L, tableRoot, feedRoot, Seq("k"))
    EventStreams.mergeEpoch(b1, 1L, tableRoot, feedRoot, Seq("k"))

    val (ver, snap) = EventStreams.readSnapshot(spark, tableRoot).get
    assert(ver === 1L)
    def canonSnap() = EventStreams.readSnapshot(spark, tableRoot).get._2
      .select("k", "s", "v").as[(Long, String, Double)].collect().toSet
    assert(canonSnap() === Set((1L, "a", 11.0), (2L, "b", 20.0),
      (3L, "c", 31.0)))
    def canonFeed() = spark.read.parquet(feedRoot)
      .select("__epoch", "_change_type", "k", "v")
      .as[(Long, String, Long, Double)].collect().toSet
    val feed = canonFeed()
    assert(feed === Set(
      (0L, "insert", 1L, 10.0), (0L, "insert", 2L, 20.0),
      (1L, "update_preimage", 1L, 10.0), (1L, "update_postimage", 1L, 11.0),
      (1L, "insert", 3L, 31.0)))

    // at-least-once failure contract: epoch 1 re-delivered — the merge
    // reads the immutable v=0 pre-state and overwrites itself
    EventStreams.mergeEpoch(b1, 1L, tableRoot, feedRoot, Seq("k"))
    assert(canonSnap() === Set((1L, "a", 11.0), (2L, "b", 20.0),
      (3L, "c", 31.0)), "replayed epoch must not change the snapshot")
    assert(canonFeed() === feed, "replayed epoch must not grow the feed")

    // end-to-end wiring: a real streaming query through the same sink
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val t2 = java.nio.file.Files.createTempDirectory("graft_ms_t2").toString
    val f2 = java.nio.file.Files.createTempDirectory("graft_ms_f2").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ms_ckpt").toString
    val input = MemoryStream[(Long, String, Double)]
    input.addData((5L, "x", 1.0), (5L, "x", 2.0), (6L, "y", 3.0))
    val q = EventStreams.mergeSink(input.toDF().toDF("k", "s", "v"),
      t2, f2, Seq("k"), ckpt)
    q.awaitTermination(120000)
    val streamed = EventStreams.readSnapshot(spark, t2).get._2
      .select("k", "s", "v").as[(Long, String, Double)].collect().toSet
    assert(streamed === Set((5L, "x", 2.0), (6L, "y", 3.0)))
  }

  test("observe: guard metrics ride the action's own pass, batch and " +
       "streaming") {
    import graft.streaming.StateMetrics
    val s = spark
    import s.implicits._
    // batch: observed row must equal a direct aggregate of the input
    val collector = new StateMetrics.ObservedCollector
    s.listenerManager.register(collector)
    try {
      val docs = Tables(spark, sfDir(), "documents").limit(200)
      val observed = docs.observe("guard",
        count(lit(1)).as("rows"),
        sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_texts"),
        sum(length(col("text"))).as("chars"))
      observed.where(col("lang").isNotNull).count() // the real job
      val direct = docs.agg(count(lit(1)), sum(when(col("text").isNull, 1L)
        .otherwise(0L)), sum(length(col("text")))).head()
      val deadline = System.currentTimeMillis() + 30000
      var row: Option[org.apache.spark.sql.Row] = None
      while (row.isEmpty && System.currentTimeMillis() < deadline) {
        row = collector.metrics.get("guard")
        if (row.isEmpty) Thread.sleep(100)
      }
      assert(row.isDefined, "observed metrics never arrived")
      assert(row.get.getLong(0) === direct.getLong(0) &&
        row.get.getLong(1) === direct.getLong(1) &&
        row.get.getLong(2) === direct.getLong(2),
        s"observed ${row.get} != direct $direct")
    } finally s.listenerManager.unregister(collector)

    // streaming: the same observe surfaces in per-batch progress
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, String)]
    input.addData((1L, "a"), (2L, null), (3L, "c"))
    val q = input.toDF().toDF("k", "v")
      .observe("stream_guard", count(lit(1)).as("rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("null_vs"))
      .writeStream.format("memory").queryName("observe_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val om = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("stream_guard"))).lastOption
      assert(om.isDefined, "streaming observed metrics missing")
      assert(om.get.getLong(0) === 3L && om.get.getLong(1) === 1L)
    } finally q.stop()
  }

  test("merge sink time travel: every snapshot version equals the feed " +
       "replayed to that epoch") {
    val s = spark
    import s.implicits._
    val tableRoot = java.nio.file.Files
      .createTempDirectory("graft_tt_table").toString
    val feedRoot = java.nio.file.Files
      .createTempDirectory("graft_tt_feed").toString
    val batches = Seq(
      Seq((1L, 10.0), (2L, 20.0)),
      Seq((1L, 11.0), (3L, 30.0)),
      Seq((2L, 22.0), (4L, 40.0)))
    batches.zipWithIndex.foreach { case (b, i) =>
      EventStreams.mergeEpoch(b.toDF("k", "v"), i.toLong,
        tableRoot, feedRoot, Seq("k"))
    }
    val feed = spark.read.parquet(feedRoot)
    (0 until batches.size).foreach { e =>
      // the CDF consumer rule, applied epoch-by-epoch from empty state
      var state = Seq.empty[(Long, Double)].toDF("k", "v")
      (0 to e).foreach { i =>
        val ep = feed.where(col("__epoch") === i)
        val drop = ep.where(col("_change_type")
          .isin("delete", "update_preimage")).select("k")
        val add = ep.where(col("_change_type")
          .isin("insert", "update_postimage")).select("k", "v")
        state = state.join(drop, Seq("k"), "left_anti").unionByName(add)
      }
      val snap = EventStreams.readSnapshot(spark, tableRoot,
        Some(e + 1L)).get._2.select("k", "v")
      assert(snap.exceptAll(state).isEmpty && state.exceptAll(snap).isEmpty,
        s"version $e must equal the feed replay up to epoch $e")
    }
  }

  test("StateMetrics proves TTL eviction bounds state (pull + listener paths)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StateMetrics
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def ts(h: Int, m: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    val listener = new StateMetrics.Listener
    s.streams.addListener(listener)
    val input = MemoryStream[(Long, Double, java.sql.Timestamp)]
    val stream = EventStreams.userTotalsStreamTtl(
      input.toDF().toDF("user_id", "value", "ts"), ttlMillis = 3600000L)
    val q = stream.writeStream.format("memory").queryName("state_metrics_mem")
      .outputMode("update").start()
    try {
      // 3 users accumulate state, then go idle past TTL while user 4 stays
      input.addData((1L, 1.0, ts(10)), (2L, 2.0, ts(10)), (3L, 3.0, ts(10, 30)))
      q.processAllAvailable() // watermark → 10:30; timeouts ≈ 11:00-11:30
      input.addData((4L, 4.0, ts(14)))
      q.processAllAvailable() // watermark advances to 14:00
      input.addData((4L, 5.0, ts(14, 5)))
      q.processAllAvailable() // eviction fires for users 1-3
      val ss = StateMetrics.samples(q.recentProgress.toSeq)
      assert(ss.nonEmpty, "no state operator reported progress")
      assert(ss.exists(_.numRowsRemoved > 0), s"no eviction recorded: $ss")
      val (peak, fin) = StateMetrics.peakAndFinal(ss).values.head
      assert(peak >= 3, s"state never held the 3 idle users (peak $peak)")
      assert(fin < peak,
        s"state did not shrink after eviction (peak $peak, final $fin)")
      assert(fin == 1, s"only user 4 should remain, final=$fin")
      // listener path: same samples arrive asynchronously — poll
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (listener.samples.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(listener.samples.exists(_.numRowsTotal >= 3),
        "listener never observed the state peak")
    } finally {
      q.stop()
      s.streams.removeListener(listener)
    }
  }

  test("streaming state rides RocksDB by default: provider set at session " +
       "build, a stateful query reports rocksdb state-store metrics, and " +
       "the D-surface suites above all ran under it") {
    // the engine default (GraftSession) — not a per-test override: every
    // other streaming case in this suite (D3/D5/D6/D13...) just ran on it
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"))
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, Double)]
    val stream = input.toDF().toDF("user_id", "value")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName("rocksdb_mem")
      .outputMode("update").start()
    try {
      input.addData((1L, 1.0), (2L, 2.0), (1L, 3.0))
      q.processAllAvailable()
      val ops = q.lastProgress.stateOperators
      assert(ops.nonEmpty, "no state operator in progress")
      import scala.jdk.CollectionConverters._
      val custom = ops.flatMap(_.customMetrics.keySet.asScala)
      assert(custom.exists(_.startsWith("rocksdb")),
        s"state-store custom metrics are not RocksDB's: ${custom.toSeq}")
      // D7's observability contract still holds under the new provider
      val samples = graft.streaming.StateMetrics.samples(
        q.recentProgress.toSeq)
      assert(samples.exists(_.numRowsTotal == 2),
        s"StateMetrics must still report state rows: $samples")
    } finally q.stop()
  }

  test("dedupStream drops within-watermark duplicates across microbatches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def ts(h: Int, m: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val stream = EventStreams.dedupStream(
      input.toDF().toDF("event_id", "ts", "value"), watermark = "2 hours")
    val q = stream.writeStream.format("memory").queryName("dedup_mem")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(10), 1.0), (2L, ts(10, 30), 2.0), (1L, ts(10), 1.0))
      q.processAllAvailable()
      // retransmission of 1 and 2 in a LATER microbatch, still in watermark
      input.addData((1L, ts(10), 1.0), (2L, ts(10, 30), 2.0), (3L, ts(11), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_mem").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L),
        "each event_id must be emitted exactly once")
    } finally q.stop()
  }

  test("batch dedup twin collapses an exact self-union") {
    val doubled = events.unionByName(events)
    val deduped = EventStreams.dedupEvents(doubled)
    assert(deduped.count() === events.count())
  }

  test("attributionStream pairs equal the raw-timestamp batch join") {
    val streamed = runToCompletion(
      EventStreams.attributionStream(spark, stagedDir, rawSchema),
      "attr_mem")
    // reference with the SAME raw (micros) timestamps the stream joins on
    val v = events.where(col("event_type") === "view")
      .select(col("user_id").as("vuid"), col("event_id").as("view_id"),
        col("ts").as("vts"))
    val p = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("puid"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
    val ref = p.join(v, col("puid") === col("vuid") &&
        col("vts") >= col("pts") - expr("INTERVAL 1800 SECONDS") &&
        col("vts") <= col("pts"))
      .select("purchase_id", "view_id")
    assert(streamed.count() > 0, "no attribution pairs emitted")
    assert(streamed.exceptAll(ref).count() === 0L, "stream emitted extras")
    assert(ref.exceptAll(streamed).count() === 0L, "stream missed pairs")
  }

  test("attributionStream leftOuter emits sound null rows for zero-view buys") {
    val streamed = runToCompletion(
      EventStreams.attributionStream(spark, stagedDir, rawSchema,
        joinType = "leftOuter"), "attr_outer_mem")
    val v = events.where(col("event_type") === "view")
      .select(col("user_id").as("vuid"), col("event_id").as("view_id"),
        col("ts").as("vts"))
    val p = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("puid"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
    val refPairs = p.join(v, col("puid") === col("vuid") &&
        col("vts") >= col("pts") - expr("INTERVAL 1800 SECONDS") &&
        col("vts") <= col("pts"))
      .select("purchase_id", "view_id")
    // matched pairs must equal the inner reference exactly
    val matched = streamed.where(col("view_id").isNotNull)
    assert(matched.exceptAll(refPairs).count() === 0L)
    assert(refPairs.exceptAll(matched).count() === 0L)
    // null rows: only for purchases with genuinely no view in the window
    // (the watermark delays SOME of them past end-of-stream — soundness,
    // not completeness, is the streaming-outer contract)
    val nulls = streamed.where(col("view_id").isNull).select("purchase_id")
    val zeroView = p.join(v, col("puid") === col("vuid") &&
        col("vts") >= col("pts") - expr("INTERVAL 1800 SECONDS") &&
        col("vts") <= col("pts"), "left_anti")
      .select("purchase_id")
    assert(nulls.count() > 0, "watermark passed most of the stream — " +
      "outer results must have flushed")
    assert(nulls.exceptAll(zeroView).count() === 0L,
      "a null row for a purchase that HAS a view is unsound")
  }

  test("enrichedHourlyStream (stream-static join) matches the batch twin " +
      "and broadcasts the dimension") {
    val dim = Tables(spark, sfDir(), "customer")
    val streamDf = EventStreams.enrichedHourlyStream(
      spark, stagedDir, rawSchema, dim)
    val streamed = runToCompletion(streamDf, "enrich_mem")
    val batch = EventStreams.enrichedHourly(events, dim)
      .select("hour", "segment", "n_events", "sum_value")
    val n = streamed.count()
    assert(n > 0, "no finalized enriched windows emitted")
    val unmatched = streamed.join(batch,
      Seq("hour", "segment", "n_events", "sum_value"), "left_anti").count()
    assert(unmatched === 0L)
    assert(n <= batch.count())
    // the join must be stateless + shuffle-free for the stream: broadcast
    // hash join, no SortMergeJoin, and no stream-stream join state store
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), "dimension join must broadcast")
    assert(!streamDf.queryExecution.analyzed.toString
      .contains("stream-stream"), "join must be stream-static, not " +
      "stream-stream (no join state store)")
  }

  test("d14: trending counts stream + rank-on-read equals the batch " +
       "top-k on every finalized hour") {
    val streamedCounts = runToCompletion(
      EventStreams.trendingCountsStream(spark, stagedDir, rawSchema),
      "trend_mem")
    val n = streamedCounts.count()
    assert(n > 0, "no finalized hourly counts emitted")
    // counts must be a subset of the batch hourly counts (watermark
    // holdback only — no wrong or duplicated cells)
    val batchCounts = events.groupBy(
        date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamedCounts.join(batchCounts,
      Seq("hour", "event_type", "n"), "left_anti").count() === 0L)
    // a finalized hour carries ALL its types (the watermark finalizes
    // whole windows), so rank-on-read over the streamed counts must
    // equal the batch top-k restricted to the streamed hours
    val hours = streamedCounts.select("hour").distinct()
    val got = EventStreams.trendingOnRead(streamedCounts, k = 3)
    val want = EventStreams.trendingBatch(events, k = 3)
      .join(hours, Seq("hour"), "left_semi")
    assert(got.exceptAll(want).count() === 0L, "rank-on-read extras")
    assert(want.exceptAll(got).count() === 0L, "rank-on-read missing rows")
  }

  test("d15: streamed Welford z-scores match the batch 1-PRECEDING " +
       "frame within fp drift") {
    val src = graft.Tables.withTsFromNanos(
      spark.readStream.schema(rawSchema).parquet(stagedDir))
    val streamed = runToCompletion(EventStreams.zscoreStream(src), "z_mem")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // batch twin WITHOUT rounding (compare raw doubles at tolerance)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val batch = events.select(col("event_id"), col("value"),
        avg("value").over(w).as("mu"),
        stddev_samp("value").over(w).as("sd"))
      .select(col("event_id"),
        when(col("sd") > 0, (col("value") - col("mu")) / col("sd")).as("z"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(streamed.size === batch.size)
    assert(streamed.count(_._2.isDefined) > 0, "no scored events")
    batch.foreach { case (id, want) =>
      (streamed(id), want) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) < 1e-6, s"event $id: $a vs $b")
        case (a, b) => assert(a === b, s"event $id null contract")
      }
    }
  }

  test("d12: streamed shard sketches are BYTE-identical to the batch " +
       "CMS, and state stays nShards rows") {
    import graft.streaming.SketchStream
    val s = spark
    // stream the staged events files; key = user_id (raw schema has ts
    // as nanos long, irrelevant here — only user_id is read)
    val streamSrc = graft.Tables.withTsFromNanos(
      s.readStream.schema(rawSchema).parquet(stagedDir))
    val streamed = SketchStream.cmsShardsStream(streamSrc,
      col("user_id"), nShards = 8)
    val q = streamed.writeStream.format("memory").queryName("cms_mem")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // one AvailableNow emission per shard = final state
    val got = spark.table("cms_mem").collect()
      .map(r => (r.getInt(0), r.getAs[Array[Byte]](1), r.getLong(2)))
    val batch = SketchStream.cmsShards(events, col("user_id"), nShards = 8)
      .collect().map(r => (r.getInt(0), r.getAs[Array[Byte]](1), r.getLong(2)))
    assert(got.length === batch.length &&
      got.length <= 8, "state must be bounded by nShards")
    val batchByShard = batch.map(t => t._1 -> t).toMap
    got.foreach { case (shard, bytes, n) =>
      val (_, bBytes, bN) = batchByShard(shard)
      assert(n === bN, s"shard $shard row count diverged")
      assert(java.util.Arrays.equals(bytes, bBytes),
        s"shard $shard sketch bytes diverged from the batch twin")
    }
    // merged estimates answer point queries like the batch sketch would
    val (cms, n) = SketchStream.mergedSketch(
      spark.table("cms_mem"))
    assert(n === events.count())
    val top = events.groupBy("user_id").count()
      .orderBy(desc("count")).head()
    assert(cms.estimateCount(top.getLong(0)) >= top.getLong(1),
      "count-min must never undercount")
  }

  test("d12: incremental batches accumulate to the one-shot sketch") {
    import graft.streaming.SketchStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[Long]
    val stream = SketchStream.cmsShardsStream(
      input.toDF().toDF("k0"), col("k0"), nShards = 4)
    val q = stream.writeStream.format("memory").queryName("cms_inc")
      .outputMode("update").start()
    try {
      input.addData(1L, 2L, 3L, 1L, 1L)
      q.processAllAvailable()
      input.addData(1L, 4L, 2L, 2L)
      q.processAllAvailable()
      // latest emission per shard = the one with the largest n
      val finals = spark.table("cms_inc").collect()
        .map(r => (r.getInt(0), r.getAs[Array[Byte]](1), r.getLong(2)))
        .groupBy(_._1).map(_._2.maxBy(_._3)).toSeq
      val oneShot = SketchStream.cmsShards(
        Seq(1L, 2L, 3L, 1L, 1L, 1L, 4L, 2L, 2L).toDF("k0"),
        col("k0"), nShards = 4)
        .collect().map(r => (r.getInt(0), r.getAs[Array[Byte]](1), r.getLong(2)))
        .toSeq
      assert(finals.map(_._3).sum === 9L)
      val byShard = oneShot.map(t => t._1 -> t).toMap
      finals.foreach { case (shard, bytes, n) =>
        val (_, bBytes, bN) = byShard(shard)
        assert(n === bN)
        assert(java.util.Arrays.equals(bytes, bBytes),
          s"shard $shard: two incremental batches != one-shot sketch")
      }
    } finally q.stop()
  }

  test("d13: streamed shard digests merge to <= 2% rank error and " +
       "exact total weight") {
    import graft.streaming.SketchStream
    val s = spark
    val streamSrc = graft.Tables.withTsFromNanos(
      s.readStream.schema(rawSchema).parquet(stagedDir))
    val streamed = SketchStream.tdigestShardsStream(streamSrc,
      col("value"), nShards = 8)
    val q = streamed.writeStream.format("memory").queryName("td_mem")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val shardRows = spark.table("td_mem")
    assert(shardRows.count() <= 8, "state must be bounded by nShards")
    val (td, n) = SketchStream.mergedDigest(shardRows)
    val vals = events.select(col("value").cast("double"))
      .where(col("value").isNotNull).collect().map(_.getDouble(0)).sorted
    assert(n === vals.length.toLong, "merged weight must equal row count")
    Seq(0.1, 0.5, 0.9).foreach { quant =>
      val est = td.quantile(quant)
      val rank = vals.count(_ <= est).toDouble / vals.length
      assert(math.abs(rank - quant) <= 0.02,
        f"q=$quant est=$est%.3f landed at rank $rank%.4f")
    }
  }

  test("d13: incremental batches accumulate digest weight and accuracy") {
    import graft.streaming.SketchStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[Double]
    val stream = SketchStream.tdigestShardsStream(
      input.toDF().toDF("v0"), col("v0"), nShards = 4)
    val q = stream.writeStream.format("memory").queryName("td_inc")
      .outputMode("update").start()
    try {
      input.addData((1 to 50).map(_.toDouble): _*)
      q.processAllAvailable()
      input.addData((51 to 100).map(_.toDouble): _*)
      q.processAllAvailable()
      val finals = spark.table("td_inc").collect()
        .map(r => (r.getInt(0), r.getAs[Array[Byte]](1), r.getLong(2)))
        .groupBy(_._1).map(_._2.maxBy(_._3)).toSeq
      assert(finals.map(_._3).sum === 100L)
      var td = new graft.operators.TDigest(200)
      finals.foreach { case (_, b, _) =>
        td = td.merge(graft.operators.TDigest.deserialize(b))
      }
      val med = td.quantile(0.5)
      assert(med > 45.0 && med < 56.0,
        s"median of 1..100 across two batches came out $med")
    } finally q.stop()
  }

  test("sessionizeStream(AvailableNow) sessions match the batch twin") {
    val streamed = runToCompletion(
      EventStreams.sessionizeStream(spark, stagedDir, rawSchema), "sessions_mem")
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("start_sec"),
        col("n_events"), col("sum_value"))
    val batch = EventStreams.sessionize(events)
      .select("user_id", "start_sec", "n_events", "sum_value")
    val n = streamed.count()
    assert(n > 0, "no finalized sessions emitted")
    val unmatched = streamed.join(batch,
      Seq("user_id", "start_sec", "n_events", "sum_value"), "left_anti").count()
    assert(unmatched === 0L)
  }

  test("d18: streaming bloom gate flags a crawl increment identically to " +
       "batch C34, statelessly, and routes fresh/seen exactly-once") {
    import graft.operators.BloomDedup
    import graft.streaming.BloomStream
    val docs = Tables(spark, sfDir(), "documents").select("doc_id", "text")
    // reference corpus = yesterday's crawl; probe = 1/3 overlap + 2/3 novel
    val reference = docs.where(col("doc_id") % 2 === 0)
    val probe = docs.where(col("doc_id") % 3 === 0)
      .unionByName(docs.where(col("doc_id") % 3 =!= 0)
        .withColumn("text", concat(col("text"), lit(" ::novel"))))
    val bloom = BloomDedup.bloomOf(reference, col("text"),
      reference.count().max(1L), fpp = 0.01)

    val staged = Files.createTempDirectory("graft_bloom_probe")
    probe.write.mode("overwrite").parquet(staged.toString)
    val src = spark.readStream.schema(probe.schema)
      .parquet(staged.toString)

    // batch ≡ stream: the same bloom bytes through the same flag operator
    val q = BloomStream.flagOverlapStream(src, col("text"), bloom)
      .writeStream.format("memory").queryName("bloom_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("bloom_mem")
    val batch = BloomDedup.flagOverlap(probe, col("text"), bloom)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L &&
           batch.exceptAll(streamed).count() === 0L,
      "stream and batch must flag every document identically")
    // no false negatives: every true-overlap doc is flagged in the stream
    val overlapIds = probe.join(reference, Seq("text"), "left_semi")
      .select("doc_id")
    val missed = overlapIds.join(
      streamed.where(col("maybe_seen")).select("doc_id"),
      Seq("doc_id"), "left_anti").count()
    assert(missed === 0L, "bloom must never miss a true overlap")
    // stateless by design: no state store behind the flag stage
    assert(q.lastProgress.stateOperators.isEmpty,
      "the bloom gate must not allocate streaming state")

    // routed delivery: fresh/seen split lands exactly-once per epoch
    val out = Files.createTempDirectory("graft_bloom_out")
    val fresh = out.resolve("fresh").toString
    val seen = out.resolve("seen").toString
    val q2 = BloomStream.bloomGatedSink(src, col("text"), bloom,
      fresh, seen, out.resolve("ckpt").toString)
    q2.awaitTermination(120000)
    val nFresh = spark.read.parquet(fresh).count()
    val nSeen = spark.read.parquet(seen).count()
    assert(nFresh + nSeen === probe.count(),
      "every document routes to exactly one sink")
    assert(nSeen === batch.where(col("maybe_seen")).count())
  }

  test("d21: generational bloom roll-over — history absorbs each epoch, " +
       "rotation drops exactly the aged generation, stream ≡ batch fold") {
    import graft.streaming.BloomStream
    import spark.implicits._
    // rotateEvery=1: every epoch is its own generation, so the probe
    // horizon is exactly the previous epoch + the current one — the
    // sharpest version of the window contract. Keys chosen so every
    // visibility transition is exercised:
    //   ep0: A B      → nothing flagged (empty history)
    //   ep1: A C      → A flagged (ep0 retained), C fresh
    //   ep2: A B D    → A flagged (ep1), B NOT (ep0 aged out), D fresh
    //   ep3: C D      → D flagged (ep2), C NOT (ep1 aged out)
    val epochData: Seq[Seq[String]] = Seq(
      Seq("A", "B"), Seq("A", "C"), Seq("A", "B", "D"), Seq("C", "D"))
    val expectSeen: Seq[Set[String]] =
      Seq(Set(), Set("A"), Set("A"), Set("D"))
    val epochDfs = epochData.zipWithIndex.map { case (ks, e) =>
      e.toLong -> ks.toDF("k")
    }

    // batch fold: flags land exactly on the retained-window truth
    // (fp-free here by construction — asserted, not assumed: the key
    // set is tiny against a 64-capacity sketch and xxhash64 is
    // deterministic, so this either always holds or never does)
    val st0 = new BloomStream.BloomGenerations(64L, 0.01, 1)
    val folded = epochDfs.map { case (e, df) =>
      val f = st0.fold(e, df, col("k")).collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      assert(f.keySet === epochData(e.toInt).toSet)
      f.foreach { case (k, flag) =>
        assert(flag === expectSeen(e.toInt).contains(k),
          s"epoch $e key $k: flag must equal retained-window truth")
      }
      f
    }

    // generationalFlagFold (the d21 gate's path) reproduces the same
    // per-epoch flags through a fresh state object
    val viaFold = BloomStream.generationalFlagFold(
        epochDfs, col("k"), 64L, 0.01, 1)
      .collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[String]("k")) ->
        r.getAs[Boolean]("maybe_seen")).toMap
    folded.zipWithIndex.foreach { case (f, e) =>
      f.foreach { case (k, flag) =>
        assert(viaFold((e.toLong, k)) === flag)
      }
    }

    // streaming: one file per epoch, one micro-batch per file — the
    // sink folds batchId as the epoch and must route every key to the
    // same fresh/seen verdicts the batch fold produced
    val staged = Files.createTempDirectory("graft_gen_bloom_src")
    epochData.zipWithIndex.foreach { case (ks, e) =>
      val tmp = Files.createTempDirectory(s"graft_gen_ep$e")
      ks.toDF("k").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        staged.resolve(f"ep$e%02d.parquet"))
    }
    val out = Files.createTempDirectory("graft_gen_bloom_out")
    val fresh = out.resolve("fresh").toString
    val seen = out.resolve("seen").toString
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
    val st1 = new BloomStream.BloomGenerations(64L, 0.01, 1)
    val q = BloomStream.generationalGatedSink(src, col("k"), st1,
      fresh, seen, out.resolve("ckpt").toString)
    q.awaitTermination(120000)
    val seenRows = spark.read.parquet(seen)
      .select(col("__epoch").cast("int"), col("k")).collect()
      .map(r => (r.getInt(0), r.getString(1)))
    val freshRows = spark.read.parquet(fresh)
      .select(col("__epoch").cast("int"), col("k")).collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(seenRows.length + freshRows.length === epochData.map(_.size).sum)
    epochData.indices.foreach { e =>
      val s = seenRows.filter(_._1 == e).map(_._2).toSet
      val fr = freshRows.filter(_._1 == e).map(_._2).toSet
      assert(s === expectSeen(e),
        s"epoch $e seen-routing must match the retained-window truth")
      assert(fr === epochData(e).toSet -- expectSeen(e))
    }
  }

  test("d26: streaming admission cap — budget exhausts mid-trigger and " +
       "across triggers, stream ≡ the batch window twin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // cap=3: user 1 sends 2 then 2 events (budget dies mid-second-
    // trigger); user 2 sends 4 in ONE trigger (dies mid-trigger)
    val b1 = Seq((1L, ts(10), 1L, "view"), (1L, ts(20), 2L, "view"))
    val b2 = Seq((1L, ts(30), 3L, "view"), (1L, ts(40), 4L, "view"),
      (2L, ts(10), 5L, "view"), (2L, ts(20), 6L, "view"),
      (2L, ts(30), 7L, "view"), (2L, ts(40), 8L, "view"))
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val stream = graft.streaming.EventStreams.admissionCapStream(
      input.toDF().toDF("user_id", "ts", "event_id", "event_type"), cap = 3)
    val q = stream.writeStream.format("memory").queryName("d26_mem")
      .outputMode("update").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("d26_mem").collect()
        .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      val batch = graft.streaming.EventStreams.admissionCapBatch(
        (b1 ++ b2).toDF("user_id", "ts", "event_id", "event_type"), cap = 3)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(got === batch)
      assert(got(3L) && !got(4L), "user 1's budget dies at its 4th event")
      assert(got(7L) && !got(8L), "user 2's budget dies mid-trigger")
    } finally q.stop()
  }

  test("d32: frontier composition gate — stream ≡ batch across triggers, " +
       "debounced and quarantined events still spend budget, the " +
       "quality verdict never perturbs the debounce clock") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // cap=3, gap=600. user 1: four 'view's 100s apart (all sub-gap
    // after the first) — events 2,3 debounced but budget-spending, so
    // event 4 is CAPPED (not debounced: the cap fires first);
    // user 2: a kept event with a BAD value (quarantined) at t=10,
    // then a good event at t=400 (sub-gap of the QUARANTINED kept
    // event — must be debounced, proving quality didn't reset the
    // clock), then a good event at t=700 (past the gap — kept+pass)
    val b1 = Seq((1L, ts(100), 1L, "view", 5.0),
      (1L, ts(200), 2L, "view", 5.0))
    val b2 = Seq((1L, ts(300), 3L, "view", 5.0),
      (1L, ts(400), 4L, "view", 5.0),
      (2L, ts(10), 5L, "view", 999.0),
      (2L, ts(400), 6L, "view", 5.0),
      (2L, ts(700), 7L, "view", 5.0))
    val cols = Seq("user_id", "ts", "event_id", "event_type", "value")
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val stream = graft.streaming.EventStreams.frontierGateStream(
      input.toDF().toDF(cols: _*), cap = 3, gapSec = 600L)
    val q = stream.writeStream.format("memory").queryName("d32_mem")
      .outputMode("update").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      def verdicts(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) ->
          ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
      val got = verdicts(spark.table("d32_mem"))
      val batch = verdicts(graft.streaming.EventStreams.frontierGateBatch(
        (b1 ++ b2).toDF(cols: _*), cap = 3, gapSec = 600L))
      assert(got === batch, "stream must equal the batch fold")
      // user 1: admitted/kept/quarantined per event
      assert(got(1L) === ((true, true, false)))
      assert(got(2L) === ((true, false, false)), "sub-gap → debounced")
      assert(got(3L) === ((true, false, false)), "budget spent anyway")
      assert(got(4L) === ((false, false, false)),
        "4th event capped — debounced events spent the budget")
      // user 2: quarantined event holds the debounce clock
      assert(got(5L) === ((true, true, true)), "kept but quarantined")
      assert(got(6L) === ((true, false, false)),
        "sub-gap of the QUARANTINED kept event → debounced")
      assert(got(7L) === ((true, true, false)), "past the gap → pass")
    } finally q.stop()
  }

  test("d27: streaming centroid maintenance — stream ≡ fold epoch by " +
       "epoch, replayed epochs leave the state untouched") {
    import graft.functions.GraftExpressions._
    import graft.operators.Clustering.IntCentroidState
    import spark.implicits._
    val signs = jlSigns(16, 64)
    val coded = Tables(spark, sfDir(), "embeddings")
      .select(col("vec_id"),
        transform(jlProject(col("embedding"), signs),
          x => x + lit(524288L)).as("code"))
    val seed: Array[Array[Long]] = coded.where(col("vec_id") < 8)
      .orderBy("vec_id").collect().map(_.getSeq[Long](1).toArray)

    // reference fold
    val stF = new IntCentroidState(seed)
    val folded = (0 until 3).map { e =>
      e.toLong -> stF.fold(coded.where(col("vec_id") % 3 === e), "code")
    }.toMap

    // replay guard: same epoch twice → same report, state not advanced
    val stR = new IntCentroidState(seed)
    val ep0 = coded.where(col("vec_id") % 3 === 0)
    val first = stR.foldEpoch(0L, ep0, "code")
    assert(stR.foldEpoch(0L, ep0, "code") === first,
      "replayed epoch must return the remembered report")
    assert(first === folded(0L))
    assert(stR.foldEpoch(1L,
      coded.where(col("vec_id") % 3 === 1), "code") === folded(1L),
      "state after a replay must equal the no-replay trajectory")

    // streaming delivery: one file per epoch through the real sink
    val staged = Files.createTempDirectory("graft_d27_src")
    (0 until 3).foreach { e =>
      val tmp = Files.createTempDirectory(s"graft_d27_ep$e")
      coded.where(col("vec_id") % 3 === e).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        staged.resolve(f"ep$e%02d.parquet"))
    }
    val out = Files.createTempDirectory("graft_d27_out")
    val src = spark.readStream
      .schema(coded.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
    val stS = new IntCentroidState(seed)
    val q = graft.streaming.CentroidStream.maintenanceSink(src, stS,
      "code", out.resolve("rep").toString, out.resolve("ckpt").toString)
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out.resolve("rep").toString)
      .select(col("__epoch").cast("long"), col("cell"),
        col("n_assigned"), col("post_count"), col("post_sum_l1"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val expect = folded.flatMap { case (e, rows) =>
      rows.map { case (c, n, pc, l1) => (e, c) -> ((n, pc, l1)) }
    }
    assert(streamed === expect, "stream must reproduce the fold exactly")
  }

  test("d29: kept-based debounce — stream ≡ fold across triggers, and " +
       "a sub-gap event train separates kept-based from raw-based") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // one user, clicks every 400s, gap 600s: kept-based admits 0 and
    // 800 (one per ~gap); raw-based admits only the FIRST ever
    val evs = Seq(0, 400, 800, 1200).zipWithIndex
      .map { case (t0, i) => (1L, ts(t0), i.toLong, "click") }
    val all = evs.toDF("user_id", "ts", "event_id", "event_type")
    val fold = graft.streaming.EventStreams
      .debounceBatchKept(all, gapSec = 600L).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(fold === Map(0L -> true, 1L -> false, 2L -> true, 3L -> false))
    // the window-expressible raw form keeps only event 0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy("sec", "event_id")
    val raw = all.select(col("event_id"),
        unix_timestamp(col("ts")).as("sec"), col("user_id"),
        col("event_type"))
      .withColumn("prev", lag("sec", 1).over(w))
      .select(col("event_id"),
        (col("prev").isNull || col("sec") - col("prev") > 600).as("kept"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(raw === Map(0L -> true, 1L -> false, 2L -> false, 3L -> false))
    // streaming, split across triggers mid-train
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val stream = graft.streaming.EventStreams.debounceStream(
      input.toDF().toDF("user_id", "ts", "event_id", "event_type"),
      gapSec = 600L)
    val q = stream.writeStream.format("memory").queryName("d29_mem")
      .outputMode("update").start()
    try {
      input.addData(evs.take(2): _*); q.processAllAvailable()
      input.addData(evs.drop(2): _*); q.processAllAvailable()
      val got = spark.table("d29_mem").collect()
        .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(got === fold, "stream must reproduce the kept-based fold")
    } finally q.stop()
  }

  test("d25: streaming novelty against rolling history — exact repeats " +
       "score 0, same-epoch repeats read as novel, stream ≡ fold") {
    import graft.streaming.BloomStream
    import spark.implicits._
    // texts sized so the shingle counts are known: 10 words → 3 grams,
    // 9 → 2. fp-free here by construction (tiny gram set vs a
    // 4096-capacity sketch at 1e-3) — asserted, not assumed: the
    // hashes are deterministic, so this either always holds or never.
    val t1 = "a b c d e f g h i j"
    val t4 = "q r s t u v w x y z"
    val epochs: Seq[(Long, Seq[(Long, String)])] = Seq(
      0L -> Seq(1L -> t1, 2L -> "one two three four five six seven eight nine"),
      1L -> Seq(3L -> t1, // exact repeat of history → 0 novelty
        4L -> t4, // fresh → full novelty
        5L -> "a b c d e f g h zz", // half-overlap → 500000
        6L -> t4), // same-EPOCH repeat of doc 4 → still novel vs history
      2L -> Seq(7L -> t4)) // doc 4's text absorbed last epoch → 0
    val expect = Map(
      (0L, 1L) -> 1000000L, (0L, 2L) -> 1000000L,
      (1L, 3L) -> 0L, (1L, 4L) -> 1000000L, (1L, 5L) -> 500000L,
      (1L, 6L) -> 1000000L,
      (2L, 7L) -> 0L)

    val st0 = new BloomStream.BloomGenerations(4096L, 0.001, 8)
    val folded = epochs.flatMap { case (e, rows) =>
      BloomStream.noveltyFold(st0, e, rows.toDF("doc_id", "text"),
          "doc_id", "text").collect()
        .map(r => (e, r.getLong(0)) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3))))
    }.toMap
    expect.foreach { case (k, ppm) =>
      assert(folded(k)._3 === ppm, s"$k: ${folded(k)}")
    }
    assert(folded((1L, 5L)) === ((2L, 1L, 500000L)))

    // streaming delivery: one file per epoch; a fresh state must land
    // identical per-epoch reports through the idempotent sink
    val staged = Files.createTempDirectory("graft_d25_src")
    epochs.foreach { case (e, rows) =>
      val tmp = Files.createTempDirectory(s"graft_d25_ep$e")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        staged.resolve(f"ep$e%02d.parquet"))
    }
    val out = Files.createTempDirectory("graft_d25_out")
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
    val st1 = new BloomStream.BloomGenerations(4096L, 0.001, 8)
    val q = BloomStream.noveltyReportSink(src, st1, "doc_id", "text",
      n = 8, out.resolve("rep").toString, out.resolve("ckpt").toString)
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out.resolve("rep").toString)
      // __epoch is a discovered partition column → inferred INT
      .select(col("__epoch").cast("long"), col("doc_id"), col("n_grams"),
        col("n_seen_max"), col("novelty_ppm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(streamed === folded, "stream must reproduce the fold exactly")
  }
}
