package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SlaStream

class SlaStreamSpec extends AnyFunSuite with SparkSpec {

  private def ts(h: Int, m: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  // (event_id, user_id, event_type, ts) — horizon 1 h everywhere below
  private val scenario = Seq(
    // user 1: e1 fixed by the 10:20 view (wait 20 min); e2 breaches
    (1L, 1L, "error", ts(10, 0)),
    (10L, 1L, "view", ts(10, 20)),
    (2L, 1L, "error", ts(10, 30)),
    // user 2: the 11:50 view is BEFORE the error (not a candidate);
    // 12:10 is the earliest of the two later views
    (20L, 2L, "view", ts(11, 50)),
    (3L, 2L, "error", ts(12, 0)),
    (21L, 2L, "view", ts(12, 10)),
    (22L, 2L, "view", ts(12, 40)),
    // user 3: fix at the SAME instant — inclusive, wait 0
    (4L, 3L, "error", ts(13, 0)),
    (30L, 3L, "view", ts(13, 0)),
    // user 4: two views at the same ts — smallest id wins
    (5L, 4L, "error", ts(14, 0)),
    (100L, 4L, "view", ts(14, 30)),
    (101L, 4L, "view", ts(14, 30)),
    // noise the operator must ignore
    (200L, 1L, "click", ts(10, 5)))

  private val expected = Set(
    (1L, 1L, Some(10L), Some(1200L * 1000000L), false),
    (2L, 1L, None, None, true),
    (3L, 2L, Some(21L), Some(600L * 1000000L), false),
    (4L, 3L, Some(30L), Some(0L), false),
    (5L, 4L, Some(100L), Some(1800L * 1000000L), false))

  test("streaming SLA: matches, breaches, equal-ts and tie contracts — " +
    "and equality with the batch twin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val stream = SlaStream.slaStream(
      input.toDF().toDF("event_id", "user_id", "event_type", "ts"))
    val q = stream.writeStream.format("memory").queryName("sla_mem")
      .outputMode("append").start()
    try {
      input.addData(scenario: _*)
      q.processAllAvailable() // watermark still at epoch during batch 1
      // sentinel traffic on an unrelated key advances the watermark past
      // every deadline; breaches must fire from TIMERS, no traffic on
      // the breached keys themselves
      input.addData((900L, 9L, "view", ts(18, 0)))
      q.processAllAvailable() // wm = 14:30 → deadlines ≤ 14:30 fire
      input.addData((901L, 9L, "view", ts(19, 0)))
      q.processAllAvailable() // wm = 18:00 → user 4's 15:00 deadline fires
      val got = spark.table("sla_mem").collect().map { r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getBoolean(4))
      }.toSet
      assert(got === expected, s"stream output: $got")
    } finally q.stop()

    // batch twin on the identical rows: same five verdicts
    val batch = SlaStream.slaBatch(
      scenario.toDF("event_id", "user_id", "event_type", "ts")
        .withColumn("value", lit(0.0)))
      .collect().map { r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getBoolean(5))
      }.toSet
    assert(batch === expected, s"batch twin: $batch")
  }

  test("bounded state: a fix evicts once the watermark clears its " +
    "horizon; silent keys self-clean via timers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val stream = SlaStream.slaStream(
      input.toDF().toDF("event_id", "user_id", "event_type", "ts"))
    val q = stream.writeStream.format("memory").queryName("sla_state_mem")
      .outputMode("append").start()
    try {
      // lone view on user 5, then only unrelated traffic
      input.addData((50L, 5L, "view", ts(9, 0)))
      q.processAllAvailable()
      input.addData((910L, 9L, "view", ts(12, 0)))
      q.processAllAvailable()
      input.addData((911L, 9L, "view", ts(13, 0)))
      q.processAllAvailable()
      val prog = q.recentProgress.flatMap(p => Option(p.stateOperators))
        .flatten.lastOption
      // user 5's fix (9:00 + 1 h horizon < wm 12:00) must be gone; only
      // the live key 9's buffer remains
      assert(prog.exists(_.numRowsTotal <= 1),
        s"state rows: ${prog.map(_.numRowsTotal)}")
    } finally q.stop()
  }
}
