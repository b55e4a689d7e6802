package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{RangeJoin, Upsert}

class RangeJoinSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("bucketed range join equals the naive non-equi join, exactly once") {
    val points = (1L to 100L).map(i => (i, i % 37)).toDF("pid", "x")
    val intervals = Seq(
      (0L, 0L, 9L), (1L, 5L, 14L),     // overlapping intervals
      (2L, 30L, 36L), (3L, 0L, 36L),   // wide interval spans all buckets
      (4L, 35L, 35L), (5L, 40L, 50L)   // point interval; empty interval
    ).toDF("iid", "lo", "hi")
    val bucketed = RangeJoin
      .pointInInterval(points, intervals, "x", "lo", "hi", bucketWidth = 7L)
      .select("pid", "iid")
    val naive = points.join(intervals,
        col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid")
    assert(bucketed.count() === naive.count())
    assert(bucketed.distinct().count() === bucketed.count(),
      "a (point, interval) pair must appear exactly once")
    assert(bucketed.exceptAll(naive).count() === 0L)
    assert(naive.exceptAll(bucketed).count() === 0L)
  }

  test("interval ends are inclusive on both sides") {
    val points = Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L)).toDF("pid", "x")
    val intervals = Seq((0L, 10L, 20L)).toDF("iid", "lo", "hi")
    val hits = RangeJoin
      .pointInInterval(points, intervals, "x", "lo", "hi", bucketWidth = 100L)
      .select("pid").collect().map(_.getLong(0)).sorted
    assert(hits.toSeq === Seq(1L, 2L))
  }

  test("range join is an equi-join on bucket: no nested-loop in the plan") {
    val points = (1L to 50L).map(i => (i, i)).toDF("pid", "x")
    val intervals = Seq((0L, 0L, 25L), (1L, 26L, 50L)).toDF("iid", "lo", "hi")
    val plan = RangeJoin
      .pointInInterval(points, intervals, "x", "lo", "hi", bucketWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(600))
  }

  test("broadcast variant: same rows, no explode, no shuffle in the plan") {
    val points = (1L to 100L).map(i => (i, i % 37)).toDF("pid", "x")
    val intervals = Seq((0L, 0L, 9L), (1L, 5L, 14L), (2L, 30L, 36L),
      (3L, 0L, 36L), (4L, 35L, 35L), (5L, 40L, 50L)).toDF("iid", "lo", "hi")
    val bc = RangeJoin
      .pointInIntervalBroadcast(points, intervals, "x", "lo", "hi")
      .select("pid", "iid")
    val bucketed = RangeJoin
      .pointInInterval(points, intervals, "x", "lo", "hi", bucketWidth = 7L)
      .select("pid", "iid")
    assert(bc.exceptAll(bucketed).count() === 0L)
    assert(bucketed.exceptAll(bc).count() === 0L)
    val plan = bc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(!plan.contains("Generate") && !plan.contains("Exchange hashpartitioning"),
      s"dim-sized interval side must not pay the explode or a shuffle: ${plan.take(600)}")
  }

  test("auto dispatch: broadcast for a dim-sized side, bucketed when disabled") {
    val points = (1L to 100L).map(i => (i, i % 37)).toDF("pid", "x")
    val intervals = Seq((0L, 0L, 9L), (1L, 10L, 36L)).toDF("iid", "lo", "hi")
    val auto = RangeJoin
      .pointInIntervalAuto(points, intervals, "x", "lo", "hi", bucketWidth = 7L)
    assert(auto.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      // threshold disabled → the big-to-big-safe bucketed equi-join
      val forced = RangeJoin
        .pointInIntervalAuto(points, intervals, "x", "lo", "hi", bucketWidth = 7L)
      val plan = forced.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(600))
      assert(forced.select("pid", "iid").exceptAll(
        auto.select("pid", "iid")).count() === 0L)
    } finally spark.conf.set(key, prev)
  }

  test("upsert: existing keys replace, new keys insert, others untouched") {
    val target = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "status", "v")
    val updates = Seq((2L, "B", 20.0), (4L, "d", 4.0)).toDF("k", "status", "v")
    val out = Upsert.upsert(target, updates, Seq("k"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out === Map(
      1L -> ("a", 1.0), 2L -> ("B", 20.0), 3L -> ("c", 3.0), 4L -> ("d", 4.0)))
  }

  test("upsert: a null in the update row wins (whole-row replace)") {
    val target = Seq((1L, Some("a"))).toDF("k", "status")
    val updates = Seq((1L, None: Option[String])).toDF("k", "status")
    val out = Upsert.upsert(target, updates, Seq("k")).collect()
    assert(out.length === 1 && out.head.isNullAt(1),
      "per-column coalesce semantics would wrongly resurrect the old value")
  }

  test("upsert is idempotent: applying the same batch twice is a no-op") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "status")
    val updates = Seq((2L, "B"), (3L, "c")).toDF("k", "status")
    val once = Upsert.upsert(target, updates, Seq("k"))
    val twice = Upsert.upsert(once, updates, Seq("k"))
    assert(twice.exceptAll(once).count() === 0L)
    assert(once.exceptAll(twice).count() === 0L)
  }

  test("b56 overlapJoin property sweep: pair-set ≡ brute force on 150x150 " +
       "seeded random intervals across bucket widths 1, 7, 100, 10000") {
    import graft.operators.RangeJoin
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(7)
    def mk(n: Int, idBase: Long) = (0 until n).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (idBase + i, lo, lo + rnd.nextInt(60))
    }
    val ls = mk(150, 0L)
    val rs = mk(150, 10000L)
    val brute = (for {
      (lid, la, ha) <- ls
      (rid, lb, hb) <- rs
      if la <= hb && lb <= ha
    } yield (lid, rid)).sorted
    val lDf = ls.toDF("lid", "lo_a", "hi_a")
    val rDf = rs.toDF("rid", "lo_b", "hi_b")
    Seq(1L, 7L, 100L, 10000L).foreach { w =>
      val got = RangeJoin.overlapJoin(lDf, rDf,
          "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = w)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq === brute,
        s"width $w: ${got.length} vs ${brute.length} pairs")
    }
  }

  test("b56 overlapJoin: every overlapping pair exactly once (multi-" +
       "bucket spans, touching ends, containment), none twice, " +
       "disjoint never") {
    import graft.operators.RangeJoin
    val s2 = spark
    import s2.implicits._
    val left = Seq(
      (1L, 0L, 250L), // spans 3 buckets of width 100
      (2L, 500L, 500L), // degenerate point interval
      (3L, 900L, 1000L)
    ).toDF("lid", "lo_a", "hi_a")
    val right = Seq(
      (10L, 240L, 260L), // overlaps 1 (multi-bucket left, shared tail)
      (11L, 250L, 400L), // touches 1 exactly at 250 (inclusive ends)
      (12L, 500L, 500L), // point-point exact hit with 2
      (13L, 100L, 120L), // contained inside 1
      (14L, 600L, 800L) // disjoint from everything
    ).toDF("rid", "lo_b", "hi_b")
    val got = RangeJoin.overlapJoin(left, right,
        "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = 100L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // brute force over all pairs
    val brute = for {
      (lid, la, ha) <- Seq((1L, 0L, 250L), (2L, 500L, 500L),
        (3L, 900L, 1000L))
      (rid, lb, hb) <- Seq((10L, 240L, 260L), (11L, 250L, 400L),
        (12L, 500L, 500L), (13L, 100L, 120L), (14L, 600L, 800L))
      if la <= hb && lb <= ha
    } yield (lid, rid)
    assert(got.sorted === brute.sorted.toArray,
      s"got ${got.toSeq}, want $brute")
    assert(got.length === got.distinct.length, "no pair may appear twice")
  }
}
