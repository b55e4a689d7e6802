package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private lazy val left = Seq(
    (1L, ts(100), "e1"), // before any right row for key 1
    (1L, ts(200), "e2"), // exactly AT a right row: inclusive match
    (1L, ts(250), "e3"), // between right rows: earlier one carries
    (1L, ts(900), "e4"), // after the last right row
    (2L, ts(500), "e5"), // key with a single right row
    (3L, ts(500), "e6")  // key absent from the right side entirely
  ).toDF("k", "t", "tag")

  private lazy val right = Seq(
    (1L, ts(200), 10L, 1.0),
    (1L, ts(300), 11L, 2.0),
    (2L, ts(400), 20L, 3.0)
  ).toDF("k", "rt", "rid", "price")

  private lazy val joined = AsofJoin
    .asof(left, right, Seq("k"), "t", "rt", Seq("rid", "price"))
    .collect()
    .map(r => r.getString(2) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
    .toMap

  test("each left row matches the latest right row at-or-before its time") {
    assert(joined("e2") === Some(10L), "equal timestamps must match (inclusive)")
    assert(joined("e3") === Some(10L), "carry the in-force version, not a later one")
    assert(joined("e4") === Some(11L), "latest version carries indefinitely")
    assert(joined("e5") === Some(20L))
  }

  test("unmatched left rows survive with null payload (left-outer)") {
    assert(joined("e1") === None, "no right row at-or-before → null")
    assert(joined("e6") === None, "key missing on the right → null")
    assert(joined.size === 6, "no left row lost or duplicated")
  }

  test("bucketed variant: identical output on the edge-case table") {
    val bucketOf = (c: org.apache.spark.sql.Column) =>
      (unix_timestamp(c) / 250L).cast("long") // buckets split the fixture
    val plain = AsofJoin
      .asof(left, right, Seq("k"), "t", "rt", Seq("rid", "price"))
    val bucketed = AsofJoin
      .asofBucketed(left, right, Seq("k"), "t", "rt", Seq("rid", "price"),
        bucketOf)
    assert(bucketed.count() === plain.count())
    assert(bucketed.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(bucketed).count() === 0L)
  }

  test("bucketed variant: one hot user with 50% of events, same answer") {
    // heavy-tailed fixture: user 0 holds half of 20k events; right-side
    // state changes are sparse (one per 100s per user) — the shape where
    // the plain form's single hot task is the whole job at scale
    val n = 20000
    val hotLeft = spark.range(n).select(
      when($"id" % 2 === 0, 0L).otherwise($"id" % 50).as("k"),
      // event times interleave across users; seconds 0..9999
      ($"id" % 10000).cast("long").as("sec"),
      concat(lit("e"), $"id").as("tag"))
      .withColumn("t", timestamp_seconds($"sec")).drop("sec")
    val hotRight = spark.range(100).select(
      ($"id" % 50).as("k"),
      timestamp_seconds(($"id" / 50) * 5000 + ($"id" % 50) * 7).as("rt"),
      $"id".as("rid"))
    val bucketOf = (c: org.apache.spark.sql.Column) =>
      (unix_timestamp(c) / 1000L).cast("long")
    val plain = AsofJoin
      .asof(hotLeft, hotRight, Seq("k"), "t", "rt", Seq("rid"))
    val bucketed = AsofJoin
      .asofBucketed(hotLeft, hotRight, Seq("k"), "t", "rt", Seq("rid"),
        bucketOf)
    assert(bucketed.count() === n.toLong)
    assert(bucketed.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(bucketed).count() === 0L)
  }

  test("plan contains no join: one exchange keyed on the join key") {
    val out = AsofJoin.asof(left, right, Seq("k"), "t", "rt", Seq("rid"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(600))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly one exchange:\n${plan.take(800)}")
  }

  test("b53 nearest: picks the side minimizing |Δt|, ties to the " +
       "EARLIER row, one-sided keys fall back, and the plan is joinless") {
    val near = AsofJoin
      .asofNearest(left, right, Seq("k"), "t", "rt", Seq("rid"))
    val got = near.collect()
      .map(r => r.getString(2) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3))),
          (if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toMap
    // e1 t=100: only later rows exist → forward match rt=200, Δ=100s
    assert(got("e1") === ((Some(10L), Some(100000000L))))
    // e2 t=200: exact hit both directions → Δ=0, earlier(-or-equal) row
    assert(got("e2") === ((Some(10L), Some(0L))))
    // e3 t=250: rt=200 (Δ50) vs rt=300 (Δ50) — TIE goes to the earlier
    assert(got("e3") === ((Some(10L), Some(50000000L))))
    // e4 t=900: only earlier rows → backward match rt=300
    assert(got("e4") === ((Some(11L), Some(600000000L))))
    // e5 t=500: single right row at 400 → backward
    assert(got("e5") === ((Some(20L), Some(100000000L))))
    // e6: key has no right rows at all → null match, null delta
    assert(got("e6") === ((None, None)))
    // brute-force argmin over all (left, right) pairs agrees everywhere
    val brute = left.as[(Long, java.sql.Timestamp, String)].collect().map {
      case (k, t, tag) =>
        val cands = right.as[(Long, java.sql.Timestamp, Long, Double)]
          .collect().filter(_._1 == k)
        if (cands.isEmpty) tag -> ((None, None))
        else {
          val best = cands.minBy(c =>
            (math.abs(c._2.getTime - t.getTime), c._2.getTime))
          tag -> ((Some(best._3),
            Some(math.abs(best._2.getTime - t.getTime) * 1000L)))
        }
    }.toMap
    assert(got === brute)
    val p = near.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE prints the exchange twice
    assert(!p.contains("Join"), p.take(600))
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"both carries must share one exchange:\n${p.take(800)}")
  }

  test("b53 nearest property sweep: ≡ brute-force argmin on a seeded " +
       "random table (200 left x 80 right rows, 10 keys, dense ties)") {
    val rnd = new scala.util.Random(42)
    // small time domain forces equal-timestamp and equal-distance ties
    val lRows = (0 until 200).map(i =>
      (rnd.nextInt(10).toLong, ts(rnd.nextInt(50).toLong), s"L$i"))
    val rAll = (0 until 80).map(i =>
      (rnd.nextInt(10).toLong, ts(rnd.nextInt(50).toLong), i.toLong, 0.0))
    // enforce the unique-(key, time) right contract
    val rRows = rAll.groupBy(r => (r._1, r._2)).values
      .map(_.minBy(_._3)).toSeq
    val lDf = lRows.toDF("k", "t", "tag")
    val rDf = rRows.toDF("k", "rt", "rid", "price")
    val got = AsofJoin
      .asofNearest(lDf, rDf, Seq("k"), "t", "rt", Seq("rid"))
      .collect()
      .map(r => r.getString(2) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap
    val brute = lRows.map { case (k, t, tag) =>
      val cands = rRows.filter(_._1 == k)
      tag -> (if (cands.isEmpty) None
      else Some(cands.minBy(c =>
        (math.abs(c._2.getTime - t.getTime), c._2.getTime, c._3))._3))
    }.toMap
    assert(got === brute)
  }

  test("b42 forward: each left row matches the EARLIEST right row " +
       "at-or-after its time; no later row -> null; still joinless") {
    val fwd = AsofJoin
      .asofForward(left, right, Seq("k"), "t", "rt", Seq("rid", "price"))
    val got = fwd.collect()
      .map(r => r.getString(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got("e1") === Some(10L), "next version after t=100 is rt=200")
    assert(got("e2") === Some(10L), "equal timestamps match (inclusive)")
    assert(got("e3") === Some(11L), "the NEXT version, not the previous")
    assert(got("e4") === None, "nothing after the last right row")
    assert(got("e5") === None, "right row at 400 is before t=500")
    assert(got("e6") === None, "key absent from the right side")
    val p = fwd.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(600))
  }
}
