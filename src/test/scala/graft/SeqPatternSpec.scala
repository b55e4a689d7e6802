package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Decontaminate, SeqPattern}

class SeqPatternSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("sequences: (sec, event_id) total order, ties broken by id") {
    val ev = Seq(
      (2L, ts(5), 1L, "signup"),
      (1L, ts(10), 1L, "view"),
      (3L, ts(10), 1L, "click"), // same second as view: id 1 < 3 orders v first
      (4L, ts(20), 1L, "purchase"),
      (5L, ts(30), 2L, "error")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val seqs = SeqPattern
      .sequences(ev, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(seqs(1L) === "svcp")
    assert(seqs(2L) === "e")
  }

  test("patternReport counts non-overlapping funnels and the longest run") {
    // seq "vvcpvpeee": 'v+c*p' matches "vvcp" then "vp" (leftmost
    // non-overlapping), longest 'e' run is 3
    val types = Seq("view", "view", "click", "purchase", "view",
      "purchase", "error", "error", "error")
    val ev = types.zipWithIndex
      .map { case (t, i) => (i.toLong, ts(100 + i), 1L, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = SeqPattern.patternReport(ev, "user_id", "ts", "event_id",
      "event_type", pattern = "v+c*p", runChar = "e").collect().head
    assert(r.getAs[Int]("seq_len") === 9)
    assert(r.getAs[Long]("n_matches") === 2L)
    assert(r.getAs[Long]("longest_run") === 3L)
  }

  test("patternReport: no matches and no runs read as zero, not null") {
    val ev = Seq((1L, ts(1), 7L, "signup"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = SeqPattern.patternReport(ev, "user_id", "ts", "event_id",
      "event_type", pattern = "v+c*p", runChar = "e").collect().head
    assert(r.getAs[Long]("n_matches") === 0L)
    assert(r.getAs[Long]("longest_run") === 0L)
  }

  test("noveltyScores: identical 0 ppm, disjoint 1e6 ppm, partial exact") {
    val ref = Seq((100L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 3 shingles, all in the reference
      (2L, "q r s t u v w x y z"), // 3 shingles, none seen
      (3L, "a b c d e f g h zz") // 2 shingles, first seen → 500000 ppm
    ).toDF("doc_id", "text")
    val out = Decontaminate.noveltyScores(docs, ref, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) === ((3L, 3L, 0L)))
    assert(out(2L) === ((3L, 0L, 1000000L)))
    assert(out(3L) === ((2L, 1L, 500000L)))
  }

  test("automatonReport ≡ patternReport (regex) over the real corpus") {
    val ev = Tables(spark, sfDir(), "events")
    def toMapOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    val regex = toMapOf(SeqPattern.patternReport(ev, "user_id", "ts",
      "event_id", "event_type", pattern = "v+c*p", runChar = "e"))
    val aut = toMapOf(SeqPattern.automatonReport(ev, "user_id", "ts",
      "event_id", "event_type"))
    assert(aut === regex)
    assert(regex.valuesIterator.map(_._2).sum > 0,
      "corpus should contain at least one funnel match")
  }

  test("patternStream carries matches and runs across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val stream = graft.streaming.EventStreams.patternStream(
      input.toDF().toDF("user_id", "ts", "event_id", "event_type"))
    val q = stream.writeStream.format("memory").queryName("d23_mem")
      .outputMode("update").start()
    try {
      // user 1's funnel splits v,c | p across triggers; user 2's error
      // run splits e | e — both must still count via the carried state
      input.addData((1L, ts(10), 1L, "view"), (1L, ts(20), 2L, "click"))
      q.processAllAvailable()
      input.addData((1L, ts(30), 3L, "purchase"), (2L, ts(40), 4L, "error"))
      q.processAllAvailable()
      input.addData((2L, ts(50), 5L, "error"))
      q.processAllAvailable()
      val finalByUser = spark.table("d23_mem").collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
      assert(finalByUser(1L) === ((3, 1L, 0L)),
        s"split funnel must count: $finalByUser")
      assert(finalByUser(2L) === ((2, 0L, 2L)),
        s"split run must accumulate: $finalByUser")
      // stream ≡ the batch automaton twin over the union of all input
      val all = Seq(
        (1L, ts(10), 1L, "view"), (1L, ts(20), 2L, "click"),
        (1L, ts(30), 3L, "purchase"), (2L, ts(40), 4L, "error"),
        (2L, ts(50), 5L, "error"))
        .toDF("user_id", "ts", "event_id", "event_type")
      val batch = SeqPattern.automatonReport(all, "user_id", "ts",
        "event_id", "event_type").collect()
        .map(r => (r.getLong(0), ((r.getInt(1), r.getLong(2), r.getLong(3)))))
        .toMap
      assert(finalByUser === batch)
    } finally q.stop()
  }

  test("noveltyScores: sub-width docs fall back to the whole-text gram") {
    val ref = Seq((9L, "hello world")).toDF("doc_id", "text")
    val docs = Seq((1L, "hello world"), (2L, "bye world"))
      .toDF("doc_id", "text")
    val out = Decontaminate.noveltyScores(docs, ref, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) === ((1L, 1L, 0L)))
    assert(out(2L) === ((1L, 0L, 1000000L)))
  }
}
