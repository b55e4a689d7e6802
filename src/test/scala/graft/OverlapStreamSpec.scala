package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.OverlapStream

/** D34: the stream-stream interval-overlap join — streamed pairs equal
  * the batch twin exactly (including touching ends and containment),
  * pairs spanning trigger boundaries survive, and out-of-contract
  * intervals are excluded on BOTH paths rather than silently dropping
  * only from the stream.
  */
class OverlapStreamSpec extends AnyFunSuite with SparkSpec {

  private def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)

  test("stream ≡ batch on overlap pairs, across triggers, with the " +
       "bounded-length contract enforced identically") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // maxLen 100 s. Overlap cases: (1,10) touching end with (2,20);
    // (3,30) contains (4,31); disjoint (5,x) pairs nothing; the
    // 500-second interval (6,...) is OUT of contract on the left side;
    // pair (7) arrives in a LATER trigger than its match (2b)
    val leftRows = Seq(
      (1L, ts(100), ts(200)),   // overlaps b1 (touching at 200) and b2
      (3L, ts(300), ts(400)),   // contains b3
      (5L, ts(1000), ts(1010)), // overlaps nothing
      (6L, ts(50), ts(550)))    // 500 s — OUT of the 100 s contract
    val rightB1 = Seq(
      (1L, ts(200), ts(260)),   // touches a1's end exactly
      (2L, ts(150), ts(170)),   // inside a1
      (3L, ts(310), ts(330)),   // inside a3
      (9L, ts(60), ts(90)))     // would overlap ONLY the out-of-contract a6
    val rightB2 = Seq(
      (7L, ts(390), ts(450)))   // late-arriving, overlaps a3
    val lIn = MemoryStream[(Long, java.sql.Timestamp, java.sql.Timestamp)]
    val rIn = MemoryStream[(Long, java.sql.Timestamp, java.sql.Timestamp)]
    val joined = OverlapStream.overlapStream(
      lIn.toDF().toDF("a_id", "a_lo", "a_hi"),
      rIn.toDF().toDF("b_id", "b_lo", "b_hi"), maxLenSec = 100L)
    val q = joined.writeStream.format("memory").queryName("d34_mem")
      .outputMode("append").start()
    try {
      lIn.addData(leftRows: _*); rIn.addData(rightB1: _*)
      q.processAllAvailable()
      rIn.addData(rightB2: _*)
      q.processAllAvailable()
      def pairs(df: org.apache.spark.sql.DataFrame) = df
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = pairs(spark.table("d34_mem"))
      val batch = pairs(OverlapStream.overlapBatch(
        leftRows.toDF("a_id", "a_lo", "a_hi"),
        (rightB1 ++ rightB2).toDF("b_id", "b_lo", "b_hi"),
        maxLenSec = 100L))
      assert(got === batch, "stream must equal the batch twin")
      assert(got === Set((1L, 1L), (1L, 2L), (3L, 3L), (3L, 7L)),
        "touching ends and containment pair; disjoint and " +
          "out-of-contract don't; cross-trigger arrival pairs")
      // the out-of-contract interval is excluded on BOTH paths — its
      // would-be partner pairs with nothing
      assert(!got.exists(_._1 == 6L) && !batch.exists(_._1 == 6L))
      assert(!got.exists(_._2 == 9L))
    } finally q.stop()
  }

  test("the join plan carries the watermark state bound (no unbounded " +
       "stream-stream state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lIn = MemoryStream[(Long, java.sql.Timestamp, java.sql.Timestamp)]
    val rIn = MemoryStream[(Long, java.sql.Timestamp, java.sql.Timestamp)]
    val joined = OverlapStream.overlapStream(
      lIn.toDF().toDF("a_id", "a_lo", "a_hi"),
      rIn.toDF().toDF("b_id", "b_lo", "b_hi"), maxLenSec = 100L)
    val q = joined.writeStream.format("memory").queryName("d34_plan")
      .outputMode("append").start()
    try {
      lIn.addData((1L, ts(10), ts(20))); rIn.addData((1L, ts(15), ts(25)))
      q.processAllAvailable()
      val p = q.lastProgress
      assert(p.stateOperators.nonEmpty &&
        p.stateOperators.head.operatorName
          .toLowerCase.contains("join"),
        "a stream-stream join state operator must be present")
    } finally q.stop()
  }
}
