package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BoilerplateStream.LineFreqState

class BoilerplateStreamSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  // 12-word texts → exactly one body line per doc, so line structure is
  // fully controlled: header + body
  private def words12(tag: String): String =
    (1 to 12).map(i => s"$tag$i").mkString(" ")

  test("headers strip everywhere, body lines never, reports per doc") {
    val docs = Tables(spark, sfDir(), "documents")
      .select("doc_id", "source", "text")
    val st = new LineFreqState()
    (0 until 2).foreach { e =>
      val rep = st.fold(e.toLong, docs.where(col("doc_id") % 2 === e))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rep.nonEmpty)
      rep.foreach { case (id, n, stripped) =>
        assert(stripped === 1L,
          s"epoch $e doc $id: exactly the planted header must strip " +
            s"($stripped of $n)")
      }
    }
  }

  test("frequency ratio is computed against ACCUMULATED history: a line " +
       "above threshold in epoch 0 falls below it as clean docs arrive; " +
       "replay flags from unchanged state") {
    val special = words12("dup")
    val ep0 = ((0 until 5).map(i => (i.toLong, "s", special)) ++
      (5 until 10).map(i => (i.toLong, "s", words12(s"u$i"))))
      .toDF("doc_id", "source", "text")
    // 10 fresh unique docs + ONE more special doc: df 6 of 21 < 30%
    val ep1 = ((10 until 20).map(i => (i.toLong, "s", words12(s"v$i"))) :+
      (20L, "s", special)).toDF("doc_id", "source", "text")
    val st = new LineFreqState()
    val r0 = st.fold(0L, ep0).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // epoch 0: header (10/10) AND the special line (5/10 = 50%) strip
    (0L until 5L).foreach(i => assert(r0(i) === 2L, s"doc $i: $r0"))
    (5L until 10L).foreach(i => assert(r0(i) === 1L, s"doc $i: $r0"))
    val r1 = st.fold(1L, ep1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // epoch 1: history is now 6-of-21 for the special line — below the
    // 30% threshold, so only the header strips
    assert(r1(20L) === 1L, s"ratio must decline with history: $r1")
    (10L until 20L).foreach(i => assert(r1(i) === 1L))
    // replay of epoch 1: state untouched, identical report
    val r1b = st.fold(1L, ep1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(r1b === r1)
  }
}
