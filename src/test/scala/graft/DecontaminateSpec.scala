package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decontaminate

class DecontaminateSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("a doc embedding one eval 8-gram is flagged; clean docs are not") {
    val evalDocs = Seq(
      (100L, "alpha bravo charlie delta echo foxtrot golf hotel india")
    ).toDF("doc_id", "text")
    val train = Seq(
      // contains "bravo charlie … india" as a contiguous run → 2 shared 8-grams
      (1L, "intro words then alpha bravo charlie delta echo foxtrot golf hotel india and more"),
      (2L, "completely different vocabulary with no overlap whatsoever at all " +
        "still nothing shared here"),
      // shares words but never 8 in a row
      (3L, "alpha bravo charlie delta echo STOP foxtrot golf hotel india")
    ).toDF("doc_id", "text")
    val out = Decontaminate
      .flagContaminated(train, evalDocs, "text", "doc_id", n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out(1L)._2 && out(1L)._1 === 2L, out(1L).toString)
    assert(out(2L) === ((0L, false)))
    assert(out(3L) === ((0L, false)), "7-word runs must not flag at n=8")
  }

  test("eval docs flag themselves; case/whitespace are normalized away") {
    val evalDocs = Seq(
      (0L, "One  Two Three FOUR five six seven eight nine")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "one two three four five six seven eight nine")).toDF("doc_id", "text")
    val out = Decontaminate
      .flagContaminated(train, evalDocs, "text", "doc_id").head
    assert(out.getBoolean(2), "normalization must make these identical")
  }

  test("short eval docs (< n words) contaminate via whole-text shingle") {
    val evalDocs = Seq((0L, "tiny eval prompt")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "tiny eval prompt"),        // exact short match
      (2L, "tiny eval prompt plus more words making it long enough maybe"))
      .toDF("doc_id", "text")
    val out = Decontaminate
      .flagContaminated(train, evalDocs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L), "whole-text shingle must match")
    assert(!out(2L), "the long doc's 8-gram universe can't contain a " +
      "3-word whole-text shingle")
  }
}
