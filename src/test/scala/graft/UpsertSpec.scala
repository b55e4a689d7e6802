package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Upsert

/** Merge + change data feed: the feed classifies exactly (insert /
  * update pre+post / delete), no-op updates emit nothing, replaying the
  * feed's postimages over the old snapshot rebuilds the new one, and the
  * ambiguous update∩delete batch fails loudly.
  */
class UpsertSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "s", "v")

  test("feed classifies inserts, real updates, no-ops, and deletes") {
    val updates = Seq(
      (2L, "b", 25.0),  // changed value  → pre+post
      (3L, "c", 30.0),  // identical      → nothing
      (9L, "z", 90.0))  // new key        → insert
      .toDF("k", "s", "v")
    val deletes = Seq(Tuple1(4L)).toDF("k")
    val r = Upsert.upsertWithChanges(target, updates, Seq("k"),
      Some(deletes))

    val feed = r.changes.select("_change_type", "k", "v")
      .as[(String, Long, Double)].collect().sortBy(c => (c._1, c._2)).toSeq
    assert(feed === Seq(
      ("delete", 4L, 40.0),
      ("insert", 9L, 90.0),
      ("update_postimage", 2L, 25.0),
      ("update_preimage", 2L, 20.0)))

    val snap = r.merged.select("k", "v").as[(Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(snap === Seq((1L, 10.0), (2L, 25.0), (3L, 30.0), (9L, 90.0)))
  }

  test("null-safe diff: null→value and value→null both count as changes," +
       " null→null does not") {
    val t0 = Seq((1L, Some(10.0)), (2L, None: Option[Double]), (3L, None))
      .toDF("k", "v")
    val up = Seq((1L, None: Option[Double]), (2L, Some(5.0)), (3L, None))
      .toDF("k", "v")
    val r = Upsert.upsertWithChanges(t0, up, Seq("k"))
    val kinds = r.changes.groupBy("k").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(kinds === Seq((1L, 2L), (2L, 2L)),
      "k=3 (null→null) must emit nothing; k=1,2 emit pre+post")
  }

  test("replaying the feed over the old snapshot rebuilds the new one") {
    val updates = Seq((1L, "a", 11.0), (9L, "z", 90.0)).toDF("k", "s", "v")
    val deletes = Seq(Tuple1(2L)).toDF("k")
    val r = Upsert.upsertWithChanges(target, updates, Seq("k"),
      Some(deletes))
    // a CDF consumer's apply rule: drop deleted+preimage keys, add
    // inserts+postimages — must equal the merged snapshot exactly
    val applyKeys = r.changes
      .where(col("_change_type").isin("delete", "update_preimage"))
      .select("k")
    val adds = r.changes
      .where(col("_change_type").isin("insert", "update_postimage"))
      .drop("_change_type")
    val replayed = target.join(applyKeys, Seq("k"), "left_anti")
      .unionByName(adds)
    assert(replayed.exceptAll(r.merged).isEmpty &&
      r.merged.exceptAll(replayed).isEmpty)
  }

  test("a key in both updates and deletes fails loudly") {
    val updates = Seq((2L, "b", 99.0)).toDF("k", "s", "v")
    val deletes = Seq(Tuple1(2L)).toDF("k")
    val e = intercept[IllegalArgumentException] {
      Upsert.upsertWithChanges(target, updates, Seq("k"), Some(deletes))
    }
    assert(e.getMessage.contains("updates and deletes"))
  }

  test("without deletes the merged snapshot matches plain upsert") {
    val updates = Seq((2L, "b", 25.0), (9L, "z", 90.0)).toDF("k", "s", "v")
    val viaCdf = Upsert.upsertWithChanges(target, updates, Seq("k")).merged
    val plain = Upsert.upsert(target, updates, Seq("k"))
    assert(viaCdf.exceptAll(plain).isEmpty && plain.exceptAll(viaCdf).isEmpty)
  }
}
