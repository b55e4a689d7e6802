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

  test("scd2Apply: change-only versions, close-out, same-instant dedup") {
    // key 1: a→a (compacts)→b→a: 3 versions; key 2: single version;
    // key 3: two observations at the SAME instant (max attr wins)
    val obs = Seq(
      (1L, "a", 10), (1L, "a", 20), (1L, "b", 30), (1L, "a", 40),
      (2L, "x", 10),
      (3L, "m", 10), (3L, "z", 10)
    ).toDF("k", "seg", "ts")
    val hist = Upsert.scd2Apply(None, obs, Seq("k"), "ts", Seq("seg"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3), r.getBoolean(4))).toSet
    assert(hist === Set(
      (1L, "a", 10, 30, false), (1L, "b", 30, 40, false),
      (1L, "a", 40, -1, true),
      (2L, "x", 10, -1, true),
      (3L, "z", 10, -1, true)))
  }

  test("scd2Apply: ordered incremental batches equal one-shot processing") {
    val all = Seq(
      (1L, "a", 10), (1L, "b", 20), (1L, "b", 30), (1L, "c", 40),
      (2L, "x", 10), (2L, "x", 40), (3L, "q", 35)
    ).toDF("k", "seg", "ts")
    val oneShot = Upsert.scd2Apply(None, all, Seq("k"), "ts", Seq("seg"))
    val b1 = Upsert.scd2Apply(None, all.where(col("ts") < 30),
      Seq("k"), "ts", Seq("seg"))
    val b2 = Upsert.scd2Apply(Some(b1), all.where(col("ts") >= 30),
      Seq("k"), "ts", Seq("seg"))
    assert(b2.exceptAll(oneShot).isEmpty && oneShot.exceptAll(b2).isEmpty)
    // idempotence: re-applying an already-folded batch changes nothing
    val again = Upsert.scd2Apply(Some(b2), all.where(col("ts") >= 30),
      Seq("k"), "ts", Seq("seg"))
    assert(again.exceptAll(oneShot).isEmpty && oneShot.exceptAll(again).isEmpty)
  }

  test("a31 diff: statuses, name-sorted change mask, and null-safe " +
       "column compare") {
    import graft.operators.TableDiff
    val v1 = Seq[(Long, Option[String], Option[Int])](
      (1L, Some("a"), Some(10)),   // same
      (2L, Some("b"), Some(20)),   // both cols change
      (3L, None, Some(30)),        // null -> value flip on s
      (4L, Some("d"), None),       // value -> null flip on n
      (5L, Some("e"), Some(50))    // removed
    ).toDF("k", "s", "n")
    val v2 = Seq[(Long, Option[String], Option[Int])](
      (1L, Some("a"), Some(10)),
      (2L, Some("B"), Some(21)),
      (3L, Some("c"), Some(30)),
      (4L, Some("d"), Some(40)),
      (6L, Some("f"), Some(60))    // added
    ).toDF("k", "s", "n")
    val got = TableDiff.diff(v1, v2, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(got === Map(
      1L -> ("same", ""), 2L -> ("changed", "n,s"),
      3L -> ("changed", "s"), 4L -> ("changed", "n"),
      5L -> ("removed", ""), 6L -> ("added", "")))
    // null == null is NOT a change: identical all-null value rows
    val w1 = Seq[(Long, Option[String])]((9L, None)).toDF("k", "s")
    val w2 = Seq[(Long, Option[String])]((9L, None)).toDF("k", "s")
    assert(TableDiff.diff(w1, w2, Seq("k")).head.getString(1) === "same")
  }

  test("snapshot-diff-derived change feed == the native A23 feed, " +
       "row for row (including the no-op silence)") {
    import graft.operators.TableDiff
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "s", "v")
    // batch: revise k=1, no-op re-deliver k=2, insert k=5; delete k=4
    val updates = Seq((1L, "a", 11.0), (2L, "b", 20.0), (5L, "e", 50.0))
      .toDF("k", "s", "v")
    val deletes = Seq(Tuple1(4L)).toDF("k")
    val native = Upsert.upsertWithChanges(v1, updates, Seq("k"),
      Some(deletes))
    val derived = TableDiff.changeFeed(v1, native.merged, Seq("k"))
    // identical multiset of feed rows — one divergence anywhere fails
    assert(derived.exceptAll(native.changes).isEmpty &&
      native.changes.exceptAll(derived).isEmpty,
      s"derived:\n${derived.collect().mkString("\n")}\n" +
        s"native:\n${native.changes.collect().mkString("\n")}")
    // and the no-op really emitted nothing on either path
    assert(derived.where(col("k") === 2L).isEmpty)
    assert(derived.count() === 4L) // 1 insert + pre/post pair + 1 delete
  }
}
