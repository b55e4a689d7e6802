package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MaterializedView, Upsert}

/** Incremental view maintenance is an IDENTITY, not an approximation:
  * for any CDF batch, applyChanges(build(t), feed) == build(merge(t))
  * exactly — including updates that move rows across groups, groups
  * emptied by deletes (they leave the view), all-null measure groups
  * (sums normalized to 0 on both paths), and chained batches.
  */
class MaterializedViewSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val keys = Seq("g")
  private val ms = Seq("v")

  private def eq(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def base = Seq(
    (1L, "a", Some(10.0)), (2L, "a", Some(20.0)), (3L, "b", Some(30.0)),
    (4L, "b", Some(40.0)), (5L, "c", Some(50.0)),
    (6L, "n", None: Option[Double]), (7L, "n", None))
    .toDF("k", "g", "v")

  test("maintained view equals rebuild under a group-moving mixed batch") {
    // 2 moves a→b with a new value, 3 is a no-op, 9 inserts a NEW group,
    // 5 deletes (emptying group c), 6 deletes one of the all-null rows
    val updates = Seq(
      (2L, "b", Some(25.0)), (3L, "b", Some(30.0)), (9L, "z", Some(90.0)))
      .toDF("k", "g", "v")
    val deletes = Seq(Tuple1(5L), Tuple1(6L)).toDF("k")
    val r = Upsert.upsertWithChanges(base, updates, Seq("k"), Some(deletes))

    val inc = MaterializedView.applyChanges(
      MaterializedView.build(base, keys, ms), r.changes, keys, ms)
    val rebuilt = MaterializedView.build(r.merged, keys, ms)
    assert(eq(inc, rebuilt))

    // group c was emptied by the delete: gone from the maintained view
    assert(inc.where(col("g") === "c").isEmpty)
    // the all-null group survives with one row and a 0 (not null) sum
    val n = inc.where(col("g") === "n")
      .select(col("__mv_n"), col("__mv_sum_v").cast("double"))
      .as[(Long, Double)].head()
    assert(n === ((1L, 0.0)))
    // the moved row landed: group b gained 2's row, group a lost it
    val counts = inc.select(col("g"), col("__mv_n")).as[(String, Long)]
      .collect().toMap
    assert(counts("a") === 1L && counts("b") === 3L && counts("z") === 1L)
  }

  test("an empty feed leaves the view bit-identical") {
    val r = Upsert.upsertWithChanges(base,
      Seq((3L, "b", Some(30.0))).toDF("k", "g", "v"), Seq("k"))
    assert(r.changes.isEmpty, "identical update must emit nothing")
    val v0 = MaterializedView.build(base, keys, ms)
    assert(eq(MaterializedView.applyChanges(v0, r.changes, keys, ms), v0))
  }

  test("chained batches: two incremental applies equal one rebuild") {
    val r1 = Upsert.upsertWithChanges(base,
      Seq((1L, "b", Some(11.0)), (8L, "d", Some(80.0))).toDF("k", "g", "v"),
      Seq("k"), Some(Seq(Tuple1(4L)).toDF("k")))
    val r2 = Upsert.upsertWithChanges(r1.merged,
      Seq((8L, "d", Some(88.0)), (2L, "d", Some(2.0))).toDF("k", "g", "v"),
      Seq("k"), Some(Seq(Tuple1(3L)).toDF("k")))
    val inc = MaterializedView.applyChanges(
      MaterializedView.applyChanges(
        MaterializedView.build(base, keys, ms), r1.changes, keys, ms),
      r2.changes, keys, ms)
    assert(eq(inc, MaterializedView.build(r2.merged, keys, ms)))
  }

  test("b57 applyFactChanges ≡ rebuild, including a group deleted to " +
       "zero and a group born from the feed") {
    val s2 = spark
    import s2.implicits._
    val dim = Seq((1L, "red"), (2L, "blue"), (3L, "green"))
      .toDF("dk", "color")
    // group green exists ONLY via fact row 30 (deleted below); group
    // blue is born purely from the feed
    val fact0 = Seq((10L, 1L, 5.0), (11L, 1L, 7.0), (30L, 3L, 9.0))
      .toDF("fk", "dk_ref", "v")
    val view0 = MaterializedView.build(
      fact0.join(dim, col("dk_ref") === col("dk")).select("color", "v"),
      Seq("color"), Seq("v"))
    val feed = Seq(
      (20L, 2L, 4.0, "insert"), (21L, 2L, 6.0, "insert"),
      (30L, 3L, 9.0, "delete"), (11L, 1L, 7.0, "delete"))
      .toDF("fk", "dk_ref", "v", "_change_type")
    val inc = MaterializedView.applyFactChanges(view0, feed, dim,
      col("dk_ref") === col("dk"), Seq("color"), Seq("v"))
    val merged = Seq((10L, 1L, 5.0), (20L, 2L, 4.0), (21L, 2L, 6.0))
      .toDF("fk", "dk_ref", "v")
    val rebuilt = MaterializedView.build(
      merged.join(dim, col("dk_ref") === col("dk")).select("color", "v"),
      Seq("color"), Seq("v"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).longValueExact())).toSet
    assert(canon(inc) === canon(rebuilt))
    assert(!canon(inc).exists(_._1 == "green"),
      "a group whose last fact row is deleted must vanish from the view")
    assert(canon(inc).exists(t => t._1 == "blue" && t._2 == 2L),
      "a group born from the feed must materialize")
  }

  test("b61 bilinear applyJoinChanges ≡ rebuild: a dim attribute move " +
       "re-groups history, an unreferenced dim insert is a no-op, and " +
       "a fact insert referencing a same-batch-moved dim lands in the " +
       "NEW group exactly once (the ΔF⋈ΔD cancellation)") {
    val s2 = spark
    import s2.implicits._
    val dim0 = Seq((1L, "red"), (2L, "blue"), (3L, "green"))
      .toDF("dk", "color")
    val fact0 = Seq((10L, 1L, 5.0), (11L, 1L, 7.0), (20L, 2L, 4.0),
      (30L, 3L, 9.0)).toDF("fk", "dk_ref", "v")
    val view0 = MaterializedView.build(
      fact0.join(dim0, col("dk_ref") === col("dk")).select("color", "v"),
      Seq("color"), Seq("v"))
    // dim batch: customer 1 moves red→gold (re-groups facts 10, 11 AND
    // the same-batch fact insert 12); dim 9 inserted but unreferenced
    val dimFeed = Seq(
      (1L, "red", "update_preimage"), (1L, "gold", "update_postimage"),
      (9L, "violet", "insert"))
      .toDF("dk", "color", "_change_type")
    // fact batch: 12 inserts onto the MOVED dim, 30 deletes (emptying
    // green), 21 inserts onto the untouched blue
    val factFeed = Seq(
      (12L, 1L, 1.0, "insert"), (30L, 3L, 9.0, "delete"),
      (21L, 2L, 6.0, "insert"))
      .toDF("fk", "dk_ref", "v", "_change_type")
    val inc = MaterializedView.applyJoinChanges(view0, factFeed, dimFeed,
      fact0, dim0, "dk_ref", "dk", Seq("color"), Seq("v"))
    val mergedFact = Seq((10L, 1L, 5.0), (11L, 1L, 7.0), (12L, 1L, 1.0),
      (20L, 2L, 4.0), (21L, 2L, 6.0)).toDF("fk", "dk_ref", "v")
    val mergedDim = Seq((1L, "gold"), (2L, "blue"), (3L, "green"),
      (9L, "violet")).toDF("dk", "color")
    val rebuilt = MaterializedView.build(
      mergedFact.join(mergedDim, col("dk_ref") === col("dk"))
        .select("color", "v"),
      Seq("color"), Seq("v"))
    def canon(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).longValueExact())).toSet
    assert(canon(inc) === canon(rebuilt))
    val m = canon(inc).map(t => t._1 -> ((t._2, t._3))).toMap
    assert(!m.contains("red"), "moved-out group must vanish")
    assert(m("gold") === ((3L, 13L)),
      "old facts re-grouped AND the same-batch insert lands once")
    assert(!m.contains("violet"), "unreferenced dim insert is a no-op")
    assert(m("blue") === ((2L, 10L)))
    assert(!m.contains("green"))
  }

  test("b62 applyScd2Changes ≡ temporal rebuild: an out-of-order " +
       "interior version re-attributes exactly the facts inside the " +
       "split window, late facts attribute against the NEW history") {
    val s2 = spark
    import s2.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    // key 1: base 'red' from 1990; key 2: base 'blue' from 1990
    val histOld = Seq(
      (1L, d("1990-01-01"), "red"), (2L, d("1990-01-01"), "blue"),
      // key 1 already versioned once: 'gold' from 2000
      (1L, d("2000-01-01"), "gold"))
      .toDF("dk", "valid_from", "attr")
    // NEW versions: key 1 gets an OUT-OF-ORDER interior 'mid' at 1995
    // (splits [1990,2000) — facts in [1995,2000) must move red→mid,
    // facts before 1995 and after 2000 must NOT move); key 2 versions
    // normally at 1998
    val histNew = histOld.unionByName(Seq(
      (1L, d("1995-01-01"), "mid"), (2L, d("1998-01-01"), "navy"))
      .toDF("dk", "valid_from", "attr"))
    val factOld = Seq(
      (10L, 1L, d("1992-06-01"), 5.0),  // red, stays
      (11L, 1L, d("1996-06-01"), 7.0),  // red → mid (inside the split)
      (12L, 1L, d("2001-06-01"), 9.0),  // gold, stays
      (20L, 2L, d("1997-01-01"), 4.0),  // blue, stays
      (21L, 2L, d("1999-01-01"), 6.0))  // blue → navy
      .toDF("fid", "dk_ref", "ts", "v")
    val view0 = MaterializedView.buildTemporal(factOld, histOld,
      "dk_ref", "dk", "ts", "fid", Seq("attr"), Seq("v"))
    // fact deltas: a LATE fact dated inside the new interior window
    // (must land in 'mid'), and a retraction of fact 20
    val factFeed = Seq(
      (13L, 1L, d("1999-06-01"), 2.0, "insert"),
      (20L, 2L, d("1997-01-01"), 4.0, "delete"))
      .toDF("fid", "dk_ref", "ts", "v", "_change_type")
    val inc = MaterializedView.applyScd2Changes(view0, factFeed,
      factOld, histOld, histNew, "dk_ref", "dk", "ts", "fid",
      Seq("attr"), Seq("v"))
    val factNew = Seq(
      (10L, 1L, d("1992-06-01"), 5.0), (11L, 1L, d("1996-06-01"), 7.0),
      (12L, 1L, d("2001-06-01"), 9.0), (21L, 2L, d("1999-01-01"), 6.0),
      (13L, 1L, d("1999-06-01"), 2.0))
      .toDF("fid", "dk_ref", "ts", "v")
    val rebuilt = MaterializedView.buildTemporal(factNew, histNew,
      "dk_ref", "dk", "ts", "fid", Seq("attr"), Seq("v"))
    def canon(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).longValueExact())).toSet
    assert(canon(inc) === canon(rebuilt))
    val m = canon(inc).map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m("red") === ((1L, 5L)), "pre-split facts stay red")
    assert(m("mid") === ((2L, 9L)),
      "split-window fact MOVES and the late fact lands in mid")
    assert(m("gold") === ((1L, 9L)), "post-2000 facts untouched")
    assert(!m.contains("blue"), "retraction + re-version empty blue")
    assert(m("navy") === ((1L, 6L)))
    // an empty change set leaves the view bit-identical
    val noop = MaterializedView.applyScd2Changes(view0,
      factFeed.limit(0), factOld, histOld, histOld, "dk_ref", "dk",
      "ts", "fid", Seq("attr"), Seq("v"))
    assert(canon(noop) === canon(view0))
  }
}
