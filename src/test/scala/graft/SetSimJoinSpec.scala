package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SetSimJoin

class SetSimJoinSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def jac(a: String, b: String): Double = {
    val sa = a.trim.toLowerCase.split("\\s+").toSet
    val sb = b.trim.toLowerCase.split("\\s+").toSet
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  // deterministic synthetic names over a small vocabulary → dense
  // similarity structure exercising prefixes of every length
  private lazy val rows: Seq[(Long, String)] = {
    val vocab = Vector("red", "green", "blue", "pale", "dark", "mint",
      "rose", "navy", "plum", "sand")
    (0L until 60L).map { i =>
      val k = 2 + (i % 4).toInt // 2..5 tokens
      val words = (0 to k).map(j => vocab(((i * 7 + j * 3) % 10).toInt))
      (i, words.mkString(" "))
    }
  }

  test("prefix-filtered join equals the brute-force pair set EXACTLY") {
    Seq(0.5, 0.6, 0.8).foreach { theta =>
      val expect = (for {
        (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
        j = jac(ta, tb) if j >= theta
      } yield (ia, ib)).toSet
      val got = SetSimJoin.jaccardSelfJoin(
          rows.toDF("id", "name"), "id", "name", theta)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expect, s"pair set diverged at theta=$theta")
    }
  }

  test("jaccard values are the exact set ratios") {
    val got = SetSimJoin.jaccardSelfJoin(
        rows.toDF("id", "name"), "id", "name", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val byId = rows.toMap
    got.foreach { case ((a, b), j) =>
      assert(j === jac(byId(a), byId(b)), s"pair ($a,$b)")
    }
  }

  test("boundary: a pair at exactly theta is kept") {
    // {a b c} vs {a b d}: jaccard 2/4 = 0.5
    val df = Seq((1L, "a b c"), (2L, "a b d")).toDF("id", "name")
    val at = SetSimJoin.jaccardSelfJoin(df, "id", "name", 0.5).count()
    assert(at === 1L)
    val above = SetSimJoin.jaccardSelfJoin(df, "id", "name", 0.51).count()
    assert(above === 0L)
  }

  test("blocking is an equi-join on prefix tokens, never a cross join") {
    val p = SetSimJoin.jaccardSelfJoin(
        rows.toDF("id", "name"), "id", "name", 0.6)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"set-similarity join must never nest loops:\n${p.take(600)}")
  }
}
