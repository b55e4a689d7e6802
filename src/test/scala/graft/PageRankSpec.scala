package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

class PageRankSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def ranksOf(nodes: Seq[Long], edges: Seq[(Long, Long)],
                      iters: Int = 3): Map[Long, Double] = {
    val n = nodes.toDF("id")
    val e = edges.toDF("src", "dst")
    PageRank.pagerank(n, e, "id", "src", "dst", iters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("ring graph: uniform ranks, full mass conserved") {
    val n = 10L
    val edges = (0L until n).map(i => (i, (i + 1) % n))
    val r = ranksOf(0L until n, edges)
    r.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-12))
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // no dangling ⇒ no leak
  }

  test("star graph: hub outranks leaves; sources settle at (1-d)/n") {
    // 1..9 all point at 0; 0 points back at 1 (so nothing dangles)
    val edges = (1L to 9L).map(i => (i, 0L)) :+ (0L, 1L)
    val r = ranksOf(0L to 9L, edges)
    assert(r(0L) > r(2L) * 5, s"hub ${r(0L)} vs leaf ${r(2L)}")
    // leaves 2..9 have no in-edges... except from the hub to 1 only:
    // 2..9 receive nothing ⇒ exactly (1-d)/n after any # of iterations
    (2L to 9L).foreach(i => assert(math.abs(r(i) - 0.15 / 10) < 1e-12))
    assert(r(1L) > r(2L)) // 1 gets the hub's mass back
  }

  test("dangling nodes leak mass (documented non-normalized variant)") {
    // 0 -> 1, 1 dangles: total mass must drop below 1
    val r = ranksOf(Seq(0L, 1L), Seq((0L, 1L)))
    assert(r.values.sum < 1.0 - 1e-6)
    assert(r(1L) > r(0L)) // 1 still receives 0's contribution
  }

  test("warm start from the uniform vector ≡ cold start (exact identity)") {
    val nodes = (0L until 40L)
    val edges = nodes.flatMap(i => Seq((i, (i * 7 + 1) % 40), (i, (i * 3 + 2) % 40)))
    val n = nodes.toDF("id")
    val e = edges.toDF("src", "dst")
    val uniform = n.select(col("id"), lit(1.0 / 40).as("rank"))
    val cold = PageRank.pagerank(n, e, "id", "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val warm = PageRank.pagerankWarm(n, e, uniform, "id", "src", "dst",
        warmIters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    nodes.foreach(i => assert(math.abs(cold(i) - warm(i)) < 1e-15, s"node $i"))
  }

  test("warm start from a converged solution barely moves; nodes missing " +
    "from prevRanks start uniform") {
    val nodes = (0L until 30L)
    val edges = nodes.flatMap(i => Seq((i, (i * 11 + 1) % 30), (i, (i * 13 + 5) % 30)))
    val n = nodes.toDF("id")
    val e = edges.toDF("src", "dst")
    // 40 iterations ≈ the fixed point for d=0.85
    val converged = PageRank.pagerank(n, e, "id", "src", "dst", iters = 40)
    val moved = PageRank.pagerankWarm(n, e, converged, "id", "src", "dst",
        warmIters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val prev = converged.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val l1 = nodes.map(i => math.abs(moved(i) - prev(i))).sum
    assert(l1 < 1e-6, s"fixed point drifted by L1=$l1 after one warm round")
    // a node unknown to prevRanks gets the uniform start, not null/0
    val partial = converged.where(col("id") =!= 0L)
    val withNew = PageRank.pagerankWarm(n, e, partial, "id", "src", "dst",
        warmIters = 1)
    assert(withNew.where(col("rank").isNull).count() === 0L)
    assert(withNew.count() === 30L)
  }

  test("ranks are partition-invariant") {
    val nodes = (0L until 50L)
    val edges = nodes.flatMap(i => Seq((i, (i * 7 + 1) % 50), (i, (i * 3 + 2) % 50)))
    val n1 = nodes.toDF("id")
    val e1 = edges.toDF("src", "dst")
    val a = PageRank.pagerank(n1, e1, "id", "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = PageRank.pagerank(n1.repartition(7), e1.repartition(5),
        "id", "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    nodes.foreach(i => assert(math.abs(a(i) - b(i)) < 1e-12, s"node $i"))
  }

  test("change-feed trigger: attribute-only churn skips rank rounds " +
       "entirely; endpoint changes fire the warm rounds") {
    import graft.operators.Upsert
    val nodes = (0L until 8L).toDF("id")
    val edges = Seq((1L, (0L, 1L), "x"), (2L, (1L, 2L), "x"),
        (3L, (2L, 0L), "x"), (4L, (3L, 0L), "x"))
      .map { case (k, (s0, d), l) => (k, s0, d, l) }
      .toDF("edge_id", "src", "dst", "label")
    val prev = PageRank.pagerank(nodes, edges, "id", "src", "dst", iters = 3)

    // label-only update + an identical redelivery → feed has rows but
    // no structural change → result must be prev, bit-identical, with
    // NO rank rounds (the plan is a bare projection — no Join at all)
    val inert = edges.where(col("edge_id") === 1)
      .unionByName(edges.where(col("edge_id") === 2)
        .withColumn("label", lit("relabeled")))
    val m1 = Upsert.upsertWithChanges(edges, inert, Seq("edge_id"))
    assert(m1.changes.count() === 2) // pre+post for the relabel only
    val skipped = PageRank.pagerankFromChangeFeed(nodes, m1.merged, prev,
      m1.changes, "id", "src", "dst", warmIters = 2)
    // bit-identical to prev: had the trigger misfired, two more damped
    // rounds on this un-converged graph would move every rank
    assert(skipped.collect().toSet === prev.collect().toSet)
    val ifRoundsRan = PageRank.pagerankWarm(nodes, m1.merged, prev,
      "id", "src", "dst", warmIters = 2)
    assert(ifRoundsRan.collect().toSet !== prev.collect().toSet,
      "sanity: rounds WOULD have moved the ranks had they run")

    // endpoint-moving update (dst 0→3 on edge 4) → must fire and equal
    // a direct warm start over the merged edges
    val moved = edges.where(col("edge_id") === 4)
      .withColumn("dst", lit(3L))
    val m2 = Upsert.upsertWithChanges(edges, moved, Seq("edge_id"))
    val fired = PageRank.pagerankFromChangeFeed(nodes, m2.merged, prev,
      m2.changes, "id", "src", "dst", warmIters = 2)
    val direct = PageRank.pagerankWarm(nodes, m2.merged, prev,
      "id", "src", "dst", warmIters = 2)
    assert(fired.collect().toSet === direct.collect().toSet)

    // insert → fires too (ranks move off prev)
    val m3 = Upsert.upsertWithChanges(edges,
      Seq((9L, 3L, 1L, "new")).toDF("edge_id", "src", "dst", "label"),
      Seq("edge_id"))
    val fired3 = PageRank.pagerankFromChangeFeed(nodes, m3.merged, prev,
      m3.changes, "id", "src", "dst", warmIters = 2)
    assert(fired3.collect().toSet !== prev.collect().toSet)

    // delete → fires, and equals the direct warm start over the pruned set
    val m4 = Upsert.upsertWithChanges(edges, edges.limit(0),
      Seq("edge_id"), Some(Seq(4L).toDF("edge_id")))
    val fired4 = PageRank.pagerankFromChangeFeed(nodes, m4.merged, prev,
      m4.changes, "id", "src", "dst", warmIters = 2)
    val direct4 = PageRank.pagerankWarm(nodes, m4.merged, prev,
      "id", "src", "dst", warmIters = 2)
    assert(fired4.collect().toSet === direct4.collect().toSet)
  }
}
