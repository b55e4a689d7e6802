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
}
