package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the physical-plan properties the 100 TB story depends on — a
  * regression here is invisible to value-correctness checks but fatal at
  * scale (a filter that stops pushing, a dim that stops broadcasting).
  */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir())
      .queryExecution.executedPlan.toString

  test("q3: filters push to parquet scans; top-k is TakeOrdered") {
    val p = plan("q3_join_topk")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"), p.take(500))
    assert(p.contains("GreaterThan(l_shipdate"), "lineitem date filter must push")
    assert(p.contains("TakeOrderedAndProject"), "limit+sort must not global-sort")
  }

  test("q5: every dimension joins via broadcast, no sort-merge") {
    val p = plan("q5_star_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(500))
    assert(!p.contains("SortMergeJoin"))
  }

  test("c6: corpus scan reads only id+vector; merge is a partial window") {
    val p = plan("c6_cosine_topk")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
      "column pruning through the scoring join must reach the scan")
    assert(p.contains("WindowGroupLimit"), "rank filter must pre-limit groups")
    assert(p.contains("MapPartitions"), "per-partition top-k heap must be in the plan")
  }

  test("a10 roundtrip read prunes partitions from the discovery scan") {
    val p = plan("a10_partitioned_sink")
    assert(p.contains("PartitionFilters"), p.take(500))
  }
}
