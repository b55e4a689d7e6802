package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected Catalyst rule (graft.plans.RangeJoinRewrite, registered
  * via GraftExtensions in the shared test session) must turn a naive
  * non-equi BETWEEN join into the bucketed equi-join — and must leave
  * plans alone whenever Spark already has a better answer.
  */
class RangeJoinRewriteSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def points = (1L to 2000L).map(i => (i, i % 97)).toDF("pid", "x")
  private def intervals = Seq(
    (0L, 0L, 9L), (1L, 5L, 30L), (2L, 50L, 96L), (3L, 0L, 96L))
    .toDF("iid", "lo", "hi")

  private def naiveJoin = points.join(intervals,
    col("x") >= col("lo") && col("x") <= col("hi"))

  private def withThreshold[T](v: String)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("custom expressions are SQL functions in the default session") {
    // the same codegen expressions the Column API exposes, via spark.sql —
    // registered by GraftExtensions, so any SQL client gets them
    val sh = spark.sql(
      "SELECT simhash64(array('the', 'quick', 'fox')) AS h").head.getLong(0)
    val sh2 = spark.sql(
      "SELECT simhash64(array('the', 'quick', 'fox')) AS h").head.getLong(0)
    assert(sh === sh2)
    assert(sh !== 0L)

    val cos = spark.sql(
      """SELECT float_cosine(CAST(array(1.0, 0.0) AS array<float>),
        |                    CAST(array(1.0, 0.0) AS array<float>)) AS c"""
        .stripMargin).head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-9)

    val j = spark.sql(
      """SELECT sorted_jaccard(shingle_hashes(array('a','b','c','d'), 2),
        |                      shingle_hashes(array('a','b','c','d'), 2)) AS j"""
        .stripMargin).head.getDouble(0)
    assert(j === 1.0)

    // build a sketch with the Column API, interrogate it from SQL
    import graft.operators.Sketches
    spark.range(1, 1001).select(col("id").cast("double").as("v"))
      .agg(Sketches.tdigestSketch(col("v")).as("sk"))
      .createOrReplaceTempView("sk_view")
    val med = spark.sql(
      "SELECT tdigest_quantiles(sk, 0.5)[0] AS m FROM sk_view")
      .head.getDouble(0)
    assert(math.abs(med - 500.0) < 15.0, s"median estimate $med")
  }

  test("non-broadcastable BETWEEN join rewrites to a bucketed equi-join") {
    withThreshold("-1") {
      val df = naiveJoin
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"rule did not fire:\n${plan.take(800)}")
      assert(plan.contains("__graft_bucket"), plan.take(800))
      // values identical to the un-rewritten join
      val expected = withThreshold("64m") {
        naiveJoin.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      }
      val got = df.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === expected)
      assert(got.distinct.size === got.size, "pairs must appear exactly once")
    }
  }

  test("rule skips when one side broadcasts (BNLJ is the right plan)") {
    withThreshold("64m") {
      val plan = naiveJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_bucket"), plan.take(600))
    }
  }

  test("rule skips joins that already have an equi key") {
    withThreshold("-1") {
      val l = (1L to 500L).map(i => (i % 5, i)).toDF("k", "v")
      val r = (1L to 100L).map(i => (i % 5, i, i + 10)).toDF("k", "lo", "hi")
      val plan = l.join(r, l("k") === r("k") &&
          l("v") >= r("lo") && l("v") <= r("hi"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_bucket"), plan.take(600))
    }
  }

  test("strict bounds and reversed operand order still rewrite correctly") {
    withThreshold("-1") {
      val df = points.join(intervals,
        col("lo") < col("x") && col("hi") > col("x"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_bucket"), plan.take(600))
      val expected = withThreshold("64m") {
        points.join(intervals, col("lo") < col("x") && col("hi") > col("x"))
          .count()
      }
      assert(df.count() === expected)
    }
  }
}
