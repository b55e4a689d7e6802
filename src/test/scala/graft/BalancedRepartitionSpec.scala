package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BalancedRepartition

class BalancedRepartitionSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("row invariance, including null partition keys") {
    val df = Seq(("a", 1), ("a", 2), (null, 3), (null, 4), ("b", 5))
      .toDF("k", "v")
    val out = BalancedRepartition(df, Seq("k"), rowsPerFile = 2L)
    assert(out.count() === 5L) // inner EqualTo join would drop the 2 nulls
    assert(out.where(col("k").isNull).count() === 2L)
    assert(out.columns.toSeq === Seq("k", "v"))
  }

  test("per-key counts preserved on real data") {
    val li = Tables(spark, sfDir(), "lineitem")
    val out = BalancedRepartition(li, Seq("l_returnflag"), rowsPerFile = 500L)
    val before = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = out.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after === before)
  }

  test("groups are balanced: max reducer input stays near rowsPerFile") {
    val li = Tables(spark, sfDir(), "lineitem")
    val rowsPerFile = 500L
    val out = BalancedRepartition(li, Seq("l_returnflag"), rowsPerFile)
    val perPart = out
      .groupBy(spark_partition_id().as("pid"), col("l_returnflag"))
      .count().collect().map(_.getLong(2))
    // content-hash salt ⇒ near-binomial group sizes; two groups can share a
    // reducer (hash collision), so allow 2× + statistical slack
    assert(perPart.max <= 2 * rowsPerFile + 200,
      s"max group ${perPart.max} for target $rowsPerFile")
    // and the layout actually spreads: expected ≈ sum(ceil(n_k/rowsPerFile))
    val expectedGroups = li.groupBy("l_returnflag").count()
      .collect().map(r => math.max(1L, math.ceil(r.getLong(1).toDouble / rowsPerFile).toLong)).sum
    assert(perPart.length >= expectedGroups / 2)
  }

  test("high-cardinality partition column fails fast, never OOMs the driver") {
    val li = Tables(spark, sfDir(), "lineitem")
    val e = intercept[IllegalArgumentException] {
      BalancedRepartition(li, Seq("l_orderkey"), rowsPerFile = 10L, maxKeys = 50)
    }
    assert(e.getMessage.contains("low-cardinality"))
  }

  test("saltedInnerJoin preserves exact row multiplicity under skew") {
    // heavy skew: key 1 dominates; include duplicate large-side rows
    val large = ((1 to 1000).map(_ => (1L, "dup")) ++
      Seq((2L, "x"), (2L, "x"), (3L, "y"))).toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "name")
    val salted = graft.operators.SkewJoin.saltedInnerJoin(large, small, "k", salts = 8)
    val plain = large.join(small, "k")
    assert(salted.count() === plain.count()) // 1000 + 2 matches
    assert(salted.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === Map(1L -> 1000L, 2L -> 2L))
    // and the hot key actually spreads across salt groups — random salt
    // spreads even bit-identical duplicate rows
    val spread = large.withColumn("__salt", (rand(42L) * 8).cast("int"))
      .where(col("k") === 1L).select("__salt").distinct().count()
    assert(spread >= 4L)
  }

  test("salting is deterministic across runs (retry/replay safety)") {
    val li = Tables(spark, sfDir(), "lineitem")
    def layout() = BalancedRepartition(li, Seq("l_returnflag"), 500L)
      .groupBy(spark_partition_id().as("pid"), col("l_returnflag"))
      .count().collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(layout() === layout())
  }
}
