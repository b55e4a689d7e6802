package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable-sketch surface: HyperLogLog++ distinct counts and
  * Greenwald-Khanna approximate percentiles. Both are partial-aggregable
  * (map-side sketches merge associatively), which is what makes them the
  * 100 TB answer where exact distinct/percentile needs a full shuffle of
  * the key universe. Accuracy is probabilistic, so they are spec-gated
  * against the exact answers rather than DuckDB-hashed.
  */
class SketchSpec extends AnyFunSuite with SparkSpec {

  private lazy val li = Tables(spark, sfDir(), "lineitem")

  test("HLL++ distinct count lands within its rsd bound") {
    val r = li.agg(
      countDistinct("l_partkey").as("exact"),
      approx_count_distinct("l_partkey", 0.02).as("approx")).head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.06, s"exact=$exact approx=$approx err=$err (3x rsd 0.02)")
  }

  test("GK approximate median sits within rank tolerance of the exact one") {
    val vals = li.select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    val approx = li.agg(percentile_approx(col("l_extendedprice"), lit(0.5),
      lit(1000)).as("p")).head.getDouble(0)
    // rank of the approx answer must be within n/accuracy of n/2
    val rank = vals.count(_ <= approx)
    val tol = math.max(1, vals.length / 1000) * 3
    assert(math.abs(rank - vals.length / 2) <= tol,
      s"median rank $rank of ${vals.length}, tol $tol")
  }

  test("sketches merge: per-group partials equal the direct global sketch") {
    // same sketch computed globally vs merged from a pre-aggregation by
    // an unrelated key — HLL registers are deterministic, so equality is
    // exact, proving the partial-merge path (the scale path) is exercised
    val direct = li.agg(approx_count_distinct("l_partkey").as("d")).head.getLong(0)
    val viaGroups = li.repartition(13, col("l_returnflag"))
      .agg(approx_count_distinct("l_partkey").as("d")).head.getLong(0)
    assert(direct === viaGroups)
  }
}
