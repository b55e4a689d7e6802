package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExpressions
import graft.sources.{DataSkipping, ZOrder}

/** Z-order clustering: the z-value expression routes buckets and
  * interleaves bits exactly as specified (equal-to-boundary goes up,
  * null dims bucket 0), the clustered write is result-neutral, and the
  * payoff is measurable — under a two-column predicate the z layout
  * reads STRICTLY fewer files than a linear sort of the leading key.
  */
class ZOrderSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val bounds2 =
    Array(Array(1.0, 2.0, 3.0), Array(10.0, 20.0, 30.0))

  private def z2(a: Any, b: Any): Long =
    Seq(1).toDF("one")
      .select(GraftExpressions.zValue(
        array(lit(a).cast("double"), lit(b).cast("double")),
        bounds2, bits = 2).as("z"))
      .as[Long].first()

  // independent statement of the contract: bucket = #boundaries <= v
  // (equal goes up), z bit (i*dims + c) = bit i of dim c's bucket
  private def refZ(buckets: Int*): Long = {
    var z = 0L
    for (c <- buckets.indices; i <- 0 until 2)
      z |= ((buckets(c) >> i) & 1L) << (i * buckets.size + c)
    z
  }

  test("zValue: bucket routing, boundary ties, bit interleave") {
    // all 4x4 bucket combinations, values chosen inside each bucket
    val dim0 = Seq(0.5 -> 0, 1.5 -> 1, 2.5 -> 2, 3.5 -> 3)
    val dim1 = Seq(5.0 -> 0, 15.0 -> 1, 25.0 -> 2, 35.0 -> 3)
    for ((v0, b0) <- dim0; (v1, b1) <- dim1)
      assert(z2(v0, v1) === refZ(b0, b1), s"($v0, $v1)")
    // a value EQUAL to a boundary belongs to the upper bucket
    assert(z2(2.0, 10.0) === refZ(2, 1))
    // below-all and above-all clamp to the edge buckets
    assert(z2(-99.0, 99.0) === refZ(0, 3))
    // null dimension buckets to 0 (nulls-first), the row is not lost
    assert(z2(null, 25.0) === refZ(0, 2))
  }

  test("zValue: adjacent buckets differ in few interleaved bits " +
       "(locality), z is monotone per dimension at fixed other dims") {
    // fixing dim1, z must be non-decreasing in dim0's bucket
    val zs = Seq(0.5, 1.5, 2.5, 3.5).map(v => z2(v, 15.0))
    assert(zs === zs.sorted)
    val zs1 = Seq(5.0, 15.0, 25.0, 35.0).map(v => z2(1.5, v))
    assert(zs1 === zs1.sorted)
  }

  test("equi-depth boundaries: sorted, deduplicated, bounded count") {
    val df = Tables(spark, sfDir("sf0.01"), "lineitem")
      .select(col("l_extendedprice").as("p"), col("l_quantity").as("q"))
    val b = ZOrder.boundaries(df, Seq("p", "q"), bits = 4)
    assert(b.length === 2)
    b.foreach { arr =>
      assert(arr.length <= 15)
      assert(arr.toSeq === arr.toSeq.sorted)
      assert(arr.toSeq.distinct.size === arr.length)
    }
    // quantity has few distinct values (1..50) — dedup must have fired
    // without breaking order; price is continuous — near-full boundary set
    assert(b(0).length >= 10)
  }

  test("clusteredWrite is result-neutral and beats the linear layout " +
       "under a two-column predicate") {
    val li = Tables(spark, sfDir("sf0.01"), "lineitem").select(
      col("l_orderkey"),
      unix_date(col("l_shipdate").cast("date")).as("shipdays"),
      col("l_extendedprice").as("price"))
    val linBase = Tables.scratch("zorder_lin")
    val zBase = Tables.scratch("zorder_z")
    li.repartitionByRange(16, col("shipdays"))
      .sortWithinPartitions("shipdays")
      .write.mode("overwrite").parquet(linBase)
    ZOrder.clusteredWrite(li, Seq("shipdays", "price"), zBase,
      numFiles = 16)

    // result-neutral: same multiset of rows in both layouts
    val key = pmod(
      xxhash64(col("l_orderkey"), col("shipdays"), col("price")),
      lit(1000000007L)) // mod keeps the 60k-row sum inside ANSI long range
    val h1 = spark.read.parquet(zBase)
      .agg(sum(key), count(lit(1))).as[(Long, Long)].first()
    val h2 = li.agg(sum(key), count(lit(1))).as[(Long, Long)].first()
    assert(h1 === h2, "z-ordered copy must hold exactly the source rows")

    val zoneCols = Seq("shipdays", "price")
    val stLin = DataSkipping.collectStats(spark, linBase, zoneCols).toDF
    val stZ = DataSkipping.collectStats(spark, zBase, zoneCols).toDF
    val dLo = java.time.LocalDate.parse("1996-01-01").toEpochDay
    val dHi = java.time.LocalDate.parse("1997-08-31").toEpochDay
    val ranges = Seq(
      DataSkipping.LongRange("shipdays", dLo, dHi),
      DataSkipping.DoubleRange("price", 26000.0, 52000.0))
    val prLin = DataSkipping.readPrunedMulti(spark, linBase, stLin, ranges)
    val prZ = DataSkipping.readPrunedMulti(spark, zBase, stZ, ranges)

    // the pruned read sees every matching row (count equality vs source)
    val expect = li.where(col("shipdays").between(dLo, dHi) &&
      col("price").between(26000.0, 52000.0)).count()
    val got = prZ.df.where(col("shipdays").between(dLo, dHi) &&
      col("price").between(26000.0, 52000.0)).count()
    assert(got === expect)
    assert(expect > 0L, "probe predicate must be non-empty to mean anything")

    // 2-D probe must skip something while reading something
    assert(prZ.report.filesSkipped > 0 && prZ.report.filesRead > 0)
    // the payoff, isolated: a predicate on the NON-LEADING column. The
    // date-sorted layout spans the full price domain in every file — it
    // can prune nothing; the z layout gives price its bit share.
    val priceOnly = Seq(DataSkipping.DoubleRange("price", 26000.0, 52000.0))
    val pLin = DataSkipping.readPrunedMulti(spark, linBase, stLin, priceOnly)
    val pZ = DataSkipping.readPrunedMulti(spark, zBase, stZ, priceOnly)
    assert(pLin.report.filesSkipped === 0,
      "a linear date sort must be unable to prune on price")
    assert(pZ.report.filesRead < pLin.report.filesRead,
      s"z-order must read strictly fewer files on the second dim " +
        s"(z=${pZ.report.filesRead}, linear=${pLin.report.filesRead})")
    // and the 2-D read never does worse than the price-only read
    assert(prZ.report.filesRead <= pZ.report.filesRead)
  }

  test("readPrunedMulti: any conjunct alone may skip a file") {
    val dir = Tables.scratch("zorder_multi")
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Seq((100L, 1.0), (200L, 2.0)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val st = DataSkipping.collectStats(spark, dir, Seq("k", "v")).toDF
    // k-range disjoint from file 2, v-range covers all: file 2 skipped
    val pr = DataSkipping.readPrunedMulti(spark, dir, st, Seq(
      DataSkipping.LongRange("k", 0L, 50L),
      DataSkipping.DoubleRange("v", 0.0, 10.0)))
    assert(pr.report.filesSkipped === 1 && pr.report.filesRead === 1)
    // both ranges cover everything: nothing skipped
    val all = DataSkipping.readPrunedMulti(spark, dir, st, Seq(
      DataSkipping.LongRange("k", 0L, 500L),
      DataSkipping.DoubleRange("v", 0.0, 10.0)))
    assert(all.report.filesSkipped === 0)
  }
}
