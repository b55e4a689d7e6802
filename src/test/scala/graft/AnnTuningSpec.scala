package graft

import org.scalatest.funsuite.AnyFunSuite

/** C98 contracts: recall and scan cost are monotone in nProbe, the
  * full-probe setting is exhaustive (recall 100%), and the c63 recall
  * report is exactly this curve's nProbe=2 point.
  */
class AnnTuningSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  private lazy val curve = SparkEntry
    .queries("c98_ann_tuning_curve")(s, sfDir())
    .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
    .sortBy(_._1)

  test("c98: recall and codes scanned are monotone non-decreasing in " +
    "nProbe, and probing every cell is exhaustive (recall = 100%)") {
    assert(curve.map(_._1).toSeq === Seq(1, 2, 4, 8, 16))
    curve.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._6 >= lo._6,
        s"recall fell from ${lo._6} (np=${lo._1}) to ${hi._6} (np=${hi._1})")
      assert(hi._3 >= lo._3, "codes scanned must grow with nProbe")
      assert(hi._2 > lo._2, "cells touched must grow with nProbe")
    }
    val full = curve.last
    assert(full._6 === 1000000L,
      s"probing all 16 cells must be exhaustive, recall=${full._6}")
    assert(full._5 === full._4, "exhaustive probe must hit every truth row")
  }

  test("c98: the c63 recall report is this curve's nProbe=2 point") {
    val c63 = SparkEntry.queries("c63_ann_recall")(s, sfDir())
      .collect()
    val hits63 = c63.map(_.getLong(2)).sum
    val exact63 = c63.map(_.getLong(1)).sum
    val np2 = curve.find(_._1 == 2).get
    assert(np2._5 === hits63 && np2._4 === exact63,
      s"curve nProbe=2 (hit=${np2._5}/${np2._4}) diverged from c63 " +
        s"($hits63/$exact63)")
  }
}
