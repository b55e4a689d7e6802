package graft

import org.scalatest.funsuite.AnyFunSuite

/** C102 contracts: the planted wholesale drift fires the rebuild gate,
  * the same-distribution control does not, and the TV/share columns
  * are valid ppm with the drift strictly separating the scenarios.
  */
class ReindexGateSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  private lazy val rows = SparkEntry.queries("c102_reindex_gate")(s, sfDir())
    .collect().map(r => r.getString(0) ->
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap

  test("c102: orthant-collapsed arrivals fire the rebuild gate; " +
    "same-distribution arrivals do not") {
    val (tvD, _, _, rebuildD) = rows("drifted")
    val (tvS, _, _, rebuildS) = rows("stable")
    assert(rebuildD && tvD > 200000L,
      s"planted drift must fire the gate (tv=$tvD)")
    assert(!rebuildS && tvS <= 200000L,
      s"stable arrivals must not fire the gate (tv=$tvS)")
    assert(tvD > tvS,
      s"drift must exceed the sampling-noise control ($tvD vs $tvS)")
    rows.values.foreach { case (tv, shareR, shareN, _) =>
      assert(tv >= 0L && tv <= 1000000L, s"TV out of ppm range: $tv")
      // a max share below 1/16 of the mass is arithmetically impossible
      assert(shareR >= 62500L && shareR <= 1000000L)
      assert(shareN >= 62500L && shareN <= 1000000L)
    }
  }

  private lazy val c107 = SparkEntry
    .queries("c107_cross_version_gate")(s, sfDir())
    .collect().map(r => r.getAs[String]("scenario") -> r).toMap

  test("c107: the STORED-code gate fires on drifted arrivals and not " +
    "on stable ones, and the v2 rebuild rebalances what the frozen v1 " +
    "cells saw as concentration") {
    val d = c107("drifted")
    val st = c107("stable")
    assert(d.getAs[Boolean]("rebuild") && d.getAs[Long]("tv_ppm") > 200000L,
      s"drift must fire the gate: $d")
    assert(!st.getAs[Boolean]("rebuild"),
      s"stable arrivals must not fire the gate: $st")
    assert(d.getAs[Long]("tv_ppm") > st.getAs[Long]("tv_ppm"))
    // the rebuilt (v2) index adapts its cells to the T2 corpus: its
    // worst cell share must sit BELOW the drifted arrivals' share
    // under the frozen v1 frame
    assert(d.getAs[Long]("max_share_v2_ppm") <
      d.getAs[Long]("max_share_new_ppm"),
      s"v2 rebuild failed to rebalance: $d")
    // iv2 holds the FULL T2 corpus in both scenarios
    Seq(d, st).foreach { r =>
      assert(r.getAs[Long]("n_v2") ===
        r.getAs[Long]("n_ref") + r.getAs[Long]("n_new"), r.toString)
    }
  }
}
