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
}
