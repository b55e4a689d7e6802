package graft

import org.scalatest.funsuite.AnyFunSuite

/** C103 contracts: the planted near-degenerate cell PASSES distinct-l
  * (three bands present) yet FAILS evenness — the separation that
  * justifies the Hill-N2 audit next to c94 — and the Simpson pair is
  * arithmetically consistent.
  */
class EvennessSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  // sf0.01: the planted cell's two rare bands need custkey % 169 hits,
  // which a 150-customer sf0.001 table doesn't contain
  private lazy val rows = SparkEntry
    .queries("c103_evenness_audit")(s, sfDir("sf0.01"))
    .collect().map(r => ((r.getInt(0), r.getString(1)),
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getBoolean(6)))).toMap

  test("c103: the planted cell is 3-diverse by count yet fails " +
    "evenness; Simpson columns are consistent ppm") {
    val (n, lDist, simpson, eff, ok) = rows((88, "PLANTED2"))
    assert(lDist >= 3L,
      s"the plant must PASS distinct-l to make the point (l=$lDist)")
    assert(!ok && eff < 3000000L,
      s"the plant must FAIL evenness (eff=$eff ppm)")
    assert(simpson > 500000L,
      s"an attacker's match odds on the plant should exceed 50% " +
        s"(simpson=$simpson ppm)")
    assert(n >= 100L)
    rows.values.foreach { case (nn, l, sp, ef, okk) =>
      // 1/l <= simpson <= 1 and 1 <= eff <= l, in ppm, by definition
      assert(sp >= 1000000L / l - 1 && sp <= 1000000L)
      assert(ef >= 1000000L - 1 && ef <= l * 1000000L + l)
      assert(okk === (ef >= 3000000L))
      assert(nn >= 1L)
    }
  }
}
