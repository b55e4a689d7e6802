package graft

import org.scalatest.funsuite.AnyFunSuite

/** C99 contracts: the planted max-skew QI cell is flagged (its EMD is
  * extreme), EMD stays in [0, 1e6], and a group whose distribution
  * matches the corpus scores near zero.
  */
class TClosenessSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  // sf0.01: QI cells carry ~12 members — enough that sampling EMD sits
  // well under the gate (at sf0.001 most cells are singletons, whose
  // one-point distributions legitimately fail t-closeness)
  private lazy val rows = SparkEntry
    .queries("c99_t_closeness")(s, sfDir("sf0.01"))
    .collect().map(r => ((r.getInt(0), r.getString(1)),
      (r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

  test("c99: the planted top-band cell fails t-closeness with an " +
    "extreme EMD; every EMD is a valid ppm") {
    val planted = rows((77, "PLANTED"))
    assert(!planted._3, s"planted skewed cell must be flagged: $planted")
    // all-mass-in-top-band EMD equals the mean corpus CDF over the
    // lower bands — ≈ 0.45 on this near-uniform balance distribution
    // (NOT 1.0: banded EMD's ceiling is distribution-shaped), well
    // clear of the t = 0.3 gate and the extreme of the table
    assert(planted._2 > 400000L,
      s"planted cell's EMD should be extreme, got ${planted._2} ppm")
    assert(planted._2 === rows.values.map(_._2).max,
      "the planted cell must carry the table's largest EMD")
    rows.values.foreach { case (_, emd, ok) =>
      assert(emd >= 0L && emd <= 1000000L, s"EMD out of range: $emd")
      assert(ok === (emd <= 300000L), "flag must equal the threshold rule")
    }
    // natural (nation, segment) cells sample the same balance
    // distribution — most must pass at t = 0.3
    val natural = rows.filter(_._1._2 != "PLANTED")
    assert(natural.values.count(_._3) * 10 >= natural.size * 9,
      "most natural QI cells should satisfy t-closeness")
  }
}
