package graft

import org.scalatest.funsuite.AnyFunSuite

/** C108/C109 contracts, including the r13 verdict's four-definition
  * consistency ask: the c103 plant (3 distinct bands, one dominant)
  * must PASS distinct-l at l=3 and FAIL evenness, entropy-l, and
  * recursive-(2,3) — each catching the skew distinct-l cannot see —
  * and the entropy verdict must be integer-bound-decided wherever the
  * Hill sandwich (N2 ≤ exp(H) ≤ N0) settles it.
  */
class DiversityAuditSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  // sf0.01: the sf0.001 customer slice has no indeterminate-band PASS
  // group, and the fallback-adjudicates-both-ways assertion below needs
  // one (the table is ~1.5k rows — spec cost is negligible)
  private lazy val e = SparkEntry
    .queries("c108_entropy_l_audit")(s, sfDir("sf0.01")).cache()
  private lazy val r = SparkEntry
    .queries("c109_recursive_cl_audit")(s, sfDir("sf0.01")).cache()

  test("c108: the Hill sandwich is sound on every group, and the plant " +
    "fails entropy-l through the indeterminate band") {
    val rows = e.collect()
    rows.foreach { row =>
      val hill2 = row.getAs[Long]("hill2_lb_ppm")
      val hill0 = row.getAs[Long]("hill0_ub_ppm")
      assert(hill2 <= hill0,
        s"Hill sandwich inverted: N2=$hill2 > N0=$hill0 at $row")
      // bound-decided rows must agree with the bound that decided them
      if (hill2 >= 3000000L)
        assert(row.getAs[Boolean]("entropy_l_ok"), s"N2-pass violated: $row")
      if (hill0 < 3000000L)
        assert(!row.getAs[Boolean]("entropy_l_ok"), s"N0-fail violated: $row")
    }
    val plant = rows.find(_.getAs[String]("c_mktsegment") == "PLANTED2").get
    assert(plant.getAs[Long]("l_distinct") === 3L,
      "the plant must still PASS distinct-l (that's the point)")
    assert(!plant.getAs[Boolean]("bound_decided"),
      "the plant must fall in the indeterminate band (N2 < l ≤ N0)")
    assert(!plant.getAs[Boolean]("entropy_l_ok"),
      "the skewed plant must fail entropy-l")
    assert(plant.getAs[Long]("entropy_e4") < 10987L)
    // the fallback band must also adjudicate PASSES (not just the plant)
    assert(rows.exists(x => !x.getAs[Boolean]("bound_decided") &&
      x.getAs[Boolean]("entropy_l_ok")),
      "no indeterminate-band pass anywhere — fallback path half-tested")
    assert(rows.exists(_.getAs[Boolean]("bound_decided")),
      "no bound-decided group anywhere — sandwich path untested")
  }

  test("c109: recursive-(2,3) catches the plant, agrees with the raw " +
    "counts, and the four definitions adjudicate the plant consistently") {
    val rows = r.collect()
    rows.foreach { row =>
      assert(row.getAs[Boolean]("rcl_ok") ===
        (row.getAs[Long]("r1_cnt") < 2L * row.getAs[Long]("tail_sum")),
        s"rcl verdict disagrees with its own counts: $row")
    }
    val plant = rows.find(_.getAs[String]("c_mktsegment") == "PLANTED2").get
    assert(plant.getAs[Boolean]("distinct_ok"),
      "the plant must pass distinct-l")
    assert(!plant.getAs[Boolean]("rcl_ok"),
      "the dominant-value plant must fail recursive-(2,3)")
    // four-definition consistency on the SAME plant: distinct-l passes;
    // evenness (c103's inverse-Simpson, re-read here as c108's N2
    // bound), entropy-l, and recursive-(c,l) all fail
    val plantE = e.collect()
      .find(_.getAs[String]("c_mktsegment") == "PLANTED2").get
    assert(plantE.getAs[Long]("hill2_lb_ppm") < 3000000L,
      "evenness (Hill-2) must fail the plant")
    assert(!plantE.getAs[Boolean]("entropy_l_ok"))
    assert(rows.exists(x => x.getAs[Boolean]("rcl_ok")),
      "no group passes recursive-(2,3) — the audit is vacuous")
  }
}
