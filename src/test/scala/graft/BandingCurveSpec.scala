package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** C101 contracts on the MEASURED candidacy column (engine-native XXH64
  * signatures — no cross-engine twin, the c83 split): candidacy is
  * monotone in the band count at every bucket, exact at the endpoints,
  * and tracks the S-curve theory where the bucket carries enough pairs.
  */
class BandingCurveSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  private lazy val rows = Dedup
    .minhashBandingCurve(Tables(s, sfDir(), "documents"), "text", "doc_id")
    .collect().map(r => ((r.getInt(0), r.getLong(1)),
      (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap

  test("c101: candidacy is monotone non-decreasing in bands at every " +
    "bucket, and exact at both endpoints") {
    val buckets = rows.keys.map(_._2).toSeq.distinct.sorted
    val bandsGrid = rows.keys.map(_._1).toSeq.distinct.sorted
    assert(bandsGrid === Seq(4, 8, 16, 32))
    buckets.foreach { bk =>
      val curve = bandsGrid.map(b => rows((b, bk))._4)
      curve.sliding(2).foreach { case Seq(lo, hi) =>
        assert(hi >= lo,
          s"bucket $bk: candidacy fell from $lo to $hi as bands grew")
      }
    }
    // full-overlap pairs (bucket 19) have IDENTICAL signatures: every
    // banding is a certain candidate
    val top = buckets.max
    bandsGrid.foreach { b =>
      assert(rows((b, top))._4 === 1000000L,
        s"bands=$b must always catch identical-signature pairs")
    }
    // disjoint pairs under the WIDEST rows-per-band (b=4, r=16): the
    // S-curve theory at j≈0 is ~0 — measured candidacy must be rare
    assert(rows((4, buckets.min))._4 <= 50000L,
      "b=4 banding should almost never fire on disjoint pairs")
  }

  test("c101: measured candidacy tracks the S-curve theory on " +
    "well-populated buckets") {
    rows.foreach { case ((b, bk), (nPairs, _, theory, cand)) =>
      if (nPairs >= 50) {
        val diff = math.abs(cand - math.round(theory * 1000000L))
        assert(diff <= 150000L,
          s"bands=$b bucket=$bk: measured $cand vs theory " +
            s"${math.round(theory * 1e6)} (n=$nPairs) off by $diff ppm")
      }
    }
  }
}
