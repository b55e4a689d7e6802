package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomDedup

/** The bloom contract: NEVER a false negative (regardless of how the
  * build was partitioned — the partial sketches bit-OR merge), false
  * positives within the calibrated rate, and a deterministic sketch.
  */
class BloomDedupSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("no false negatives under any build partitioning; fp rate bounded") {
    val ref = (1L to 2000L).map(i => s"doc-$i").toDF("k")
    val bloom = BloomDedup.bloomOf(ref, col("k"), 2000L, fpp = 0.01)
    // probe = all 2000 members + 2000 guaranteed non-members
    val probe = ((1L to 2000L).map(i => (s"doc-$i", true)) ++
      (1L to 2000L).map(i => (s"novel-$i", false))).toDF("k", "member")
    val flagged = BloomDedup.flagOverlap(probe, col("k"), bloom)
    val missed = flagged.where(col("member") && !col("maybe_seen")).count()
    assert(missed === 0L, "a bloom filter must never miss a true member")
    val fps = flagged.where(!col("member") && col("maybe_seen")).count()
    assert(fps <= 100L, s"fp count $fps far above the 1% calibration")

    // adversarial partitioning: merge order of the partial sketches
    // must not change a single bit
    val bloom2 = BloomDedup.bloomOf(ref.repartition(17).orderBy(desc("k")),
      col("k"), 2000L, fpp = 0.01)
    assert(java.util.Arrays.equals(bloom, bloom2),
      "sketch must be partition- and order-invariant")
  }

  test("bitsFor: monotone in items, floor applied") {
    assert(BloomDedup.bitsFor(1L, 0.5) === 64L)
    val b1 = BloomDedup.bitsFor(1000L, 0.01)
    val b2 = BloomDedup.bitsFor(10000L, 0.01)
    assert(b1 < b2 && b1 > 9000L, s"~9.6 bits/key at 1% fpp, got $b1")
  }
}
