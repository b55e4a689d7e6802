package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Audio, ImageDedup}

/** C128/C129 contracts: cross pairs only (increment-internal dups
  * never pair — two variants of the same reference image pair in the
  * SELF-join but must not appear in the cross output), the planted
  * cross relations are recovered, and the stored-reference path equals
  * the computed-reference path bit-for-bit (the stores round-trip
  * integer codes exactly).
  */
class IncrementalMediaPairsSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  test("c128: image cross pairs — planted re-encodes and brightness " +
    "shifts pair with their reference originals; variant-vs-variant " +
    "(increment-internal) pairs are excluded; stored-ref ≡ computed-ref") {
    val docs = Tables(s, sfDir(), "documents").select("doc_id").limit(60)
    val packed = ImageDedup.packImageVariants(s, docs, "doc_id").cache()
    val refCodes = ImageDedup.blockhashCodes(s,
      packed.where(col("media_id") < 2000000L)).cache()
    val incCodes = ImageDedup.blockhashCodes(s,
      packed.where(col("media_id") >= 2000000L)).cache()
    val cross = ImageDedup.perceptualCrossPairs(refCodes, incCodes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross.nonEmpty, "no planted cross pairs found")
    // every cross pair has ref < 2e6 and inc >= 2e6 BY OUTPUT SHAPE;
    // the planted relation: variant media v pairs with its source
    // doc's hero (v % 1e6 = the source doc id)
    cross.foreach { case (a, b) =>
      assert(a < 2000000L && b >= 2000000L, s"side leak: ($a, $b)")
    }
    // the variant pair (2e6+d, 3e6+d) exists in the SELF-join (both
    // are codes of the same source pixels ± brightness) but must NOT
    // appear here — neither as (ref, inc) nor reversed
    val self = ImageDedup.perceptualPairs(
        refCodes.unionByName(incCodes))
      .where(col("id_a") >= 2000000L)
      .count()
    assert(self > 0,
      "fixture broken: increment-internal pairs should exist self-side")
    assert(!cross.exists { case (a, _) => a >= 2000000L },
      "an increment-internal pair leaked into the cross output")
    // every re-encode (+2e6) pairs with its hero at hamming 0
    val reenc = incCodes.where(col("media_id") < 3000000L)
      .select("media_id").collect().map(_.getLong(0))
    assert(reenc.nonEmpty)
    reenc.foreach { v =>
      assert(cross.contains((v - 2000000L, v)),
        s"re-encode $v must pair with its hero ${v - 2000000L}")
    }
  }

  test("c129: audio cross pairs — planted re-masters pair with their " +
    "source clips under the duration block; within-reference pairs " +
    "are excluded") {
    val docs = Tables(s, sfDir(), "documents").select("doc_id")
      .where(col("doc_id") % 4 === 0).limit(56)
    val wavs = Audio.packWav(s, docs, "doc_id").cache()
    val inc = Audio.gainWav(s,
      wavs.where(pmod(col("media_id"), lit(7)) === 0)
        .withColumn("media_id", col("media_id") + lit(3000000L)))
    val refCodes = Audio.chainedLandmarkRows(s, wavs).cache()
    val incCodes = Audio.chainedLandmarkRows(s, inc).cache()
    val cross = Audio.chainedCrossPairsFromCodes(refCodes, incCodes, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross.nonEmpty, "no planted re-master pairs found")
    cross.foreach { case (a, b) =>
      assert(a < 3000000L && b >= 3000000L, s"side leak: ($a, $b)")
    }
    // the STRONG contract: cross ≡ the self-join over the union
    // restricted to the cross slice (the increment saw exactly the
    // pairs a full rebuild would have produced, at increment cost)
    val selfRestricted = Audio.chainedPairsFromCodes(
        refCodes.unionByName(incCodes), 4)
      .where(col("id_a") < 3000000L && col("id_b") >= 3000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross === selfRestricted,
      "cross pairs diverged from the restricted full self-join")
    // at least one planted source↔re-master pair survives the halving
    // (most do; the matcher is amplitude-invariant up to argmax ties)
    assert(cross.exists { case (a, b) => b - a == 3000000L },
      "no source↔re-master pair found at all")
  }
}
