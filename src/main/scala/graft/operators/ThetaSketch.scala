package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable distinct-count sketch with SET OPERATIONS (B63) — the
  * k-minimum-values / theta family (Beyer et al. 2007 "On synopses for
  * distinct-value estimation under multiset operations"; the Apache
  * DataSketches theta design). The engine's HLL surfaces (B20/B24)
  * union and estimate but cannot INTERSECT — yet "how many users are in
  * segment A AND segment B" is the audience-overlap question every
  * analytics deployment asks. KMV keeps the k smallest distinct hash
  * values of the key stream; because the retained set is a pure
  * function of the INPUT SET (the k smallest of a set do not depend on
  * order or multiplicity), merge is exact-by-construction:
  * kmin(A ∪ B) == merge(kmin(A), kmin(B)) bit-for-bit, which makes
  * re-aggregating per-shard/per-day partials safe at any merge shape —
  * the same contract the t-digest and HLL ride, here with EQUALITY
  * instead of a bound (spec-locked).
  *
  * Estimation: hashes map to (0, 1] as unsigned fractions; with the
  * sketch full, theta = the k-th smallest fraction and
  * distinct ≈ (k−1)/theta (the order-statistics estimator — unbiased,
  * RSE ≈ 1/√(k−2)); below k entries the sketch IS the set and the
  * count is exact. Intersection follows the theta rule: cut both
  * retained sets at th = min(theta_A, theta_B); every surviving hash is
  * a uniform rate-th sample of its set, so |A∩B| ≈ |common below th|/th.
  *
  * At 100 TB: per-group state is ≤ k longs (k=512 → 4 KB), built
  * map-side, merged associatively; the pairwise report touches only
  * GROUP-sized sketch rows. The b63 gate computes the exact overlaps
  * NEXT TO the estimates (the c63 recall-report pattern — you keep the
  * calibration query around precisely because at full scale only the
  * sketch is affordable) and checks the error bounds as booleans, the
  * b22 style: deterministic at fixed hash + fixed data, not flaky.
  */
object ThetaSketch {

  /** Aggregate a pre-hashed long column (use `xxhash64(key)`) into a
    * serialized KMV sketch.
    */
  def kmvSketch(hashed: Column, k: Int = 512): Column =
    udaf(new KmvBuildAgg(k), Encoders.scalaLong).apply(hashed)

  /** Merge stored sketches (binary column) into one. */
  def kmvMerge(sketch: Column, k: Int = 512): Column =
    udaf(new KmvMergeAgg(k), Encoders.BINARY).apply(sketch)
}

/** Bounded k-min-values state: at most k DISTINCT hash values, smallest
  * by UNSIGNED order. Stored sign-bit-FLIPPED (h ^ Long.MinValue), so
  * the TreeSet's natural signed order IS the unsigned hash order — no
  * custom comparator to trip kryo.
  */
final class KmvSketch(val k: Int) extends Serializable {
  require(k >= 16, s"k $k too small for a stable estimator")
  private val flipped = new java.util.TreeSet[java.lang.Long]()

  def size: Int = flipped.size

  def add(h: Long): Unit = {
    val f = h ^ Long.MinValue
    if (flipped.size < k) { flipped.add(f); () }
    else if (f < flipped.last) {
      if (flipped.add(f)) { flipped.remove(flipped.last); () }
    }
  }

  def merge(o: KmvSketch): KmvSketch = {
    // The exact-merge contract (kmin(A∪B) == merge of partials) only
    // holds at EQUAL k: folding a smaller-k sketch under a larger-k
    // aggregator would leave the result under-filled with theta=1.0 and
    // estimate() silently returning the truncated retained-set size.
    // Fail loudly instead (r11 advice) — mixed-k stores are a config bug.
    require(
      o.k == k,
      s"KMV merge requires equal k: this sketch k=$k, other k=${o.k}")
    val it = o.flipped.iterator()
    while (it.hasNext) add(it.next() ^ Long.MinValue)
    this
  }

  /** Retained hashes (unflipped) in ascending unsigned order. */
  def values: Array[Long] = {
    val out = new Array[Long](flipped.size)
    val it = flipped.iterator()
    var i = 0
    while (i < flipped.size) { out(i) = it.next() ^ Long.MinValue; i += 1 }
    out
  }

  /** The sampling rate: k-th smallest hash as a fraction of the hash
    * space when full, 1.0 while the sketch is still exact.
    */
  def theta: Double =
    if (flipped.size < k) 1.0
    else KmvSketch.frac(flipped.last ^ Long.MinValue)

  /** Distinct estimate: exact below k, (k−1)/theta at capacity. */
  def estimate: Double =
    if (flipped.size < k) flipped.size.toDouble
    else (k - 1).toDouble / theta

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * flipped.size)
    bb.putInt(k); bb.putInt(flipped.size)
    val it = flipped.iterator()
    while (it.hasNext) bb.putLong(it.next() ^ Long.MinValue)
    bb.array()
  }
}

object KmvSketch {
  private val TwoPow64 = 18446744073709551616.0

  /** Unsigned long → (0, 1] fraction of the hash space. */
  private[operators] def frac(h: Long): Double = {
    val u = if (h >= 0) h.toDouble else h.toDouble + TwoPow64
    math.max(u / TwoPow64, java.lang.Double.MIN_VALUE)
  }

  def deserialize(bytes: Array[Byte]): KmvSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new KmvSketch(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  /** Theta intersection: cut both retained sets at th = min(theta); the
    * survivors present in BOTH are a rate-th uniform sample of A∩B.
    */
  def intersectEstimate(a: KmvSketch, b: KmvSketch): Double = {
    val th = math.min(a.theta, b.theta)
    val bSet = new java.util.HashSet[java.lang.Long]()
    b.values.foreach(h => bSet.add(h))
    var hits = 0
    a.values.foreach { h =>
      if ((th == 1.0 || frac(h) < th) && bSet.contains(h)) hits += 1
    }
    hits / th
  }

  /** Union estimate via the exact-by-construction merge. */
  def unionEstimate(a: KmvSketch, b: KmvSketch): Double =
    deserialize(a.serialize()).merge(b).estimate

  /** The intersection cut rate — exposed so callers can express the
    * estimator's own error bound (hits are Binomial(|A∩B|, th)).
    */
  def thetaMin(a: KmvSketch, b: KmvSketch): Double =
    math.min(a.theta, b.theta)

  /** Set-difference estimate |A \ B| (B64): cut both at th = min(theta);
    * A's survivors below th that are NOT retained by B are a rate-th
    * sample of A \ B — DataSketches' a-not-b, same cut rule as the
    * intersection.
    */
  def aNotBEstimate(a: KmvSketch, b: KmvSketch): Double = {
    val th = thetaMin(a, b)
    val bSet = new java.util.HashSet[java.lang.Long]()
    b.values.foreach(h => bSet.add(h))
    var hits = 0
    a.values.foreach { h =>
      if ((th == 1.0 || frac(h) < th) && !bSet.contains(h)) hits += 1
    }
    hits / th
  }
}

class KmvBuildAgg(k: Int) extends Aggregator[Long, KmvSketch, Array[Byte]] {
  def zero: KmvSketch = new KmvSketch(k)
  def reduce(b: KmvSketch, h: Long): KmvSketch = { b.add(h); b }
  def merge(b1: KmvSketch, b2: KmvSketch): KmvSketch = b1.merge(b2)
  def finish(r: KmvSketch): Array[Byte] = r.serialize()
  def bufferEncoder: Encoder[KmvSketch] = Encoders.kryo[KmvSketch]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

class KmvMergeAgg(k: Int)
    extends Aggregator[Array[Byte], KmvSketch, Array[Byte]] {
  def zero: KmvSketch = new KmvSketch(k)
  def reduce(b: KmvSketch, bytes: Array[Byte]): KmvSketch =
    b.merge(KmvSketch.deserialize(bytes))
  def merge(b1: KmvSketch, b2: KmvSketch): KmvSketch = b1.merge(b2)
  def finish(r: KmvSketch): Array[Byte] = r.serialize()
  def bufferEncoder: Encoder[KmvSketch] = Encoders.kryo[KmvSketch]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
