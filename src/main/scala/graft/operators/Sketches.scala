package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile sketch: a t-digest-style centroid digest usable as a
  * regular aggregate in `groupBy().agg()` (Dunning & Ertl, "Computing
  * extremely accurate quantiles using t-digests", arXiv:1902.04023 — the
  * merging-digest variant).
  *
  * Why this exists at 100 TB: exact percentiles (B12) need every value of a
  * group on one reducer — a full shuffle of the value universe, and a
  * straggler when one group is hot. The digest is a few-KB bounded state
  * that builds map-side, merges associatively (partial aggregation — the
  * same contract HLL++ rides), and answers any quantile after the fact.
  * Three surfaces, mirroring the DataSketches/BigQuery pattern:
  *
  *   - [[Sketches.tdigestSketch]]:  values  → binary sketch (store/reuse)
  *   - [[Sketches.tdigestMerge]]:   sketches → merged sketch (re-aggregate
  *     per-shard/per-day partials without touching raw data)
  *   - [[Sketches.tdigestQuantiles]]: values → quantiles directly
  *   - [[Sketches.quantilesFromSketch]]: scalar extraction from a stored
  *     sketch column (runs once per GROUP row, not per input row)
  *
  * Accuracy: rank error is bounded by the k₁ scale function — centroids
  * near the median hold ≤ ~2/δ of the mass (δ = compression), tails are
  * tighter (asin scale → centroid q-width ∝ √(q(1-q))). Distributed merge
  * order can shift estimates within that bound but never outside it, which
  * is why the correctness gate (b20) checks the rank-error bound, not
  * bit-equality. Accuracy + merge-path bounds are spec'd in `SketchSpec`
  * against B12's exact percentiles.
  */
object Sketches {

  /** Aggregate a double column into a serialized t-digest. */
  def tdigestSketch(c: Column, compression: Int = 200): Column =
    udaf(new TDigestBuildAgg(compression), Encoders.scalaDouble)
      .apply(c)

  /** Merge a column of serialized t-digests into one. */
  def tdigestMerge(c: Column, compression: Int = 200): Column =
    udaf(new TDigestMergeAgg(compression), Encoders.BINARY).apply(c)

  /** Aggregate a double column straight to `array<double>` quantiles. */
  def tdigestQuantiles(c: Column, qs: Seq[Double],
                       compression: Int = 200): Column =
    udaf(new TDigestQuantilesAgg(compression, qs), Encoders.scalaDouble)
      .apply(c)

  /** Scalar: quantiles out of a stored sketch column. A Catalyst expression
    * (interpreted eval) — extraction runs once per GROUP row, never in a
    * per-input-row hot path, so codegen would buy nothing.
    */
  def quantilesFromSketch(sketch: Column, qs: Seq[Double]): Column = {
    import org.apache.spark.sql.classic.GraftColumnBridge
    GraftColumnBridge.column(
      TDigestQuantilesExpr(GraftColumnBridge.expression(sketch), qs))
  }
}

/** quantiles(sketch_bytes) → array<double>; null-safe, interpreted. */
case class TDigestQuantilesExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    qs: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantilesFromSketch expects binary, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val d = TDigest.deserialize(input.asInstanceOf[Array[Byte]])
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      qs.map(d.quantile).toArray)
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : TDigestQuantilesExpr = copy(child = newChild)
}

/** Merging t-digest. Mutable, Serializable (rides agg buffers via Kryo).
  * Raw values accumulate in a fixed buffer; when it fills, buffered values
  * and existing centroids are sorted and re-merged under the k₁ scale
  * constraint k(q_right) − k(q_left) ≤ 1 per centroid. State is bounded:
  * ≤ ~2δ centroids + the buffer, a few KB at δ=200 — per GROUP, regardless
  * of group size. That bound is the whole point.
  */
final class TDigest(val compression: Double) extends Serializable {
  import TDigest._

  var means: Array[Double] = Array.empty
  var weights: Array[Double] = Array.empty
  var total: Double = 0.0
  private var buf: Array[Double] = new Array[Double](BufSize)
  private var bufN: Int = 0

  def add(x: Double): Unit = {
    if (bufN == buf.length) compress()
    buf(bufN) = x; bufN += 1
  }

  def merge(o: TDigest): TDigest = {
    o.compress()
    var i = 0
    while (i < o.means.length) { // centroids re-enter as weighted points
      addCentroid(o.means(i), o.weights(i)); i += 1
    }
    this
  }

  private var extraM: Array[Double] = Array.empty
  private var extraW: Array[Double] = Array.empty
  private var extraN = 0

  private def addCentroid(m: Double, w: Double): Unit = {
    if (extraN == extraM.length) {
      val cap = math.max(32, extraN * 2)
      extraM = java.util.Arrays.copyOf(extraM, cap)
      extraW = java.util.Arrays.copyOf(extraW, cap)
    }
    extraM(extraN) = m; extraW(extraN) = w; extraN += 1
    if (extraN >= BufSize) compress()
  }

  /** k₁ scale: δ · (asin(2q−1)/π + 1/2). */
  private def kScale(q: Double): Double =
    compression * (math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)
      / math.Pi + 0.5)

  def compress(): Unit = {
    val n = means.length + bufN + extraN
    if (bufN == 0 && extraN == 0) return
    val m = new Array[Double](n)
    val w = new Array[Double](n)
    System.arraycopy(means, 0, m, 0, means.length)
    System.arraycopy(weights, 0, w, 0, means.length)
    var i = 0
    while (i < bufN) {
      m(means.length + i) = buf(i); w(means.length + i) = 1.0; i += 1
    }
    i = 0
    while (i < extraN) {
      m(means.length + bufN + i) = extraM(i)
      w(means.length + bufN + i) = extraW(i); i += 1
    }
    // sort pairs by mean (index sort then apply — n is small and bounded)
    val idx = (0 until n).sortBy(i => m(i))
    val sm = idx.map(i => m(i)).toArray
    val sw = idx.map(i => w(i)).toArray
    val newTotal = sw.sum
    val om = new Array[Double](n)
    val ow = new Array[Double](n)
    var out = 0
    var curM = sm(0); var curW = sw(0)
    var wSoFar = 0.0
    i = 1
    while (i < n) {
      val proposed = curW + sw(i)
      val q0 = wSoFar / newTotal
      val q2 = (wSoFar + proposed) / newTotal
      if (kScale(q2) - kScale(q0) <= 1.0) {
        // merge into current centroid (weighted mean)
        curM = curM + (sm(i) - curM) * sw(i) / proposed
        curW = proposed
      } else {
        om(out) = curM; ow(out) = curW; out += 1
        wSoFar += curW
        curM = sm(i); curW = sw(i)
      }
      i += 1
    }
    om(out) = curM; ow(out) = curW; out += 1
    means = java.util.Arrays.copyOf(om, out)
    weights = java.util.Arrays.copyOf(ow, out)
    total = newTotal
    bufN = 0; extraN = 0
    extraM = Array.empty; extraW = Array.empty
  }

  /** Quantile by linear interpolation between adjacent centroid means,
    * centroids treated as mass centered at their cumulative midpoint.
    */
  def quantile(q: Double): Double = {
    compress()
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val target = q * total
    // cumulative weight up to the MIDPOINT of centroid i
    var cum = 0.0
    var i = 0
    var prevMid = 0.0
    var prevMean = means(0)
    while (i < n) {
      val mid = cum + weights(i) / 2.0
      if (target <= mid) {
        if (i == 0) return means(0)
        val frac = (target - prevMid) / (mid - prevMid)
        return prevMean + (means(i) - prevMean) * frac
      }
      cum += weights(i)
      prevMid = mid; prevMean = means(i)
      i += 1
    }
    means(n - 1)
  }

  def serialize(): Array[Byte] = {
    compress()
    val n = means.length
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 16 * n)
    bb.putInt(n).putDouble(compression)
    var i = 0
    while (i < n) { bb.putDouble(means(i)); i += 1 }
    i = 0
    while (i < n) { bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  /** Unmerged-buffer size: compress cost amortizes over this many adds. */
  val BufSize = 512

  def deserialize(bytes: Array[Byte]): TDigest = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val d = new TDigest(bb.getDouble)
    d.means = Array.fill(n)(bb.getDouble)
    d.weights = Array.fill(n)(bb.getDouble)
    d.total = d.weights.sum
    d
  }
}

/** values → serialized sketch. */
class TDigestBuildAgg(compression: Int)
    extends Aggregator[Double, TDigest, Array[Byte]] {
  def zero: TDigest = new TDigest(compression)
  def reduce(b: TDigest, a: Double): TDigest = { b.add(a); b }
  def merge(b1: TDigest, b2: TDigest): TDigest = b1.merge(b2)
  def finish(r: TDigest): Array[Byte] = r.serialize()
  def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** serialized sketches → merged serialized sketch (re-aggregation). */
/** Heavy-hitter detection over a long key via Spark's built-in mergeable
  * count-min sketch (`functions.count_min_sketch` — map-side partials,
  * associative merge, eps/confidence-sized counter grid; Cormode &
  * Muthukrishnan 2005, public).
  *
  * 100 TB shape: the corpus-sized work is ONE pass building the sketch —
  * a constant-size (depth × width counters) partial per task, merged up;
  * no per-key shuffle touches the full key universe. Candidate heavy keys
  * are then probed against the sketch driver-side — the candidate set is
  * provably ≤ 1/minShare keys, a bounded collect by construction.
  *
  * This entry point doubles as its own correctness gate (the c7/c23
  * pattern for non-SQL-replicable state): alongside each heavy key's
  * exact count it emits the two CMS contract booleans — `est_ge_true`
  * (a count-min estimate NEVER undercounts — deterministic property) and
  * `err_within_eps` (overcount ≤ eps·N, holds with the configured
  * confidence; fixed seed + fixed data ⇒ stable across runs). The DuckDB
  * oracle computes the exact heavy-hitter set and expects both booleans
  * TRUE; a sketch regression flips a boolean and fails the hash compare.
  */
object CmsHeavyHitters {
  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  def apply(df: DataFrame, keyCol: String, minShare: Double,
            eps: Double = 0.0001, confidence: Double = 0.999,
            seed: Int = 42): DataFrame = {
    require(minShare > 0 && minShare <= 1, "minShare in (0, 1]")
    val spark = df.sparkSession
    val key = col(keyCol).cast("long")
    // one distributed pass: sketch bytes + total count together
    val agg = df.agg(
      count_min_sketch(key, lit(eps), lit(confidence), lit(seed)).as("cms"),
      count(key).as("n")).head()
    val bytes = agg.getAs[Array[Byte]](0)
    val n = agg.getLong(1)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    probe(df, keyCol, minShare, cms, n, eps)
  }

  /** Probe a PRE-BUILT sketch (e.g. merged from streaming shard state —
    * D12) against the exact heavy set of `df`, emitting the same contract
    * booleans as the one-pass form.
    */
  def probe(df: DataFrame, keyCol: String, minShare: Double,
            cms: org.apache.spark.util.sketch.CountMinSketch, n: Long,
            eps: Double): DataFrame = {
    require(minShare > 0 && minShare <= 1, "minShare in (0, 1]")
    val spark = df.sparkSession
    val key = col(keyCol).cast("long")
    // exact candidate counts: bounded by construction (≤ 1/minShare heavy
    // keys can exist); the limit+require makes the bound loud, not trusted
    val maxKeys = math.ceil(1.0 / minShare).toInt
    val threshold = math.ceil(minShare * n).toLong
    // null keys are outside the contract on BOTH passes: the sketch agg
    // and count(key) above skip nulls, so the exact side must too
    val heavy = df.where(key.isNotNull).groupBy(key.as("item"))
      .agg(count(lit(1)).as("true_cnt"))
      .where(col("true_cnt") >= threshold)
      .limit(maxKeys + 1).collect()
    require(heavy.length <= maxKeys,
      s"CmsHeavyHitters: > $maxKeys keys above share $minShare — impossible " +
        "unless the share threshold was applied to a different total")
    val out = heavy.map { r =>
      val item = r.getLong(0); val trueCnt = r.getLong(1)
      val est = cms.estimateCount(java.lang.Long.valueOf(item))
      Row(item, trueCnt, est >= trueCnt,
        est <= trueCnt + math.ceil(eps * n).toLong)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(out: _*),
      StructType(Seq(
        StructField("item", LongType),
        StructField("true_cnt", LongType, nullable = false),
        StructField("est_ge_true", BooleanType, nullable = false),
        StructField("err_within_eps", BooleanType, nullable = false))))
  }
}

class TDigestMergeAgg(compression: Int)
    extends Aggregator[Array[Byte], TDigest, Array[Byte]] {
  def zero: TDigest = new TDigest(compression)
  def reduce(b: TDigest, a: Array[Byte]): TDigest =
    if (a == null) b else b.merge(TDigest.deserialize(a))
  def merge(b1: TDigest, b2: TDigest): TDigest = b1.merge(b2)
  def finish(r: TDigest): Array[Byte] = r.serialize()
  def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** values → quantiles directly (no stored sketch). */
class TDigestQuantilesAgg(compression: Int, qs: Seq[Double])
    extends Aggregator[Double, TDigest, Seq[Double]] {
  def zero: TDigest = new TDigest(compression)
  def reduce(b: TDigest, a: Double): TDigest = { b.add(a); b }
  def merge(b1: TDigest, b2: TDigest): TDigest = b1.merge(b2)
  def finish(r: TDigest): Seq[Double] = qs.map(r.quantile)
  def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
