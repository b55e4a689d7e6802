package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable-sketch surface: HyperLogLog++ distinct counts and
  * Greenwald-Khanna approximate percentiles. Both are partial-aggregable
  * (map-side sketches merge associatively), which is what makes them the
  * 100 TB answer where exact distinct/percentile needs a full shuffle of
  * the key universe. Accuracy is probabilistic, so they are spec-gated
  * against the exact answers rather than DuckDB-hashed.
  */
class SketchSpec extends AnyFunSuite with SparkSpec {

  private lazy val li = Tables(spark, sfDir(), "lineitem")

  test("HLL++ distinct count lands within its rsd bound") {
    val r = li.agg(
      countDistinct("l_partkey").as("exact"),
      approx_count_distinct("l_partkey", 0.02).as("approx")).head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.06, s"exact=$exact approx=$approx err=$err (3x rsd 0.02)")
  }

  test("GK approximate median sits within rank tolerance of the exact one") {
    val vals = li.select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    val approx = li.agg(percentile_approx(col("l_extendedprice"), lit(0.5),
      lit(1000)).as("p")).head.getDouble(0)
    // rank of the approx answer must be within n/accuracy of n/2
    val rank = vals.count(_ <= approx)
    val tol = math.max(1, vals.length / 1000) * 3
    assert(math.abs(rank - vals.length / 2) <= tol,
      s"median rank $rank of ${vals.length}, tol $tol")
  }

  // ---- t-digest (graft's own mergeable quantile sketch, B20) ----------

  private def rankErr(vals: Array[Double], est: Double, q: Double): Double = {
    val rank = vals.count(_ <= est).toDouble / vals.length
    math.abs(rank - q)
  }

  test("t-digest: rank error within 1% across the quantile range") {
    import graft.operators.Sketches
    val vals = li.select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val est = li.repartition(7) // force a real distributed merge tree
      .agg(Sketches.tdigestQuantiles(col("l_extendedprice"), qs, 200).as("e"))
      .head.getSeq[Double](0)
    qs.zip(est).foreach { case (q, e) =>
      val err = rankErr(vals, e, q)
      assert(err <= 0.01, s"q=$q est=$e rank error $err > 0.01")
    }
  }

  test("t-digest: per-group sketches merge to the global answer") {
    import graft.operators.Sketches
    val vals = li.select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    // shard → sketch bytes → re-aggregate the BYTES (the 100 TB shape:
    // daily partials merged without touching raw data)
    val perGroup = li.groupBy("l_returnflag")
      .agg(Sketches.tdigestSketch(col("l_extendedprice"), 200).as("sk"))
    val merged = perGroup
      .agg(Sketches.tdigestMerge(col("sk"), 200).as("sk"))
      .select(Sketches.quantilesFromSketch(col("sk"), Seq(0.1, 0.5, 0.9)))
      .head.getSeq[Double](0)
    Seq(0.1, 0.5, 0.9).zip(merged).foreach { case (q, e) =>
      val err = rankErr(vals, e, q)
      assert(err <= 0.015, s"merged q=$q est=$e rank error $err > 0.015")
    }
  }

  test("t-digest: state stays KB-bounded regardless of input size") {
    import graft.operators.Sketches
    val sk = li.agg(Sketches.tdigestSketch(col("l_extendedprice"), 200).as("s"))
      .head.getAs[Array[Byte]](0)
    // ≤ ~2δ centroids × 16 bytes + 12-byte header: the whole point of the
    // sketch — per-group state independent of group size
    assert(sk.length <= 2 * 200 * 16 + 12, s"sketch ${sk.length} bytes")
    val d = graft.operators.TDigest.deserialize(sk)
    assert(math.abs(d.total - li.count()) < 0.5, "total weight = row count")
  }

  test("t-digest: heavy ties and tails stay monotone and in-range") {
    import graft.operators.Sketches
    // l_quantity: ~50 distinct integer values over thousands of rows —
    // the tie-heavy distribution that breaks naive centroid interpolation
    val vals = li.select(col("l_quantity").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    val qs = Seq(0.001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999)
    val est = li.repartition(5)
      .agg(Sketches.tdigestQuantiles(col("l_quantity").cast("double"),
        qs, 200).as("e")).head.getSeq[Double](0)
    est.sliding(2).foreach { case Seq(a, b) =>
      assert(a <= b + 1e-9, s"quantile estimates must be monotone: $est")
    }
    est.foreach { e =>
      assert(e >= vals.head - 1e-9 && e <= vals.last + 1e-9,
        s"estimate $e outside data range [${vals.head}, ${vals.last}]")
    }
    // tie-aware rank error: a tied value OWNS a rank interval
    // [rank(<v)/n, rank(<=v)/n]; the estimate is exact if q lands inside
    // it (plain rank error would charge the digest the whole tie mass)
    qs.zip(est).foreach { case (q, e) =>
      val lo = vals.count(_ < e).toDouble / vals.length
      val hi = vals.count(_ <= e).toDouble / vals.length
      val err = if (q < lo) lo - q else if (q > hi) q - hi else 0.0
      assert(err <= 0.02, s"q=$q est=$e rank span [$lo,$hi] under ties")
    }
  }

  test("profileWithQuantiles: one scan, digest quartiles within bounds") {
    import graft.operators.Profile
    val out = Profile.profileWithQuantiles(li,
      Seq("l_extendedprice", "l_returnflag")).collect()
      .map(r => r.getString(0) -> r).toMap
    val price = out("l_extendedprice")
    val vals = li.select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    Seq(0.25 -> price.getDouble(6), 0.5 -> price.getDouble(7),
      0.75 -> price.getDouble(8)).foreach { case (q, est) =>
      val err = rankErr(vals, est, q)
      assert(err <= 0.015, s"q=$q est=$est rank error $err")
    }
    val flag = out("l_returnflag")
    assert(flag.isNullAt(6) && flag.isNullAt(7) && flag.isNullAt(8),
      "non-numeric columns must carry null quartiles")
    assert(flag.getLong(2) === 0L) // no nulls in the fixture column
  }

  test("CmsHeavyHitters: exact heavy set, contract booleans, partition-invariant") {
    val s = spark
    import s.implicits._
    // 1000 'hot' (=7), 100 each of 3 warm keys, 300 singletons
    val rows = Seq.fill(1000)(7L) ++
      (1 to 3).flatMap(k => Seq.fill(100)(k.toLong)) ++
      (1000L to 1299L)
    val df = rows.toDF("k")
    val out = graft.operators.CmsHeavyHitters(df, "k", minShare = 0.05)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2), r.getBoolean(3))).toMap
    // N = 1600, threshold = 80: hot + the three warm keys qualify
    assert(out.keySet === Set(7L, 1L, 2L, 3L))
    assert(out(7L)._1 === 1000L && out(1L)._1 === 100L)
    assert(out.values.forall(v => v._2 && v._3), s"CMS contract violated: $out")
    // sketch counters are sums — the estimate cannot depend on layout
    val repartitioned = graft.operators.CmsHeavyHitters(
      df.repartition(17, col("k")), "k", minShare = 0.05)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(repartitioned === out.view.mapValues(_._1).toMap)
  }

  test("sketches merge: per-group partials equal the direct global sketch") {
    // same sketch computed globally vs merged from a pre-aggregation by
    // an unrelated key — HLL registers are deterministic, so equality is
    // exact, proving the partial-merge path (the scale path) is exercised
    val direct = li.agg(approx_count_distinct("l_partkey").as("d")).head.getLong(0)
    val viaGroups = li.repartition(13, col("l_returnflag"))
      .agg(approx_count_distinct("l_partkey").as("d")).head.getLong(0)
    assert(direct === viaGroups)
  }

  test("b63 KMV theta: planted-overlap estimates within bounds; merge of " +
    "sketches EQUALS the sketch of the union bit-for-bit; order and " +
    "multiplicity invariant; exact below k") {
    import graft.operators.{KmvSketch, ThetaSketch}
    val s2 = spark
    import s2.implicits._
    val k = 512
    // planted universes: A = 1..10000, B = 5001..15000 — overlap 5000
    val a = (1L to 10000L).toDF("key")
      .agg(ThetaSketch.kmvSketch(xxhash64(col("key")), k))
      .head.getAs[Array[Byte]](0)
    val b = (5001L to 15000L).toDF("key")
      .agg(ThetaSketch.kmvSketch(xxhash64(col("key")), k))
      .head.getAs[Array[Byte]](0)
    val (sa, sb) = (KmvSketch.deserialize(a), KmvSketch.deserialize(b))
    val rse = 1.0 / math.sqrt(k.toDouble)
    assert(math.abs(sa.estimate - 10000) <= 4 * rse * 10000,
      s"A estimate ${sa.estimate}")
    assert(math.abs(KmvSketch.unionEstimate(sa, sb) - 15000) <=
      4 * rse * 15000, s"union ${KmvSketch.unionEstimate(sa, sb)}")
    val estI = KmvSketch.intersectEstimate(sa, sb)
    val th = KmvSketch.thetaMin(sa, sb)
    assert(math.abs(estI - 5000) <= 5 * math.sqrt(5000 / th),
      s"intersection $estI at theta $th")
    // a-not-b (b64): |A \ B| = 5000 planted, same cut rule
    val estD = KmvSketch.aNotBEstimate(sa, sb)
    assert(math.abs(estD - 5000) <= 5 * math.sqrt(5000 / th),
      s"a-not-b $estD at theta $th")
    assert(math.abs(KmvSketch.aNotBEstimate(sb, sa) - 5000) <=
      5 * math.sqrt(5000 / th), "b-not-a")
    // merge(sketch(A), sketch(B)) == sketch(A ∪ B), BYTE-for-byte: the
    // k smallest of a set do not depend on how the set was assembled
    val direct = (1L to 15000L).toDF("key")
      .agg(ThetaSketch.kmvSketch(xxhash64(col("key")), k))
      .head.getAs[Array[Byte]](0)
    val merged = KmvSketch.deserialize(a).merge(sb).serialize()
    assert(java.util.Arrays.equals(merged, direct),
      "sketch merge must equal the union's sketch exactly")
    // order + multiplicity invariance: shuffled triplicated input,
    // different partitioning — identical bytes
    val noisy = (1L to 10000L).flatMap(x => Seq(x, x, x))
    val shuffled = new scala.util.Random(7).shuffle(noisy)
      .toDF("key").repartition(13)
      .agg(ThetaSketch.kmvSketch(xxhash64(col("key")), k))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(shuffled, a),
      "the sketch must be a pure function of the input SET")
    // below k the sketch IS the set: exact count, theta 1
    val tiny = (1L to 100L).toDF("key")
      .agg(ThetaSketch.kmvSketch(xxhash64(col("key")), k))
      .head.getAs[Array[Byte]](0)
    val st = KmvSketch.deserialize(tiny)
    assert(st.estimate === 100.0 && st.theta === 1.0)
    // kmvMerge re-aggregates STORED sketches (the per-shard rollup)
    val parts = Seq(a, b).toDF("sk")
      .agg(ThetaSketch.kmvMerge(col("sk"), k))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(parts, direct),
      "stored-sketch rollup must equal the union's sketch")
  }
}
