package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExpressions, VectorFunctions}
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def fvec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  private def pad64(head: Double*): Seq[Float] =
    (head ++ Seq.fill(64 - head.length)(0.0)).map(_.toFloat)

  test("floatCosine matches the declarative higher-order-function cosine") {
    val emb = Tables(spark, sfDir(), "embeddings").limit(100)
    val both = emb.select(
      GraftExpressions.floatCosine(col("embedding"), reverse(col("embedding")))
        .as("fast"),
      VectorFunctions.cosine(col("embedding").cast("array<double>"),
        reverse(col("embedding")).cast("array<double>")).as("ref"))
    val maxDiff = both.select(max(abs(col("fast") - col("ref")))).head.getDouble(0)
    assert(maxDiff < 1e-9)
  }

  test("cosineTopK: hand-checkable tiny corpus") {
    val corpus = Seq(
      (0L, fvec(1, 0)), (1L, fvec(0.9, 0.1)), (2L, fvec(0, 1)),
      (3L, fvec(-1, 0))).toDF("vec_id", "embedding")
    val queries = Seq((100L, fvec(1, 0))).toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(corpus, queries, "vec_id", "embedding", k = 2)
      .orderBy("rnk").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 1L))
    assert(math.abs(out(0).getDouble(2) - 1.0) < 1e-9)
    assert(math.abs(out(1).getDouble(2) - 0.9 / math.sqrt(0.82)) < 1e-9)
  }

  test("cosineTopK partial top-k equals a full-window reference") {
    val emb = Tables(spark, sfDir(), "embeddings")
    val queries = emb.where(col("vec_id") < 8)
    val fast = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rnk")
    // reference: no partial top-k, plain global window
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    val ref = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        GraftExpressions.floatCosine(col("cv"), col("qv")).as("cos"))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
      .select("query_id", "neighbor_id", "rnk")
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
  }

  test("cosineTopK works with non-integral ids (heap degrades to window)") {
    val corpus = Seq(
      ("a", fvec(1, 0)), ("b", fvec(0.9, 0.1)), ("c", fvec(0, 1)))
      .toDF("vec_id", "embedding")
    val queries = Seq(("q1", fvec(1, 0))).toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(corpus, queries, "vec_id", "embedding", k = 2)
      .orderBy("rnk").collect()
    assert(out.map(_.getString(1)).toSeq === Seq("a", "b"))
  }

  test("lshTopK recall vs exact brute force is >= 0.9") {
    val emb = Tables(spark, sfDir(), "embeddings")
    val queries = emb.where(col("vec_id") < 8)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
    val nExact = exact.count()
    val hits = exact.intersect(approx).count()
    assert(nExact === 40L)
    assert(hits.toDouble / nExact >= 0.9, s"recall $hits/$nExact")
  }

  test("embeddingNearDupPairs finds non-identical near-dups (cos ≈ .995)") {
    val df = Seq(
      (1L, pad64(1.0)),           // e1
      (2L, pad64(1.0, 0.1)),      // cos(1,2) = 1/sqrt(1.01) ≈ 0.995
      (3L, pad64(0.0, 1.0)),      // orthogonal to 1
      (4L, pad64(0.0, 1.0, 0.1))  // cos(3,4) ≈ 0.995
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (3L, 4L)))
  }

  test("SimHash64Expr matches an independent reimplementation") {
    val tokens = Seq("hello", "world", "hello", "spark")
    val expected = {
      val votes = new Array[Int](64)
      tokens.foreach { t =>
        val h = XXH64.hashUTF8String(UTF8String.fromString(t), 42L)
        (0 until 64).foreach { b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        }
      }
      (0 until 64).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
    }
    val got = Seq(Tuple1(tokens)).toDF("toks")
      .select(GraftExpressions.simhash64(col("toks"))).head.getLong(0)
    assert(got === expected)
  }

  test("ivfTopK: full probe equals exact; partial probe keeps recall") {
    val emb = Tables(spark, sfDir(), "embeddings")
    val queries = emb.where(col("vec_id") < 8)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
    val full = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nLists = 16, nProbe = 16).select("query_id", "neighbor_id")
    assert(full.exceptAll(exact).isEmpty && exact.exceptAll(full).isEmpty)

    val partial = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nLists = 16, nProbe = 6).select("query_id", "neighbor_id")
    val hits = exact.intersect(partial).count()
    assert(hits.toDouble / 40.0 >= 0.5,
      s"partial-probe recall $hits/40 (uniform random vectors scatter " +
        "across lists; real clustered embeddings recall far higher)")
  }

  test("probeMasks covers the multi-probe Hamming ball") {
    val masks = Similarity.probeMasks(6, 2)
    assert(masks.length === 1 + 6 + 15)
    assert(masks.forall(m => Integer.bitCount(m) <= 2 && m < 64))
  }

  test("ivfTopK2: full probe equals exact; partial probe keeps recall") {
    val emb = Tables(spark, sfDir(), "embeddings")
    val queries = emb.where(col("vec_id") < 8)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
    val full = Similarity.ivfTopK2(emb, queries, "vec_id", "embedding",
      k = 5, l1 = 4, l2 = 4, probe1 = 4, probe2 = 16)
      .select("query_id", "neighbor_id")
    assert(full.exceptAll(exact).isEmpty && exact.exceptAll(full).isEmpty)

    val partial = Similarity.ivfTopK2(emb, queries, "vec_id", "embedding",
      k = 5, l1 = 4, l2 = 4, probe1 = 3, probe2 = 8)
      .select("query_id", "neighbor_id")
    val hits = exact.intersect(partial).count()
    assert(hits.toDouble / 40.0 >= 0.5,
      s"partial-probe recall $hits/40")
  }

  test("ivfTopK2 at 1024 leaves: constant codegen size, exact full probe, " +
       "partial-probe recall") {
    // sf0.1: 2000 vectors — enough corpus to populate 32×32 = 1024 leaves
    val emb = Tables(spark, sfDir("sf0.1"), "embeddings")
    val queries = emb.where(col("vec_id") < 8)
    val small = Similarity.ivfTopK2(emb, queries, "vec_id", "embedding",
      k = 5, l1 = 4, l2 = 4, probe1 = 2, probe2 = 4)
    val big = Similarity.ivfTopK2(emb, queries, "vec_id", "embedding",
      k = 5, l1 = 32, l2 = 32, probe1 = 16, probe2 = 512)
    // 64× the leaves must NOT grow the generated plan: the whole hierarchy
    // rides as one reference object. (Single-level ivfTopK enumerates a
    // literal struct per centroid — its plan string scales with nLists.)
    val smallLen = small.queryExecution.executedPlan.toString.length
    val bigLen = big.queryExecution.executedPlan.toString.length
    assert(bigLen <= smallLen * 11 / 10 + 500,
      s"plan grew with leaf count: $smallLen -> $bigLen chars")
    // full probe over all 32 cells / all leaves degenerates to exact
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
    val full = Similarity.ivfTopK2(emb, queries, "vec_id", "embedding",
      k = 5, l1 = 32, l2 = 32, probe1 = 32, probe2 = 1024)
      .select("query_id", "neighbor_id")
    assert(full.exceptAll(exact).isEmpty && exact.exceptAll(full).isEmpty)
    // half-the-index probe keeps recall (uniform random vectors are the
    // adversarial case for IVF — clustered real embeddings recall higher)
    val hits = exact.intersect(
      big.select("query_id", "neighbor_id")).count()
    assert(hits.toDouble / 40.0 >= 0.5, s"1024-leaf recall $hits/40")
  }

  test("pqTopK: corpus == codebook sample ranks exactly like brute-force L2") {
    // when the corpus is exactly the 16-vector codebook sample, every
    // vector encodes to itself (sub-distance 0 per subspace), so ADC
    // equals the true sum-of-subspace distances and the ranking is exact
    val emb = Tables(spark, sfDir(), "embeddings")
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id").cast("string"))
      .limit(16)
    val queries = emb.limit(3)
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      k = 5, m = 8, kCodes = 16).select("query_id", "neighbor_id", "rnk")
    // driver-side exact reference (16×3 pairs): sum of per-subspace L2s
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def subL2(a: Array[Float], b: Array[Float], j: Int): Double = {
      var s = 0.0
      (j * 8 until (j + 1) * 8).foreach { i =>
        val d = a(i).toDouble - b(i).toDouble; s += d * d
      }
      math.sqrt(s)
    }
    val qids = queries.collect().map(_.getLong(0))
    val expected = qids.flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(n => (q, n,
          BigDecimal((0 until 8).map(j => subL2(vecs(q), vecs(n), j)).sum)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy { case (_, n, d) => (d, n) }.take(5).zipWithIndex
        .map { case ((qq, n, _), i) => (qq, n, i + 1) }
    }.toSet
    val got = pq.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)
  }

  test("pqTopK: map-only compressed scan retrieves planted duplicates at rank 1") {
    // corpus = embeddings ∪ id-shifted exact copies (the c5 planting). A
    // copy encodes to the same m bytes as its original, and a query's own
    // code vector minimizes ADC by construction (code_j = argmin of the
    // query's LUT row j), so the copy MUST surface at rank 1 — the
    // retrieval contract that matters for near-dup search. (Plain top-k
    // recall on uniform random vectors is meaningless for any quantizer:
    // pairwise distances concentrate, so the true ranking is noise.)
    val emb = Tables(spark, sfDir(), "embeddings")
    val corpus = emb.unionByName(
      emb.withColumn("vec_id", col("vec_id") + lit(1000000L)))
    val queries = emb.where(col("vec_id") < 8)
    val pq = Similarity.pqTopK(corpus, queries, "vec_id", "embedding",
      k = 3, m = 8, kCodes = 16)
    // encoding is map-only: the only join in the plan is the broadcast
    // query side (compression contract: array<byte>, m per vector, is
    // locked by the exactness test above feeding ADC from codes alone)
    val plan = pq.queryExecution.executedPlan.toString
    assert("Join".r.findAllIn(plan).size <= 1, plan.take(800))
    val rank1 = pq.where(col("rnk") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 8L).foreach { q =>
      assert(rank1.get(q).contains(q + 1000000L),
        s"query $q rank-1 neighbor ${rank1.get(q)} != planted copy")
    }
  }

  test("ivfpqTopK: full probe equals the plain PQ scan; partial probe finds " +
       "planted copies in one cell") {
    val emb = Tables(spark, sfDir(), "embeddings")
    val queries = emb.where(col("vec_id") < 8)
    // full probe == pqTopK exactly (cell routing can't change a full scan)
    val full = Similarity.ivfpqTopK(emb, queries, "vec_id", "embedding",
      k = 5, nLists = 8, nProbe = 8).select("query_id", "neighbor_id", "rnk")
    val flat = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      k = 5).select("query_id", "neighbor_id", "rnk")
    assert(full.exceptAll(flat).isEmpty && flat.exceptAll(full).isEmpty)
    // partial probe: an exact copy shares its query's cell (identical
    // vector → identical assignment) and minimizes ADC → rank 1 even at
    // nProbe = 1
    val corpus = emb.unionByName(
      emb.withColumn("vec_id", col("vec_id") + lit(1000000L)))
    val rank1 = Similarity.ivfpqTopK(corpus, queries, "vec_id", "embedding",
      k = 3, nLists = 8, nProbe = 1)
      .where(col("rnk") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 8L).foreach { q =>
      assert(rank1.get(q).contains(q + 1000000L),
        s"query $q rank-1 ${rank1.get(q)} != planted copy at nProbe=1")
    }
  }

  test("ivfTopK2: assignment is joinless and codegen-compact") {
    val emb = Tables(spark, sfDir(), "embeddings")
    val queries = emb.where(col("vec_id") < 8)
    val out = Similarity.ivfTopK2(emb, queries, "vec_id", "embedding",
      k = 5, l1 = 4, l2 = 4, probe1 = 2, probe2 = 4)
    val plan = out.queryExecution.executedPlan.toString
    // the probe join is the ONLY join: corpus-side leaf assignment must
    // not join a centroid table
    assert("Join".r.findAllIn(plan).size <= 2, plan.take(800))
    // centroids ride as a reference object, not literal expressions: the
    // plan string must not enumerate centroid floats (ivfTopK's literal
    // form would) — one IvfLeafExpr marker instead
    assert(plan.contains("ivfleafexpr") || plan.contains("IvfLeafExpr") ||
      !plan.contains("0.0f"), plan.take(400))
  }

  test("ivfTopKMany ≡ per-query ivfTopK at every probe depth, and the " +
       "batched scan is joinless") {
    val emb = Tables(spark, sfDir(), "embeddings")
    val qs: Map[Long, Array[Float]] = emb.where(col("vec_id") < 8)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for (nProbe <- Seq(4, 16)) {
      val one = Similarity.ivfTopK(emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, nLists = 16, nProbe = nProbe)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      val many = Similarity.ivfTopKMany(emb, "vec_id", "embedding", qs,
          k = 5, nLists = 16, nProbe = nProbe)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      assert(many === one, s"nProbe=$nProbe: batched results must be " +
        "bit-identical to per-query calls")
    }
    // the batched plan has NO join: the query batch is a reference
    // object inside the generator expression, not a broadcast side
    val plan = Similarity.ivfTopKMany(emb, "vec_id", "embedding", qs,
      k = 5, nLists = 16, nProbe = 4).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"batched IVF must stay joinless:\n${plan.take(600)}")
    assert(plan.toLowerCase.contains("ivfscoremanyexpr"), plan.take(400))
  }

  test("ivfpqTopKMany ≡ per-query ivfpqTopK at every probe depth, " +
       "joinless compressed scan") {
    val emb = Tables(spark, sfDir(), "embeddings")
    val qs: Map[Long, Array[Float]] = emb.where(col("vec_id") < 5)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for (nProbe <- Seq(2, 8)) {
      val one = Similarity.ivfpqTopK(emb, emb.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 6, nLists = 8, nProbe = nProbe,
          m = 8, kCodes = 16)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      val many = Similarity.ivfpqTopKMany(emb, "vec_id", "embedding", qs,
          k = 6, nLists = 8, nProbe = nProbe, m = 8, kCodes = 16)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      assert(many === one, s"nProbe=$nProbe: batched IVFPQ must equal " +
        "per-query calls")
    }
    val plan = Similarity.ivfpqTopKMany(emb, "vec_id", "embedding", qs,
      k = 6, nLists = 8, nProbe = 2, m = 8, kCodes = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"batched IVFPQ must stay joinless:\n${plan.take(600)}")
    assert(plan.toLowerCase.contains("pqscoremanyexpr"), plan.take(400))
  }

  test("jlProject: integer-grid projection matches the direct definition, " +
    "duplicates map identically, planted near-dup stays nearest") {
    val emb = Tables(spark, sfDir(), "embeddings")
      .select("vec_id", "embedding")
    val signs = GraftExpressions.jlSigns(16, 64)
    val out = emb.select(col("vec_id"),
        GraftExpressions.jlProject(col("embedding"), signs).as("code"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    // direct definition over the collected floats
    val raw = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    raw.foreach { case (id, v) =>
      val exp = signs.map { row =>
        var acc = 0L
        (0 until math.min(v.length, row.length)).foreach { i =>
          acc += row(i) * math.floor(v(i).toDouble * 1024.0 + 0.5).toLong
        }
        acc
      }
      assert(out(id).toSeq === exp.toSeq, s"vec $id")
    }
    // identical input vectors yield identical codes (duplicate detection
    // survives the projection exactly)
    val dup = emb.limit(1)
      .select(lit(999999L).as("vec_id"), col("embedding"))
    val dupCode = dup.select(
        GraftExpressions.jlProject(col("embedding"), signs).as("code"))
      .head.getSeq[Long](0).toArray
    val origId = emb.limit(1).head.getLong(0)
    assert(dupCode.toSeq === out(origId).toSeq)
    // the JL guarantee is about DISTANCE RATIOS in expectation, not
    // per-pair ranks (k=16 has per-pair distortion up to several ×):
    // E[||R(a−b)||²/k] = ||a−b||² for the ±1 construction, so the mean
    // ratio over a fixed pair sample must sit near 1
    def dist2(a: Array[Long], b: Array[Long]): Double = {
      var s = 0.0
      (0 until a.length).foreach { i =>
        val d = (a(i) - b(i)).toDouble; s += d * d
      }
      s
    }
    val gridOf = raw.view.mapValues(v =>
      v.map(x => math.floor(x.toDouble * 1024.0 + 0.5))).toMap
    def gdist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      (0 until a.length).foreach { i => val d = a(i) - b(i); s += d * d }
      s
    }
    val idSeq = raw.keys.toSeq.sorted
    val ratios = for {
      ai <- idSeq.indices by 7
      bi <- (ai + 1) until idSeq.length by 13
      de = gdist2(gridOf(idSeq(ai)), gridOf(idSeq(bi))) if de > 0
    } yield dist2(out(idSeq(ai)), out(idSeq(bi))) / 16.0 / de
    assert(ratios.nonEmpty)
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2,
      s"mean distance ratio $mean drifted from the JL expectation")
    // a planted NEAR-duplicate (one grid step on 3 dims — tiny against
    // typical pair distances) must be the projected-space nearest
    // neighbor of its original: near-dup structure survives projection
    val v0 = raw(idSeq.head)
    val nd = v0.clone()
    nd(0) += 1.0f / 1024.0f; nd(7) -= 1.0f / 1024.0f; nd(31) += 1.0f / 1024.0f
    val ndCode = signs.map { row =>
      var acc = 0L
      (0 until math.min(nd.length, row.length)).foreach { i =>
        acc += row(i) * math.floor(nd(i).toDouble * 1024.0 + 0.5).toLong
      }
      acc
    }
    val nn = idSeq.minBy(id => dist2(ndCode, out(id)))
    assert(nn === idSeq.head,
      s"planted near-dup projects nearest to $nn, not its original")
  }

  test("intCellAssign matches the direct argmin with lowest-index ties, " +
    "and a planted duplicate always lands rank 1 through its own cell") {
    val emb = Tables(spark, sfDir(), "embeddings")
      .select("vec_id", "embedding")
    val signs = GraftExpressions.jlSigns(16, 64)
    val coded = emb.select(col("vec_id"),
      GraftExpressions.jlProject(col("embedding"), signs).as("code"))
    val cents = coded.where(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(_.getSeq[Long](1).toArray)
    val assigned = coded
      .withColumn("cell", GraftExpressions.intCellAssign(col("code"), cents))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getInt(2)))
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < math.min(a.length, b.length)) {
        val d = a(i) - b(i); acc += d * d; i += 1
      }
      acc
    }
    assigned.foreach { case (id, code, cell) =>
      val expect = cents.zipWithIndex
        .map { case (ct, ci) => (d2(code, ct), ci) }.min._2
      assert(cell === expect, s"vec $id cell")
    }
    // the IVF no-lost-duplicate contract, exactly checkable because
    // everything is integer: a duplicate vector gets the identical code
    // (JlProject is pure), hence the identical cell; and every vector's
    // 4-cell probe list CONTAINS its own assigned cell (the assigned
    // cell IS the argmin centroid — probe rank 1), so a duplicate can
    // never be lost to cell pruning and lands at dist 0, rank 1
    val dup = emb.where(col("vec_id") === 3L)
      .select(lit(999999L).as("vec_id"), col("embedding"))
    val dupRow = dup.select(
        GraftExpressions.jlProject(col("embedding"), signs).as("code"))
      .withColumn("cell", GraftExpressions.intCellAssign(col("code"), cents))
      .head
    val orig = assigned.find(_._1 == 3L).get
    assert(dupRow.getSeq[Long](0).toArray.toSeq === orig._2.toSeq,
      "duplicate must project to the identical code")
    assert(dupRow.getInt(1) === orig._3,
      "duplicate must assign to the identical cell")
    assigned.foreach { case (id, code, cell) =>
      val probed = cents.zipWithIndex
        .map { case (ct, ci) => (d2(code, ct), ci) }
        .sorted.take(4).map(_._2).toSet
      assert(probed.contains(cell),
        s"vec $id: own cell $cell must be in its probe set")
    }
  }

  test("c89 hyperplane calibration: endpoints exact, per-plane agreement " +
    "tracks Goemans-Williamson 1 - theta/pi, candidacy tracks the " +
    "OR-amplified table curve") {
    val emb = Tables(spark, sfDir(), "embeddings")
    val rep = Similarity.hyperplaneCalibrationReport(emb, "vec_id",
        "embedding").orderBy("bucket").collect()
    assert(rep.nonEmpty)
    // f = 1 endpoint (single-point grid, so the bucket is PURE): the
    // variant IS the vector — every plane agrees, every table collides
    val hi = Similarity.hyperplaneCalibrationReport(emb, "vec_id",
      "embedding", overlapGridPpm = Seq(1000000L)).collect()
    assert(hi.length === 1 && hi.head.getLong(0) === 19L)
    assert(hi.head.getLong(3) === 1000000L,
      s"agree at cos=1: ${hi.head.getLong(3)}")
    assert(hi.head.getLong(4) === 1000000L,
      s"cand at cos=1: ${hi.head.getLong(4)}")
    // f = 0 endpoint: the variant is the NEGATED vector — every plane
    // with a nonzero projection flips, no 8-bit table can collide
    val lo = Similarity.hyperplaneCalibrationReport(emb, "vec_id",
      "embedding", overlapGridPpm = Seq(0L)).collect()
    assert(lo.length === 1 && lo.head.getLong(0) === 0L)
    assert(lo.head.getLong(3) <= 50000L,
      s"agree at cos=-1: ${lo.head.getLong(3)}")
    assert(lo.head.getLong(4) === 0L,
      s"cand at cos=-1: ${lo.head.getLong(4)}")
    // per-bucket: measured sign agreement vs 1 - arccos(2*rho - 1)/pi at
    // the bucket's mean planted cosine, and any-table candidacy vs the
    // OR-amplification 1 - (1 - p^8)^16 of that agreement
    for (r <- rep) {
      val rho = r.getLong(2) / 1e6
      val theta = math.acos(math.min(1.0, math.max(-1.0, 2 * rho - 1)))
      val pTheory = 1.0 - theta / math.Pi
      val pMeas = r.getLong(3) / 1e6
      assert(math.abs(pMeas - pTheory) <= 0.08,
        s"bucket ${r.getLong(0)}: plane agreement $pMeas vs GW $pTheory")
      val candTheory = 1.0 - math.pow(1.0 - math.pow(pTheory, 8), 16)
      val candMeas = r.getLong(4) / 1e6
      assert(math.abs(candMeas - candTheory) <= 0.25,
        s"bucket ${r.getLong(0)}: candidacy $candMeas vs $candTheory")
    }
    // agreement is monotone in the planted cosine
    val ag = rep.map(_.getLong(3))
    assert(ag.zip(ag.tail).forall { case (a, b) => a <= b },
      s"non-monotone agreement: ${ag.mkString(",")}")
  }
}
