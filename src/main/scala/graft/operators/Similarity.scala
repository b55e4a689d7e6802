package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions

/** Similarity search over an `array<float>` embedding column.
  *
  * Scale story: the query set is the SMALL side — it is broadcast, so the
  * corpus is scanned exactly once, partition-local; no corpus-sized shuffle
  * exists in any plan here. Top-k runs as a per-partition bounded heap
  * before the per-query merge, so the merge shuffle carries at most
  * k·partitions·|Q| rows, never the scored corpus. Scoring uses the
  * codegen'd [[graft.functions.FloatCosineExpr]] (one tight loop per pair,
  * no intermediate arrays).
  */
object Similarity {

  /** Brute-force cosine top-k: exact baseline. `queries` must be small
    * (broadcast). Returns (query_id, neighbor_id, cos, rnk) — self-matches
    * excluded, ties broken by neighbor id.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(F.broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        GraftExpressions.floatCosine(col("cv"), col("qv")).as("cos"))
    topKPerQuery(partialTopK(scored, k), k)
  }

  /** Per-partition bounded top-k heap: keeps the k best (cos desc, id asc)
    * rows per query per partition. This is the partial aggregate that makes
    * the final per-query window a merge of k·partitions·|Q| rows instead of
    * a corpus-sized exchange into |Q| reducer tasks.
    *
    * The typed heap requires integral ids and non-null scores; for other
    * id types it degrades to a pass-through — correctness is unaffected
    * (the final window computes the same top-k) and Spark's own
    * WindowGroupLimit(Partial) still pre-limits each partition before the
    * exchange. Rows with a null id/score carry no ranking information and
    * are dropped ON BOTH PATHS (a null embedding scores null), so the
    * result never depends on which path ran.
    */
  private[operators] def partialTopK(scored: DataFrame, k: Int): DataFrame = {
    val integral = Set("byte", "short", "integer", "long")
    val idsIntegral = Seq("query_id", "neighbor_id").forall(c =>
      integral.contains(scored.schema(c).dataType.typeName))
    val nonNull = scored.where(col("query_id").isNotNull &&
      col("neighbor_id").isNotNull && col("cos").isNotNull)
    if (!idsIntegral) nonNull
    else {
      val spark = scored.sparkSession
      import spark.implicits._
      nonNull
        .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
          col("cos").cast("double"))
        .as[(Long, Long, Double)]
        .mapPartitions { it =>
          import scala.collection.mutable
          // "worst kept row" dequeues first: lowest cos, then highest id
          val worstFirst =
            Ordering.by[(Long, Long, Double), (Double, Long)](r => (-r._3, r._2))
          val heaps =
            mutable.Map.empty[Long, mutable.PriorityQueue[(Long, Long, Double)]]
          it.foreach { r =>
            val h = heaps.getOrElseUpdate(r._1,
              mutable.PriorityQueue.empty(worstFirst))
            h.enqueue(r)
            if (h.size > k) h.dequeue()
          }
          heaps.valuesIterator.flatMap(_.iterator)
        }
        .toDF("query_id", "neighbor_id", "cos")
    }
  }

  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "cos", "rnk")
  }

  /** Deterministic Rademacher (±1) hyperplanes for sign-LSH. */
  private[graft] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** All XOR masks of `bits` bits with popcount ≤ maxHamming — the
    * multi-probe neighborhood of a bucket.
    */
  private[graft] def probeMasks(bits: Int, maxHamming: Int): Seq[Int] =
    (0 until (1 << bits)).filter(m => Integer.bitCount(m) <= maxHamming)

  /** LSH-bucketed approximate top-k, OR-amplified: `tables` independent
    * sign-LSH tables of `bitsPerTable` bits each (round 1's single AND-only
    * 16-bit signature had ~2^-16 collision probability — zero recall).
    * Queries multi-probe every bucket within Hamming ≤ `probeHamming` of
    * their own, so a true neighbor is missed only if it mismatches every
    * table by > probeHamming bits — P(miss) ≈ 1e-6 at cos 0.5 with the
    * defaults. Exact cosine runs map-side on bucket hits (before any
    * shuffle); the only shuffled rows are (query, neighbor, cos) triples.
    *
    * At larger corpora raise `bitsPerTable` ≈ log2(n / desired bucket size);
    * the shape (broadcast probe join + hit dedup + rerank) is unchanged.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int = 10, tables: Int = 16,
              bitsPerTable: Int = 6, probeHamming: Int = 2, dim: Int = 64,
              seed: Long = 7L): DataFrame = {
    val planes = hyperplanes(tables * bitsPerTable, dim, seed)
    def buckets(v: org.apache.spark.sql.Column) =
      GraftExpressions.planeSignBuckets(v, planes, tables, bitsPerTable)

    val cHit = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .select(col("neighbor_id"), col("cv"),
        posexplode(buckets(col("cv"))).as(Seq("tbl", "bucket")))

    val masks = probeMasks(bitsPerTable, probeHamming)
    val qProbe = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        posexplode(buckets(col("qv"))).as(Seq("tbl", "qbucket")))
      .select(col("query_id"), col("qv"), col("tbl"),
        explode(array(masks.map(m =>
          col("qbucket").bitwiseXOR(lit(m))): _*)).as("bucket"))

    val hits = cHit.join(F.broadcast(qProbe), Seq("tbl", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        GraftExpressions.floatCosine(col("cv"), col("qv")).as("cos"))

    // dedup multi-table hits; cos is identical per pair, so max == first
    val scored = hits.groupBy("query_id", "neighbor_id")
      .agg(max("cos").as("cos"))
    topKPerQuery(scored, k)
  }

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    * path alongside sign-LSH: corpus vectors are assigned to their most
    * similar of `nLists` centroids (one pass, codegen'd cosine against
    * centroid literals, no shuffle); each query probes only its `nProbe`
    * closest lists, so the scan fraction is ≈ nProbe/nLists of the corpus.
    * Exact cosine reranks inside the probed lists.
    *
    * Centroids are a deterministic hash-ordered sample of the corpus
    * (Faiss-style random init, seeded) collected to the driver — nLists ×
    * dim floats, i.e. KBs; the assignment itself is fully distributed.
    * nProbe = nLists degenerates to the exact brute-force answer — that
    * configuration is what the DuckDB oracle checks; recall at partial
    * nProbe is asserted in SimilaritySpec.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int = 10, nLists: Int = 16,
              nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.Column
    val centroids: Array[Array[Float]] = corpus
      .select(col(idCol).cast("string").as("id"), col(vecCol).as("v"))
      .orderBy(xxhash64(col("id")))
      .limit(nLists)
      .collect()
      .map(_.getSeq[Float](1).toArray)

    def centroidSims(v: Column): Seq[Column] = centroids.zipWithIndex.map {
      case (c, i) =>
        struct(GraftExpressions.floatCosine(v, typedLit(c.toSeq)).as("cos"),
          lit(i).as("list"))
    }.toSeq
    def bestList(v: Column): Column =
      array_max(array(centroidSims(v): _*)).getField("list")
    def probeLists(v: Column, n: Int): Column =
      transform(slice(reverse(array_sort(array(centroidSims(v): _*))), 1, n),
        s => s.getField("list"))

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("list", bestList(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(probeLists(col("qv"),
          math.min(nProbe, centroids.length))).as("list"))

    val scored = c.join(F.broadcast(q), Seq("list"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        GraftExpressions.floatCosine(col("cv"), col("qv")).as("cos"))
    topKPerQuery(partialTopK(scored, k), k)
  }

  /** Two-level IVF top-k: the scale path past the single-level form's
    * ceiling. [[ivfTopK]] compiles every centroid into the plan as a
    * literal — fine for hundreds, but thousands of centroid literals bloat
    * whole-stage codegen past the JIT's method limits. Here the WHOLE
    * centroid hierarchy rides the plan as ONE referenced
    * [[CentroidIndex]] object (the same pattern as the BPE codec): the
    * generated code makes a single virtual call per row into a compiled
    * scalar loop, so capacity grows to l1 × l2 leaves with constant
    * codegen size. Assignment stays map-only and joinless — the c19/c14
    * plan-audit property — and the index is l1·l2·dim floats, KBs on the
    * driver, broadcast once inside the serialized expression.
    *
    * Corpus rows assign to the best leaf within their best coarse cell
    * (standard IVF); queries probe the top `probe1` coarse cells and the
    * top `probe2` leaves ranked across those cells. Probing everything
    * (probe1 = l1, probe2 = l1·l2) degenerates to exact brute force —
    * the configuration the DuckDB oracle checks; partial-probe recall is
    * asserted in SimilaritySpec.
    */
  def ivfTopK2(corpus: DataFrame, queries: DataFrame, idCol: String,
               vecCol: String, k: Int = 10, l1: Int = 4, l2: Int = 4,
               probe1: Int = 2, probe2: Int = 4): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.classic.GraftColumnBridge
    // L1: deterministic hash-ordered sample (Faiss-style seeded init)
    val l1Cents: Array[Array[Float]] = corpus
      .select(col(idCol).cast("string").as("id"), col(vecCol).as("v"))
      .orderBy(xxhash64(col("id")))
      .limit(l1)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    // L2: per coarse cell, a hash-ordered sample of the cell's members —
    // one window pass at INDEX BUILD time (not per query)
    def l1Sims(v: Column): Seq[Column] = l1Cents.zipWithIndex.map {
      case (c, i) =>
        struct(GraftExpressions.floatCosine(v, typedLit(c.toSeq)).as("cos"),
          lit(i).as("cell"))
    }.toSeq
    val cellW = Window.partitionBy("c1").orderBy(xxhash64(col("id")))
    val l2Rows = corpus
      .select(col(idCol).cast("string").as("id"), col(vecCol).as("v"))
      .withColumn("c1", array_max(array(l1Sims(col("v")): _*)).getField("cell"))
      .withColumn("rn", row_number().over(cellW))
      .where(col("rn") <= l2)
      .select(col("c1"), col("v"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val l2Cents: Array[Array[Array[Float]]] =
      (0 until l1Cents.length).map(c =>
        l2Rows.filter(_._1 == c).map(_._2)).toArray
    val index = new CentroidIndex(l1Cents, l2Cents)

    def leafOf(v: Column): Column = GraftColumnBridge.column(
      IvfLeafExpr(GraftColumnBridge.expression(v), index))
    def probesOf(v: Column): Column = GraftColumnBridge.column(
      IvfProbesExpr(GraftColumnBridge.expression(v), index, probe1, probe2))

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("list", leafOf(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(probesOf(col("qv"))).as("list"))
    val scored = c.join(F.broadcast(q), Seq("list"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        GraftExpressions.floatCosine(col("cv"), col("qv")).as("cos"))
    topKPerQuery(partialTopK(scored, k), k)
  }

  /** Batched IVF top-k — N queries answered in ONE corpus scan, the
    * vector twin of [[graft.operators.Bm25.rankMany]]'s result shaping.
    *
    * The per-call shape of [[ivfTopK]] takes the query set as a
    * DataFrame and broadcast-joins it per invocation; production ANN
    * serving instead holds a BATCH of query vectors in hand (they
    * arrive from a service, not a table) and wants one pass over the
    * corpus for all of them. Here the whole batch rides the plan as ONE
    * reference object ([[IvfQueryIndex]], the CentroidIndex pattern):
    * probe-list selection runs driver-side (queries are driver data;
    * nLists·|Q| cosines), the index maps each inverted list to the
    * queries probing it, and the corpus scan emits (query_id, cos)
    * pairs via a single generator expression — NO join anywhere in the
    * plan, fan-out per corpus row bounded by the queries that probed
    * its list. Per-partition bounded heaps ([[partialTopK]]) keep the
    * merge at k·partitions·|Q| rows.
    *
    * Scoring and tie-breaking replicate [[ivfTopK]] bit-for-bit (same
    * cosine loop, same (cos, list)-descending probe order), so results
    * are IDENTICAL to per-query calls at every nProbe — spec-locked in
    * SimilaritySpec; the exhaustive configuration is oracle-checked
    * like c14.
    */
  def ivfTopKMany(corpus: DataFrame, idCol: String, vecCol: String,
                  queries: Map[Long, Array[Float]], k: Int = 10,
                  nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.classic.GraftColumnBridge
    require(queries.nonEmpty, "ivfTopKMany: no queries")
    val centroids: Array[Array[Float]] = corpus
      .select(col(idCol).cast("string").as("id"), col(vecCol).as("v"))
      .orderBy(xxhash64(col("id")))
      .limit(nLists)
      .collect()
      .map(_.getSeq[Float](1).toArray)

    // driver-side replica of FloatCosineExpr's exact double loop
    def cosTo(q: Array[Float], c: Array[Float]): Double = {
      val n = math.min(q.length, c.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = q(i).toDouble; val yv = c(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else dot / denom
    }
    // probe order replicates probeLists' reverse(array_sort(struct(cos,
    // list))): descending cos, ties to the LARGER list index
    val nP = math.min(nProbe, centroids.length)
    val listQ = Array.fill(centroids.length)(
      scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])])
    queries.toSeq.sortBy(_._1).foreach { case (qid, qv) =>
      centroids.indices
        .map(i => (cosTo(qv, centroids(i)), i))
        .sortBy { case (cos, i) => (-cos, -i) }
        .take(nP)
        .foreach { case (_, i) => listQ(i) += (qid -> qv) }
    }
    val index = new IvfQueryIndex(
      listQ.map(_.map(_._1).toArray), listQ.map(_.map(_._2).toArray))

    // corpus assignment: the same centroid-literal argmax as ivfTopK
    def centroidSims(v: Column): Seq[Column] = centroids.zipWithIndex.map {
      case (c, i) =>
        struct(GraftExpressions.floatCosine(v, typedLit(c.toSeq)).as("cos"),
          lit(i).as("list"))
    }.toSeq
    def bestList(v: Column): Column =
      array_max(array(centroidSims(v): _*)).getField("list")

    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("list", bestList(col("cv")))
      .select(col("neighbor_id"),
        explode(GraftColumnBridge.column(IvfScoreManyExpr(
          GraftColumnBridge.expression(col("cv")),
          GraftColumnBridge.expression(col("list")), index))).as("qc"))
      .select(col("qc.query_id").as("query_id"), col("neighbor_id"),
        col("qc.cos").as("cos"))
      .where(col("neighbor_id") =!= col("query_id"))
    topKPerQuery(partialTopK(scored, k), k)
  }

  /** Product-quantization ADC top-k — the compressed-domain scale path.
    *
    * PQ splits each dim-d vector into `m` subspaces of d/m floats and
    * replaces each sub-vector with the index of its nearest of `kCodes`
    * codewords: the corpus shrinks from 4·d bytes to m bytes per vector
    * (32x at d=64, m=8), which at 100 TB is the difference between an
    * embedding store that fits executor memory and one that doesn't.
    * Search is ADC (asymmetric distance computation): each query
    * precomputes an m×kCodes lookup table of exact sub-distances, and the
    * corpus scan sums m table lookups per encoded vector — never touching
    * the original floats.
    *
    * Spark shape: codebooks ride the plan as ONE codegen reference object
    * ([[PqIndex]], same pattern as [[CentroidIndex]]); encoding is a
    * map-only projection ([[PqEncodeExpr]] → array<byte>); the query set
    * (small by contract) carries its LUT as a column ([[PqLutExpr]],
    * computed once per query row) and is BROADCAST, so the compressed
    * corpus is scanned partition-local exactly once and only
    * (query, neighbor, adc) triples reach the top-k merge.
    *
    * Codebooks here are a deterministic md5-ordered corpus sample (k-means
    * init; the same cross-engine-reproducible idiom as c19's centroids) so
    * the DuckDB oracle can replicate encode+ADC bit-for-bit; a production
    * index would refine them with [[Clustering]] Lloyd rounds — the scan
    * shape is identical.
    *
    * Distance: per-subspace Euclidean (sqrt'd, double accumulation),
    * ADC = Σ_j l2(q_sub_j, codeword_j[code_j]). Rank orders by
    * round(adc, 6) then neighbor id — quantized ordering, so a 1-ulp
    * cross-engine summation difference cannot flip the oracle compare.
    * Returns (query_id, neighbor_id, adc, rnk).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int = 10, m: Int = 8,
             kCodes: Int = 16): DataFrame = {
    import org.apache.spark.sql.classic.GraftColumnBridge
    require(kCodes <= 128, "byte codes: kCodes must be <= 128")
    // deterministic md5-ordered sample → per-subspace codebooks (KBs)
    val sample: Array[Array[Float]] = corpus
      .select(col(idCol).cast("string").as("id"), col(vecCol).as("v"))
      .orderBy(md5(col("id")), col("id"))
      .limit(kCodes)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(sample.nonEmpty, "pqTopK: empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"pqTopK: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val codebooks: Array[Array[Array[Float]]] =
      Array.tabulate(m)(j => sample.map(_.slice(j * dsub, (j + 1) * dsub)))
    val index = new PqIndex(codebooks)

    def codesOf(v: org.apache.spark.sql.Column) = GraftColumnBridge.column(
      PqEncodeExpr(GraftColumnBridge.expression(v), index))
    def lutOf(v: org.apache.spark.sql.Column) = GraftColumnBridge.column(
      PqLutExpr(GraftColumnBridge.expression(v), index))
    def adcOf(codes: org.apache.spark.sql.Column,
              lut: org.apache.spark.sql.Column) = GraftColumnBridge.column(
      PqAdcExpr(GraftColumnBridge.expression(codes),
        GraftColumnBridge.expression(lut)))

    val c = corpus.select(col(idCol).as("neighbor_id"),
      codesOf(col(vecCol)).as("codes"))
    val q = queries.select(col(idCol).as("query_id"),
      lutOf(col(vecCol)).as("lut"))
    val scored = c.join(F.broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(adcOf(col("codes"), col("lut")), 6).as("adc"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc"), col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "adc", "rnk")
  }

  /** IVFPQ top-k — the faiss-shape composition of the two ANN scale
    * levers: an IVF coarse quantizer restricts each query's scan to
    * `nProbe` of `nLists` cells, and inside the probed cells the scan
    * runs over PQ codes (m bytes/vector) via ADC — so at a billion
    * vectors the per-query work is (nProbe/nLists) of the corpus × m
    * byte-lookups, and the whole index (cells + codes) is a fraction of
    * the raw float store.
    *
    * Consistent L2 metric end-to-end: cell assignment minimizes Euclidean
    * distance to the cell centroid ([[L2CellsExpr]]/[[L2ProbesExpr]] —
    * centroids ride as ONE codegen reference object, assignment map-only
    * and joinless), and ranking is the same summed-subspace ADC as
    * [[pqTopK]]. Probing every cell (nProbe = nLists) degenerates to
    * exactly the brute-force ADC scan — the configuration the DuckDB
    * oracle checks (cell routing cannot change a full scan's result);
    * partial-probe retrieval is spec-locked on planted copies, which
    * share their query's cell by construction.
    */
  def ivfpqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int = 10, nLists: Int = 8,
                nProbe: Int = 2, m: Int = 8, kCodes: Int = 16): DataFrame = {
    val (cells, pq) = buildIvfpqIndex(corpus, idCol, vecCol, nLists, m,
      kCodes)
    ivfpqTopKWith(corpus, queries, idCol, vecCol, cells, pq, k, nProbe)
  }

  /** The IVFPQ index-BUILD step on its own — the state a serving
    * pipeline persists as a versioned artifact ([[graft.sources
    * .AnnIndexStore]]) instead of rebuilding per session: the L2 coarse
    * cells and the per-subspace PQ codebooks, both from the same
    * deterministic md5-ordered sample pool (so build is reproducible
    * run-to-run — the property that makes the index VERSIONABLE at
    * all). KB-sized driver state: nLists·dim + m·kCodes·(dim/m) floats.
    */
  def buildIvfpqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      nLists: Int = 8, m: Int = 8,
                      kCodes: Int = 16): (L2Cells, PqIndex) = {
    require(kCodes <= 128, "byte codes: kCodes must be <= 128")
    // both codebooks from the same deterministic md5-ordered sample pool
    val pool: Array[Array[Float]] = corpus
      .select(col(idCol).cast("string").as("id"), col(vecCol).as("v"))
      .orderBy(md5(col("id")), col("id"))
      .limit(math.max(kCodes, nLists))
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(pool.nonEmpty, "buildIvfpqIndex: empty corpus")
    val dim = pool.head.length
    require(dim % m == 0, s"buildIvfpqIndex: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val pq = new PqIndex(Array.tabulate(m)(j =>
      pool.take(kCodes).map(_.slice(j * dsub, (j + 1) * dsub))))
    val cells = new L2Cells(pool.take(nLists))
    (cells, pq)
  }

  /** [[ivfpqTopK]] served from a PREBUILT index — the load path of a
    * published index artifact. Same expressions, same quantized
    * ranking: serving from a loaded index is hash-identical to serving
    * from an in-memory build by construction (spec-locked in
    * AnnIndexStoreSpec).
    */
  def ivfpqTopKWith(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, cells: L2Cells, pq: PqIndex,
                    k: Int = 10, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.classic.GraftColumnBridge
    val nLists = cells.cents.length

    def cellOf(v: org.apache.spark.sql.Column) = GraftColumnBridge.column(
      L2CellsExpr(GraftColumnBridge.expression(v), cells))
    def probesOf(v: org.apache.spark.sql.Column) = GraftColumnBridge.column(
      L2ProbesExpr(GraftColumnBridge.expression(v), cells,
        math.min(nProbe, nLists)))
    def codesOf(v: org.apache.spark.sql.Column) = GraftColumnBridge.column(
      PqEncodeExpr(GraftColumnBridge.expression(v), pq))
    def lutOf(v: org.apache.spark.sql.Column) = GraftColumnBridge.column(
      PqLutExpr(GraftColumnBridge.expression(v), pq))
    def adcOf(codes: org.apache.spark.sql.Column,
              lut: org.apache.spark.sql.Column) = GraftColumnBridge.column(
      PqAdcExpr(GraftColumnBridge.expression(codes),
        GraftColumnBridge.expression(lut)))

    val c = corpus.select(col(idCol).as("neighbor_id"),
      cellOf(col(vecCol)).as("cell"), codesOf(col(vecCol)).as("codes"))
    val q = queries.select(col(idCol).as("query_id"),
      lutOf(col(vecCol)).as("lut"),
      explode(probesOf(col(vecCol))).as("cell"))
    val scored = c.join(F.broadcast(q), Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(adcOf(col("codes"), col("lut")), 6).as("adc"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc"), col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "adc", "rnk")
  }

  /** Encode a corpus under a FROZEN index into its stored-code form —
    * the C82 incremental-maintenance step: (id, cell, codes), the
    * m-byte PQ representation a serving pipeline appends per ingest
    * epoch instead of re-encoding the whole corpus. One map-only
    * codegen pass; the same expressions serving uses.
    */
  def encodeCodes(corpus: DataFrame, idCol: String, vecCol: String,
                  cells: L2Cells, pq: PqIndex,
                  attrCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.classic.GraftColumnBridge
    // attrCols (C90): filterable metadata STORED WITH the codes, so a
    // serving-time predicate is a parquet pushdown on the m-byte table —
    // no corpus-sized attribute join, floats stay cold
    corpus.select(col(idCol).as("neighbor_id") +:
      GraftColumnBridge.column(L2CellsExpr(
        GraftColumnBridge.expression(col(vecCol)), cells)).as("cell") +:
      GraftColumnBridge.column(PqEncodeExpr(
        GraftColumnBridge.expression(col(vecCol)), pq)).as("codes") +:
      attrCols.map(col): _*)
  }

  /** [[ivfpqTopKWith]] served from STORED codes ([[encodeCodes]]
    * output read back from a codes table) — the scan side never touches
    * raw vectors: at 100 TB the float corpus stays cold, the m-byte
    * code table is what serving reads, and ingest appends code epochs
    * incrementally against the frozen index version. ADC and ranking
    * are the same expressions, so stored-code serving is hash-identical
    * to encode-at-query-time serving (spec-locked).
    */
  def ivfpqTopKFromCodes(codes: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String, cells: L2Cells,
                         pq: PqIndex, k: Int = 10,
                         nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.classic.GraftColumnBridge
    def probesOf(v: org.apache.spark.sql.Column) = GraftColumnBridge.column(
      L2ProbesExpr(GraftColumnBridge.expression(v), cells,
        math.min(nProbe, cells.cents.length)))
    def lutOf(v: org.apache.spark.sql.Column) = GraftColumnBridge.column(
      PqLutExpr(GraftColumnBridge.expression(v), pq))
    def adcOf(c: org.apache.spark.sql.Column,
              lut: org.apache.spark.sql.Column) = GraftColumnBridge.column(
      PqAdcExpr(GraftColumnBridge.expression(c),
        GraftColumnBridge.expression(lut)))
    val q = queries.select(col(idCol).as("query_id"),
      lutOf(col(vecCol)).as("lut"),
      explode(probesOf(col(vecCol))).as("cell"))
    val scored = codes.join(F.broadcast(q), Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(adcOf(col("codes"), col("lut")), 6).as("adc"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc"), col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "adc", "rnk")
  }

  /** Batched IVFPQ top-k — the compressed-domain twin of [[ivfTopKMany]]:
    * N driver-side query vectors answered in ONE joinless scan of the
    * PQ-encoded corpus. Probe cells and ADC lookup tables are computed
    * driver-side (queries are in hand; nLists + m·kCodes distances per
    * query), the batch rides the plan as ONE [[PqQueryIndex]] reference
    * object mapping each cell to the (query, LUT) pairs probing it, and
    * a generator expression emits (query_id, adc) per encoded corpus
    * row — no join, no decompression, constant codegen size in the
    * batch. ADC, cell assignment, and encode replicate [[ivfpqTopK]]'s
    * expressions bit-for-bit; ranking uses the same quantized
    * round(adc, 6) ordering, so batched ≡ per-query at every probe
    * depth (spec-locked; the exhaustive configuration shares c28's
    * brute-force oracle).
    */
  def ivfpqTopKMany(corpus: DataFrame, idCol: String, vecCol: String,
                    queries: Map[Long, Array[Float]], k: Int = 10,
                    nLists: Int = 8, nProbe: Int = 2, m: Int = 8,
                    kCodes: Int = 16): DataFrame = {
    import org.apache.spark.sql.classic.GraftColumnBridge
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    require(queries.nonEmpty, "ivfpqTopKMany: no queries")
    require(kCodes <= 128, "byte codes: kCodes must be <= 128")
    val pool: Array[Array[Float]] = corpus
      .select(col(idCol).cast("string").as("id"), col(vecCol).as("v"))
      .orderBy(md5(col("id")), col("id"))
      .limit(math.max(kCodes, nLists))
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(pool.nonEmpty, "ivfpqTopKMany: empty corpus")
    val dim = pool.head.length
    require(dim % m == 0, s"ivfpqTopKMany: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val pq = new PqIndex(Array.tabulate(m)(j =>
      pool.take(kCodes).map(_.slice(j * dsub, (j + 1) * dsub))))
    val cells = new L2Cells(pool.take(nLists))

    // driver-side probe + LUT per query, via the SAME index objects the
    // in-plan expressions use (GenericArrayData wraps the float arrays)
    val nP = math.min(nProbe, cells.cents.length)
    val byCell = Array.fill(cells.cents.length)(
      scala.collection.mutable.ArrayBuffer
        .empty[(Long, Array[Array[Double]])])
    queries.toSeq.sortBy(_._1).foreach { case (qid, qv) =>
      val ad = new GenericArrayData(qv)
      val lutAd = pq.lut(ad)
      val lut = Array.tabulate(pq.m)(j => lutAd.getArray(j).toDoubleArray())
      val probes = cells.probes(ad, nP)
      var i = 0
      while (i < probes.numElements()) {
        byCell(probes.getInt(i)) += (qid -> lut)
        i += 1
      }
    }
    val qidx = new PqQueryIndex(
      byCell.map(_.map(_._1).toArray), byCell.map(_.map(_._2).toArray))

    def cellOf(v: org.apache.spark.sql.Column) = GraftColumnBridge.column(
      L2CellsExpr(GraftColumnBridge.expression(v), cells))
    def codesOf(v: org.apache.spark.sql.Column) = GraftColumnBridge.column(
      PqEncodeExpr(GraftColumnBridge.expression(v), pq))

    val scored = corpus
      .select(col(idCol).as("neighbor_id"),
        cellOf(col(vecCol)).as("cell"), codesOf(col(vecCol)).as("codes"))
      .select(col("neighbor_id"),
        explode(GraftColumnBridge.column(PqScoreManyExpr(
          GraftColumnBridge.expression(col("codes")),
          GraftColumnBridge.expression(col("cell")), qidx))).as("qa"))
      .select(col("qa.query_id").as("query_id"), col("neighbor_id"),
        round(col("qa.adc"), 6).as("adc"))
      .where(col("neighbor_id") =!= col("query_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc"), col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "adc", "rnk")
  }

  /** Hyperplane sign-LSH estimator calibration (C89) — the C83/C88
    * calibration harness pointed at the EMBEDDING-side candidate
    * generator: C5's OR-amplified random-hyperplane tables drive which
    * embedding pairs ever reach exact-cosine verification, but nothing
    * measured what cosine range a `tables`×`bitsPerTable` sign-LSH
    * actually captures. This is that table, over a PLANTED cosine grid.
    *
    * The grid lives on the 1/1024 integer lattice: each id-sampled
    * vector is quantized (q_i = ⌊x·1024 + 0.5⌋, the C53 grid) and
    * paired with the variant keeping its first m = ⌊d·f⌋ coordinates
    * and NEGATING the tail. Both norms are equal by construction, so
    * cos(q, v) = (2·Sm − S)/S with S = Σq², Sm the kept-prefix mass —
    * the exact cosine needs ONE integer division and sweeps −1 → 1 as
    * f sweeps the grid. Reported positive-shifted as
    * cosp_ppm = ⌊Sm·1e6/S⌋ = (cos+1)/2 in ppm. (Note: DuckDB's INTEGER
    * `//` truncates toward zero exactly like Spark's `div` — the
    * measured c92 rule; the flooring behavior applies to DOUBLE `//`
    * only. The positive shift here is belt-and-braces, not required
    * for sign agreement.)
    *
    * Both pair sides live in ONE ROW: exact cosine, the production
    * signatures (the SAME [[GraftExpressions.planeSignBuckets]]
    * expression C5/C7 serve with, C5's 16×8 defaults), per-plane sign
    * agreement (bits − popcount(xor) summed over tables) and any-table
    * candidacy are map-only projections — no join, no bucket shuffle,
    * just the 20-row bucket aggregate. At 100 TB `sampleMod` bounds
    * cost to corpus/sampleMod rows of codegen'd expression work.
    *
    * Cross-engine exactness: bucket / n_pairs / mean_cosp_ppm are pure
    * integer arithmetic — the DuckDB oracle reproduces them from its
    * own lattice rebuild. mean_agree_ppm and cand_ppm have no SQL twin
    * (the plane signs ride a seeded Rademacher matrix inside a codegen
    * expression); they are the SPEC-locked columns: SimilaritySpec pins
    * per-plane agreement against Goemans–Williamson 1 − θ/π at the
    * bucket mean (θ = arccos(2·cosp − 1)) and candidacy against the
    * OR-amplified 1 − (1 − p^bits)^tables curve, plus the endpoint
    * contracts (v = q → everything collides; v = −q → nothing does).
    *
    * Returns (bucket, n_pairs, mean_cosp_ppm, mean_agree_ppm, cand_ppm).
    */
  def hyperplaneCalibrationReport(emb: DataFrame, idCol: String,
                                  vecCol: String, tables: Int = 16,
                                  bitsPerTable: Int = 8, dim: Int = 64,
                                  seed: Long = 7L, sampleMod: Int = 3,
                                  overlapGridPpm: Seq[Long] =
                                    Dedup.CalibrationGridPpm): DataFrame = {
    val G = GraftExpressions
    val planes = hyperplanes(tables * bitsPerTable, dim, seed)
    val nBits = (tables * bitsPerTable).toLong
    def sigs(c: org.apache.spark.sql.Column) =
      G.planeSignBuckets(transform(c, _.cast("float")), planes, tables,
        bitsPerTable)
    val base = emb
      .where(col(idCol) % sampleMod === 0)
      .select(col(idCol).as("id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * 1024 + lit(0.5)).cast("long"))
          .as("q"))
      .select(col("id"), col("q"),
        aggregate(col("q"), lit(0L), (a, e) => a + e * e).as("s"),
        // the original-side signature is GRID-INVARIANT: compute it
        // once per vector, before the 9-way grid explode
        sigs(col("q")).as("sq"))
      .where(col("s") > 0)
    val paired = base
      .withColumn("f_ppm", explode(array(overlapGridPpm.map(lit): _*)))
      .withColumn("m",
        G.longDiv(size(col("q")).cast("long") * col("f_ppm"), lit(1000000L)))
      .withColumn("sm",
        coalesce(aggregate(slice(col("q"), lit(1), col("m").cast("int")),
          lit(0L), (a, e) => a + e * e), lit(0L)))
      .withColumn("v",
        transform(col("q"), (x, i) => when(i < col("m"), x).otherwise(-x)))
    val pairs = paired.select(
        G.longDiv(col("sm") * lit(1000000L), col("s")).as("cosp_ppm"),
        zip_with(col("sq"), sigs(col("v")), (a, b) =>
          struct((lit(bitsPerTable) -
            bit_count(a.bitwiseXOR(b))).cast("long").as("agree"),
            (a === b).cast("long").as("coll"))).as("tb"))
      .select(col("cosp_ppm"),
        aggregate(col("tb"), lit(0L),
          (acc, e) => acc + e("agree")).as("agree_bits"),
        (aggregate(col("tb"), lit(0L),
          (acc, e) => acc + e("coll")) > 0).cast("long").as("candidate"))
    pairs
      .groupBy(least(lit(19L), G.longDiv(col("cosp_ppm"), lit(50000L)))
        .as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("cosp_ppm")).as("__sc"),
        sum(col("agree_bits")).as("__sa"),
        sum(col("candidate")).as("__sk"))
      .select(col("bucket"), col("n_pairs"),
        G.longDiv(col("__sc"), col("n_pairs")).as("mean_cosp_ppm"),
        G.longDiv(col("__sa") * lit(1000000L), col("n_pairs") * nBits)
          .as("mean_agree_ppm"),
        G.longDiv(col("__sk") * lit(1000000L), col("n_pairs"))
          .as("cand_ppm"))
      .orderBy("bucket")
  }

  /** Embedding-cosine near-duplicate pairs, OR-amplified across `tables`
    * independent sign-LSH tables (single-table AND-hashing only ever finds
    * exact copies — cos 0.95 near-dups collide with prob ≈ 0.43 per 8-bit
    * table, ≥ 0.9998 across 16). Bucket self-join carries only ids; vectors
    * are joined back for exact-cosine verification on the DISTINCT'd
    * candidate pairs. Returns (id_a, id_b, cos) with id_a < id_b.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double = 0.95, tables: Int = 16,
                            bitsPerTable: Int = 8, dim: Int = 64,
                            seed: Long = 7L): DataFrame = {
    val planes = hyperplanes(tables * bitsPerTable, dim, seed)
    val keyed = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val banded = keyed.select(col("id"),
      posexplode(GraftExpressions.planeSignBuckets(col("v"), planes,
        tables, bitsPerTable)).as(Seq("tbl", "bucket")))

    // shuffle_hash — the r13 banded-join audit rule: the banded frame
    // is corpus-scaled (tables x rows behind a posexplode, the b25
    // misestimate class); the identical sides share one exchange
    val candidates = banded.as("l")
      .join(banded.as("r").hint("shuffle_hash"), Seq("tbl", "bucket"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .where(col("id_a") < col("id_b"))
      .distinct()

    candidates
      .join(keyed.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(keyed.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        GraftExpressions.floatCosine(col("v_a"), col("v_b")).as("cos"))
      .where(col("cos") >= threshold) // exact value, THEN display rounding
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}

/** Hierarchical centroid index: coarse L1 cells, fine L2 leaves per cell,
  * flattened to global leaf ids via per-cell offsets. Norms precomputed;
  * all search loops are scalar float loops over primitive arrays. One
  * instance rides the plan as a codegen reference object — capacity is
  * bounded by driver/executor memory (KBs for thousands of leaves), not
  * by generated-code size.
  */
final class CentroidIndex(val l1: Array[Array[Float]],
                          val l2: Array[Array[Array[Float]]])
    extends Serializable {
  import org.apache.spark.sql.catalyst.util.ArrayData

  private val offsets: Array[Int] = {
    val o = new Array[Int](l1.length + 1)
    var i = 0
    while (i < l1.length) { o(i + 1) = o(i) + l2(i).length; i += 1 }
    o
  }
  val numLeaves: Int = offsets(l1.length)

  private def norm(a: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i); i += 1 }
    math.sqrt(s)
  }
  private val l1Norm: Array[Double] = l1.map(norm)
  private val l2Norm: Array[Array[Double]] = l2.map(_.map(norm))

  private def dot(v: ArrayData, c: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(v.numElements(), c.length)
    while (i < n) { s += v.getFloat(i).toDouble * c(i); i += 1 }
    s
  }

  private def vNorm(v: ArrayData): Double = {
    var s = 0.0; var i = 0
    val n = v.numElements()
    while (i < n) { val x = v.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Best leaf within the best coarse cell (standard IVF assignment). */
  def bestLeaf(v: ArrayData): Int = {
    val nv = vNorm(v)
    var bestCell = 0; var bestCos = Double.MinValue
    var i = 0
    while (i < l1.length) {
      val d = l1Norm(i) * nv
      val cos = if (d == 0) 0.0 else dot(v, l1(i)) / d
      if (cos > bestCos) { bestCos = cos; bestCell = i }
      i += 1
    }
    var bestL = offsets(bestCell); var bestLCos = Double.MinValue
    var j = 0
    while (j < l2(bestCell).length) {
      val d = l2Norm(bestCell)(j) * nv
      val cos = if (d == 0) 0.0 else dot(v, l2(bestCell)(j)) / d
      if (cos > bestLCos) { bestLCos = cos; bestL = offsets(bestCell) + j }
      j += 1
    }
    bestL
  }

  /** Top `p2` leaves ranked across the top `p1` coarse cells. */
  def probeLeaves(v: ArrayData, p1: Int, p2: Int): ArrayData = {
    val nv = vNorm(v)
    // rank cells by cosine (l1 is small: selection sort over a copy)
    val cellCos = new Array[Double](l1.length)
    var i = 0
    while (i < l1.length) {
      val d = l1Norm(i) * nv
      cellCos(i) = if (d == 0) 0.0 else dot(v, l1(i)) / d
      i += 1
    }
    val cellIdx = (0 until l1.length).sortBy(c => -cellCos(c)).toArray
    val nCells = math.min(p1, l1.length)
    // collect (cos, leaf) across probed cells, take top p2
    val leafBuf = scala.collection.mutable.ArrayBuffer.empty[(Double, Int)]
    var ci = 0
    while (ci < nCells) {
      val cell = cellIdx(ci)
      var j = 0
      while (j < l2(cell).length) {
        val d = l2Norm(cell)(j) * nv
        val cos = if (d == 0) 0.0 else dot(v, l2(cell)(j)) / d
        leafBuf += ((cos, offsets(cell) + j))
        j += 1
      }
      ci += 1
    }
    val top = leafBuf.sortBy { case (cos, leaf) => (-cos, leaf) }
      .take(math.min(p2, leafBuf.length)).map(_._2)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(top.toArray)
  }
}

/** Per-subspace PQ codebooks: [m][kCodes][dsub] floats. One instance rides
  * encode/LUT plans as a codegen reference object — m·kCodes·dsub floats
  * (KBs), constant generated-code size. All loops are scalar double
  * accumulations over primitive arrays; sub-distance is Euclidean with a
  * final sqrt (ascending-index summation, matching DuckDB's
  * `list_distance`, so oracle compares are bit-honest).
  */
final class PqIndex(val codebooks: Array[Array[Array[Float]]])
    extends Serializable {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  val m: Int = codebooks.length
  val kCodes: Int = codebooks.head.length
  val dsub: Int = codebooks.head.head.length

  private def subDist(v: ArrayData, off: Int, cw: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < cw.length) {
      val d = v.getFloat(off + i).toDouble - cw(i).toDouble
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  /** Nearest codeword per subspace (min distance, ties → lowest index). */
  def encode(v: ArrayData): ArrayData = {
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < kCodes) {
        val d = subDist(v, j * dsub, codebooks(j)(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Query-side ADC lookup table: [m][kCodes] exact sub-distances. */
  def lut(v: ArrayData): ArrayData = {
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      val r = new Array[Double](kCodes)
      var c = 0
      while (c < kCodes) { r(c) = subDist(v, j * dsub, codebooks(j)(c)); c += 1 }
      rows(j) = new GenericArrayData(r)
      j += 1
    }
    new GenericArrayData(rows)
  }
}

object PqIndex {
  import org.apache.spark.sql.catalyst.util.ArrayData

  /** ADC distance: m array lookups + adds — the whole per-row scan cost. */
  def adc(codes: ArrayData, lut: ArrayData): Double = {
    var s = 0.0; var j = 0
    val m = codes.numElements()
    while (j < m) {
      s += lut.getArray(j).getDouble(codes.getByte(j).toInt & 0xFF)
      j += 1
    }
    s
  }
}

/** Euclidean coarse-quantizer cells for IVFPQ: nLists × dim floats riding
  * plans as one codegen reference object. Scalar double loops; min-L2
  * assignment, ties → lowest cell index (matching PQ encode's tie rule).
  */
final class L2Cells(val cents: Array[Array[Float]]) extends Serializable {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  private def dist(v: ArrayData, c: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(v.numElements(), c.length)
    while (i < n) {
      val d = v.getFloat(i).toDouble - c(i).toDouble
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  def best(v: ArrayData): Int = {
    var b = 0; var bd = Double.MaxValue; var i = 0
    while (i < cents.length) {
      val d = dist(v, cents(i))
      if (d < bd) { bd = d; b = i }
      i += 1
    }
    b
  }

  /** The `n` nearest cells, ascending distance (ties → lower index). */
  def probes(v: ArrayData, n: Int): ArrayData = {
    val ds = Array.tabulate(cents.length)(i => (dist(v, cents(i)), i))
    new GenericArrayData(
      ds.sortBy { case (d, i) => (d, i) }.take(n).map(_._2))
  }
}

/** l2_cell(vec) → int: joinless map-only IVFPQ cell assignment. */
case class L2CellsExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    cells: L2Cells)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"l2_cell expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = cells.best(
    input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("l2cells", cells, classOf[L2Cells].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $c.best($v);")
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : L2CellsExpr = copy(child = newChild)
}

/** l2_probes(vec, n) → array<int>: query-side nearest-cells probe list. */
case class L2ProbesExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    cells: L2Cells, nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"l2_probes expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = cells.probes(
    input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], nProbe)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("l2cells", cells, classOf[L2Cells].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $c.probes($v, $nProbe);")
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : L2ProbesExpr = copy(child = newChild)
}

/** pq_encode(vec) → array<byte>: map-only corpus compression (4·d → m bytes). */
case class PqEncodeExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    index: PqIndex)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def nullSafeEval(input: Any): Any = index.encode(
    input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("pqIndex", index, classOf[PqIndex].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $idx.encode($c);")
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : PqEncodeExpr = copy(child = newChild)
}

/** pq_lut(vec) → array<array<double>>: per-query ADC table (|Q| rows only). */
case class PqLutExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    index: PqIndex)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def nullSafeEval(input: Any): Any = index.lut(
    input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("pqIndex", index, classOf[PqIndex].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $idx.lut($c);")
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : PqLutExpr = copy(child = newChild)
}

/** pq_adc(codes, lut) → double: compressed-domain distance (m lookups). */
case class PqAdcExpr(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<byte>, array<array<double>>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(codes: Any, lut: Any): Any = PqIndex.adc(
    codes.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
    lut.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val pq = classOf[PqIndex].getName
    nullSafeCodeGen(ctx, ev,
      (c, l) => s"${ev.value} = $pq$$.MODULE$$.adc($c, $l);")
  }
  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression)
      : PqAdcExpr = copy(left = newLeft, right = newRight)
}

/** ivf_leaf(vec) → int: joinless map-only corpus assignment. */
case class IvfLeafExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    index: CentroidIndex)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_leaf expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = index.bestLeaf(
    input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("ivfIndex", index,
      classOf[CentroidIndex].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $idx.bestLeaf($c);")
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : IvfLeafExpr = copy(child = newChild)
}

/** ivf_probes(vec) → array<int>: query-side probe list. */
case class IvfProbesExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    index: CentroidIndex, probe1: Int, probe2: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_probes expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = index.probeLeaves(
    input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
    probe1, probe2)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("ivfIndex", index,
      classOf[CentroidIndex].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $idx.probeLeaves($c, $probe1, $probe2);")
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : IvfProbesExpr = copy(child = newChild)
}

/** The query batch of [[Similarity.ivfTopKMany]] as one plan-referenced
  * object: per inverted list, the ids and vectors of the queries probing
  * it. `score` emits the (query_id, cos) pairs for one corpus row — the
  * cosine loop is byte-for-byte [[graft.functions.FloatCosineExpr]]'s, so
  * batched results are bit-identical to per-query scoring.
  */
final class IvfQueryIndex(val qids: Array[Array[Long]],
                          val qvecs: Array[Array[Array[Float]]])
    extends Serializable {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  private val empty = new GenericArrayData(Array.empty[Any])

  def score(list: Int, v: ArrayData): ArrayData = {
    if (list < 0 || list >= qids.length || qids(list).length == 0) empty
    else {
      val ids = qids(list); val qs = qvecs(list)
      val out = new Array[Any](ids.length)
      var qi = 0
      while (qi < ids.length) {
        val q = qs(qi)
        val n = math.min(v.numElements(), q.length)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val xv = v.getFloat(i).toDouble
          val yv = q(i).toDouble
          dot += xv * yv; na += xv * xv; nb += yv * yv
          i += 1
        }
        val denom = math.sqrt(na) * math.sqrt(nb)
        val cos = if (denom == 0.0) 0.0 else dot / denom
        out(qi) = InternalRow(ids(qi), cos)
        qi += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** `array<struct<query_id,cos>>` of every query probing this row's list —
  * the generator half of [[Similarity.ivfTopKMany]]'s joinless scan. The
  * whole query batch is ONE referenced [[IvfQueryIndex]] object in the
  * generated class (the CentroidIndex pattern): constant codegen size in
  * the batch size.
  */
case class IvfScoreManyExpr(
    vec: org.apache.spark.sql.catalyst.expressions.Expression,
    list: org.apache.spark.sql.catalyst.expressions.Expression,
    index: IvfQueryIndex)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def left: org.apache.spark.sql.catalyst.expressions.Expression = vec
  override def right: org.apache.spark.sql.catalyst.expressions.Expression = list

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, list.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ivf_score_many expects (array<float>, int), got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any, l: Any): Any = index.score(
    l.asInstanceOf[Int],
    v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("ivfQueryIndex", index,
      classOf[IvfQueryIndex].getName)
    nullSafeCodeGen(ctx, ev,
      (v, l) => s"${ev.value} = $idx.score($l, $v);")
  }
  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression)
      : IvfScoreManyExpr = copy(vec = newLeft, list = newRight)
}

/** The query batch of [[Similarity.ivfpqTopKMany]] as one plan-referenced
  * object: per IVF cell, the ids and ADC lookup tables of the queries
  * probing it. `score` emits (query_id, adc) pairs for one encoded
  * corpus row — the ADC loop is byte-for-byte [[PqIndex.adc]]'s.
  */
final class PqQueryIndex(val qids: Array[Array[Long]],
                         val luts: Array[Array[Array[Array[Double]]]])
    extends Serializable {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  private val empty = new GenericArrayData(Array.empty[Any])

  def score(cell: Int, codes: ArrayData): ArrayData = {
    if (cell < 0 || cell >= qids.length || qids(cell).length == 0) empty
    else {
      val ids = qids(cell); val ls = luts(cell)
      val out = new Array[Any](ids.length)
      var qi = 0
      while (qi < ids.length) {
        val lut = ls(qi)
        var s = 0.0
        var j = 0
        val m = codes.numElements()
        while (j < m) {
          s += lut(j)(codes.getByte(j).toInt & 0xFF)
          j += 1
        }
        out(qi) = InternalRow(ids(qi), s)
        qi += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** `array<struct<query_id,adc>>` of every query probing this row's IVF
  * cell — the generator half of [[Similarity.ivfpqTopKMany]]'s joinless
  * compressed scan (the [[IvfScoreManyExpr]] pattern on PQ codes).
  */
case class PqScoreManyExpr(
    codes: org.apache.spark.sql.catalyst.expressions.Expression,
    cell: org.apache.spark.sql.catalyst.expressions.Expression,
    index: PqQueryIndex)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def left: org.apache.spark.sql.catalyst.expressions.Expression = codes
  override def right: org.apache.spark.sql.catalyst.expressions.Expression = cell

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, cell.dataType) match {
      case (ArrayType(ByteType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_score_many expects (array<byte>, int), got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("adc", DoubleType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(c: Any, l: Any): Any = index.score(
    l.asInstanceOf[Int],
    c.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("pqQueryIndex", index,
      classOf[PqQueryIndex].getName)
    nullSafeCodeGen(ctx, ev,
      (c, l) => s"${ev.value} = $idx.score($l, $c);")
  }
  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression)
      : PqScoreManyExpr = copy(codes = newLeft, cell = newRight)
}
