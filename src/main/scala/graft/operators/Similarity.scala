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

    val candidates = banded.as("l").join(banded.as("r"), Seq("tbl", "bucket"))
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
