package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions

/** Distributed spherical k-means over an `array<float>` embedding column —
  * the clustering pass data-curation pipelines use for semantic
  * stratification, topic balancing, and cluster-level dedup/sampling.
  *
  * Lloyd's iterations, Spark-shaped:
  *   - ASSIGN is a single codegen'd projection — the k centroids are
  *     driver-local literals (k·dim floats, KBs) compiled into the plan, so
  *     the corpus is scanned once per iteration with NO shuffle and no
  *     join; argmax-by-cosine via array_max over (cos, list) structs.
  *   - UPDATE shuffles only (list, dim, partial-sum) triples — posexplode
  *     to (list, dim, value), one map-side-combined aggregation, k·dim
  *     result rows collected to the driver for the next iteration's
  *     literals. The corpus-sized frame never shuffles.
  *
  * Init is a deterministic md5-ordered sample of the corpus (seed-free,
  * content-addressed — reruns and engine ports agree), the same init the
  * DuckDB oracle reproduces.
  *
  * At 100 TB: cost per iteration = one corpus scan + one (k·dim)-row
  * aggregate; centroid state is O(k·dim) on the driver, same contract as
  * Spark MLlib's KMeans but with the assignment kept as a relational
  * column (composable with every other operator here).
  */
object Clustering {

  /** Deterministic initial centroids: the k corpus vectors with the
    * smallest md5(id) — content-addressed, so any engine reproduces them.
    */
  def initCentroids(df: DataFrame, idCol: String, vecCol: String,
                    k: Int): Array[Array[Float]] =
    df.select(col(idCol).cast("string").as("id"), col(vecCol).as("v"))
      .orderBy(md5(col("id")), col("id"))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](1).toArray)

  private def assignStruct(v: Column, centroids: Array[Array[Float]]): Column =
    array_max(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(GraftExpressions.floatCosine(v, typedLit(c.toSeq)).as("cos"),
        lit(i).as("list"))
    }.toIndexedSeq: _*))

  /** Literal-free assignment for LARGE k: the whole centroid table rides
    * the plan as ONE [[FlatCentroids]] reference object (the
    * CentroidIndex pattern). The literal `assignStruct` inlines k
    * cosine loops into the generated method — measured 44x slower at
    * k=80 (the c31 10x probe: whole-stage codegen past the JIT inlining
    * budget) — while this form is one virtual call into a compiled
    * scalar loop, constant codegen size at any k. Cosine math and the
    * greatest-index tie rule replicate `assignStruct`/array_max
    * bit-for-bit, so the two paths agree wherever both run (spec-locked
    * in ClusteringSpec).
    */
  private def assignListRef(v: Column, centroids: Array[Array[Float]]): Column =
    org.apache.spark.sql.classic.GraftColumnBridge.column(
      CentroidAssignExpr(
        org.apache.spark.sql.classic.GraftColumnBridge.expression(v),
        new FlatCentroids(centroids)))

  /** Literal assignment wins below ~16 centroids (no object dispatch,
    * constant-folded vectors); above it codegen size dominates.
    */
  private val LiteralAssignMaxK = 16

  private def assignList(v: Column, centroids: Array[Array[Float]]): Column =
    if (centroids.length <= LiteralAssignMaxK)
      assignStruct(v, centroids).getField("list")
    else assignListRef(v, centroids)

  /** One Lloyd UPDATE: per-cluster per-dimension means of the assigned
    * vectors. Shuffles (list, dim, value) triples only.
    */
  private def updateCentroids(assigned: DataFrame,
                              centroids: Array[Array[Float]]): Array[Array[Float]] = {
    val dims = assigned
      .select(col("list"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("list", "dim").agg(avg("x").as("m"))
      .collect()
    val next = centroids.map(_.clone())
    dims.foreach { r =>
      next(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat
    }
    next
  }

  /** Run `iters` assignment passes with an UPDATE between consecutive
    * ones (iters = 1 ⇒ pure initial assignment). Returns one row per
    * input row: (id, list, cos) — cluster index and cosine to the final
    * centroid set.
    */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                   k: Int = 8, iters: Int = 1): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val keyed = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    var centroids = initCentroids(df, idCol, vecCol, k)
    for (_ <- 1 until iters) {
      val assigned = keyed.withColumn("list",
        assignStruct(col("v"), centroids).getField("list"))
      centroids = updateCentroids(assigned, centroids)
    }
    keyed
      .withColumn("best", assignStruct(col("v"), centroids))
      .select(col("id"), col("best.list").as("list"), col("best.cos").as("cos"))
  }

  /** Cluster count keeping the expected k-means cell at ~`targetCell`
    * vectors: ⌈n / targetCell⌉ with a floor of 8 (below ~8·targetCell
    * vectors the pair join is trivially cheap and more clusters would
    * only starve the centroid sample). This is the knob that keeps
    * [[semDedup]] linear as the corpus grows — see the scaling rule in
    * its doc.
    */
  def semDedupK(n: Long, targetCell: Int = 300): Int =
    math.max(8, math.ceil(n.toDouble / targetCell).toInt)

  /** Incremental integer-centroid state (D27) — mini-batch k-means
    * (Sculley 2010) over the C53 code grid, the serving-index
    * maintenance loop a crawl runs as embeddings ARRIVE instead of
    * re-clustering the corpus: per cell the state is (Σ codes, count);
    * the centroid served to an epoch is the INTEGER mean `sum / count`
    * (truncating; callers shift codes positive so truncation ≡ floor ≡
    * DuckDB's `//` and the whole trajectory replays cross-engine);
    * each epoch assigns against the centroids AS OF ITS START (the
    * mini-batch rule — assignment never sees its own epoch's updates),
    * then folds its per-cell sums in. Driver state like D12's sketch
    * shards: k·dim longs, constant, epoch-ordered.
    */
  final class IntCentroidState(seed: Array[Array[Long]]) extends Serializable {
    require(seed.nonEmpty, "at least one seed centroid")
    private val k = seed.length
    private val dim = seed.head.length
    private val sums: Array[Array[Long]] = seed.map(_.clone())
    private val counts: Array[Long] = Array.fill(k)(1L)

    /** Integer centroids as of now: sums/counts, truncating. */
    def centroids: Array[Array[Long]] =
      sums.zip(counts).map { case (s, n) => s.map(_ / n) }

    private var lastFolded: Long = -1L
    private var lastReport: Seq[(Int, Long, Long, Long)] = Nil

    /** [[fold]] keyed by epoch for at-least-once streaming delivery: a
      * replayed LATEST epoch (id == last folded) must NOT re-absorb its
      * sums — identical input ⇒ identical report, so the remembered one
      * is returned and the state stays exactly-once (the D21 replay
      * rule). Epoch ids must be CONTIGUOUS from 0 (Structured Streaming
      * batch ids are): an OLDER id is lost ordering, and a NEWER id that
      * skips ahead means this state object missed epochs — the classic
      * hole is a checkpointed stream resuming at batch k>0 against a
      * freshly-built state (sums re-seeded), which would silently
      * continue a corrupted trajectory. Both fail loudly; a restart must
      * either replay from batch 0 into a fresh state or restore the
      * (sums, counts, lastFolded) state alongside the checkpoint.
      */
    def foldEpoch(epoch: Long, codes: DataFrame,
                  codeCol: String): Seq[(Int, Long, Long, Long)] = {
      // epoch >= 0 BEFORE the replay short-circuit: foldEpoch(-1) on a
      // fresh state would otherwise match lastFolded's initial -1 and
      // return the empty initial report instead of failing loudly.
      require(epoch >= 0, s"epoch $epoch < 0: ids are batch ids from 0")
      if (epoch == lastFolded) lastReport
      else {
        require(epoch == lastFolded + 1,
          s"epoch $epoch is not ${lastFolded + 1} (last folded " +
            s"$lastFolded): non-contiguous delivery — only the latest " +
            "epoch may replay, and no epoch may be skipped (reports are " +
            "not kept per epoch)")
        val r = fold(codes, codeCol)
        lastFolded = epoch
        lastReport = r
        r
      }
    }

    /** Fold one epoch of codes: assign against the CURRENT centroids,
      * absorb per-cell sums, return the per-cell epoch report
      * (cell, n_assigned, post_count, post_sum_l1). Cost: one map-only
      * codegen assignment scan + a (cell, dim)-keyed agg collected at
      * k·dim rows.
      */
    def fold(codes: DataFrame, codeCol: String): Seq[(Int, Long, Long, Long)] = {
      import graft.functions.GraftExpressions.intCellAssign
      val cents = centroids
      val perDim = codes
        .select(intCellAssign(col(codeCol), cents).as("cell"),
          posexplode(col(codeCol)))
        .toDF("cell", "j", "q")
        .groupBy("cell", "j")
        .agg(count(lit(1)).as("n"), sum("q").as("s"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      require(perDim.length <= k * dim, "assignment produced unknown cells")
      val nAssigned = Array.fill(k)(0L)
      perDim.foreach { case (c, j, n, s) =>
        sums(c)(j) += s
        if (j == 0) nAssigned(c) = n
      }
      (0 until k).map { c =>
        counts(c) += nAssigned(c)
        (c, nAssigned(c), counts(c), sums(c).sum)
      }
    }
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication with the pairwise cosine confined INSIDE k-means
    * clusters — the trick that makes embedding dedup tractable at
    * corpus scale. A row is dropped iff some same-cluster row with a
    * smaller id is within cosine ≥ `tau` of it (deterministic
    * keep-first, the engine-wide c1 contract; a transitive chain keeps
    * exactly its minimum id, since every later member has that smaller
    * partner... each dropped row names SOME smaller kept-or-dropped
    * partner, and the minimum survives).
    *
    * Scale shape: assignment is one corpus scan, no shuffle —
    * centroid literals below k=16, the [[FlatCentroids]] reference
    * object above (constant codegen size at any k); the pair join
    * shuffles vectors keyed on the cluster index, so per-task work is
    * O(cluster²·dim) — k is the knob that bounds cluster size (the
    * paper runs k ≈ 10⁵ on web corpora; the toy default 8 matches the
    * oracle-replicable init). Returns (id, list, dropped).
    *
    * SCALING RULE — k must grow with the corpus. The within-cluster
    * pair join is O(n²/k) total work: holding k FIXED while n grows
    * degrades SemDeDup to all-pairs (the r7 bench measured exactly
    * that — 10× data, 10.1× time at k=8). Use [[semDedupK]] to size k
    * so the expected cell stays ~`targetCell` vectors regardless of n;
    * then 10× data ⇒ 10× clusters of the SAME size ⇒ linear total work.
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               k: Int = 8, tau: Double = 0.9): DataFrame = {
    val centroids = initCentroids(df, idCol, vecCol, k)
    // assignList switches to the FlatCentroids reference object past
    // k=16 — the scaled-k path semDedupK produces must not pay literal
    // codegen that grows with k
    val assigned = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("list", assignList(col("v"), centroids))
    val l = assigned.select(col("list"), col("id").as("id_a"), col("v").as("va"))
    val r = assigned.select(col("list"), col("id").as("id_b"), col("v").as("vb"))
    val dropped = l.join(r, "list")
      .where(col("id_a") < col("id_b"))
      .where(GraftExpressions.floatCosine(col("va"), col("vb")) >= lit(tau))
      .select(col("id_b").as("id")).distinct()
    assigned.select(col("id"), col("list"))
      .join(dropped.withColumn("dropped", lit(true)), Seq("id"), "left")
      .select(col("id"), col("list"),
        coalesce(col("dropped"), lit(false)).as("dropped"))
  }
}

/** A flat centroid table as one plan-referenced object — the
  * large-k assignment path of [[Clustering]] (the CentroidIndex
  * pattern). `assign` replicates the literal `array_max(struct(cos,
  * list))` form bit-for-bit: the cosine is
  * [[graft.functions.FloatCosineExpr]]'s exact double loop (vector
  * first, centroid second, denom = sqrt(na)·sqrt(nb)), and ties keep
  * the GREATEST index — array_max's struct ordering.
  */
final class FlatCentroids(val cents: Array[Array[Float]])
    extends Serializable {
  import org.apache.spark.sql.catalyst.util.ArrayData

  def assign(v: ArrayData): Int = {
    var best = 0
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = v.getFloat(i).toDouble
        val yv = cent(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val cos = if (denom == 0.0) 0.0 else dot / denom
      // >= : ties resolve to the greatest index, as array_max does over
      // (cos, list) structs
      if (cos >= bestCos) { bestCos = cos; best = c }
      c += 1
    }
    best
  }
}

/** `argmax_c cosine(v, centroid_c)` with the whole centroid table as ONE
  * referenced [[FlatCentroids]] object — constant generated-code size at
  * any k (the literal form inlines k cosine loops and falls off the JIT
  * cliff near k≈80).
  */
case class CentroidAssignExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    index: FlatCentroids)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_assign expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = index.assign(
    input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("flatCentroids", index,
      classOf[FlatCentroids].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $idx.assign($c);")
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : CentroidAssignExpr = copy(child = newChild)
}
