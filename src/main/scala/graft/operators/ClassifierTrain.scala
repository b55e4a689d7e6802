package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftExpressions, HashedClassifier}

/** Distributed classifier TRAINING (C75) — the missing train side of the
  * C37 quality-filter stack: a fastText-shaped linear classifier (Joulin
  * et al. 2016) over the same hashed unigram+bigram features
  * ([[HashedClassifier.features]]/[[HashedClassifier.bucket]]), fit by
  * mini-batch gradient descent the way CCNet/DCLM-style filters are
  * trained on in-corpus labels before they score a crawl.
  *
  * Spark-first shape (the D27 loop): the corpus is featurized ONCE into a
  * long-form (doc, batch, bucket, count) frame — one tokenize+md5 scan,
  * cached; each iteration is then two map-combined aggregations over that
  * frame (margins keyed by doc, gradient keyed by bucket) with the
  * current weights riding the plan as ONE array literal (nBuckets longs,
  * KBs). Driver state is the weight vector only — k longs, constant in
  * corpus size; per-iteration shuffle volume is docs + nBuckets rows.
  * Nothing collects rows proportional to the corpus: the gradient
  * COLLAPSES to nBuckets rows before `collect`, exactly like D27's
  * centroid sums. At 100 TB the featurized frame is the thing you keep
  * partitioned on doc_id; both per-iteration aggs combine map-side.
  *
  * Cross-engine-exact arithmetic — the trajectory REPLAYS bit-for-bit in
  * the DuckDB oracle, no transcendental anywhere:
  *
  *   - weights live on the 1/2²⁰ integer grid (longs in 1/W units,
  *     W = 2²⁰ — FINER than C37's 1/1024 scoring grid because the
  *     per-update step `G/(lrDiv·n)` must survive integer flooring at
  *     a small learning rate; on the 1/1024 grid a stable-lr update
  *     floors to 0 and the model never moves);
  *   - the margin `m = Σ w·x` is a sum of long products — exact,
  *     order-independent;
  *   - the activation is the HARD sigmoid `p = clamp(0.5 + z/4, 0, 1)`
  *     (Courbariaux et al. 2016's piecewise-linear sigmoid): in grid
  *     units `p1024 = (clamp(m, ±2W) + 2W) / 4096`, a NON-NEGATIVE
  *     integer division — floor ≡ truncate, identical in Spark, Java
  *     and DuckDB (the positive-shifted-grid rule). The smooth sigmoid
  *     would make the trajectory depend on last-ulp `exp` agreement
  *     between engines — one boundary-straddling round would cascade
  *     through every later epoch;
  *   - the residual `r = p1024 − 1024·y` and gradient `G_b = Σ r·x_b`
  *     are exact integer sums;
  *   - the update `w ← w − 1024·G/(lrDiv·n)` (the 1024 re-scales the
  *     1/1024-unit residual onto the 1/W weight grid) floor-divides
  *     via a positive shift (`(a + K·D)/D − K`, K = 2^20), again
  *     engine-identical.
  *
  * The loss reported per mini-batch is the exact integer `Σ r²` (squared
  * error in grid units against the hard-sigmoid output — the quantity
  * this descent actually reduces; its epoch trend is the convergence
  * contract the spec locks).
  */
object ClassifierTrain {

  /** Per-iteration record: (iteration, epoch, batch, n_docs, loss). */
  final case class IterStat(iter: Int, epoch: Int, batch: Int,
                            n: Long, loss: Long)

  final case class TrainResult(weights: Array[Long], trace: Seq[IterStat])

  /** Featurize once: long-form (doc_id, y, batch, b, x). Blank docs have
    * no features and drop out (they cannot move a linear model). Batch
    * assignment is `pmod(doc_id, nBatches)` — deterministic, engine-
    * independent, and at scale a hash-uniform split of the corpus.
    */
  def featurize(docs: DataFrame, textCol: String, idCol: String,
                label: Column, nBuckets: Int, nBatches: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        label.cast("int").cast("long").as("y"),
        pmod(col(idCol).cast("long"), lit(nBatches.toLong)).as("batch"),
        explode(HashedClassifier.features(col(textCol))).as("f"))
      .select(col("doc_id"), col("y"), col("batch"),
        HashedClassifier.bucket(col("f"), nBuckets).as("b"))
      .groupBy("doc_id", "y", "batch", "b")
      .agg(count(lit(1)).as("x"))
      // pre-partition the CACHED frame on doc_id: hash(doc_id)
      // satisfies every step's (doc_id, y) margin-agg clustering, so
      // the epochs×batches per-step exchanges collapse into this ONE —
      // the loop then runs map-side-only aggregations over the cached
      // partitioning (the dupClusters edge-frame trick applied to the
      // training loop). Pure layout: no arithmetic changes.
      .repartition(col("doc_id"))

  /** Weight grid: 1/W units, W = 2²⁰. */
  val WScale: Long = 1L << 20

  /** The hard-sigmoid output in 1/1024 units for a margin column in
    * 1/W units: `(clamp(m, ±2W) + 2W) div 4096` — non-negative long
    * division, floor ≡ truncate on both engines.
    */
  private def p1024(m: Column): Column =
    GraftExpressions.longDiv(
      greatest(lit(-2 * WScale), least(lit(2 * WScale), m)) + lit(2 * WScale),
      lit(4 * WScale / 1024L))

  /** Driver-side exact floor division for the weight update: positive
    * shift so Java's truncating `/` floors. K·D stays far above any
    * reachable |G| (|G| ≤ 1024 · batch feature mass ≈ 4·10⁵·n while
    * K·D = 2^20·lrDiv·n), and far below Long.MaxValue.
    */
  private def floorDiv(g: Long, d: Long): Long = {
    val K = 1L << 20
    // K·d must not overflow: d = lrDiv·n, so the shift window caps the
    // per-batch doc count at 2^42/lrDiv (≈ 6.9e10 docs at lrDiv=64) —
    // far beyond any mini-batch, but checked loudly rather than letting
    // an overflowed shift silently flip the division's sign
    require(d > 0 && d < (1L << 42),
      s"lrDiv·n = $d outside the exact-shift window — shard the batch")
    require(g.abs < K * d, s"gradient $g out of the shift window for d=$d")
    (g + K * d) / d - K
  }

  /** One gradient step over an already-featurized batch against
    * weights `w`: margins → residuals → exact (n, loss, per-bucket
    * gradient). Two map-combined jobs; the gradient collapses to
    * nBuckets rows before collect. Shared by [[train]] and the D33
    * online state — batch and stream run the LITERAL same arithmetic.
    */
  def step(batch: DataFrame, w: Array[Long])
      : (Long, Long, Map[Int, Long]) = {
    val wLit = typedlit(w.toSeq)
    // r18: ONE job per step — (n, loss) ride the gradient action as an
    // Observation on the residual subtree (exact long count/sum, same
    // aggregates the separate head() job computed), so the margin
    // aggregation is evaluated exactly once inside the single job and
    // the per-step persist/unpersist pair disappears with the second
    // job. Values unchanged: observation metrics are computed from the
    // same rows the gradient join consumes.
    val obs = org.apache.spark.sql.Observation()
    val resid = batch
      .groupBy("doc_id", "y")
      .agg(sum(col("x") *
        element_at(wLit, (col("b") + 1).cast("int"))).as("m"))
      .select(col("doc_id"),
        (p1024(col("m")) - col("y") * lit(1024L)).as("r"))
      .observe(obs, count(lit(1)).as("n"),
        sum(col("r") * col("r")).as("loss"))
    val gradRows = batch.join(resid, "doc_id")
      .groupBy("b").agg(sum(col("r") * col("x")).as("g"))
      .collect()
    // guard BEFORE obs.get: an all-empty batch can prune the observe
    // node out of the plan (no metrics ever fire) — and gradRows is
    // empty iff the batch is (every resid doc comes from batch rows)
    require(gradRows.nonEmpty, "empty mini-batch — fewer docs than batches?")
    val grad = gradRows.map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val m = obs.get
    (m("n").asInstanceOf[Long], m("loss").asInstanceOf[Long], grad)
  }

  /** Apply one collected gradient to `w` in place (exact floor-div). */
  def applyStep(w: Array[Long], grad: Map[Int, Long], n: Long,
                lrDiv: Long): Unit = {
    val d = lrDiv * n
    for (b <- w.indices)
      w(b) -= floorDiv(1024L * grad.getOrElse(b, 0L), d)
  }

  /** Run the descent: for each epoch, for each mini-batch in order,
    * one [[step]] + one [[applyStep]].
    */
  def train(feats: DataFrame, nBuckets: Int, epochs: Int, nBatches: Int,
            lrDiv: Long): TrainResult = {
    require(epochs >= 1 && nBatches >= 1 && lrDiv >= 1, "bad hyperparams")
    val w = Array.fill(nBuckets)(0L)
    val trace = Seq.newBuilder[IterStat]
    var iter = 0
    for (e <- 0 until epochs; t <- 0 until nBatches) {
      iter += 1
      val (n, loss, grad) = step(feats.where(col("batch") === t), w)
      applyStep(w, grad, n, lrDiv)
      trace += IterStat(iter, e, t, n, loss)
    }
    TrainResult(w, trace.result())
  }

  /** D33: the C75 descent as ONLINE maintenance — one gradient step per
    * ARRIVING epoch (single-pass SGD, the way a filter tracks a live
    * crawl instead of retraining on the full corpus), with the D27
    * epoch-replay discipline: a redelivered LATEST epoch returns the
    * remembered report and leaves the weights untouched; an older epoch
    * id fails loudly (Structured Streaming replays only the latest
    * uncommitted batch — an older id means lost ordering, and replaying
    * it would corrupt the trajectory). Driver state: the weight vector
    * + one epoch id — constant in corpus size. Folding epochs 0..k−1
    * where epoch e holds batch-e docs is BIT-IDENTICAL to
    * `train(epochs = 1, nBatches = k)` (same [[step]], same
    * [[applyStep]]) — which is what lets the d33 gate reuse the
    * unrolled DuckDB trajectory oracle.
    */
  final class OnlineClassifierState(nBuckets: Int,
                                    lrDiv: Long) extends Serializable {
    val weights: Array[Long] = Array.fill(nBuckets)(0L)
    private var lastFolded: Long = -1L
    private var lastReport: (Long, Long) = _

    /** Fold one arriving epoch of featurized docs; returns (n, loss).
      *
      * Epoch ids must be CONTIGUOUS from 0 (Structured Streaming batch
      * ids are): a gap means this state object did not see every prior
      * epoch — the checkpoint resumed at batch k against a freshly-built
      * state (weights zeroed), and folding k would silently continue a
      * corrupted trajectory. `epoch == lastFolded + 1` turns that
      * restart hole into a loud failure; a process that restarts must
      * either replay the stream from batch 0 into a fresh state or
      * restore (weights, lastFolded) alongside the checkpoint.
      */
    def foldEpoch(epoch: Long, feats: DataFrame): (Long, Long) = {
      // epoch >= 0 BEFORE the replay short-circuit: foldEpoch(-1) on a
      // fresh state would otherwise match lastFolded's initial -1 and
      // return the still-null lastReport instead of failing loudly.
      require(epoch >= 0, s"epoch $epoch < 0: ids are batch ids from 0")
      if (epoch == lastFolded) lastReport
      else {
        require(epoch == lastFolded + 1,
          s"epoch $epoch is not ${lastFolded + 1} (last folded " +
            s"$lastFolded): non-contiguous delivery — an older epoch is " +
            "lost ordering, a NEWER one means this state missed epochs " +
            "(e.g. a checkpoint resumed at k>0 against fresh weights)")
        val (n, loss, grad) = step(feats, weights)
        applyStep(weights, grad, n, lrDiv)
        lastFolded = epoch
        lastReport = (n, loss)
        lastReport
      }
    }
  }

  // ------------------------------------------------------- multi-class

  /** Label-agnostic featurization for one-vs-rest training: the corpus
    * is scanned ONCE into (doc_id, cls, batch, b, x) — the raw class
    * value rides along instead of a binary y, so k per-class binary
    * problems all train against the same cached frame (k× iteration
    * cost, 1× featurization cost — at 100 TB featurization is the only
    * corpus-scale pass, so sharing it is what makes one-vs-rest
    * affordable).
    */
  def featurizeMulti(docs: DataFrame, textCol: String, idCol: String,
                     classCol: String, nBuckets: Int,
                     nBatches: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(classCol).as("cls"),
        pmod(col(idCol).cast("long"), lit(nBatches.toLong)).as("batch"),
        explode(HashedClassifier.features(col(textCol))).as("f"))
      .select(col("doc_id"), col("cls"), col("batch"),
        HashedClassifier.bucket(col("f"), nBuckets).as("b"))
      .groupBy("doc_id", "cls", "batch", "b")
      .agg(count(lit(1)).as("x"))
      // one exchange for the whole k-class loop (see featurize)
      .repartition(col("doc_id"))

  /** One JOINT gradient step for ALL classes over an already-featurized
    * label-agnostic batch ([[featurizeMulti]] shape): one margin
    * aggregation computes every class's margin (one `sum(x·w_c[b])`
    * column per class — the weights ride as k array literals), one
    * residual frame carries every class's r_c, and one gradient
    * aggregation collapses to nBuckets rows with k gradient columns.
    *
    * Classes are INDEPENDENT (separate weight vectors over the same
    * docs), and every quantity is an exact LONG sum — order-independent
    * — so per class this is bit-identical to the binary [[step]] on
    * `y_c = (cls = c)`: same groups (doc_id determines cls, so grouping
    * by (doc_id, cls) IS grouping by (doc_id, y_c)), same integer
    * arithmetic. What changes is only the JOB COUNT: k classes cost the
    * same 2 jobs per step as one class, instead of 2k — the r18
    * optimization that took c79 from 20 per-class steps (5 classes x 4
    * mini-batches, ~60 jobs) to 4 joint steps (~12 jobs).
    *
    * Returns (n, per-class (loss, gradient)) in `classes` order.
    */
  def stepMulti(batch: DataFrame, classes: Seq[String],
                ws: Seq[Array[Long]])
      : (Long, Seq[(Long, Map[Int, Long])]) = {
    val k = classes.size
    val marginAggs = ws.zipWithIndex.map { case (w, i) =>
      sum(col("x") *
        element_at(typedlit(w.toSeq), (col("b") + 1).cast("int")))
        .as(s"__m_$i")
    }
    // r18: ONE job per joint step — n and the k per-class losses ride
    // the gradient action as an Observation on the residual subtree
    // (the binary step's rationale; exact long counts/sums, identical
    // aggregates), so the k-margin aggregation evaluates exactly once
    // inside the single job and the persist/unpersist pair disappears
    // with the second job.
    val obs = org.apache.spark.sql.Observation()
    val lossAggs = count(lit(1)).as("__n") +:
      (0 until k).map(i =>
        sum(col(s"__r_$i") * col(s"__r_$i")).as(s"__loss_$i"))
    val resid = batch
      .groupBy("doc_id", "cls")
      .agg(marginAggs.head, marginAggs.tail: _*)
      .select(col("doc_id") +: classes.zipWithIndex.map { case (c, i) =>
        (p1024(col(s"__m_$i")) -
          (col("cls") <=> lit(c)).cast("int").cast("long") * lit(1024L))
          .as(s"__r_$i")
      }: _*)
      .observe(obs, lossAggs.head, lossAggs.tail: _*)
    val gradAggs = (0 until k).map(i =>
      sum(col(s"__r_$i") * col("x")).as(s"__g_$i"))
    val gradRows = batch.join(resid, "doc_id")
      .groupBy("b").agg(gradAggs.head, gradAggs.tail: _*)
      .collect()
    // guard BEFORE obs.get (the binary step's rule): an all-empty batch
    // can prune the observe node out of the plan entirely
    require(gradRows.nonEmpty, "empty mini-batch — fewer docs than batches?")
    val grads = (0 until k).map { i =>
      gradRows.map(r => r.getLong(0).toInt -> r.getLong(i + 1)).toMap
    }
    val m = obs.get
    (m("__n").asInstanceOf[Long], (0 until k).map(i =>
      (m(s"__loss_$i").asInstanceOf[Long], grads(i))))
  }

  /** One-vs-rest multi-class training (C79) — the C75 binary descent
    * run for every class over the SHARED featurized frame, label
    * `y_c = (cls = c)` (Joulin et al. 2016's fastText shape for flat
    * label sets; one-vs-rest rather than softmax because the softmax
    * normalizer needs a cross-class transcendental — the hard-sigmoid
    * keeps EVERY class's trajectory on the exact integer grid, so the
    * full k-class training replays bit-for-bit in the oracle).
    * Classes are EXPLICIT (not discovered) — discovery would make the
    * model shape data-dependent; unknown class values train every
    * binary problem as a negative, which is exactly right.
    * Driver state: k weight vectors (k·nBuckets longs).
    *
    * Execution is the JOINT step ([[stepMulti]]): every (epoch, batch)
    * runs once with all k classes' margins/gradients in the same two
    * jobs — per class bit-identical to the sequential per-class loop
    * (independent integer trajectories), k times fewer jobs.
    */
  def trainMulticlass(feats: DataFrame, classes: Seq[String],
                      nBuckets: Int, epochs: Int, nBatches: Int,
                      lrDiv: Long): Seq[(String, TrainResult)] = {
    require(classes.nonEmpty && classes.distinct == classes,
      s"classes must be distinct, got $classes")
    require(epochs >= 1 && nBatches >= 1 && lrDiv >= 1, "bad hyperparams")
    val ws = classes.map(_ => Array.fill(nBuckets)(0L))
    val traces = classes.map(_ => Seq.newBuilder[IterStat])
    var iter = 0
    for (e <- 0 until epochs; t <- 0 until nBatches) {
      iter += 1
      val (n, perClass) =
        stepMulti(feats.where(col("batch") === t), classes, ws)
      perClass.zipWithIndex.foreach { case ((loss, grad), i) =>
        applyStep(ws(i), grad, n, lrDiv)
        traces(i) += IterStat(iter, e, t, n, loss)
      }
    }
    classes.zipWithIndex.map { case (c, i) =>
      c -> TrainResult(ws(i), traces(i).result())
    }
  }

  /** The trained scored path (C79's apply side — what replaces the C8
    * stopword heuristic once a labeled slice exists): per document one
    * margin per class (`m_c = Σ w_c·x`, exact long sums), prediction =
    * argmax with ties to the FIRST class in `classes` order (encoded as
    * a descending index in the comparison struct, so `array_max`'s
    * lexicographic greatest IS the deterministic argmax — one
    * projection + one doc-keyed agg, no per-class passes).
    * Output: (doc_id, pred, margin).
    */
  def scoreMulticlass(docs: DataFrame, textCol: String, idCol: String,
                      model: Seq[(String, Array[Long])],
                      nBuckets: Int): DataFrame = {
    require(model.nonEmpty, "empty model")
    val perDoc = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(HashedClassifier.features(col(textCol))).as("f"))
      .select(col("doc_id"),
        HashedClassifier.bucket(col("f"), nBuckets).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("x"))
    val margins = model.map { case (c, w) =>
      sum(col("x") * element_at(typedlit(w.toSeq),
        (col("b") + 1).cast("int"))).as(s"m_$c")
    }
    val scored = perDoc.groupBy("doc_id").agg(margins.head, margins.tail: _*)
    val best = array_max(array(model.zipWithIndex.map { case ((c, _), i) =>
      struct(col(s"m_$c").as("m"),
        lit((model.size - 1 - i).toLong).as("pref"),
        lit(c).as("cls"))
    }: _*))
    scored.select(col("doc_id"), best.getField("cls").as("pred"),
      best.getField("m").as("margin"))
  }

  /** D36: the C79 one-vs-rest model as ONLINE maintenance — one
    * [[OnlineClassifierState]] per class, every arriving epoch folded
    * into ALL classes before the next epoch arrives. Classes are
    * independent (separate weight vectors, each seeing the same epoch
    * order), so epoch-major folding is BIT-IDENTICAL per class to
    * [[trainMulticlass]] at epochs = 1 — which lets the d36 gate reuse
    * the generated per-class trajectory oracle. The contiguity/replay
    * discipline is inherited per class from the binary state (a
    * replayed LATEST epoch is a remembered no-op for every class; a
    * gap fails loudly on the first class checked). Driver state:
    * k·nBuckets longs + k epoch ids.
    */
  final class OnlineMulticlassState(classes: Seq[String], nBuckets: Int,
                                    lrDiv: Long) extends Serializable {
    require(classes.nonEmpty && classes.distinct == classes,
      s"classes must be distinct, got $classes")
    private val ws: Seq[Array[Long]] =
      classes.map(_ => Array.fill(nBuckets)(0L))
    private val byClass: Map[String, Array[Long]] =
      classes.zip(ws).toMap
    // every class folds the same epoch sequence in lockstep (the joint
    // step), so ONE epoch id carries the per-class contiguity/replay
    // discipline the binary state documents — a gap or an older id
    // fails loudly exactly as before, for every class at once
    private var lastFolded: Long = -1L
    private var lastReport: Seq[(String, (Long, Long))] = _

    def weights(c: String): Array[Long] = byClass(c)

    /** Fold one arriving epoch of label-agnostic features
      * ([[featurizeMulti]] shape) into every class; returns the
      * per-class (n, loss) reports in class order. One [[stepMulti]]
      * — two jobs for all k classes — instead of k binary steps; per
      * class the integer trajectory is bit-identical (independent
      * exact-long arithmetic, see [[stepMulti]]).
      */
    def foldEpoch(epoch: Long,
                  feats: DataFrame): Seq[(String, (Long, Long))] = {
      require(epoch >= 0, s"epoch $epoch < 0: ids are batch ids from 0")
      if (epoch == lastFolded) lastReport
      else {
        require(epoch == lastFolded + 1,
          s"epoch $epoch is not ${lastFolded + 1} (last folded " +
            s"$lastFolded): non-contiguous delivery — an older epoch is " +
            "lost ordering, a NEWER one means this state missed epochs " +
            "(e.g. a checkpoint resumed at k>0 against fresh weights)")
        val (n, perClass) = stepMulti(feats, classes, ws)
        lastReport = classes.zip(perClass.zip(ws).map {
          case ((loss, grad), w) =>
            applyStep(w, grad, n, lrDiv)
            (n, loss)
        })
        lastFolded = epoch
        lastReport
      }
    }
  }

  /** The oracle-shaped multi-class report: long-form (cls, kind, k, v)
    * — per class the final weights and the per-iteration loss/count
    * trace, one frame so one hash locks every class's whole trajectory.
    */
  def multiclassReport(docs: DataFrame, textCol: String, idCol: String,
                       classCol: String, classes: Seq[String],
                       nBuckets: Int, epochs: Int, nBatches: Int,
                       lrDiv: Long): DataFrame = {
    val spark = docs.sparkSession
    val feats = featurizeMulti(docs, textCol, idCol, classCol,
      nBuckets, nBatches).persist()
    try {
      val results = trainMulticlass(feats, classes, nBuckets, epochs,
        nBatches, lrDiv)
      import spark.implicits._
      val rows = results.flatMap { case (c, res) =>
        res.weights.zipWithIndex.toSeq
          .map { case (wv, b) => (c, "w", b.toLong, wv) } ++
        res.trace.map(s => (c, "loss", s.iter.toLong, s.loss)) ++
        res.trace.map(s => (c, "n", s.iter.toLong, s.n))
      }
      rows.toDF("cls", "kind", "k", "v").orderBy("cls", "kind", "k")
    } finally { feats.unpersist() }
  }

  /** The oracle-shaped report: long-form (kind, k, v) — final weights
    * (`kind='w'`, one row per bucket) plus the per-iteration doc counts
    * and exact losses (`kind='n'` / `kind='loss'`, keyed by iteration).
    * A single frame so one hash locks the whole trajectory: any
    * divergence in ANY update of ANY epoch changes the final weights.
    */
  def trainReport(docs: DataFrame, textCol: String, idCol: String,
                  label: Column, nBuckets: Int, epochs: Int,
                  nBatches: Int, lrDiv: Long): DataFrame = {
    val spark = docs.sparkSession
    val feats = featurize(docs, textCol, idCol, label, nBuckets, nBatches)
      .persist()
    try {
      val res = train(feats, nBuckets, epochs, nBatches, lrDiv)
      import spark.implicits._
      val rows =
        res.weights.zipWithIndex.toSeq
          .map { case (wv, b) => ("w", b.toLong, wv) } ++
        res.trace.map(s => ("loss", s.iter.toLong, s.loss)) ++
        res.trace.map(s => ("n", s.iter.toLong, s.n))
      rows.toDF("kind", "k", "v").orderBy("kind", "k")
    } finally { feats.unpersist() }
  }
}
