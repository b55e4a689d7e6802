package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Training-data decontamination: flag training documents that share any
  * width-`n` word shingle with an evaluation/benchmark set — the standard
  * n-gram-overlap check (GPT-3 appendix C / PaLM style) run before a
  * training corpus ships.
  *
  * Scale shape: the eval set is the SMALL side by definition (benchmarks
  * are KBs–MBs, the corpus is the 100 TB side), so its distinct shingle
  * hashes broadcast; the corpus is scanned once, map-side, through the
  * codegen'd [[graft.functions.ShingleHashesExpr]] (distinct hashes per
  * doc, no per-gram string allocation), and only matched (id, gram) pairs
  * ever reach the aggregation. No corpus-sized shuffle: the groupBy
  * carries overlap hits only, and clean docs rejoin via their ids.
  */
object Decontaminate {

  /** Per-doc overlap report: (id, n_overlap, contaminated).
    *
    * @param n shingle width in words — 8 is the common contamination
    *          definition (13 for GPT-3's dedup; smaller = stricter)
    */
  def flagContaminated(docs: DataFrame, evalDocs: DataFrame,
                       textCol: String, idCol: String,
                       n: Int = 8): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(Dedup.shingleHashes(col(textCol), n)).as("gram"))
      .distinct()
    val docGrams = docs.select(col(idCol).as("id"),
      explode(Dedup.shingleHashes(col(textCol), n)).as("gram"))
    // shingle hashes are DISTINCT per doc, so count(*) == distinct overlap
    val overlaps = docGrams.join(F.broadcast(evalGrams), Seq("gram"))
      .groupBy("id").agg(count(lit(1)).as("n_overlap"))
    docs.select(col(idCol))
      .join(overlaps, col(idCol) === col("id"), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }

  /** N-gram novelty scoring — the GRADED complement of
    * [[flagContaminated]]: instead of a binary any-overlap flag, score
    * each candidate document by the fraction of its shingles NOT already
    * present in a reference corpus. Data-selection pipelines use this to
    * prefer novel text when budgeting an incremental crawl (a page that
    * is 95% boilerplate already seen contributes almost nothing).
    *
    * Scale shape: identical to [[flagContaminated]] — the reference
    * shingle set is the broadcast side (or, at crawl scale, the C34/D21
    * bloom generations stand in for it with a documented FP bias toward
    * LOWER novelty, never higher), the candidate corpus is scanned once
    * map-side through the codegen shingle expression, and only matched
    * pairs reach the count. The ratio ships as exact integer ppm
    * (truncating division on BIGINTs) so no float ever crosses engines.
    */
  def noveltyScores(docs: DataFrame, refDocs: DataFrame, textCol: String,
                    idCol: String, n: Int = 8): DataFrame = {
    val refGrams = refDocs
      .select(explode(Dedup.shingleHashes(col(textCol), n)).as("gram"))
      .distinct()
    val docGrams = docs.select(col(idCol).as("id"),
      explode(Dedup.shingleHashes(col(textCol), n)).as("gram"))
    // shingle hashes are distinct per doc, so both counts are distinct-gram
    // counts; n_grams rides the same exchange as the overlap count
    val seen = docGrams
      .join(F.broadcast(refGrams.select(col("gram"), lit(1).as("__hit"))),
        Seq("gram"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_seen"))
    docs.select(col(idCol))
      .join(seen, col(idCol) === col("id"), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0L))
          .otherwise((coalesce(col("n_grams"), lit(0L)) -
            coalesce(col("n_seen"), lit(0L))) * lit(1000000L) /
            col("n_grams"))
          .cast("long").as("novelty_ppm"))
  }

  /** Eval-side contamination report (C66) — the REVERSE direction of
    * [[flagContaminated]]: per EVAL item, how badly is it compromised
    * (how many of its shingles appear in training data, from how many
    * distinct training documents). This is the audit table a model card
    * publishes: c24 decides which training docs to drop, this measures
    * which eval numbers to distrust if they weren't dropped.
    *
    * Scale shape: identical to c24 — the eval gram set broadcasts, the
    * training corpus is scanned once map-side, only matched pairs reach
    * the aggregation; distinct-counting is over (eval, gram) and
    * (eval, train-doc) pairs, both bounded by hit volume.
    */
  def evalContaminationReport(trainDocs: DataFrame, evalDocs: DataFrame,
                              textCol: String, idCol: String,
                              n: Int = 8): DataFrame = {
    val evalGrams = evalDocs
      .select(col(idCol).as("eval_id"),
        explode(Dedup.shingleHashes(col(textCol), n)).as("gram"))
    val trainGrams = trainDocs.select(col(idCol).as("train_id"),
      explode(Dedup.shingleHashes(col(textCol), n)).as("gram"))
    val hits = trainGrams.join(F.broadcast(evalGrams), Seq("gram"))
      .groupBy("eval_id")
      .agg(countDistinct("gram").as("n_grams_hit"),
        countDistinct("train_id").as("n_train_docs"))
    val totals = evalDocs.select(col(idCol).as("eval_id"),
      size(Dedup.shingleHashes(col(textCol), n)).cast("long").as("n_grams"))
    totals.join(hits, Seq("eval_id"), "left")
      .select(col("eval_id"), col("n_grams"),
        coalesce(col("n_grams_hit"), lit(0L)).as("n_grams_hit"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        (coalesce(col("n_grams_hit"), lit(0L)) === 0).as("clean"))
  }

  /** Semantic decontamination — the EMBEDDING-space complement of
    * [[flagContaminated]]: an n-gram check misses paraphrased or
    * translated eval leakage, so pipelines also flag corpus items whose
    * embedding is within cosine `tau` of ANY eval item's embedding.
    *
    * Scale shape: eval sets are bounded by definition (a benchmark is
    * KBs–MBs), so the whole eval matrix rides the plan as ONE codegen
    * reference object ([[EvalIndex]] — the CentroidIndex/PqIndex
    * pattern: constant generated-code size, one virtual call per row
    * into a compiled scalar loop). The corpus is scanned once, map-only,
    * joinless, no shuffle; per-row cost is |eval|·dim multiply-adds.
    * The collect is guarded: an oversized eval frame fails loudly
    * instead of OOMing the driver (the BalancedRepartition contract).
    *
    * Ties in the argmax resolve to the smallest eval id (the index is
    * id-sorted and comparison is strict), so output is deterministic.
    * Returns (idCol, max_cos, nearest_eval_id, flagged).
    */
  def semanticFlags(corpus: DataFrame, evalSet: DataFrame, idCol: String,
                    vecCol: String, evalIdCol: String, evalVecCol: String,
                    tau: Double, maxEval: Int = 100000): DataFrame = {
    import org.apache.spark.sql.classic.GraftColumnBridge
    val rows = evalSet
      .select(col(evalIdCol).cast("long"), col(evalVecCol))
      .limit(maxEval + 1).collect()
    require(rows.nonEmpty, "semanticFlags: eval set is empty")
    require(rows.length <= maxEval,
      s"semanticFlags: eval set exceeds maxEval=$maxEval rows; " +
        "raise the bound explicitly if the eval frame is really this big")
    val sorted = rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val index = new EvalIndex(sorted.map(_._1), sorted.map(_._2))
    val best = GraftColumnBridge.column(
      SemanticBestExpr(GraftColumnBridge.expression(col("__v")), index))
    corpus.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("__best", best)
      .select(col(idCol),
        col("__best.cos").as("max_cos"),
        col("__best.eval_id").as("nearest_eval_id"),
        (col("__best.cos") >= lit(tau)).as("flagged"))
  }
}

/** Id-sorted eval-embedding matrix for [[Decontaminate.semanticFlags]].
  * One instance rides the plan as a codegen reference object; `best` is a
  * tight scalar loop (double accumulation, ascending index — the c6
  * cosine contract, so the DuckDB replica is bit-honest before rounding).
  */
final class EvalIndex(val ids: Array[Long], val vecs: Array[Array[Float]])
    extends Serializable {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  private val norms: Array[Double] = vecs.map { a =>
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i); i += 1 }
    math.sqrt(s)
  }

  /** (max cosine, its eval id); ties keep the first (= smallest) id. */
  def best(v: ArrayData): GenericInternalRow = {
    var nv = 0.0
    var i = 0
    val n = v.numElements()
    while (i < n) { val x = v.getFloat(i).toDouble; nv += x * x; i += 1 }
    nv = math.sqrt(nv)
    var bestCos = Double.MinValue
    var bestId = ids(0)
    var e = 0
    while (e < vecs.length) {
      val c = vecs(e)
      var s = 0.0
      var j = 0
      val m = math.min(n, c.length)
      while (j < m) { s += v.getFloat(j).toDouble * c(j); j += 1 }
      val d = norms(e) * nv
      val cos = if (d == 0) 0.0 else s / d
      if (cos > bestCos) { bestCos = cos; bestId = ids(e) }
      e += 1
    }
    new GenericInternalRow(Array[Any](bestCos, bestId))
  }
}

/** semantic_best(vec) → struct<cos: double, eval_id: long>. */
case class SemanticBestExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    index: EvalIndex)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"semantic_best expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("eval_id", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any = index.best(
    input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("evalIndex", index,
      classOf[EvalIndex].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $idx.best($c);")
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : SemanticBestExpr = copy(child = newChild)
}
