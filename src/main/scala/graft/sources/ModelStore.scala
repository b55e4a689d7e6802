package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned classifier-MODEL persistence (C95) — the C81 discipline
  * (publish/load an index as a versioned artifact) applied to the other
  * in-session state the engine still retrained to consult: C79's
  * one-vs-rest weights. A deployed quality/langid filter is a MODEL
  * ARTIFACT (fastText's save_model/load_model contract, Joulin et
  * al. 2016): training produces it once, serving sessions LOAD the
  * committed version and score — they never retrain. Before this store
  * existed, c79b/c92's scoring paths trained inline (~90% of their
  * headline cost, the r11 verdict's top ask).
  *
  * The model state is two KB-sized TABLES published together through
  * [[MultiPublish.publishAll]]'s ATOMIC multi-table commit (A37):
  *
  *   - `clf_weights` (cls, b, w): k·nBuckets longs on the exact 1/2²⁰
  *     integer grid ([[graft.operators.ClassifierTrain]]'s arithmetic —
  *     integers round-trip parquet bit-exactly, so serve-from-load is
  *     HASH-IDENTICAL to serve-from-train, the property the c79b oracle
  *     row rests on);
  *   - `clf_meta` (ord, cls, n_buckets, trained_at_epoch): the CLASS
  *     ORDER (argmax ties break to the FIRST training class — a model
  *     whose class order is lost scores differently), the feature-space
  *     width, and the training watermark.
  *
  * A reader following the commit pointer can never see weights from one
  * training state beside another's meta — the torn-model failure the
  * atomic pointer exists to prevent. Structural audits ride the publish
  * (the AnnIndexStore rule: a torn table fails the PUBLISH audit, not a
  * query): every declared class present with a DENSE bucket vector
  * (count = nBuckets, min = 0, max = nBuckets−1), class order dense
  * 0..k−1, one consistent nBuckets.
  *
  * Version semantics are the C85 blue/green contract: each publish
  * advances both tables together; `loadModelAt` pins a historical
  * version (serve the old model through a rollover; A/B two training
  * depths), `loadModel` follows the committed pointer. Continued
  * training (D33/D36 epoch folds) publishes its snapshots as ordinary
  * new versions against the same root.
  *
  * At 100 TB: the model tables are KBs (k·nBuckets longs + k meta
  * rows) — publish and load are metadata-cost; the corpus-scale cost
  * (featurize + margins) lives entirely in training and scoring,
  * unchanged. Nothing here scans the corpus.
  */
object ModelStore {

  val WeightsTable = "clf_weights"
  val MetaTable = "clf_meta"

  /** A loaded model: per-class weights IN TRAINING ORDER (argmax ties
    * break to the first class), the feature width, and the training
    * watermark the publisher recorded.
    */
  final case class LoadedModel(model: Seq[(String, Array[Long])],
                               nBuckets: Int, trainedAtEpoch: Long)

  /** The weights table: (cls, b, w) long-form. */
  def weightsFrame(spark: SparkSession,
                   model: Seq[(String, Array[Long])]): DataFrame = {
    import spark.implicits._
    model.flatMap { case (c, w) =>
      w.zipWithIndex.map { case (wv, b) => (c, b, wv) }
    }.toDF("cls", "b", "w")
  }

  /** The meta table: (ord, cls, n_buckets, trained_at_epoch). */
  def metaFrame(spark: SparkSession, classes: Seq[String], nBuckets: Int,
                trainedAtEpoch: Long): DataFrame = {
    import spark.implicits._
    classes.zipWithIndex
      .map { case (c, i) => (i, c, nBuckets, trainedAtEpoch) }
      .toDF("ord", "cls", "n_buckets", "trained_at_epoch")
  }

  /** Publish one trained model (both tables, atomically) under `root`;
    * returns the publish report — versions advance together or not at
    * all. `trainedAtEpoch` is the publisher's training watermark (e.g.
    * the last folded D33/D36 epoch id) so a serving session can tell
    * WHICH training state it is scoring with.
    */
  def publishModel(spark: SparkSession, root: String,
                   model: Seq[(String, Array[Long])],
                   trainedAtEpoch: Long,
                   batchId: Option[Long] = None): MultiPublish.MultiReport = {
    require(model.nonEmpty, "publishModel: empty model")
    val classes = model.map(_._1)
    require(classes.distinct == classes,
      s"duplicate classes in model: $classes")
    val nBuckets = model.head._2.length
    require(nBuckets > 0 && model.forall(_._2.length == nBuckets),
      s"non-uniform weight-vector lengths: ${model.map(_._2.length)}")
    publishFrames(spark, root, weightsFrame(spark, model),
      metaFrame(spark, classes, nBuckets, trainedAtEpoch),
      classes, nBuckets, batchId)
  }

  /** INTERNAL (ModelStoreSpec + the c95 refusal probe): publish EXPLICIT
    * frames under the model audits — the path a torn or partial writer
    * (a class dropped, a bucket hole) takes, and where it must be
    * REFUSED: committed=false, failures named, pointer and every
    * reader's view untouched.
    */
  private[graft] def publishFrames(spark: SparkSession, root: String,
                                   weightsDf: DataFrame, metaDf: DataFrame,
                                   classes: Seq[String], nBuckets: Int,
                                   batchId: Option[Long] = None)
      : MultiPublish.MultiReport = {
    // every declared class present with a DENSE bucket vector — an
    // intra-class hole (the AnnIndexStore dense-code rule) or a missing
    // class must fail the publish audit, not mis-score at query time
    val wAudit: Wap.Audit = (s"class_coverage(${classes.size}x$nBuckets)",
      df => {
        val rows = df.groupBy(col("cls"))
          .agg(countDistinct(col("b")).as("k"),
            min(col("b")).as("lo"), max(col("b")).as("hi")).collect()
        val present = rows.map(_.getString(0)).toSet
        val holed = rows.filter(r => r.getLong(1) != nBuckets.toLong ||
          r.getInt(2) != 0 || r.getInt(3) != nBuckets - 1)
        if (present != classes.toSet)
          Some(s"classes present=${present.toSeq.sorted.mkString(",")}, " +
            s"want ${classes.sorted.mkString(",")}")
        else if (holed.nonEmpty)
          Some(holed.map(r => s"class ${r.getString(0)} buckets not dense " +
            s"0..${nBuckets - 1}: k=${r.getLong(1)}, min=${r.getInt(2)}, " +
            s"max=${r.getInt(3)}").mkString("; "))
        else None
      })
    val mAudit: Wap.Audit = ("meta_order", df => {
      val rows = df.select(col("ord"), col("n_buckets")).collect()
      val ords = rows.map(_.getInt(0)).sorted.toSeq
      val nbs = rows.map(_.getInt(1)).distinct.toSeq
      if (ords != classes.indices)
        Some(s"ord not dense 0..${classes.size - 1}: ${ords.mkString(",")}")
      else if (nbs != Seq(nBuckets))
        Some(s"inconsistent n_buckets: ${nbs.mkString(",")}")
      else None
    })
    MultiPublish.publishAll(spark, Map(
      WeightsTable -> ((weightsDf, Seq(Wap.minRows(1), wAudit))),
      MetaTable -> ((metaDf, Seq(Wap.minRows(1), mAudit)))),
      root, batchId)
  }

  /** The COMMITTED model version — both tables advance together through
    * the A37 atomic commit, so a split pointer is structural corruption
    * and fails loudly.
    */
  def committedModelVersion(spark: SparkSession, root: String): Int = {
    val vs = MultiPublish.commitVersions(spark, root)
    val vw = vs.getOrElse(WeightsTable, throw new IllegalStateException(
      s"no committed $WeightsTable under $root"))
    val vm = vs.getOrElse(MetaTable, throw new IllegalStateException(
      s"no committed $MetaTable under $root"))
    require(vw == vm, s"torn model pointer: weights v$vw vs meta v$vm")
    vw
  }

  /** Load the COMMITTED model — what a serving session does instead of
    * retraining.
    */
  def loadModel(spark: SparkSession, root: String): LoadedModel =
    loadModelAt(spark, root, committedModelVersion(spark, root))

  /** Load an EXPLICIT model version (time-travel pin — serve the old
    * model through a rollover, or A/B two training depths). Loud on
    * structural holes: a missing class or bucket would silently shift
    * every margin.
    */
  def loadModelAt(spark: SparkSession, root: String,
                  version: Int): LoadedModel = {
    val metaRows = MultiPublish.readVersion(spark, root, MetaTable, version)
      .select("ord", "cls", "n_buckets", "trained_at_epoch").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._1)
    require(metaRows.nonEmpty &&
      metaRows.map(_._1).toSeq == metaRows.indices.toSeq,
      s"meta order holes: ${metaRows.map(_._1).mkString(",")}")
    val nbs = metaRows.map(_._3).distinct
    require(nbs.length == 1, s"inconsistent n_buckets: ${nbs.mkString(",")}")
    val eps = metaRows.map(_._4).distinct
    require(eps.length == 1,
      s"inconsistent trained_at_epoch: ${eps.mkString(",")}")
    val nBuckets = nbs.head
    val classes = metaRows.map(_._2).toSeq
    val wRows = MultiPublish.readVersion(spark, root, WeightsTable, version)
      .select("cls", "b", "w").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    val model = classes.map { c =>
      val rows = wRows.getOrElse(c, throw new IllegalStateException(
        s"class '$c' missing from $WeightsTable v$version"))
        .sortBy(_._2)
      require(rows.map(_._2).toSeq == (0 until nBuckets),
        s"class '$c' bucket holes: ${rows.map(_._2).mkString(",")}")
      c -> rows.map(_._3)
    }
    require(wRows.keySet == classes.toSet,
      s"stray classes in $WeightsTable v$version: " +
        s"${(wRows.keySet -- classes).mkString(",")}")
    LoadedModel(model, nBuckets, eps.head)
  }
}
