package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ClassifierTrain

/** C75 training-loop contracts: the descent LEARNS on separable data,
  * replays deterministically (the property the DuckDB trajectory oracle
  * rests on), matches a hand-computed single step, and fails loudly on
  * degenerate configurations.
  */
class ClassifierTrainSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private val B = 64

  /** Two disjoint-vocabulary "languages" — linearly separable after
    * hashing unless two vocab words collide into every bucket equally
    * (vanishingly unlikely at 20 words / 64 buckets).
    */
  private def docs = {
    val en = Seq("the", "of", "and", "to", "in", "is", "was", "for",
      "on", "as")
    val de = Seq("der", "die", "das", "und", "ist", "von", "mit",
      "auf", "für", "als")
    (0 until 60).map { i =>
      val v = if (i % 2 == 0) en else de
      val text = (0 until 30).map(j => v((i + j * 7) % 10)).mkString(" ")
      (i.toLong, text, if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")
  }

  private def feats(nBatches: Int) =
    ClassifierTrain.featurize(docs, "text", "doc_id",
      col("lang") === "en", B, nBatches)

  test("loss decreases monotonically per mini-batch across epochs on " +
    "separable data, and the final epoch has learned most of the margin") {
    val res = ClassifierTrain.train(feats(3).persist(), B, epochs = 3,
      nBatches = 3, lrDiv = 64L)
    val byBatch = res.trace.groupBy(_.batch).view.mapValues(
      _.sortBy(_.epoch).map(_.loss)).toMap
    byBatch.values.foreach { losses =>
      assert(losses.zip(losses.tail).forall { case (a, b) => b < a },
        s"per-batch loss not strictly decreasing: $losses")
    }
    // epoch-3 total loss well below the zero-model's (epoch-1 first
    // sight of each batch starts at p=512 for every doc — maximal
    // ignorance); separable vocab must cut it by more than half
    val e1 = res.trace.filter(_.epoch == 0).map(_.loss).sum
    val e3 = res.trace.filter(_.epoch == 2).map(_.loss).sum
    assert(e3 < e1 / 2, s"epoch3=$e3 not < half of epoch1=$e1")
  }

  test("the trajectory is deterministic — two trains agree bit-for-bit") {
    val f = feats(3).persist()
    val a = ClassifierTrain.train(f, B, 2, 3, 64L)
    val b = ClassifierTrain.train(f, B, 2, 3, 64L)
    assert(a.weights.toSeq === b.weights.toSeq)
    assert(a.trace === b.trace)
  }

  test("one full-batch step equals the hand-computed gradient formula") {
    val f = feats(1).persist()
    val res = ClassifierTrain.train(f, B, epochs = 1, nBatches = 1,
      lrDiv = 64L)
    // zero weights → every doc's margin is 0 → p1024 = 512 exactly →
    // r = 512 - 1024y; expected w_b = -floor(1024 * Σ r·x_b / (64 n))
    val rows = f.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("y"), r.getAs[Long]("b"), r.getAs[Long]("x")))
    val n = rows.map(_._1).distinct.length.toLong
    val g = rows.groupBy(_._3).view.mapValues(_.map { case (_, y, _, x) =>
      (512L - 1024L * y) * x }.sum).toMap
    val expected = (0 until B).map { b =>
      val num = 1024L * g.getOrElse(b.toLong, 0L)
      -(Math.floorDiv(num, 64L * n))
    }
    assert(res.weights.toSeq === expected)
    // and the reported loss is the exact zero-model loss: n · 512²
    assert(res.trace.head.loss === n * 512L * 512L)
  }

  test("blank documents carry no features and drop out of every batch") {
    val withBlank = docs.unionByName(
      Seq((1000L, "   ", "en")).toDF("doc_id", "text", "lang"))
    val f = ClassifierTrain.featurize(withBlank, "text", "doc_id",
      col("lang") === "en", B, 3)
    assert(f.where(col("doc_id") === 1000L).count() === 0L)
  }

  test("d33: online epoch folds are bit-identical to one-epoch " +
    "mini-batch training, replayed epochs leave the weights untouched, " +
    "older epochs fail loudly") {
    val f = feats(3).persist()
    val ref = ClassifierTrain.train(f, B, epochs = 1, nBatches = 3, 64L)
    val st = new ClassifierTrain.OnlineClassifierState(B, 64L)
    val reports = (0 until 3).map { e =>
      st.foldEpoch(e.toLong, f.where(col("batch") === e))
    }
    assert(st.weights.toSeq === ref.weights.toSeq,
      "online fold must equal train(epochs = 1)")
    assert(reports.map(_._2) === ref.trace.map(_.loss),
      "per-epoch losses must match the trace")
    // replay of the LATEST epoch: same report, weights untouched
    val before = st.weights.toSeq
    assert(st.foldEpoch(2L, f.where(col("batch") === 2)) === reports(2))
    assert(st.weights.toSeq === before)
    // an OLDER epoch is lost ordering — loud, never silent
    assertThrows[IllegalArgumentException] {
      st.foldEpoch(0L, f.where(col("batch") === 0))
    }
    // a SKIPPED epoch means this state missed folds — also loud: the
    // checkpoint-restart hole (fresh weights, stream resumes at k>0)
    // must not silently continue a corrupted trajectory (r9 advice)
    assertThrows[IllegalArgumentException] {
      st.foldEpoch(5L, f.where(col("batch") === 0))
    }
    val fresh = new ClassifierTrain.OnlineClassifierState(B, 64L)
    assertThrows[IllegalArgumentException] {
      fresh.foldEpoch(2L, f.where(col("batch") === 2))
    }
    // a NEGATIVE epoch on a fresh state must not match the initial
    // lastFolded = -1 replay branch and return a null report (r10 advice)
    val fresh2 = new ClassifierTrain.OnlineClassifierState(B, 64L)
    assertThrows[IllegalArgumentException] {
      fresh2.foldEpoch(-1L, f.where(col("batch") === 0))
    }
    f.unpersist()
  }

  test("d33: streaming delivery through the maintenance sink ≡ the fold") {
    import java.nio.file.Files
    val byEpoch = (0 until 3).map(e => docs.where(col("doc_id") % 3 === e))
    // reference: fold the three epochs directly
    val stRef = new ClassifierTrain.OnlineClassifierState(B, 64L)
    byEpoch.zipWithIndex.foreach { case (d, e) =>
      stRef.foldEpoch(e.toLong,
        ClassifierTrain.featurize(d, "text", "doc_id",
          col("lang") === "en", B, 1))
    }
    // stream: one file per epoch through the real sink
    val staged = Files.createTempDirectory("graft_d33_src")
    byEpoch.zipWithIndex.foreach { case (d, e) =>
      val tmp = Files.createTempDirectory(s"graft_d33_ep$e")
      d.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, staged.resolve(f"ep$e%02d.parquet"))
    }
    val out = Files.createTempDirectory("graft_d33_out")
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val stS = new ClassifierTrain.OnlineClassifierState(B, 64L)
    val q = graft.streaming.ClassifierStream.maintenanceSink(src, stS,
      "text", "doc_id", col("lang") === "en", B,
      out.resolve("rep").toString, out.resolve("ckpt").toString)
    q.awaitTermination(120000)
    assert(stS.weights.toSeq === stRef.weights.toSeq,
      "streamed folds must reproduce the direct trajectory")
    // the landed per-epoch reports carry the post-step weights
    val lastRep = spark.read.parquet(out.resolve("rep").toString)
      .where(col("__epoch") === 2 && col("kind") === "w")
      .collect()
      .map(r => r.getAs[Long]("k").toInt -> r.getAs[Long]("v")).toMap
    assert((0 until B).map(b => lastRep(b)) === stS.weights.toSeq)
  }

  test("degenerate configurations fail loudly") {
    assertThrows[IllegalArgumentException] {
      ClassifierTrain.train(feats(1), B, epochs = 0, nBatches = 1, 64L)
    }
    // more batches than docs → some batch empty → loud, not silent
    val tiny = Seq((0L, "a b c d", "en")).toDF("doc_id", "text", "lang")
    val f = ClassifierTrain.featurize(tiny, "text", "doc_id",
      col("lang") === "en", B, 3)
    assertThrows[IllegalArgumentException] {
      ClassifierTrain.train(f, B, 1, 3, 64L)
    }
  }

  test("c79: each one-vs-rest trajectory is bit-identical to the binary " +
    "train with that class's label") {
    val mf = ClassifierTrain.featurizeMulti(docs, "text", "doc_id",
      "lang", B, 2).persist()
    val multi = ClassifierTrain.trainMulticlass(mf, Seq("en", "de"),
      B, epochs = 2, nBatches = 2, lrDiv = 64L).toMap
    for (c <- Seq("en", "de")) {
      val bin = ClassifierTrain.train(
        ClassifierTrain.featurize(docs, "text", "doc_id",
          col("lang") === c, B, 2), B, 2, 2, 64L)
      assert(multi(c).weights.toSeq === bin.weights.toSeq,
        s"class $c weights must equal the standalone binary train")
      assert(multi(c).trace === bin.trace)
    }
    mf.unpersist()
  }

  test("d36: epoch-major multiclass folds are bit-identical to " +
    "class-major training, with per-class replay/gap discipline") {
    val classes = Seq("en", "de")
    val mf = ClassifierTrain.featurizeMulti(docs, "text", "doc_id",
      "lang", B, 3).persist()
    val ref = ClassifierTrain.trainMulticlass(mf, classes, B,
      epochs = 1, nBatches = 3, lrDiv = 64L).toMap
    val st = new ClassifierTrain.OnlineMulticlassState(classes, B, 64L)
    val reports = (0 until 3).map { e =>
      st.foldEpoch(e.toLong, mf.where(col("batch") === e)).toMap
    }
    for (c <- classes) {
      assert(st.weights(c).toSeq === ref(c).weights.toSeq,
        s"class $c: online fold must equal trainMulticlass(epochs=1)")
      assert(reports.map(_(c)._2) === ref(c).trace.map(_.loss))
    }
    // replay of the LATEST epoch: remembered reports, weights untouched
    val before = classes.map(c => st.weights(c).toSeq)
    assert(st.foldEpoch(2L, mf.where(col("batch") === 2)).toMap
      === reports(2))
    assert(classes.map(c => st.weights(c).toSeq) === before)
    // a gap fails loudly (the checkpoint-restart hole, per class)
    assertThrows[IllegalArgumentException] {
      st.foldEpoch(7L, mf.where(col("batch") === 0))
    }
    mf.unpersist()
  }

  test("c79b: the trained langid separates planted languages the C8 " +
    "stopword heuristic confuses") {
    // es and fr share their highest-frequency stopwords ('de la en
    // que'); the only discriminative tokens are content words NO
    // stopword list contains ('hola' / 'bonjour'). C8 ties on the
    // shared hits and tie-breaks every doc to the same language; the
    // trained model learns the discriminative buckets.
    def mk(id: Long, lang: String, marker: String) = {
      val filler = (0 until 6).map(j => s"w${(id + j * 3) % 7}")
      (id, (Seq("de", "la", "en", "que", marker, marker) ++ filler)
        .mkString(" "), lang)
    }
    val planted = ((0L until 30L by 2).map(i => mk(i, "es", "hola")) ++
      (1L until 30L by 2).map(i => mk(i, "fr", "bonjour")))
      .toDF("doc_id", "text", "lang")
    val classes = Seq("es", "fr")
    val mf = ClassifierTrain.featurizeMulti(planted, "text", "doc_id",
      "lang", B, 2).persist()
    val model = ClassifierTrain.trainMulticlass(mf, classes, B,
      epochs = 3, nBatches = 2, lrDiv = 64L)
      .map { case (c, r) => (c, r.weights) }
    mf.unpersist()
    val pred = ClassifierTrain.scoreMulticlass(planted, "text",
      "doc_id", model, B)
    val n = planted.count()
    val trainedAcc = pred.join(planted, "doc_id")
      .where(col("pred") === col("lang")).count().toDouble / n
    val c8Acc = planted
      .where(graft.functions.TextFunctions.langId(col("text"))
        === col("lang")).count().toDouble / n
    assert(c8Acc <= 0.6,
      s"C8 should confuse the planted pair (acc $c8Acc) — fixture broken")
    assert(trainedAcc >= 0.9 && trainedAcc > c8Acc,
      s"trained langid must separate what C8 cannot: trained " +
        s"$trainedAcc vs C8 $c8Acc")
  }
}
