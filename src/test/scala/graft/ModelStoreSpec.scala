package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ClassifierTrain
import graft.sources.ModelStore

/** C95 contracts, unit-level (the c95 oracle row gates the full
  * lifecycle end to end; these pin the store's refusal/pin/round-trip
  * behavior in isolation, on hand-made KB models): dense-coverage
  * publish audits refuse torn writers with the pointer untouched,
  * version pins serve historical states, and integer-grid weights
  * round-trip parquet bit-exactly so score-from-load ≡
  * score-from-train.
  */
class ModelStoreSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft_modelstore_$tag").toString

  private def mkModel(seed: Long): Seq[(String, Array[Long])] =
    Seq("de", "en", "es").zipWithIndex.map { case (c, ci) =>
      c -> Array.tabulate(8)(b => seed + ci * 100L + b)
    }

  test("c95: publish/load round-trips weights, class order, and meta " +
    "bit-exactly; pins serve historical versions") {
    val root = freshRoot("roundtrip")
    val m1 = mkModel(1000L)
    val rep1 = ModelStore.publishModel(s, root, m1, trainedAtEpoch = 0L)
    assert(rep1.committed, rep1.failures.mkString("; "))
    assert(ModelStore.committedModelVersion(s, root) === 1)
    val m2 = mkModel(-7L)
    val rep2 = ModelStore.publishModel(s, root, m2, trainedAtEpoch = 3L)
    assert(rep2.committed)
    assert(ModelStore.committedModelVersion(s, root) === 2)
    // the committed pointer serves v2; an explicit pin serves v1 —
    // weights AND class order AND watermark, all bit-exact
    val l2 = ModelStore.loadModel(s, root)
    val l1 = ModelStore.loadModelAt(s, root, 1)
    assert(l1.trainedAtEpoch === 0L && l2.trainedAtEpoch === 3L)
    assert(l1.nBuckets === 8 && l2.nBuckets === 8)
    assert(l1.model.map(_._1) === Seq("de", "en", "es"))
    Seq((l1, m1), (l2, m2)).foreach { case (loaded, orig) =>
      loaded.model.zip(orig).foreach { case ((lc, lw), (oc, ow)) =>
        assert(lc === oc)
        assert(lw.toSeq === ow.toSeq, s"weights drifted for class $lc")
      }
    }
  }

  test("c95: a bucket-holed class, a missing class, and a stray class " +
    "are each REFUSED at publish with the pointer untouched") {
    val root = freshRoot("refusal")
    val m = mkModel(42L)
    assert(ModelStore.publishModel(s, root, m, trainedAtEpoch = 0L).committed)
    val classes = m.map(_._1)
    val w = ModelStore.weightsFrame(s, m)
    val meta = ModelStore.metaFrame(s, classes, 8, 1L)
    // bucket hole in one class
    val holed = ModelStore.publishFrames(s, root,
      w.where(!(col("cls") === "de" && col("b") === 3)), meta, classes, 8)
    assert(!holed.committed && holed.failures.exists(_.contains("dense")),
      s"bucket hole must fail the dense audit: $holed")
    // whole class missing
    val missing = ModelStore.publishFrames(s, root,
      w.where(col("cls") =!= "en"), meta, classes, 8)
    assert(!missing.committed &&
      missing.failures.exists(_.contains("classes present")),
      s"missing class must fail coverage: $missing")
    // stray class not in meta
    val stray = ModelStore.publishFrames(s, root,
      w.unionByName(ModelStore.weightsFrame(s,
        Seq("zz" -> Array.fill(8)(1L)))), meta, classes, 8)
    assert(!stray.committed, s"stray class must fail coverage: $stray")
    // every refusal left the pointer — and therefore every reader — at v1
    assert(ModelStore.committedModelVersion(s, root) === 1)
    assert(ModelStore.loadModel(s, root).trainedAtEpoch === 0L)
  }

  test("c95: a torn pointer (weights and meta at different versions) " +
    "fails loudly instead of serving a mixed model") {
    val root = freshRoot("torn")
    assert(ModelStore.publishModel(s, root, mkModel(5L), 0L).committed)
    // corrupt the manifest by hand: meta pinned one version behind
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(root).toUri,
      s.sparkContext.hadoopConfiguration)
    assert(ModelStore.publishModel(s, root, mkModel(6L), 1L).committed)
    val commit = new org.apache.hadoop.fs.Path(root, "_COMMIT")
    val out = fs.create(commit, true)
    out.write(s"${ModelStore.MetaTable}=1\n${ModelStore.WeightsTable}=2\n"
      .getBytes("UTF-8"))
    out.close()
    val e = intercept[IllegalArgumentException] {
      ModelStore.committedModelVersion(s, root)
    }
    assert(e.getMessage.contains("torn model pointer"))
  }

  test("c95: score-from-LOAD ≡ score-from-TRAIN on a real trained " +
    "model (the 1/2^20 integer grid round-trips parquet bit-exactly)") {
    val root = freshRoot("loadscore")
    val docs = Tables(s, sfDir(), "documents").limit(120).cache()
    val classes = Seq("de", "en", "es")
    val feats = ClassifierTrain.featurizeMulti(
      docs, "text", "doc_id", "lang", 64, 2).persist()
    val trained = try {
      ClassifierTrain.trainMulticlass(feats, classes, 64, 1, 2, 64L)
        .map { case (c, r) => (c, r.weights) }
    } finally { feats.unpersist() }
    assert(ModelStore.publishModel(s, root, trained, 1L).committed)
    val loaded = ModelStore.loadModel(s, root)
    val fromTrain = ClassifierTrain
      .scoreMulticlass(docs, "text", "doc_id", trained, 64)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val fromLoad = ClassifierTrain
      .scoreMulticlass(docs, "text", "doc_id", loaded.model, loaded.nBuckets)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(fromLoad === fromTrain,
      "loaded-model scores diverged from trained-model scores")
    docs.unpersist()
  }
}
