package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VerdictStore
import graft.streaming.VerdictStream

/** D48 contracts through the REAL sink: each arriving doc epoch lands
  * its artifacts into the three media stores and publishes a new
  * verdict version; the MID-crawl version already carries the media
  * verdicts while the text pairs (whose copies arrive a whole epoch
  * later) appear only in the final version — cross-epoch pair
  * formation through the stores; the final version equals the one-shot
  * fold on the same corpus; a consumer pinned at v1 is byte-stable
  * through the advance; and a fresh-checkpoint redelivery converges
  * (stores via D8, publishes via the batch watermark).
  */
class VerdictStreamSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark

  private def freshRoots(tag: String): VerdictStream.Roots = {
    def d(n: String) =
      Files.createTempDirectory(s"graft_d48_${tag}_$n").toString
    VerdictStream.Roots(d("sigs"), d("img"), d("aud"), d("verd"),
      d("docs") + "/seen")
  }

  test("d48: verdicts advance version-by-version under arrival; text " +
    "dups form across epochs through the stores; final ≡ one-shot; " +
    "pinned v1 stable; fresh-checkpoint redelivery converges") {
    val docs = Tables(s, sfDir(), "documents").select("doc_id", "text")
      .limit(60).cache()
    // epoch 0: the originals (all media). epoch 1: the re-crawled
    // copies of the ≡1 mod 3 slice — every text pair CROSSES epochs
    val copies = docs.where(pmod(col("doc_id"), lit(3)) === 1)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    val staged = Files.createTempDirectory("graft_d48_src")
    Seq(docs, copies).zipWithIndex.foreach { case (ep, i) =>
      val tmp = Files.createTempDirectory(s"graft_d48_ep$i")
      ep.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, staged.resolve(f"ep$i%02d.parquet"))
    }
    val r = freshRoots("main")
    VerdictStream.initStores(s, r)
    def runSink(): Unit = {
      val src = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged.toString)
      val q = VerdictStream.maintenanceSink(src, r,
        Files.createTempDirectory("graft_d48_ck").toString)
      q.awaitTermination(180000)
      ()
    }
    runSink()
    assert(VerdictStore.committedVersion(s, r.verdicts) === 2,
      "two epochs must land two verdict versions")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getBoolean(1), x.getBoolean(2),
          x.getBoolean(3), x.getString(4))).toSeq
    val v1 = rows(VerdictStore.loadVerdictsAt(s, r.verdicts, 1))
    val v2 = rows(VerdictStore.loadVerdictsAt(s, r.verdicts, 2))
    // mid-crawl: media dups already flagged, no text pair CAN exist
    // yet (the copies have not arrived)
    assert(v1.nonEmpty && v1.forall(!_._2),
      "no text_dup may exist before the copies arrive")
    assert(v1.exists(_._3) && v1.exists(_._4),
      "media dups must already be flagged mid-crawl")
    // final: the cross-epoch text pairs landed
    assert(v2.exists(_._2), "text dups must appear once copies arrive")
    // final ≡ one-shot: everything ingested as a single epoch into
    // fresh stores, the same fold
    val one = freshRoots("oneshot")
    VerdictStream.initStores(s, one)
    VerdictStream.foldAndPublish(s, docs.unionByName(copies), 0L, one)
    assert(v2 === rows(VerdictStore.loadCommitted(s, one.verdicts)),
      "streamed final verdicts diverged from the one-shot fold")
    // fresh-checkpoint redelivery: stores converge (D8), publishes are
    // watermark-skipped, the committed view is unchanged
    runSink()
    assert(VerdictStore.committedVersion(s, r.verdicts) === 2,
      "redelivery must not mint new versions")
    assert(rows(VerdictStore.loadCommitted(s, r.verdicts)) === v2,
      "redelivery must not change the committed verdicts")
    assert(rows(VerdictStore.loadVerdictsAt(s, r.verdicts, 1)) === v1,
      "the pinned v1 table must be byte-stable through everything")
  }

  test("d49: ledger maintenance through the real sink ≡ the recompute " +
    "fold; per-epoch ledger appends are delta-sized; fresh-checkpoint " +
    "redelivery is a ledger no-op") {
    import graft.sources.PairLedger
    val docs = Tables(s, sfDir(), "documents").select("doc_id", "text")
      .limit(60).cache()
    val copies = docs.where(pmod(col("doc_id"), lit(3)) === 1)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    val staged = Files.createTempDirectory("graft_d49_src")
    Seq(docs, copies).zipWithIndex.foreach { case (ep, i) =>
      val tmp = Files.createTempDirectory(s"graft_d49_ep$i")
      ep.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, staged.resolve(f"ep$i%02d.parquet"))
    }
    val r = freshRoots("ledger")
    val pairsRoot =
      Files.createTempDirectory("graft_d49_pairs").toString + "/ledger"
    VerdictStream.initStores(s, r)
    def runSink(): Unit = {
      val src = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged.toString)
      val q = VerdictStream.ledgerMaintenanceSink(src, r, pairsRoot,
        Files.createTempDirectory("graft_d49_ck").toString)
      q.awaitTermination(180000)
      ()
    }
    runSink()
    assert(VerdictStore.committedVersion(s, r.verdicts) === 2,
      "two epochs must land two verdict versions")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getBoolean(1), x.getBoolean(2),
          x.getBoolean(3), x.getString(4))).toSeq
    val v2 = rows(VerdictStore.loadCommitted(s, r.verdicts))
    // ledger final ≡ the NON-ledger recompute fold on the same corpus:
    // the two maintenance strategies must ship the same table
    val one = freshRoots("ledgeroneshot")
    VerdictStream.initStores(s, one)
    VerdictStream.foldAndPublish(s, docs.unionByName(copies), 0L, one)
    assert(v2 === rows(VerdictStore.loadCommitted(s, one.verdicts)),
      "ledger-built verdicts diverged from the recompute fold")
    // mid-crawl: no text pair can exist before the copies arrive
    assert(rows(VerdictStore.loadVerdictsAt(s, r.verdicts, 1))
      .forall(!_._2), "no text_dup may exist before the copies arrive")
    // delta-sized appends: every epoch-1 text-ledger pair touches an
    // epoch-1 arrival (the +1e6 copies) — an epoch that re-appended
    // history would put copy-free pairs in its own partition
    def pairRows(m: String) = s.read.parquet(s"$pairsRoot/$m")
      .select(col("id_a"), col("id_b"), col("__epoch").cast("long"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val textPairs = pairRows("text")
    assert(textPairs.exists(_._3 == 1L), "epoch 1 must append text pairs")
    assert(textPairs.filter(_._3 == 1L).forall(_._2 >= 1000000L),
      "an epoch's ledger partition may hold only pairs touching its " +
        "own arrivals (delta-sized, never history replay)")
    // normalized, duplicate-free across epochs
    assert(textPairs.forall(p => p._1 < p._2),
      "ledger pairs must land normalized id_a < id_b")
    PairLedger.Modalities.foreach { m =>
      val ps = pairRows(m).toSeq
      assert(ps.groupBy(p => (p._1, p._2)).forall(_._2.size == 1),
        s"a $m pair must appear in exactly one ledger epoch")
    }
    // fresh-checkpoint redelivery: ledger partitions overwrite
    // themselves bit-identically, publishes are watermark-skipped
    runSink()
    assert(VerdictStore.committedVersion(s, r.verdicts) === 2,
      "redelivery must not mint new versions")
    assert(pairRows("text") === textPairs,
      "redelivery must not change the ledger content")
    assert(rows(VerdictStore.loadCommitted(s, r.verdicts)) === v2,
      "redelivery must not change the committed verdicts")
  }

  test("d49b: streamed compaction (compactEvery) keeps the ledger at " +
    "O(1) partitions under arrival without changing the verdicts; a " +
    "fresh-checkpoint redelivery still converges") {
    import graft.sources.PairLedger
    val docs = Tables(s, sfDir(), "documents").select("doc_id", "text")
      .limit(60).cache()
    val copies = docs.where(pmod(col("doc_id"), lit(3)) === 1)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    val staged = Files.createTempDirectory("graft_d49b_src")
    Seq(docs, copies).zipWithIndex.foreach { case (ep, i) =>
      val tmp = Files.createTempDirectory(s"graft_d49b_ep$i")
      ep.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, staged.resolve(f"ep$i%02d.parquet"))
    }
    val r = freshRoots("ledgercomp")
    val pairsRoot =
      Files.createTempDirectory("graft_d49b_pairs").toString + "/ledger"
    VerdictStream.initStores(s, r)
    def runSink(): Unit = {
      val src = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged.toString)
      val q = VerdictStream.ledgerMaintenanceSink(src, r, pairsRoot,
        Files.createTempDirectory("graft_d49b_ck").toString,
        compactEvery = 1)
      q.awaitTermination(180000)
      ()
    }
    runSink()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getBoolean(1), x.getBoolean(2),
          x.getBoolean(3), x.getString(4))).toSeq
    val v = rows(VerdictStore.loadCommitted(s, r.verdicts))
    // ≡ the recompute fold on the same corpus
    val one = freshRoots("ledgercomponeshot")
    VerdictStream.initStores(s, one)
    VerdictStream.foldAndPublish(s, docs.unionByName(copies), 0L, one)
    assert(v === rows(VerdictStore.loadCommitted(s, one.verdicts)),
      "compacted-ledger verdicts diverged from the recompute fold")
    def nParts(m: String): Int = {
      val d = new java.io.File(s"$pairsRoot/$m")
      if (!d.exists()) 0
      else d.listFiles().count(f =>
        f.isDirectory && f.getName.startsWith("__epoch="))
    }
    // epoch 1's fold retired epoch 0's partition; at most the merged
    // partition + the in-flight epoch remain
    PairLedger.Modalities.foreach { m =>
      assert(nParts(m) <= 2,
        s"$m ledger must stay at O(1) partitions, got ${nParts(m)}")
    }
    // fresh-checkpoint redelivery: stragglers re-land and are absorbed
    runSink()
    assert(rows(VerdictStore.loadCommitted(s, r.verdicts)) === v,
      "redelivery must not change the committed verdicts")
  }

  test("c135: ledger compaction folds epochs ≤ watermark into one " +
    "partition, preserves the pair multiset, leaves the in-flight " +
    "tail untouched, and no-ops on ≤1 partitions / a missing modality") {
    import graft.sources.PairLedger
    val root = Files.createTempDirectory("graft_c135").toString + "/ledger"
    def pairsOf(xs: (Long, Long)*) = {
      import s.implicits._
      xs.toSeq.toDF("id_a", "id_b")
    }
    PairLedger.appendPairsEpoch(pairsOf((1L, 2L)), root, "text", 0L)
    PairLedger.appendPairsEpoch(pairsOf((3L, 4L), (5L, 6L)), root,
      "text", 1L)
    PairLedger.appendPairsEpoch(pairsOf((7L, 8L)), root, "text", 2L)
    PairLedger.appendPairsEpoch(pairsOf((9L, 10L)), root, "text", 3L)
    def all = PairLedger.readPairs(s, root, "text").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    def parts = new java.io.File(root + "/text").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__epoch="))
      .map(_.getName).sorted.toSeq
    val before = all
    assert(parts.size === 4)
    val rep = PairLedger.compactEpochs(s, root, "text", 2L)
    assert(rep.into === -1L && rep.folded === Seq(0L, 1L, 2L),
      s"fold accounting off: $rep")
    assert(parts === Seq("__epoch=-1", "__epoch=3"),
      "epochs ≤ 2 fold into one RESERVED partition; the in-flight " +
        "tail survives")
    assert(all === before, "compaction must preserve the pair set")
    // idempotent: one eligible partition left at the watermark → no-op
    assert(PairLedger.compactEpochs(s, root, "text", 2L).folded.isEmpty)
    assert(all === before && parts.size === 2)
    // a deliverable-epoch redelivery AFTER compaction (the r16 advice's
    // collision finding): the D8 overwrite re-lands its OWN partition
    // beside the reserved one — folded history is untouchable
    PairLedger.appendPairsEpoch(pairsOf((1L, 2L)), root, "text", 0L)
    assert(all.distinct === before,
      "post-compaction redelivery must not change the readable pair SET " +
        "(the straggler's rows duplicate until the next fold)")
    assert(parts === Seq("__epoch=-1", "__epoch=0", "__epoch=3"),
      "the straggler re-lands beside the merged history, never over it")
    // … and the next fold retires the straggler duplicates (distinct)
    val rep2 = PairLedger.compactEpochs(s, root, "text", 2L)
    assert(rep2.into === -2L && rep2.folded === Seq(-1L, 0L))
    assert(all === before && parts === Seq("__epoch=-2", "__epoch=3"))
    // a modality nothing has written yet is a quiet no-op
    assert(PairLedger.compactEpochs(s, root, "image", 5L).folded.isEmpty)
    // deliverable epochs may never use the reserved range
    intercept[IllegalArgumentException] {
      PairLedger.appendPairsEpoch(pairsOf((1L, 2L)), root, "text", -1L)
    }
  }

  test("c135b: a planted crash in EITHER swap window loses no pair — " +
    "before the rename the live tree is untouched; after it the " +
    "duplicates converge on the next fold") {
    import graft.sources.PairLedger
    val root = Files.createTempDirectory("graft_c135b").toString + "/ledger"
    def pairsOf(xs: (Long, Long)*) = {
      import s.implicits._
      xs.toSeq.toDF("id_a", "id_b")
    }
    PairLedger.appendPairsEpoch(pairsOf((1L, 2L)), root, "text", 0L)
    PairLedger.appendPairsEpoch(pairsOf((3L, 4L)), root, "text", 1L)
    def all = PairLedger.readPairs(s, root, "text").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    def parts = new java.io.File(root + "/text").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__epoch="))
      .map(_.getName).sorted.toSeq
    val expect = Seq((1L, 2L), (3L, 4L))
    // window 1: crash BEFORE the rename — the merged copy exists only
    // under the underscore temp; the live tree must be untouched
    graft.sources.LedgerFold.beforeSwapHook = () => sys.error("planted pre-swap crash")
    try intercept[RuntimeException] {
      PairLedger.compactEpochs(s, root, "text", 1L)
    } finally graft.sources.LedgerFold.beforeSwapHook = () => ()
    assert(parts === Seq("__epoch=0", "__epoch=1"),
      "a pre-rename crash must leave the live tree untouched")
    assert(all === expect)
    // recovery is just running compaction again (the stale temp is
    // swept; its contents still live in the folded partitions)
    assert(PairLedger.compactEpochs(s, root, "text", 1L).into === -1L)
    assert(all === expect && parts === Seq("__epoch=-1"))
    // window 2: crash AFTER the rename, BEFORE the deletes — merged
    // AND folded partitions are both visible (duplicates, never loss)
    PairLedger.appendPairsEpoch(pairsOf((5L, 6L)), root, "text", 2L)
    graft.sources.LedgerFold.afterSwapHook = () => sys.error("planted post-swap crash")
    try intercept[RuntimeException] {
      PairLedger.compactEpochs(s, root, "text", 2L)
    } finally graft.sources.LedgerFold.afterSwapHook = () => ()
    assert(parts === Seq("__epoch=-1", "__epoch=-2", "__epoch=2"),
      "a post-rename crash leaves merged AND folded partitions visible")
    assert(all.distinct === expect :+ (5L, 6L),
      "the readable pair SET must survive the crash window (the " +
        "distinct consumers absorb the duplicate copies)")
    // the next fold converges the duplicates away
    assert(PairLedger.compactEpochs(s, root, "text", 2L).into === -3L)
    assert(all === expect :+ (5L, 6L) && parts === Seq("__epoch=-3"))
  }

  test("c136: compaction RETIRES pairs whose endpoints were deleted " +
    "(the ledger shrinks when the corpus does), and readPairs " +
    "distinguishes a missing tree from a broken one") {
    import graft.sources.PairLedger
    val root = Files.createTempDirectory("graft_c136u").toString + "/ledger"
    def pairsOf(xs: (Long, Long)*) = {
      import s.implicits._
      xs.toSeq.toDF("id_a", "id_b")
    }
    PairLedger.appendPairsEpoch(pairsOf((1L, 2L), (3L, 4L)), root,
      "text", 0L)
    PairLedger.appendPairsEpoch(pairsOf((2L, 5L), (6L, 7L)), root,
      "text", 1L)
    import s.implicits._
    val rep = PairLedger.compactEpochs(s, root, "text", 1L,
      retire = Some(Seq(2L).toDF("doc_id")))
    assert(rep.retired === 2L, s"pairs (1,2) and (2,5) must retire: $rep")
    val left = PairLedger.readPairs(s, root, "text").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(left === Seq((3L, 4L), (6L, 7L)),
      "every pair with a retired endpoint must be gone from the ledger")
    // retirement works even on an already-compacted (single-partition)
    // ledger — the governance event can arrive between folds
    val rep2 = PairLedger.compactEpochs(s, root, "text", 1L,
      retire = Some(Seq(4L).toDF("doc_id")))
    assert(rep2.retired === 1L)
    assert(PairLedger.readPairs(s, root, "text").count() === 1L)
    // a missing tree reads as the typed empty relation …
    assert(PairLedger.readPairs(s, root, "image").count() === 0L)
    // … but a CORRUPT one propagates (the r16 advice: a broken ledger
    // must not be indistinguishable from an empty crawl)
    val bad = new java.io.File(root + "/audio/__epoch=0")
    bad.mkdirs()
    Files.writeString(new java.io.File(bad, "zz.parquet").toPath,
      "not a parquet file")
    intercept[Exception] {
      PairLedger.readPairs(s, root, "audio").collect()
    }
  }

  test("c136s: streamed retirement (retireResolved) — an A36 mark " +
    "between epochs shrinks the ledger at the next fold, the published " +
    "verdicts are clean one epoch later through the plain serve, and a " +
    "fresh-checkpoint redelivery converges") {
    import graft.sources.{DeletionVectors, PairLedger}
    val docs = Tables(s, sfDir(), "documents").select("doc_id", "text")
      .limit(60).cache()
    val copies = docs.where(pmod(col("doc_id"), lit(3)) === 1)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    // two post-governance arrivals: disjoint doc slices (fresh crawl
    // tail) — the retirement fold fires while the crawl keeps moving
    val all = Tables(s, sfDir(), "documents").select("doc_id", "text")
    val ep2 = all.where(col("doc_id") >= 60 && col("doc_id") < 66)
    val ep3 = all.where(col("doc_id") >= 66 && col("doc_id") < 72)
    val staged = Files.createTempDirectory("graft_c136s_src")
    def stage(ep: org.apache.spark.sql.DataFrame, i: Int): Unit = {
      val tmp = Files.createTempDirectory(s"graft_c136s_ep$i")
      ep.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, staged.resolve(f"ep$i%02d.parquet"))
      ()
    }
    stage(docs, 0); stage(copies, 1)
    val r = freshRoots("retire")
    val pairsRoot =
      Files.createTempDirectory("graft_c136s_pairs").toString + "/ledger"
    VerdictStream.initStores(s, r)
    def runSink(ck: String): Unit = {
      val src = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(staged.toString)
      val q = VerdictStream.ledgerMaintenanceSink(src, r, pairsRoot, ck,
        compactEvery = 1, retireResolved = true)
      assert(q.awaitTermination(240000),
        "sink did not drain in 240s")
      ()
    }
    val ck = Files.createTempDirectory("graft_c136s_ck").toString
    runSink(ck)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getBoolean(1), x.getBoolean(2),
          x.getBoolean(3), x.getString(4))).toSeq
    val pre = rows(VerdictStore.loadCommitted(s, r.verdicts))
    // doc 1 is text-dup via its copy; doc 0 is image-dup (doc 5 embeds
    // its hero)
    assert(pre.exists(v => v._1 === 1L && v._2),
      s"fixture precondition: doc 1 text-dup, got $pre")
    assert(pre.exists(v => v._1 === 0L && v._3),
      s"fixture precondition: doc 0 image-dup, got $pre")
    // the governance event: doc 1 (and its re-crawl copy) tombstoned
    val mark = DeletionVectors.markDeleted(s, r.docsSeen, "doc_id",
      Seq(1L, 1000001L), "rtbf_stream_1")
    assert(mark.rowsMarked === 2L, s"mark landed wrong: $mark")
    // the crawl continues: two more arrivals; the id=2 fold retires
    stage(ep2, 2); stage(ep3, 3)
    runSink(ck)
    // fold the tail too (the sink's last fold stopped at upTo=2, so
    // epoch 3 is still in-flight) — then NOTHING touching doc 1 (or
    // the media that lost their live links) survives in any ledger
    VerdictStream.compactRetiredEpochs(s, r, pairsRoot, 3L)
    val resolved = VerdictStream.retiredEndpoints(s, r)
    PairLedger.Modalities.foreach { m =>
      val ids = resolved(m).toDF("__rid")
      val left = PairLedger.readPairs(s, pairsRoot, m)
      val n = left.join(ids, col("id_a") === col("__rid"), "left_semi")
        .unionByName(
          left.join(ids, col("id_b") === col("__rid"), "left_semi"))
        .count()
      assert(n === 0L, s"$m still holds $n resolved pairs")
    }
    // the epoch AFTER the retiring fold publishes clean through the
    // PLAIN serve — physical retirement propagates without the
    // tombstone-aware read
    val post = rows(VerdictStore.loadCommitted(s, r.verdicts))
    assert(!post.exists(_._1 === 1L),
      s"deleted doc 1 must leave the verdicts: $post")
    // live docs keep their verdicts (doc 0's audio flag is allowed to
    // stay: the synthetic wavs form LCG phase FAMILIES, so doc 0 has
    // audio pairs beyond the retired doc-1 remaster — retirement must
    // remove exactly the resolved pairs, nothing else)
    assert(post.exists(v => v._1 === 0L && v._3),
      s"live doc 0 must keep its image verdict: $post")
    // fresh-checkpoint redelivery: stragglers re-land retired pairs,
    // every publish is watermark-skipped, the re-fold re-retires —
    // committed verdicts byte-stable
    runSink(Files.createTempDirectory("graft_c136s_ck2").toString)
    assert(rows(VerdictStore.loadCommitted(s, r.verdicts)) === post,
      "redelivery must not change the committed verdicts")
    // … and the tombstone-aware serve gives the same table even when
    // asked mid-straggler (before any re-fold)
    assert(rows(VerdictStream.verdictsFromLedgerRetired(s, r, pairsRoot)
        .orderBy("doc_id")) === post,
      "the tombstone-aware serve must match the committed table")
  }
}
