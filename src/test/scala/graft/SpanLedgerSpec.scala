package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.{SpanLedger, SpanStore}

/** C137 contracts: the per-epoch fired-window deltas union to EXACTLY
  * the one-shot fired set (the induction identity — every delta case
  * exercised: within-delta dup, the ref-side 1→2 transition, an
  * arrival against an already-duplicated ref hash, and never-fired
  * windows); extents served from the ledger equal the batch
  * [[Dedup.spanExtents]]; a redelivered epoch converges (D8) even
  * after later epochs landed; and compaction + a post-compaction
  * straggler replay leave the served extents unchanged (the absorb
  * rule at window grain).
  */
class SpanLedgerSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  // One width (8) keeps the hash structure auditable by eye:
  //   - block A (12 tokens) is shared by docs 1 and 2 — doc 1 arrives
  //     at epoch 0, doc 2 at epoch 1: the REF 1→2 transition (doc 1's
  //     A-windows fire AT EPOCH 1, recorded in epoch 1's delta);
  //   - block B (10 tokens) is shared by docs 3 and 4, BOTH in epoch
  //     0: the within-delta case;
  //   - doc 5 (epoch 2) repeats block A a THIRD time: its windows
  //     fire on arrival against an ALREADY-duplicated ref hash — and
  //     docs 1/2's A-windows must NOT be re-added (n_ref = 2 ≠ 1);
  //   - doc 6 is unique filler: never fired at any epoch.
  private val blockA = (1 to 12).map(i => s"dupA$i").mkString(" ")
  private val blockB = (1 to 10).map(i => s"dupB$i").mkString(" ")
  private def uniq(tag: String, n: Int) =
    (1 to n).map(i => s"$tag$i").mkString(" ")
  private def corpus = Seq(
    (1L, 0, blockA + " " + uniq("a", 20)),
    (3L, 0, uniq("c", 15) + " " + blockB),
    (4L, 0, blockB + " " + uniq("d", 15)),
    (6L, 0, uniq("f", 30)),
    (2L, 1, uniq("b", 20) + " " + blockA),
    (5L, 2, uniq("e", 9) + " " + blockA + " " + uniq("g", 9))
  ).toDF("doc_id", "epoch", "text")

  private val W = 8

  private def freshRoots(): (String, String) = {
    val base = Files.createTempDirectory("graft_c137").toString
    val store = s"$base/store"
    val rep = SpanStore.publishSpec(s, store, "span_md5", Seq(W))
    assert(rep.committed, s"spec publish failed: ${rep.failures}")
    (store, s"$base/ledger")
  }

  private def ingest(store: String, ledger: String, e: Int): Unit =
    SpanLedger.ingestEpoch(s, store, 1, ledger,
      corpus.where(col("epoch") === e).select("doc_id", "text"),
      "text", "doc_id", e.toLong)

  private def firedSet(ledger: String): Set[(Long, Long)] =
    SpanLedger.readFired(s, ledger, W).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def batchFired: Set[(Long, Long)] =
    Dedup.firedWindows(Dedup.spanDigestRows(
        corpus.select("doc_id", "text"), "text", "doc_id", W))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def extents(ledger: String): Seq[(Long, Long, Long, Long)] =
    SpanLedger.extentsFromLedger(s, ledger, Seq(W))
      .select("id", "start_tok", "end_tok", "ext_len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted

  private def batchExtents: Seq[(Long, Long, Long, Long)] =
    Dedup.spanExtents(corpus.select("doc_id", "text"), "text", "doc_id",
        Seq(W))
      .select("id", "start_tok", "end_tok", "ext_len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted

  test("c137: per-epoch deltas union to the one-shot fired set, with " +
    "every delta case exercised, and ledger extents equal the batch " +
    "sweep") {
    val (store, ledger) = freshRoots()
    (0 to 2).foreach(e => ingest(store, ledger, e))
    val fired = firedSet(ledger)
    assert(fired === batchFired,
      "ledger union must equal the one-shot fired-window relation")
    // the case audit: doc 6 never fires; docs 3/4 fire at epoch 0
    // (within-delta); doc 1 fires via the epoch-1 transition; doc 5
    // fires on arrival at epoch 2
    val byDoc = fired.groupBy(_._1).view.mapValues(_.size).toMap
    assert(!byDoc.contains(6L), "unique filler must never fire")
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(byDoc.contains),
      s"every planted dup doc must fire: $byDoc")
    // epoch 1's delta carries doc 1's transition windows, epoch 2's
    // must NOT re-add them (n_ref = 2)
    val e1 = s.read.parquet(s"$ledger/w$W/__epoch=1")
      .select("id").distinct().as[Long].collect().toSet
    assert(e1 === Set(1L, 2L),
      s"epoch 1's delta must be exactly the A-block transition: $e1")
    val e2 = s.read.parquet(s"$ledger/w$W/__epoch=2")
      .select("id").distinct().as[Long].collect().toSet
    assert(e2 === Set(5L),
      s"epoch 2 must not re-add already-fired ref windows: $e2")
    assert(extents(ledger) === batchExtents,
      "ledger-served extents must equal the batch sweep")
  }

  test("c137: a redelivered epoch recomputes the identical delta even " +
    "after later epochs landed (D8), and compaction + straggler " +
    "replay leave the served extents unchanged") {
    val (store, ledger) = freshRoots()
    (0 to 2).foreach(e => ingest(store, ledger, e))
    val before = firedSet(ledger)
    val extBefore = extents(ledger)
    // replay epoch 1 AFTER epoch 2 landed: the ref side (epochs < 1)
    // is partition-pruned, so the delta recomputes identically and
    // overwrites its own partition
    ingest(store, ledger, 1)
    assert(firedSet(ledger) === before, "replay must converge (D8)")
    // fold everything, then re-land epoch 1 as a straggler beside the
    // merged partition — the sweep absorbs duplicate windows
    val rep = SpanLedger.compactEpochs(s, ledger, W, 2L)
    assert(rep.into < 0L && rep.folded === Seq(0L, 1L, 2L), s"$rep")
    ingest(store, ledger, 1)
    assert(firedSet(ledger) === before,
      "the readable fired SET must survive the straggler replay")
    assert(extents(ledger) === extBefore,
      "served extents must be unchanged by compaction + straggler")
    // the next fold converges the duplicates away
    val rep2 = SpanLedger.compactEpochs(s, ledger, W, 2L)
    assert(rep2.into < rep.into, s"$rep2")
    assert(extents(ledger) === extBefore)
  }

  test("c137: document retirement and the age watermark hold on the " +
    "span tree too — a retired doc's windows go entirely, expired " +
    "windows stay raw-visible as stragglers but never serve retained") {
    val (store, ledger) = freshRoots()
    (0 to 2).foreach(e => ingest(store, ledger, e))
    // retire doc 3: every one of its stored windows goes (span truth
    // lives inside the document); its B-partner doc 4 keeps firing
    val rep = SpanLedger.compactEpochs(s, ledger, W, 2L,
      retire = Some(Seq(3L).toDF("doc_id")))
    assert(rep.retired > 0L, s"$rep")
    val ids = firedSet(ledger).map(_._1)
    assert(!ids.contains(3L) && ids.contains(4L),
      s"retirement must drop doc 3's windows only: $ids")
    // age watermark: epoch-0 arrivals (docs 3/4's within-delta fire)
    // expire; the epoch-1 transition and epoch-2 arrivals stay
    val rep2 = SpanLedger.compactEpochs(s, ledger, W, 2L,
      olderThan = Some(1L))
    assert(rep2.expired > 0L, s"$rep2")
    assert(firedSet(ledger).map(_._1) === Set(1L, 2L, 5L),
      "only the A-family (fired at epochs 1 and 2) survives the TTL")
    assert(SpanLedger.readFiredRetained(s, ledger, W, 1L).distinct()
      .count() === SpanLedger.readFired(s, ledger, W).distinct().count(),
      "post-TTL the retained serve equals the physical ledger")
  }
}
