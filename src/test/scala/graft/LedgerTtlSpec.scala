package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PairLedger

/** C138 contracts on the pair ledger: the compaction fold preserves
  * each pair's ARRIVAL epoch across any number of folds (the merged
  * partition's `arr_epoch` column); an `olderThan` watermark expires
  * exactly the pairs below it (accounting from the single-pass
  * Observation); a replayed folded epoch re-lands its expired pairs
  * but the age-aware serve ([[PairLedger.readPairsRetained]]) never
  * resurrects them; and retire + TTL compose with disjoint counts.
  */
class LedgerTtlSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def pairsOf(ps: (Long, Long)*) = ps.toDF("id_a", "id_b")

  private def freshRoot(): String =
    Files.createTempDirectory("graft_c138").toString + "/ledger"

  private def all(root: String): Seq[(Long, Long)] =
    PairLedger.readPairs(s, root, "text").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  private def retained(root: String, from: Long): Seq[(Long, Long)] =
    PairLedger.readPairsRetained(s, root, "text", from).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("c138: arrival epochs survive repeated folds, olderThan expires " +
    "exactly the old pairs, and a replayed folded epoch cannot " +
    "resurrect an expired pair in the retained serve") {
    val root = freshRoot()
    (0 to 3).foreach { e =>
      PairLedger.appendPairsEpoch(
        pairsOf((10L * e, 10L * e + 1)), root, "text", e.toLong)
    }
    // fold WITHOUT a watermark first: arrivals must persist as data
    val r1 = PairLedger.compactEpochs(s, root, "text", 3L)
    assert(r1.into === -1L && r1.folded === Seq(0L, 1L, 2L, 3L) &&
      r1.retired === 0L && r1.expired === 0L, s"$r1")
    assert(retained(root, 2L) === Seq((20L, 21L), (30L, 31L)),
      "the merged partition must still know each pair's arrival")
    // SECOND fold, now with the watermark: the age read comes from the
    // merged partition's arr_epoch column, not any live __epoch key
    val r2 = PairLedger.compactEpochs(s, root, "text", 3L,
      olderThan = Some(2L))
    assert(r2.expired === 2L && r2.retired === 0L,
      s"epochs 0 and 1 must expire exactly once: $r2")
    assert(all(root) === Seq((20L, 21L), (30L, 31L)),
      "the physical ledger must shrink to the retained window")
    // straggler replay of a folded epoch re-lands its EXPIRED pair …
    PairLedger.appendPairsEpoch(pairsOf((10L, 11L)), root, "text", 1L)
    assert(all(root).contains((10L, 11L)),
      "positive control: the raw read must see the straggler")
    // … but the age-aware serve never resurrects it
    assert(retained(root, 2L) === Seq((20L, 21L), (30L, 31L)),
      "an expired pair must not resurrect in the retained serve")
    // and the next fold re-expires it physically
    val r3 = PairLedger.compactEpochs(s, root, "text", 3L,
      olderThan = Some(2L))
    assert(r3.expired === 1L, s"$r3")
    assert(all(root) === Seq((20L, 21L), (30L, 31L)))
  }

  test("c138: retire and TTL compose in one single-pass fold with " +
    "disjoint accounting (a pair both tombstoned and expired counts " +
    "as retired, not twice)") {
    val root = freshRoot()
    PairLedger.appendPairsEpoch(pairsOf((1L, 2L), (3L, 4L)), root,
      "text", 0L)
    PairLedger.appendPairsEpoch(pairsOf((5L, 6L)), root, "text", 5L)
    PairLedger.appendPairsEpoch(pairsOf((7L, 8L), (5L, 9L)), root,
      "text", 6L)
    // tombstone endpoint 1 (expired epoch too — counts as retired
    // only) and endpoint 7 (live epoch)
    val rep = PairLedger.compactEpochs(s, root, "text", 6L,
      retire = Some(Seq(1L, 7L).toDF("doc_id")),
      olderThan = Some(5L))
    assert(rep.retired === 2L,
      s"pairs (1,2) and (7,8) retire by endpoint: $rep")
    assert(rep.expired === 1L,
      s"only (3,4) expires by age — (1,2) already counted: $rep")
    assert(all(root) === Seq((5L, 6L), (5L, 9L)), s"${all(root)}")
    assert(retained(root, 5L) === Seq((5L, 6L), (5L, 9L)))
  }

  test("c136/c138: a retire+TTL fold is ONE dataset action — the " +
    "merged write, with the accounting riding its Observation (the " +
    "r17 finding: the count-the-anti-join formulation paid three full " +
    "ledger passes per retirement)") {
    val root = freshRoot()
    (0 to 2).foreach { e =>
      PairLedger.appendPairsEpoch(
        pairsOf((10L * e, 10L * e + 1)), root, "text", e.toLong)
    }
    val n = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { n.incrementAndGet(); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    try {
      val rep = PairLedger.compactEpochs(s, root, "text", 2L,
        retire = Some(Seq(10L).toDF("doc_id")),
        olderThan = Some(1L))
      assert(rep.retired === 1L && rep.expired === 1L, s"$rep")
      // the listener bus is async: wait for quiescence, then assert
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        if (n.get == last) stable += 1 else { stable = 0; last = n.get }
      }
      assert(n.get === 1,
        s"a retire+TTL fold must pay exactly one ledger action " +
          s"(the merged write), saw ${n.get}")
    } finally s.listenerManager.unregister(listener)
  }
}
