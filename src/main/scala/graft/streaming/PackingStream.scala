package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Chunking

/** D44: streaming WHOLE-DOC packing — c106's bounded-open-bin slot
  * machine folded ACROSS micro-batches: under continuous arrival the
  * open bins must not die with the trigger (a bin left 60% full by
  * epoch 0 takes the small doc arriving in epoch 2), so the O(k) slot
  * state ([[Chunking.BinSlots]]: open bin ids, fills, next id) lives
  * in a keyed GroupState per (source, band) shard — the same state the
  * batch fold carries in a local variable, promoted to the state store.
  *
  * Equivalence contract (the D-twin discipline): streamed assignments
  * ≡ [[Chunking.packWholeDocsBoundedEpochs]] on the same arrival order
  * BY CONSTRUCTION — both paths drive [[Chunking.BinSlots.place]], the
  * stream sorting each trigger's shard arrivals by the same
  * within-epoch BFD rule (tk desc, doc id) the twin's sort applies.
  * The twin carries the oracle row (`d44_stream_packing`: the
  * rank-synchronous recursive CTE re-ranked by arrival epoch); the
  * spec locks stream ≡ twin through real triggers, cross-batch bin
  * reuse included.
  *
  * At 100 TB: state is k longs ×2 + 1 per (source, band) shard —
  * KB-scale total at any corpus size (state size is set by shard
  * count, never by document count); each trigger shuffles only its
  * delta, keyed by shard; the within-trigger sort is per-group over
  * the trigger's arrivals only. RocksDB state store (the session
  * default) keeps even a huge shard fan-out off-heap.
  */
object PackingStream {

  /** One arriving document, pre-sharded. */
  case class PackDoc(source: String, band: Long, doc_id: Long, tk: Long)

  /** One placement decision. */
  case class PackAssign(source: String, band: Long, doc_id: Long,
                        tk: Long, bin: Long)

  /** Fold arriving documents into per-shard open bins; emits one
    * placement row per doc as it arrives (Append — a placement is
    * final the moment it is made, the slot machine never revisits).
    *
    * ONE-EPOCH-PER-TRIGGER assumption (r15 advice): the ≡-twin
    * equivalence above holds when each trigger delivers one arrival
    * epoch. A trigger that batches SEVERAL epochs (checkpoint
    * catch-up after a restart, maxFilesPerTrigger spanning multiple
    * epoch files) sorts the merged arrivals by (tk desc, doc_id)
    * ACROSS the epoch boundary, so its placements can diverge from the
    * epoch-major twin — that is catch-up re-ordering, not a state bug:
    * the fold itself (BinSlots.place over whatever order arrives) is
    * still the operator's contract, and bin fills stay ≤ budget either
    * way. Operators wanting byte-exact twin replays through restarts
    * should cap the source at one epoch file per trigger.
    */
  def packStream(stream: DataFrame, idCol: String, tokensCol: String,
                 sourceCol: String, nBands: Int, budget: Long,
                 openBins: Int,
                 firstFit: Boolean = false): Dataset[PackAssign] = {
    require(budget > 0 && nBands > 0, "need budget > 0 and nBands > 0")
    require(openBins >= 1, s"openBins $openBins < 1")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col(sourceCol).cast("string").as("source"),
        pmod(col(idCol).cast("long"), lit(nBands.toLong)).as("band"),
        col(idCol).cast("long").as("doc_id"),
        col(tokensCol).cast("long").as("tk"))
      .as[PackDoc]
      .groupByKey(d => (d.source, d.band))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (_: (String, Long), rows: Iterator[PackDoc],
         state: GroupState[(Array[Long], Array[Long], Long)]) => {
          val slots = state.getOption match {
            case Some((b, f, n)) => Chunking.BinSlots.restore(b, f, n)
            case None => new Chunking.BinSlots(openBins)
          }
          // one trigger's shard arrivals fold best-fit-DECREASING (the
          // within-epoch rule the batch twin's sort applies); across
          // triggers order is arrival — that is the operator
          val buf = rows.toArray.sortBy(d => (-d.tk, d.doc_id))
          val out = buf.map(d => PackAssign(d.source, d.band, d.doc_id,
            d.tk, slots.place(d.tk, budget, firstFit)))
          state.update((slots.binIds.clone(), slots.fills.clone(),
            slots.nextBin))
          out.iterator
        })
  }
}
