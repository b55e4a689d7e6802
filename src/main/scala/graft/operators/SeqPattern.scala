package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-sequence pattern mining — the MATCH_RECOGNIZE / funnel-regex
  * operator class: per-entity event histories rendered as ordered
  * type-code strings, then scanned with a regular expression. Covers the
  * "did this user ever view→(clicks)→purchase" and "how long are error
  * bursts" questions that B35's fixed two-stage funnel can't express —
  * the pattern is arbitrary regular structure, not a hardcoded pair.
  *
  * Scale shape: ONE keyed exchange (groupBy the entity key) and a
  * per-key LINEAR regex scan — never an event×event self-join, and the
  * pattern automaton carries O(1) state per key. The sequence string is
  * bounded by per-entity history length; at 100 TB the entity key is
  * time-bucketed ((user, month)) so no single key's history exceeds a
  * task, exactly the BalancedRepartition contract. Ordering inside a key
  * is (epoch-second, event_id) — the same total order the D2
  * sessionizer uses, so ties are deterministic cross-engine.
  */
object SeqPattern {

  /** Per-entity ordered type-code sequence: one row per entity with the
    * concatenated first letters of `typeCol` in (sec, event_id) order.
    * The sort happens INSIDE the aggregated array (array_sort over
    * (sec, id, code) structs) — no window, no second exchange.
    */
  def sequences(events: DataFrame, keyCol: String, tsCol: String,
                idCol: String, typeCol: String): DataFrame =
    events
      .select(col(keyCol), unix_timestamp(col(tsCol)).as("sec"),
        col(idCol).cast("long").as("eid"),
        substring(col(typeCol), 1, 1).as("code"))
      .groupBy(keyCol)
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("sec"), col("eid"), col("code")))),
        x => x.getField("code"))).as("seq"))

  /** Per-key fold state for [[advance]] — the O(1) incremental form of
    * the [[patternReport]] scan: `aut` is the automaton position inside
    * the funnel pattern, the rest are the running report counters. Small
    * and flat so it serializes cheaply as streaming state.
    */
  final case class FoldState(aut: Int, matches: Long, seqLen: Long,
                             run: Long, maxRun: Long)

  object FoldState { val zero: FoldState = FoldState(0, 0L, 0L, 0L, 0L) }

  /** One-character step of the `start+ mid* end` funnel matcher —
    * equivalent to the leftmost-non-overlapping regex scan
    * [[patternReport]] runs, but consumable char-by-char with O(1)
    * state, which is what lets the STREAMING form carry a match across
    * micro-batch boundaries (a regex cannot resume mid-pattern).
    *
    * Equivalence argument: the only viable match start is `startC`, so
    * on seeing it the automaton (re)enters the seen-start state from
    * anywhere — exactly where the regex scan would begin its next
    * attempt; any other character outside a viable prefix resets. The
    * three class characters must be distinct. Locked against the regex
    * over real data in SeqPatternSpec.
    */
  def advance(st: FoldState, ch: Char, startC: Char, midC: Char,
              endC: Char, runC: Char): FoldState = {
    val aut =
      if (ch == startC) 1
      else if (st.aut >= 1 && ch == midC) 2
      else 0
    val matched = st.aut >= 1 && ch == endC
    val run = if (ch == runC) st.run + 1 else 0L
    FoldState(if (matched) 0 else aut,
      st.matches + (if (matched) 1L else 0L),
      st.seqLen + 1L, run, math.max(st.maxRun, run))
  }

  /** [[patternReport]] computed by folding [[advance]] over each key's
    * ordered history instead of materializing the sequence string and
    * regex-scanning it — the batch twin of the streaming automaton
    * (EventStreams.patternStream), checked against the SAME DuckDB regex
    * oracle so automaton ≡ RE2 is itself a driver-gated contract.
    */
  def automatonReport(events: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, typeCol: String,
                      startC: Char = 'v', midC: Char = 'c',
                      endC: Char = 'p', runC: Char = 'e'): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    sequences(events, keyCol, tsCol, idCol, typeCol)
      .select(col(keyCol).cast("long"), col("seq"))
      .as[(Long, String)]
      .map { case (k, seq) =>
        var st = FoldState.zero
        var i = 0
        while (i < seq.length) {
          st = advance(st, seq.charAt(i), startC, midC, endC, runC)
          i += 1
        }
        (k, st.seqLen.toInt, st.matches, st.maxRun)
      }
      .toDF(keyCol, "seq_len", "n_matches", "longest_run")
  }

  /** Pattern report over [[sequences]]: non-overlapping occurrence count
    * of `pattern` plus the longest run of `runChar` — the two shapes
    * (ordered funnel, burst length) sequence analytics always wants.
    * Regex semantics are leftmost non-overlapping in both Spark (Java
    * regex `find()` loop) and DuckDB (RE2 `regexp_extract_all`) — for
    * the anchored-literal patterns used here the engines agree exactly.
    */
  def patternReport(events: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, typeCol: String, pattern: String,
                    runChar: String): DataFrame = {
    val runs = regexp_extract_all(col("seq"), lit(s"$runChar+"), lit(0))
    sequences(events, keyCol, tsCol, idCol, typeCol)
      .select(col(keyCol), length(col("seq")).as("seq_len"),
        size(regexp_extract_all(col("seq"), lit(pattern), lit(0)))
          .cast("long").as("n_matches"),
        coalesce(array_max(transform(runs, r => length(r))), lit(0))
          .cast("long").as("longest_run"))
  }
}
