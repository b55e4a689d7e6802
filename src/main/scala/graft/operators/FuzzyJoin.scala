package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join (entity resolution / fuzzy matching) —
  * the approximate-string counterpart of the exact joins in the engine.
  *
  * Blocking is the deletion neighborhood (the SymSpell scheme): every
  * string emits the hash of itself and of each variant obtainable by
  * deleting up to `maxDist` characters. Two strings within Levenshtein
  * distance k ALWAYS share a depth-k deletion variant (delete the edited
  * positions from whichever side carries them), so the blocking is
  * lossless — unlike q-gram blocking there is no recall knob to tune.
  * Candidates then verify with the exact codegen'd `levenshtein`.
  *
  * Scale shape (the reason this isn't a cross join):
  *  - variant generation is a map-only projection of built-in codegen
  *    expressions (sequence/transform/substring/md5) — no UDF;
  *  - the only wide exchange is keyed on the variant hash and carries
  *    (id, hash) rows: n·(len+1) rows at k=1, n·O(len²) at k=2 — linear
  *    in data, never quadratic;
  *  - candidate pairs are DISTINCT'd before strings are joined back, so
  *    the verify work is bounded by the true-ish candidate count (the
  *    same shape as [[Dedup.minhashDedupPairs]]'s verify stage);
  *  - hash collisions can only ADD candidates (removed by the exact
  *    verify), never drop a true pair — the result is exactly the
  *    distance-≤k pair set.
  *
  * Intended for short strings (names, titles, codes): the deletion
  * neighborhood is O(len^k) per row, so document-sized text belongs with
  * the MinHash/SimHash family instead.
  */
object FuzzyJoin {

  /** Hashes of all deletion variants of `c` up to depth `maxDist`,
    * including the string itself (depth 0). Pure built-in expressions.
    */
  private def variantHashes(s: String, maxDist: Int): Column = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2 (deletion-neighborhood size is O(len^k)), got $maxDist")
    val d1 =
      s"""transform(sequence(1, length($s)),
         |  i -> concat(substring($s, 1, i-1), substring($s, i+1)))""".stripMargin
    val all =
      if (maxDist == 1) s"concat(array($s), $d1)"
      else
        s"""concat(array($s), $d1,
           |  flatten(transform($d1,
           |    d -> transform(sequence(1, length(d)),
           |      i -> concat(substring(d, 1, i-1), substring(d, i+1))))))""".stripMargin
    // xxhash64, not md5 (r9 sf1 follow-up): the variant hash is ONLY a
    // blocking key, and it is the thing the one wide exchange carries —
    // an 8-byte long shuffles at a fraction of a 32-char hex string's
    // width and hashes cheaper too. The b25 100x probe was single-box
    // shuffle-spill-bound, so key width IS the constant. Collisions
    // still only ADD candidates (the exact levenshtein verify removes
    // them) — the result set is provably unchanged.
    expr(s"transform(array_distinct($all), v -> xxhash64(v))")
  }

  /** All pairs (id_a < id_b) of rows whose `strCol` values are within
    * Levenshtein distance `maxDist`, with both strings carried for the
    * caller. Exact: blocking is lossless, verification is exact.
    */
  def editDistanceSelfJoin(df: DataFrame, idCol: String, strCol: String,
                           maxDist: Int = 1): DataFrame = {
    val base = df.select(col(idCol).as("fj_id"), col(strCol).as("fj_str"))
      .where(col("fj_str").isNotNull)
    // Strings ride WITH the variant rows (r10 constant attack): the
    // previous shape distinct'd bare (id_a, id_b) candidates and then
    // joined both strings back — one candidate-sized exchange plus two
    // base-sized hash joins. Carrying the (short, by contract) string
    // through the blocking exchange widens it ~2x but lets the exact
    // levenshtein verify run IN the join output, so the only remaining
    // wide op is a distinct over TRUE pairs (tiny), and the join-backs
    // disappear entirely. Verify cost per candidate OCCURRENCE is fine:
    // distinct strings at distance ≤ k share O(k) deletion variants, so
    // a true pair is re-verified at most a couple of times, and the
    // per-occurrence levenshtein on short strings is cheaper than
    // re-exchanging the candidate set. Dev-harness like-for-like with
    // the shuffle_hash fix below: ~1.4x faster at the 10-copy replica,
    // ~2.9x at the 100-copy; the committed per-round numbers live in
    // BENCH_local_r10_sf1.json's b25 row.
    val variants = base.select(col("fj_id"), col("fj_str"),
      explode(variantHashes("fj_str", maxDist)).as("vh"))
    // shuffle_hash, NOT auto-broadcast (the c27 rule): Catalyst's
    // estimate for a Generate's output is optimistic enough to build
    // the WHOLE exploded variant table — n·(len+1) rows, corpus-sized,
    // never dim-sized — as a broadcast HashedRelation (measured at the
    // 10-copy replica: a multi-million-entry build, and the generate
    // runs TWICE because the probe side has no exchange to reuse).
    // Forcing the shuffle join keys both sides on vh and the two
    // identical scan+explode subplans collapse into ONE reused
    // exchange: scan once, explode once, exchange once.
    variants.as("a")
      .join(variants.as("b").hint("shuffle_hash"), col("a.vh") === col("b.vh"))
      .where(col("a.fj_id") < col("b.fj_id"))
      .select(col("a.fj_id").as("id_a"), col("b.fj_id").as("id_b"),
        col("a.fj_str").as("str_a"), col("b.fj_str").as("str_b"),
        levenshtein(col("a.fj_str"), col("b.fj_str")).as("dist"))
      .where(col("dist") <= maxDist)
      .distinct()
  }
}
