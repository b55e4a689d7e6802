package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over a change data feed —
  * the consumer side of [[Upsert.upsertWithChanges]]'s delta-CDF
  * contract. A grouped count/sum view is *self-maintainable* (Gupta &
  * Mumick's classic result): every CDF row contributes a signed delta
  * (`insert`/`update_postimage` = +1, `delete`/`update_preimage` = −1),
  * so the view advances with ONE batch-sized aggregation and ONE keyed
  * merge join — never a rescan of the base table. This is the piece
  * that replaces the reference's "re-run BigQuery over the whole
  * parquet lake after each load" reporting model (the SQL under
  * etl/censo_escolar/load rebuilds external tables; every dashboard
  * query then re-reads all years) with O(changes) refresh.
  *
  * Sums are carried as DECIMAL(28,6): incremental maintenance applies
  * additions and subtractions in arbitrary order, and exact decimal
  * arithmetic is what makes `applyChanges(build(t), cdf) ==
  * build(merge(t))` an EQUALITY rather than a float-tolerance claim
  * (the spec and the b26 gate both assert it exactly).
  *
  * Contracts: group-key columns must be non-null in base and feed (the
  * merge join is null-safe, but a view with null groups usually means
  * an upstream bug — normalize first); the feed must be a genuine CDF
  * (paired pre/post images, deletes carrying the removed row), which
  * [[Upsert.upsertWithChanges]] guarantees. A group whose count reaches
  * zero leaves the view, exactly as a fresh rebuild would drop it.
  *
  * At 100 TB: the delta aggregation is map-side combined over the
  * batch (size ∝ changes); the merge join keys on the group columns,
  * and the view side is group-cardinality-sized — typically dims ×
  * small — so AQE broadcasts the delta and the view never shuffles if
  * stored bucketed on its keys. Min/max are NOT self-maintainable
  * under deletes; for those, recompute only the affected groups (semi
  * join the base on touched keys) — deliberately not hidden behind
  * this API because it costs a base scan.
  */
object MaterializedView {

  private val SumType = "decimal(28,6)"

  private def sumCol(c: String) = s"__mv_sum_$c"

  /** The initial view: one row per group with `__mv_n` (row count) and
    * `__mv_sum_<c>` (exact decimal sum) per measure. `avg` is derived
    * downstream as sum/count — never stored, always consistent. Sums
    * are normalized to 0 (not SQL's NULL) when a group holds only null
    * measure values: the view stores total mass, and normalizing keeps
    * `applyChanges(build(t), cdf) == build(merge(t))` an identity even
    * for all-null groups, where the incremental path's signed deltas
    * can only ever produce 0.
    */
  def build(base: DataFrame, keys: Seq[String],
            measures: Seq[String]): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__mv_n"),
        measures.map(c =>
          coalesce(sum(col(c).cast(SumType)),
            lit(0).cast(SumType)).as(sumCol(c))): _*)

  /** JOIN-view maintenance (B57): advance an aggregate view over
    * `fact ⋈ dim` from the FACT side's change feed alone — the classic
    * IVM counting algorithm specialized to the star-schema case that
    * dominates practice: the dim is static for the batch, so
    * Δ(fact ⋈ dim) = Δfact ⋈ dim, and the enriched deltas flow through
    * [[applyChanges]]' signed arithmetic unchanged. Dim-side changes
    * need the full bilinear rule (ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB) and a
    * dim-keyed re-aggregation — named out of scope, the B26 contract
    * style. Cost: the feed (not the fact table) joins the dim —
    * feed-sized work, broadcast when the dim is small.
    */
  def applyFactChanges(view: DataFrame, factChanges: DataFrame,
                       dim: DataFrame, joinCond: org.apache.spark.sql.Column,
                       viewKeys: Seq[String],
                       measures: Seq[String]): DataFrame =
    applyChanges(view, factChanges.join(dim, joinCond), viewKeys, measures)

  private def cdfSign = when(
    col("_change_type").isin("insert", "update_postimage"), 1L)
    .when(col("_change_type").isin("delete", "update_preimage"), -1L)
    .otherwise(lit(null).cast("long"))

  /** B61: FULL bilinear join-view maintenance — the dim-side case B57
    * names out of scope, closed. For a view `γ(F ⋈ D)` with changes on
    * BOTH inputs, the delta relation is the bilinear expansion
    *
    *   Δ(F ⋈ D) = ΔF ⋈ D_old  ∪  F_old ⋈ ΔD  ∪  ΔF ⋈ ΔD
    *
    * with each delta row's sign the PRODUCT of its inputs' signs
    * (Griffin & Libkin's counting algebra). The third term is what
    * makes same-batch composition exact: a fact INSERTED referencing a
    * dim row UPDATED in the same batch contributes (+1)·(old dim) via
    * term 1, then (+1)·(−1)·(old) + (+1)·(+1)·(new) via term 3 — the
    * old-group mass cancels algebraically and exactly one unit lands
    * in the new group (spec-locked). This is also the operator that
    * RE-GROUPS history when a dim ATTRIBUTE moves (a customer changes
    * segment): the preimage joins every old fact row out of the old
    * group, the postimage joins them into the new one — B57's
    * fact-only rule cannot express that.
    *
    * Cost honesty, stated not hidden: term 2 scans the OLD fact table
    * against the dim feed — dim changes cost one fact-side pass probed
    * by a broadcast of the (small) dim delta; with the fact bucketed or
    * partitioned on the FK, dynamic partition pruning cuts the scan to
    * affected keys. This asymmetry (fact deltas are feed-sized, dim
    * deltas are fact-scan-sized) is exactly why slowly-changing dims
    * are usually modeled as SCD2 versions (A24) instead of in-place
    * updates — the operator exists for when in-place is the contract.
    *
    * `factOld`/`dimOld` must be the PRE-batch snapshots; both feeds are
    * CDF-shaped (`_change_type` + their table's columns).
    */
  def applyJoinChanges(view: DataFrame,
                       factChanges: DataFrame, dimChanges: DataFrame,
                       factOld: DataFrame, dimOld: DataFrame,
                       fk: String, pk: String,
                       viewKeys: Seq[String],
                       measures: Seq[String]): DataFrame = {
    val df = factChanges.withColumn("__sf", cdfSign).drop("_change_type")
    val dd = dimChanges.withColumn("__sd", cdfSign).drop("_change_type")
    val on = col(fk) === col(pk)
    val out = viewKeys.map(col) ++ measures.map(col)
    val term1 = df.join(dimOld, on)
      .select(out :+ col("__sf").as("__sign"): _*)
    val term2 = factOld.join(dd, on)
      .select(out :+ col("__sd").as("__sign"): _*)
    val term3 = df.join(dd, on)
      .select(out :+ (col("__sf") * col("__sd")).as("__sign"): _*)
    applySignedDeltas(view,
      Seq(term1, term2, term3).reduce(_ unionByName _),
      viewKeys, measures)
  }

  /** B62: SCD2-aware TEMPORAL join-view maintenance — the dim-history
    * case B61 names as the reason slowly-changing dims are modeled as
    * versions: the view is `γ(F ⋈ₜ H)` where each fact row joins the
    * dim VERSION valid at its event time (latest valid_from ≤ ts), and
    * maintenance must stay exact when (a) facts arrive late or are
    * retracted and (b) NEW VERSIONS land in the history — including
    * OUT-OF-ORDER effective dates that split an interior validity
    * window and silently re-attribute every fact inside it.
    *
    * The delta algebra (exact for arbitrary version arrivals):
    *
    *   Δview = [γ(F_old|K ⋈ₜ H_new) − γ(F_old|K ⋈ₜ H_old)]   (re-attribution)
    *         ∪  signed(ΔF ⋈ₜ H_new)                            (fact deltas)
    *
    * where K = keys whose version SET changed (symmetric difference of
    * the two histories' (pk, valid_from, attrs) sets). Unaffected keys
    * cancel identically, so the re-attribution scans only the
    * AFFECTED-KEY fact slice — the temporal analogue of B61's term-2
    * honesty, but bounded by the keys that actually versioned. The
    * signed union flows through [[applySignedDeltas]] unchanged.
    *
    * The temporal join keeps, per fact row, the version with the
    * LATEST valid_from ≤ ts via one (factId-keyed) max-struct
    * aggregation — no window, no extra join (measures ride the
    * group-by keys, functionally dependent on factId). Facts dated
    * before a key's first version join nothing and are excluded from
    * the view (the rebuild does the same — a fact without a valid dim
    * version has no attribution).
    *
    * At 100 TB: fact deltas cost feed-sized work; version arrivals
    * cost one fact-scan restricted to affected keys (broadcast
    * semi-join; with the fact partitioned on the FK, partition pruning
    * cuts it further) × two KB-sized history joins.
    *
    * `factId` must uniquely identify fact rows (the attribution
    * groups by it — duplicate ids would collapse their mass).
    */
  def applyScd2Changes(view: DataFrame, factChanges: DataFrame,
                       factOld: DataFrame, historyOld: DataFrame,
                       historyNew: DataFrame, fk: String, pk: String,
                       tsCol: String, factId: String,
                       attrCols: Seq[String],
                       measures: Seq[String]): DataFrame = {
    val vCols = Seq(pk, "valid_from") ++ attrCols
    val oldV = historyOld.select(vCols.map(col): _*)
    val newV = historyNew.select(vCols.map(col): _*)
    val changedKeys = newV.exceptAll(oldV).select(col(pk))
      .unionByName(oldV.exceptAll(newV).select(col(pk)))
      .distinct()

    // temporal attribution: latest valid_from <= ts per fact row
    def temporal(facts: DataFrame, hist: DataFrame): DataFrame = {
      val fCols = Seq(factId, tsCol) ++ measures ++
        (if (facts.columns.contains("__sign")) Seq("__sign") else Nil)
      val vStruct = struct((col("valid_from") +: attrCols.map(col)): _*)
      facts.select((fCols :+ fk).distinct.map(col): _*)
        .join(hist.select(vCols.map(col): _*),
          col(fk) === col(pk) && col("valid_from") <= col(tsCol))
        .groupBy(fCols.map(col): _*)
        .agg(max(vStruct).as("__v"))
        .select((fCols.map(col) ++
          attrCols.map(a => col("__v").getField(a).as(a))): _*)
    }

    val affected = factOld.join(changedKeys, factOld(fk) === col(pk),
      "left_semi")
    val sel = attrCols ++ measures
    val reattrNew = temporal(affected.withColumn("__sign", lit(1L)),
      historyNew).select((sel :+ "__sign").map(col): _*)
    val reattrOld = temporal(affected.withColumn("__sign", lit(-1L)),
      historyOld).select((sel :+ "__sign").map(col): _*)
    val deltas = temporal(factChanges.withColumn("__sign", cdfSign)
        .drop("_change_type"), historyNew)
      .select((sel :+ "__sign").map(col): _*)
    applySignedDeltas(view,
      Seq(reattrNew, reattrOld, deltas).reduce(_ unionByName _),
      attrCols, measures)
  }

  /** Build the temporal view from scratch (the rebuild twin of
    * [[applyScd2Changes]] — what the incremental path must equal).
    */
  def buildTemporal(facts: DataFrame, history: DataFrame, fk: String,
                    pk: String, tsCol: String, factId: String,
                    attrCols: Seq[String],
                    measures: Seq[String]): DataFrame = {
    val vCols = Seq(pk, "valid_from") ++ attrCols
    val vStruct = struct((col("valid_from") +: attrCols.map(col)): _*)
    val fCols = Seq(factId, tsCol) ++ measures
    val attributed = facts.select((fCols :+ fk).distinct.map(col): _*)
      .join(history.select(vCols.map(col): _*),
        col(fk) === col(pk) && col("valid_from") <= col(tsCol))
      .groupBy(fCols.map(col): _*)
      .agg(max(vStruct).as("__v"))
      .select((fCols.map(col) ++
        attrCols.map(a => col("__v").getField(a).as(a))): _*)
    build(attributed, attrCols, measures)
  }

  /** Advance `view` by one CDF batch (schema: base columns +
    * `_change_type`). Returns the maintained view, identical to
    * rebuilding from the merged snapshot.
    */
  def applyChanges(view: DataFrame, changes: DataFrame, keys: Seq[String],
                   measures: Seq[String]): DataFrame =
    applySignedDeltas(view, changes.withColumn("__sign", cdfSign)
      .drop("_change_type"), keys, measures)

  /** The shared signed-delta merge: aggregate `__sign`-weighted rows,
    * full-outer merge into the view, drop groups whose count reaches
    * zero — exactly what a rebuild would do.
    */
  def applySignedDeltas(view: DataFrame, signedRows: DataFrame,
                        keys: Seq[String],
                        measures: Seq[String]): DataFrame = {
    val delta = signedRows
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__sign")).as("__d_n"),
        measures.map(c =>
          sum(col(c).cast(SumType) * col("__sign")).as(s"__d_sum_$c")): _*)

    val v = view.as("v")
    val d = delta.as("d")
    val cond = keys.map(k => col(s"v.$k") <=> col(s"d.$k")).reduce(_ && _)
    val zero = lit(0L)
    val zeroSum = lit(0).cast(SumType)
    v.join(d, cond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"v.$k"), col(s"d.$k")).as(k)) ++
          Seq((coalesce(col("v.__mv_n"), zero) +
            coalesce(col("d.__d_n"), zero)).as("__mv_n")) ++
          measures.map(c =>
            (coalesce(col(s"v.${sumCol(c)}"), zeroSum) +
              coalesce(col(s"d.__d_sum_$c"), zeroSum)).as(sumCol(c))): _*)
      .where(col("__mv_n") > 0)
  }
}
