package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions

/** Z-order clustered writes (delta/iceberg `OPTIMIZE ZORDER BY`
  * semantics): lay a table out along a Morton space-filling curve over N
  * columns so that FILE-level min/max zones are tight on EVERY clustered
  * column at once. A linear sort makes only its leading key skippable —
  * zones for the second column span the whole domain in every file; the
  * z-curve trades a constant factor of per-column tightness (each of N
  * columns gets bits/N of the locality) for making all N columns
  * prunable, which is the right trade whenever queries filter on more
  * than one dimension ([[DataSkipping]] serves those pruned reads).
  *
  * Scale shape: bucket boundaries are equi-depth quantiles — one
  * `approxQuantile` pass (Greenwald-Khanna partials, map-side combined),
  * driver state of 2^bits-1 doubles per column (KB — the k-means
  * centroid contract), riding the plan as ONE codegen reference object
  * inside [[graft.functions.ZValueExpr]]. The write is
  * `repartitionByRange` on the z-value (one range shuffle — the same
  * exchange a linear sorted write pays) + an in-partition sort, so
  * z-ordering costs exactly what sorting costs: no extra pass, no
  * driver-side data movement. Equi-depth bucketization keeps skewed
  * columns balanced, so file sizes stay uniform where an equi-width
  * curve would pile the skew into one tile.
  */
object ZOrder {

  /** Equi-depth boundary arrays for `cols` (sorted, deduplicated; up to
    * 2^bits-1 interior quantiles each), from one approxQuantile pass.
    * `relErr` is the GK sketch bound — 1e-3 keeps bucket mass within
    * 0.1% of uniform, plenty for file-level locality.
    */
  def boundaries(df: DataFrame, cols: Seq[String], bits: Int,
                 relErr: Double = 0.001): Array[Array[Double]] = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 63)
    val buckets = 1 << bits
    val probs = Array.tabulate(buckets - 1)(i => (i + 1).toDouble / buckets)
    val numeric = df.select(cols.zipWithIndex.map { case (c, i) =>
      col(c).cast("double").as(s"_z$i")
    }: _*)
    numeric.stat
      .approxQuantile(cols.indices.map(i => s"_z$i").toArray, probs, relErr)
      .map(_.distinct.sorted)
  }

  /** The z-value column for `cols` under `bounds` (null dims bucket 0). */
  def zValueCol(cols: Seq[Column], bounds: Array[Array[Double]],
                bits: Int): Column =
    GraftExpressions.zValue(array(cols.map(_.cast("double")): _*),
      bounds, bits)

  /** Write `df` to `path` clustered along the z-curve over `cols` in
    * ~`numFiles` files. Returns the boundaries used (callers pass them
    * to [[zValueCol]] to route further predicates or incremental data).
    */
  def clusteredWrite(df: DataFrame, cols: Seq[String], path: String,
                     numFiles: Int, bits: Int = 8): Array[Array[Double]] = {
    val bounds = boundaries(df, cols, bits)
    val z = zValueCol(cols.map(col), bounds, bits)
    df.withColumn("__graft_z", z)
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
    bounds
  }
}
