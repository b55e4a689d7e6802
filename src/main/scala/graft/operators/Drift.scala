package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift report (C56) — the "did the new crawl move the
  * distribution?" gate a recurring training-data pipeline runs between
  * snapshot N and N+1 before committing a mix: per stratum (source,
  * language, domain tier, ...), document and token volumes side by side
  * plus each stratum's token SHARE of its snapshot, with the share
  * delta flagged against a tolerance. A silent 2× collapse of one
  * source between crawls — the classic upstream regression — shows up
  * as one flagged row instead of a downstream eval surprise.
  *
  * Determinism (the §4 grid-integer rule): shares ship as exact
  * integer PARTS-PER-MILLION — `toks * 1_000_000 div total` (both
  * engines truncate integer division identically) — so every column is
  * a BIGINT and the gate is hash-exact; no double division, no
  * rounding boundary.
  *
  * Scale shape: one map-combined aggregate pass per snapshot (the only
  * corpus-sized work), then a stratum-sized full-outer join + one
  * unpartitioned window over the dim-sized frame for totals. Missing
  * strata surface as 0-volume rows on the other side — a vanished
  * source is a flagged row, never an absent one.
  */
object Drift {

  def corpusDrift(oldDf: DataFrame, newDf: DataFrame, strataCol: String,
                  tokens: Column, driftPpmLimit: Long = 5000L): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame =
      df.groupBy(col(strataCol).as("stratum"))
        .agg(count(lit(1)).as(s"docs_$tag"),
          sum(tokens.cast("long")).as(s"toks_$tag"))
    val o = side(oldDf, "old")
    val n = side(newDf, "new")
    val joined = o.join(n, Seq("stratum"), "full_outer")
      .na.fill(0L, Seq("docs_old", "toks_old", "docs_new", "toks_new"))
    joined
      .withColumn("share_old_ppm",
        expr("toks_old * 1000000 DIV greatest(1, sum(toks_old) OVER ())"))
      .withColumn("share_new_ppm",
        expr("toks_new * 1000000 DIV greatest(1, sum(toks_new) OVER ())"))
      .withColumn("drift_ppm",
        abs(col("share_new_ppm") - col("share_old_ppm")))
      .withColumn("drifted", col("drift_ppm") > lit(driftPpmLimit))
  }
}
