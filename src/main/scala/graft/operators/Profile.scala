package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass data profiling: per-column non-null/null/distinct counts
  * and min/max, computed in ONE aggregate over the table (one scan, one
  * reduce), then pivoted to tidy long format with `stack`.
  *
  * Distinct counts are exact so the result is oracle-comparable; at
  * 100 TB swap `countDistinct` for `approx_count_distinct` — the plan
  * shape (single scan, no joins) is unchanged. min/max surface as
  * strings so heterogeneous column types share one output schema.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains))
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`"
    ).mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column, n_non_null, n_nulls, n_distinct, min_value, max_value)")
  }

  /** [[profile]] plus approximate quartiles for numeric columns via the
    * mergeable t-digest ([[Sketches]]) — still one scan; the digests build
    * map-side alongside the other aggregates and add KBs of state per
    * column. Non-numeric columns carry null quartiles. This is the
    * 100 TB profiling shape: quantiles without per-column sorts.
    */
  def profileWithQuantiles(df: DataFrame, cols: Seq[String],
                           compression: Int = 200): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains))
    val numeric = cols.filter(c => df.schema(c).dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    }).toSet
    val qs = Seq(0.25, 0.5, 0.75)
    val aggs = cols.flatMap { c =>
      val base = Seq(
        count(col(c)).as(s"${c}__n"),
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
      val quart =
        if (numeric(c))
          Sketches.tdigestQuantiles(col(c).cast("double"), qs, compression)
            .as(s"${c}__q")
        else array(lit(null), lit(null), lit(null)).cast("array<double>")
          .as(s"${c}__q")
      base :+ quart
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__distinct`, `${c}__min`, " +
        s"`${c}__max`, `${c}__q`[0], `${c}__q`[1], `${c}__q`[2]"
    ).mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column, n_non_null, n_nulls, n_distinct, min_value, max_value, " +
        "q25, q50, q75)")
  }
}
