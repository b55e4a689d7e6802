package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the delta-constraints / DLT
  * `expect` surface over plain tables: a set of named checks validated
  * in bulk, emitting one (check, n_violations, pass) row each. The
  * reference pipeline has NO validation between transform and load;
  * this is the gate a production lakehouse runs before publish (pairs
  * with A29: expectations as the WAP audit step).
  *
  * Execution shape, sized for 100 TB:
  *  - all row-local checks (not-null, accepted-range/set) fold into ONE
  *    map-side-combined aggregate pass over the table — adding a check
  *    adds a column to the agg, never a scan;
  *  - `uniqueKey` is one keyed count (map-combined, shuffle on the key);
  *  - `referential` is one anti-join per FK (broadcast when the parent
  *    is dim-sized — the planner's call via AQE/stats).
  * Output is long-form and tiny (one row per check), so the whole
  * report is a driver-safe collect for the publish/refuse decision.
  */
object Expectations {

  /** A row-local expectation: `holds` must be true (nulls count as
    * violations unless the predicate says otherwise).
    */
  case class RowCheck(name: String, holds: Column)

  /** Row-local checks in one aggregate pass. */
  def rowChecks(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "Expectations.rowChecks: no checks")
    checks.foreach(c => require(c.name.matches("[A-Za-z0-9_]+"),
      s"check name '${c.name}' must be identifier-safe (it names an " +
        "aggregate column and rides a stack() expression)"))
    val aggs = checks.map(c =>
      sum(when(coalesce(c.holds, lit(false)), 0L).otherwise(1L))
        .as(c.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // wide (1 row) -> long (one row per check): stack is map-side only
    val stacked = checks.map(c =>
      s"'${c.name}', coalesce(CAST(${c.name} AS BIGINT), 0)").mkString(", ")
    wide.selectExpr(
      s"stack(${checks.size}, $stacked) AS (check_name, n_violations)")
  }

  /** Duplicate-key violations: rows beyond the first per key value. */
  def uniqueKey(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Referential-integrity violations: child rows whose FK value exists
    * nowhere in the parent key column (null FKs are not violations —
    * SQL FK semantics).
    */
  def referential(child: DataFrame, fk: String,
                  parent: DataFrame, pk: String, name: String): DataFrame =
    child.where(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Union the reports and attach the verdict. */
  def report(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)
      .select(col("check_name"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
}
