package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType}

/** Column-recoding operators — the Spark-first re-expression of the
  * reference's transform surface (see /root/reference/etl/censo_escolar/
  * transform/transform.py:33-152).
  *
  * The reference recodes categorical columns with per-row Python UDF dict
  * lookups (transform.py:33-38). Here every recode is a Catalyst map-literal
  * / CASE expression: codegen'd, null-safe, and pushdown-transparent — at
  * 100 TB a Python UDF in this spot is the whole job's bottleneck.
  */
object Recode {

  /** Build a Catalyst map literal out of a Scala map (small dictionaries:
    * the censo maps.json has ≤ ~100 entries per column).
    */
  private def mapLiteral(m: Map[String, String]): Column =
    map(m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** Dict recode: code → label, unmapped/null → null.
    * Mirrors transform.py:33-38 (`map_.get(key)`), minus the UDF.
    */
  def recodeWithMap(df: DataFrame, column: String, m: Map[String, String]): DataFrame =
    df.withColumn(column, try_element_at(mapLiteral(m), col(column)))

  /** Recode every column whose name matches `pred` and has a dictionary in
    * `maps` — the `transform_string_columns` loop (transform.py:68-77).
    */
  def recodeCategoricals(
      df: DataFrame,
      maps: Map[String, Map[String, String]],
      pred: String => Boolean = c => c.startsWith("TP") || c.startsWith("CO")
  ): DataFrame = {
    val cols = df.columns.map { c =>
      if (pred(c) && maps.contains(c)) try_element_at(mapLiteral(maps(c)), col(c)).as(c)
      else col(c)
    }
    df.select(cols.toSeq: _*)
  }

  /** "0"/"1" string → boolean, anything else → null (transform.py:80-92). */
  def recodeBoolean(df: DataFrame, columns: Seq[String]): DataFrame = {
    val set = columns.toSet
    val cols = df.columns.map { c =>
      if (set(c))
        when(col(c) === "1", lit(true))
          .when(col(c) === "0", lit(false))
          .otherwise(lit(null))
          .as(c)
      else col(c)
    }
    df.select(cols.toSeq: _*)
  }

  /** Cast all columns matching `pred` (reference: NU_ / QT_ prefixes) to
    * int (transform.py:95-101). `try_cast`, not `cast`: the reference ran
    * Spark 3 non-ANSI where malformed numerics became null; under Spark
    * 4's default ANSI mode a plain cast would kill a 100 TB load on the
    * first dirty cell. try_cast preserves the null-on-garbage contract.
    */
  def castInts(df: DataFrame, pred: String => Boolean): DataFrame = {
    val cols = df.columns.map { c =>
      if (pred(c)) col(c).try_cast(IntegerType).as(c) else col(c)
    }
    df.select(cols.toSeq: _*)
  }

  private val monthAbbrev: Column = map(Seq(
    "JAN" -> 1, "FEB" -> 2, "MAR" -> 3, "APR" -> 4, "MAY" -> 5, "JUN" -> 6,
    "JUL" -> 7, "AUG" -> 8, "SEP" -> 9, "OCT" -> 10, "NOV" -> 11, "DEC" -> 12
  ).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** SAS-style `ddMMMyyyy:HH:mm:ss` (e.g. `01JAN2015:00:00:00`) → date.
    * Implemented with substrings + a month-abbrev map literal so parsing
    * is locale- and case-insensitive (Java's MMM parser is neither).
    * try_* variants throughout: malformed strings → null, never an ANSI
    * runtime error mid-load.
    */
  def parseSasDate(c: Column): Column = {
    val y = substring(c, 6, 4)
    val m = try_element_at(monthAbbrev, upper(substring(c, 3, 3))).cast("string")
    val d = substring(c, 1, 2)
    // null-propagating concat (NOT concat_ws, which would skip null parts
    // and mis-align fields) + try_to_timestamp: any malformed component —
    // bad month code, day 99, alpha year — yields null, never an ANSI
    // error (make_date THROWS on out-of-range parts under ANSI)
    try_to_timestamp(
      concat(y, lit("-"), m, lit("-"), d), lit("y-M-d"))
  }

  /** Year-dependent date parse (transform.py:41-50): censo years after 2014
    * ship `dd/M/yyyy` strings, older years the SAS datetime form.
    */
  def parseDateFlex(df: DataFrame, column: String, year: Int): DataFrame = {
    val parsed =
      if (year > 2014) try_to_timestamp(col(column), lit("d/M/yyyy"))
      else parseSasDate(col(column))
    df.withColumn(column, parsed.cast(DateType))
  }

  /** Derived boolean = a OR b, then drop the parts (transform.py:112-126). */
  def deriveOr(df: DataFrame, target: String, a: String, b: String,
               dropParts: Boolean = true): DataFrame = {
    val out = df.withColumn(target, col(a) || col(b))
    if (dropParts) out.drop(a, b) else out
  }

  /** Prefix every column (`add_prefix_in_columns`, transform.py:21-23). */
  def withPrefix(df: DataFrame, prefix: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(s"${prefix}_$c")).toSeq: _*)

  /** Bulk rename by map (rename_columns, transform.py:129-137). */
  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.select(df.columns.map(c => col(c).as(renames.getOrElse(c, c))).toSeq: _*)

  /** n-way union of homogeneous frames (transform.py:151-152). Uses
    * unionByName so shard column order can't silently corrupt data.
    */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_))
}
