package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Recode

/** The reference's whole `transform()` chain (/root/reference/etl/
  * censo_escolar/transform/transform.py:140-148) as one composable,
  * fully-declarative pipeline: dict recodes → boolean recodes → int casts →
  * date parse → OR-derives → renames. Every step is a projection, so
  * Catalyst collapses the chain into a single codegen'd stage — the
  * reference pays one Python-UDF round trip per recoded column instead.
  */
object CensoPipeline {

  /** Censo-shaped view of the lineitem test table (TP_/IN_/NU_/DT_ naming
    * convention carried over from the censo data dictionary), so the
    * pipeline is exercised — and oracle-checked — on driver-provided data.
    */
  def censoLike(lineitem: DataFrame): DataFrame = lineitem.select(
    col("l_orderkey").as("CO_ID"),
    col("l_returnflag").as("TP_RET"),
    when(col("l_quantity") > 25, "1").otherwise("0").as("IN_HEAVY"),
    when(col("l_discount") > 0.05, "1").otherwise("0").as("IN_DISC"),
    col("l_quantity").cast("int").cast("string").as("NU_QTY"),
    date_format(col("l_shipdate"), "dd/MM/yyyy").as("DT_SHIP"))

  val retMap: Map[String, String] =
    Map("A" -> "Accepted", "N" -> "None", "R" -> "Refused")

  /** The reference's year-conditional escolas column rules, re-expressed
    * verbatim (transform.py:112-137 join_columns + rename_columns):
    * pre-2019 files OR-merge the ONG/OSCIP maintainer flags and the two
    * fossa columns; the merged parts are dropped unconditionally. The
    * reference then copies IN_ALOJAM_* to IN_DORMITORIO_* and immediately
    * drops the copies (a self-canceling rename — reproduced as-is so
    * outputs match), leaving CO_LINGUA_INDIGENA_1 as the only rename that
    * survives.
    */
  def escolasYearRules(df: DataFrame, year: Int): DataFrame = {
    val merged =
      if (year < 2019)
        df.withColumn("IN_MANT_ESCOLA_PRIV_ONG_OSCIP",
            col("IN_MANT_ESCOLA_PRIVADA_ONG") || col("IN_MANT_ESCOLA_PRIVADA_OSCIP"))
          .withColumn("IN_ESGOTO_FOSSA",
            col("IN_ESGOTO_FOSSA_SEPTICA") || col("IN_ESGOTO_FOSSA_COMUM"))
      else df
    val dropped = merged.drop("IN_MANT_ESCOLA_PRIVADA_ONG",
      "IN_MANT_ESCOLA_PRIVADA_OSCIP", "IN_ESGOTO_FOSSA_SEPTICA",
      "IN_ESGOTO_FOSSA_COMUM")
    val renamed =
      if (year < 2019)
        dropped.withColumn("CO_LINGUA_INDIGENA_1", col("CO_LINGUA_INDIGENA"))
      else dropped
    renamed.drop("IN_DORMITORIO_ALUNO", "IN_DORMITORIO_PROFESSOR",
      "CO_LINGUA_INDIGENA")
  }

  /** transform(): the full recode chain with censo column-prefix
    * conventions (TP_/CO_ categorical, IN_ boolean, NU_/QT_ integer,
    * DT_ date).
    */
  def run(df: DataFrame, year: Int,
          maps: Map[String, Map[String, String]] = Map("TP_RET" -> retMap),
          renames: Map[String, String] = Map("TP_RET" -> "TP_RETURN")): DataFrame = {
    val boolCols = df.columns.filter(_.startsWith("IN")).toSeq
    val dateCols = df.columns.filter(_.startsWith("DT")).toSeq
    var out = Recode.recodeCategoricals(df, maps)
    out = Recode.recodeBoolean(out, boolCols)
    out = Recode.castInts(out, c => c.startsWith("NU") || c.startsWith("QT"))
    out = dateCols.foldLeft(out)((d, c) => Recode.parseDateFlex(d, c, year))
    out = Recode.deriveOr(out, "IN_ANY", "IN_HEAVY", "IN_DISC")
    Recode.renameAll(out, renames)
  }
}
