package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Recode

/** Dirty-data behavior under Spark 4 ANSI mode: every recode/cast/parse
  * must yield null on garbage, never an ANSI runtime error — the
  * reference ran Spark 3 non-ANSI where that was the silent default, and
  * a 100 TB load must not die on one malformed cell.
  */
class RecodeSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("castInts: malformed numerics become null, not ANSI errors") {
    val df = Seq("12", "not_a_number", "", "3.7e2junk", "2147483648")
      .toDF("NU_X")
    val out = Recode.castInts(df, _.startsWith("NU")).collect()
      .map(r => Option(r.get(0)))
    assert(out === Seq(Some(12), None, None, None, None))
  }

  test("parseDateFlex modern form: garbage yields null") {
    val df = Seq("02/02/2015", "31/02/2015", "garbage", "").toDF("DT_X")
    val out = Recode.parseDateFlex(df, "DT_X", 2015).collect()
      .map(r => Option(r.get(0)).map(_.toString))
    assert(out === Seq(Some("2015-02-02"), None, None, None))
  }

  test("parseSasDate: bad month code / day 99 / alpha year yield null") {
    val df = Seq("01FEB2011:00:00:00", "99FEB2011:00:00:00",
      "01XXX2011:00:00:00", "01FEByyyy:00:00:00", "junk").toDF("DT_X")
    val out = Recode.parseDateFlex(df, "DT_X", 2011).collect()
      .map(r => Option(r.get(0)).map(_.toString))
    assert(out === Seq(Some("2011-02-01"), None, None, None, None))
  }

  test("recodeWithMap: unmapped codes become null (map_.get contract)") {
    val df = Seq("1", "2", "7", null).toDF("TP_X")
    val out = Recode.recodeWithMap(df, "TP_X", Map("1" -> "a", "2" -> "b"))
      .collect().map(r => Option(r.getString(0)))
    assert(out === Seq(Some("a"), Some("b"), None, None))
  }

  test("recodeBoolean: non-0/1 strings become null") {
    val df = Seq("1", "0", "2", "true", null).toDF("IN_X")
    val out = Recode.recodeBoolean(df, Seq("IN_X")).collect()
      .map(r => Option(r.get(0)))
    assert(out === Seq(Some(true), Some(false), None, None, None))
  }
}
