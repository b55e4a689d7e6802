package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Expectations
import graft.operators.Expectations.RowCheck

/** A32 declarative expectations: null handling (a null under a row
  * check is a VIOLATION; a null FK is NOT one — SQL semantics), dup
  * counting beyond-first, and empty-frame totals.
  */
class ExpectationsSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("row checks: nulls violate, one agg pass serves many checks") {
    val df = Seq[(Option[Int], Option[String])](
      (Some(5), Some("a")), (Some(50), Some("b")),
      (None, Some("a")), (Some(7), None)).toDF("n", "s")
    val got = Expectations.rowChecks(df, Seq(
        RowCheck("n_le_10", col("n") <= 10),
        RowCheck("s_not_null", col("s").isNotNull)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n_le_10: 50 violates, null violates -> 2; s_not_null: 1
    assert(got === Map("n_le_10" -> 2L, "s_not_null" -> 1L))
  }

  test("uniqueKey counts rows beyond the first; referential ignores " +
       "null FKs; report attaches verdicts") {
    val child = Seq[(Option[Long], String)](
      (Some(1L), "x"), (Some(1L), "y"), (Some(1L), "z"),
      (Some(9L), "dangling"), (None, "null-fk")).toDF("fk", "v")
    val parent = Seq(1L, 2L).toDF("pk")
    val rep = Expectations.report(Seq(
        Expectations.uniqueKey(child, "unique_fk", Seq("fk")),
        Expectations.referential(child, "fk", parent, "pk", "fk_ok")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    // fk=1 triplicated -> 2 beyond-first; null key group of 1 -> 0
    assert(rep("unique_fk") === ((2L, false)))
    // only fk=9 dangles; the null FK is not a violation
    assert(rep("fk_ok") === ((1L, false)))
  }

  test("empty frame: zero violations everywhere, all checks pass") {
    val empty = Seq.empty[(Option[Int], Option[String])].toDF("n", "s")
    val rep = Expectations.report(Seq(
        Expectations.rowChecks(empty, Seq(RowCheck("c", col("n") > 0))),
        Expectations.uniqueKey(empty, "u", Seq("n"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rep.toSet === Set(("c", 0L, true), ("u", 0L, true)))
  }
}
