package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pseudonymize

class PseudonymizeSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("tokenization preserves referential integrity across tables") {
    val cust = Tables(spark, sfDir(), "customer")
      .select("c_custkey", "c_name")
    val ords = Tables(spark, sfDir(), "orders").select("o_custkey")
    // join cardinality on RAW keys ≡ join cardinality on TOKENS
    val raw = cust.join(ords, col("c_custkey") === col("o_custkey")).count()
    val tok = Pseudonymize.tokenize(cust, "k", Seq("c_custkey"))
      .join(Pseudonymize.tokenize(ords, "k", Seq("o_custkey")),
        col("c_custkey") === col("o_custkey")).count()
    assert(tok === raw)
    // distinct values stay distinct (no token collapse on this domain)
    val nTok = Pseudonymize.tokenize(cust, "k", Seq("c_custkey"))
      .select("c_custkey").distinct().count()
    assert(nTok === cust.select("c_custkey").distinct().count())
  }

  test("different secrets yield unlinkable tokens; nulls stay null") {
    val df = Seq(Some("alice"), Some("bob"), None).toDF("name")
    val a = Pseudonymize.tokenize(df, "s1", Seq("name"))
      .collect().map(r => Option(r.getString(0)))
    val b = Pseudonymize.tokenize(df, "s2", Seq("name"))
      .collect().map(r => Option(r.getString(0)))
    assert(a.zip(b).forall {
      case (None, None) => true // null carries no identity
      case (Some(x), Some(y)) => x != y
      case _ => false
    })
  }
}
