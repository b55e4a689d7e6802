package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{QualityFilters, TextFunctions}

class QualityFiltersSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def metrics(text: String): (Int, Double, Double, Double, Boolean) = {
    val r = Seq(text).toDF("text").select(
      QualityFilters.nWords(col("text")),
      QualityFilters.dupWordFrac(col("text")),
      QualityFilters.topBigramFrac(col("text")),
      QualityFilters.meanWordLen(col("text")),
      QualityFilters.keep(col("text"))).head
    (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))
  }

  test("hand-computed metrics on a short sentence") {
    // 6 words, 5 distinct ("the" twice); 5 bigrams all distinct;
    // mean word length (3+3+3+2+3+3)/6
    val (n, dwf, tbf, mwl, keep) = metrics("the cat sat on the mat")
    assert(n === 6)
    assert(math.abs(dwf - (1.0 - 5.0 / 6.0)) < 1e-12)
    assert(math.abs(tbf - 0.2) < 1e-12)
    assert(math.abs(mwl - 17.0 / 6.0) < 1e-12)
    assert(!keep, "mean word length < 3 must drop")
  }

  test("repetition spam is caught by dup-word and top-bigram fractions") {
    val (_, dwf, tbf, _, keep) = metrics("click here click here click here")
    assert(math.abs(dwf - (1.0 - 2.0 / 6.0)) < 1e-12)
    // bigrams: [click here, here click, click here, here click, click here]
    assert(math.abs(tbf - 3.0 / 5.0) < 1e-12)
    assert(!keep)
  }

  test("natural prose passes all gates") {
    val (n, dwf, tbf, mwl, keep) =
      metrics("quick brown foxes jump over lazy dogs today")
    assert(n === 8 && dwf === 0.0)
    assert(math.abs(tbf - 1.0 / 7.0) < 1e-12)
    assert(mwl === 4.5)
    assert(keep)
  }

  test("degenerate inputs: empty, blank, single word") {
    assert(metrics("") === ((0, 0.0, 0.0, 0.0, false)))
    assert(metrics("   ") === ((0, 0.0, 0.0, 0.0, false)))
    val (n, dwf, tbf, _, keep) = metrics("word")
    assert(n === 1 && dwf === 0.0 && tbf === 0.0 && !keep)
  }

  test("case folding: tokens compare lowercased") {
    val (_, dwf, _, _, _) = metrics("The the THE")
    assert(math.abs(dwf - (1.0 - 1.0 / 3.0)) < 1e-12)
  }

  test("pii scrub redacts emails, ipv4, and intl phones — and only those") {
    val in = "mail a.b@c.de and 10.2.3.4 call +1 234-567-8901 v2.5 is pi 3.14"
    val out = Seq(in).toDF("t")
      .select(TextFunctions.scrubPii(col("t"))).head.getString(0)
    assert(out === "mail <EMAIL> and <IP> call <PHONE> v2.5 is pi 3.14")
    val counts = Seq(in).toDF("t").select(
      TextFunctions.countMatches(col("t"), TextFunctions.emailPattern),
      TextFunctions.countMatches(col("t"), TextFunctions.ipv4Pattern),
      TextFunctions.countMatches(col("t"), TextFunctions.phonePattern)).head
    assert((counts.getInt(0), counts.getInt(1), counts.getInt(2)) === ((1, 1, 1)))
  }

  test("pii scrub is idempotent and leaves clean text untouched") {
    val clean = "no personal data here, just words and 42 numbers"
    val df = Seq(clean).toDF("t")
    assert(df.select(TextFunctions.scrubPii(col("t"))).head.getString(0) === clean)
    val once = "reach x@y.org now"
    val scrubbed = Seq(once).toDF("t")
      .select(TextFunctions.scrubPii(TextFunctions.scrubPii(col("t"))))
      .head.getString(0)
    assert(scrubbed === "reach <EMAIL> now")
  }
}
