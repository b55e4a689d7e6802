package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

class TextFunctionsSpec extends AnyFunSuite with SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c).head.get(0)

  test("token counting: whitespace and BPE-ish") {
    assert(one("a b  c", TextFunctions.tokenCount(col("t"))) === 3)
    assert(one("", TextFunctions.tokenCount(col("t"))) === 0)
    assert(one("   ", TextFunctions.tokenCount(col("t"))) === 0)
    // runs: "ab" "12" "," "cd" -> 4
    assert(one("ab12,cd", TextFunctions.bpeishTokenCount(col("t"))) === 4)
  }

  test("qualityScore is bounded and orders clean text above digit soup") {
    val clean = one("The quick brown fox jumps over the lazy dog",
      TextFunctions.qualityScore(col("t"))).asInstanceOf[Double]
    val soup = one("00 11 2345 678 999 000 1 2 3 44 5555",
      TextFunctions.qualityScore(col("t"))).asInstanceOf[Double]
    assert(clean >= 0.0 && clean <= 1.0 && soup >= 0.0 && soup <= 1.0)
    assert(clean > soup)
  }

  test("fingerprintMd5 equals JVM md5 of the normalized text") {
    val text = "  Hello   WORLD  "
    val norm = "hello world"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(one(text, TextFunctions.fingerprintMd5(col("t"))) === md)
  }

  test("rollingHash: known value, deterministic, ANSI-safe on long text") {
    // "ab" -> ((0*257+97) % M)*257 + 98) % M = 25027
    assert(one("ab", TextFunctions.rollingHash(col("t"))) === 25027L)
    val long = ("x" * 100000)
    val h1 = one(long, TextFunctions.rollingHash(col("t")))
    val h2 = one(long, TextFunctions.rollingHash(col("t")))
    assert(h1 === h2) // and no ARITHMETIC_OVERFLOW on 100k chars
  }

  test("fingerprint64 is stable across whitespace/case variants") {
    val a = one("Hello   World", TextFunctions.fingerprint64(col("t")))
    val b = one("hello world", TextFunctions.fingerprint64(col("t")))
    assert(a === b)
  }

  test("approx sketches track exact answers within tolerance") {
    val li = Tables(spark, sfDir(), "lineitem")
    val row = li.agg(
      countDistinct("l_partkey").as("exact_d"),
      approx_count_distinct("l_partkey").as("approx_d"),
      expr("percentile(l_extendedprice, 0.5D)").as("exact_p50"),
      expr("approx_percentile(l_extendedprice, 0.5D, 1000)").as("approx_p50"))
      .head
    val (ed, ad) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(ad - ed) / ed < 0.05, s"distinct $ad vs $ed")
    val (ep, ap) = (row.getDouble(2), row.getDouble(3))
    assert(math.abs(ap - ep) / ep < 0.05, s"p50 $ap vs $ep")
  }

  test("langId classifies unambiguous stopword-rich sentences") {
    val cases = Seq(
      "the cat and the dog is in that house for it with them" -> "en",
      "la que el en y los del se las casa" -> "es",
      "le et les des du un homme que la de" -> "fr",
      "der die und den von zu das mit sich haus" -> "de",
      "de que e o a do da em um para" -> "pt")
    cases.foreach { case (text, expected) =>
      assert(one(text, TextFunctions.langId(col("t"))) === expected,
        s"for: $text")
    }
    // all-zero tie resolves to the greatest lang code deterministically
    assert(one("qwx zzz", TextFunctions.langId(col("t"))) === "pt")
  }

  test("normalizeText: NFC composition, control strip, collapse, trim") {
    def norm(s: String): Any =
      one(s, graft.functions.GraftExpressions.normalizeText(col("t")))
    // decomposed e + U+0301 composes to the precomposed é
    assert(norm("café") === "café")
    // precomposed input passes through unchanged
    assert(norm("café") === "café")
    // controls (tab, newline, CR, BEL, DEL) become spaces and collapse
    assert(norm("a\t\nbc") === "a b c")
    assert(norm("  a   b  ") === "a b")
    // NBSP is NOT ASCII whitespace: stated pass-through contract
    assert(norm("a b") === "a b")
    // idempotence
    assert(norm("  x́  y\t ") ===
      one("  x́  y\t ", graft.functions.GraftExpressions.normalizeText(
        graft.functions.GraftExpressions.normalizeText(col("t")))))
    assert(norm("") === "")
    assert(norm(" \t ") === "")
    // null-safe
    val n = Seq[Option[String]](None).toDF("t")
      .select(graft.functions.GraftExpressions.normalizeText(col("t")))
      .head.isNullAt(0)
    assert(n)
  }

  test("c44: URL canonicalization handles ports, www, tracking params, " +
       "fragments, and public-suffix domains") {
    import graft.functions.UrlFunctions
    def canon(u: String): String =
      one(u, UrlFunctions.canonicalUrl(col("t"))).asInstanceOf[String]
    def domain(h: String): String =
      one(h, UrlFunctions.registeredDomain(col("t"))).asInstanceOf[String]
    // default port stripped iff it matches the scheme; www stripped;
    // scheme+host lowercased; path case preserved
    assert(canon("HTTPS://WWW.Example.COM:443/A/b") ===
      "https://example.com/A/b")
    assert(canon("http://site.org:80/x") === "http://site.org/x")
    // non-default port survives
    assert(canon("https://site.org:8080/x") === "https://site.org:8080/x")
    // tracking-only query drops the '?' entirely; kept params keep order
    assert(canon("http://a.com/p?utm_source=x&utm_medium=y#frag") ===
      "http://a.com/p")
    assert(canon("http://a.com/p?b=2&utm_source=x&a=1&gclid=z") ===
      "http://a.com/p?b=2&a=1")
    // trailing slashes strip (root path canonicalizes to empty)
    assert(canon("http://a.com/") === "http://a.com")
    assert(canon("http://a.com/x///") === "http://a.com/x")
    // registered-domain heuristic: 2 labels, 3 under a 2-label suffix
    assert(domain("tracker.ads.example.com") === "example.com")
    assert(domain("news.bbc.co.uk") === "bbc.co.uk")
    assert(domain("localhost") === "localhost")
    assert(one("http://Sub.Spammy.NET/x",
      UrlFunctions.domainBlocked(
        UrlFunctions.canonicalHost(col("t")),
        Seq("spammy.net"))).asInstanceOf[Boolean])
  }
}
