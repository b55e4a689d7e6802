package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for LLM training-data pipelines. All pure
  * Catalyst expressions (no UDFs): codegen'd and usable inside any plan.
  * Semantics kept ASCII-regex-based so the DuckDB oracle can reproduce them
  * exactly where checked.
  */
object TextFunctions {

  /** Whitespace tokens of the trimmed text. */
  def wsTokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(wsTokens(c)))

  /** BPE-ish subword count: alpha runs, digit runs, and punctuation runs each
    * count as one token — a cheap deterministic stand-in for a real BPE
    * vocab that tracks it within a few percent on English text.
    */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(bpePattern), lit(0)))

  /** Character-class counts used by the quality score. */
  def alphaChars(c: Column): Column = length(regexp_replace(c, "[^A-Za-z]", ""))
  def digitChars(c: Column): Column = length(regexp_replace(c, "[^0-9]", ""))
  def punctChars(c: Column): Column =
    length(c) - length(regexp_replace(c, "[^A-Za-z0-9\\s]", ""))

  /** Heuristic quality score in [0,1]: rewards alphabetic mass and a natural
    * mean word length, penalizes digit/punctuation soup. Deterministic,
    * SQL-expressible (oracle-checked), one projection pass.
    */
  def qualityScore(c: Column): Column = {
    val n = greatest(length(c), lit(1)).cast("double")
    val alphaRatio = alphaChars(c) / n
    val digitRatio = digitChars(c) / n
    val punctRatio = punctChars(c) / n
    val words = greatest(tokenCount(c), lit(1)).cast("double")
    val meanWordLen = length(regexp_replace(c, "\\s", "")) / words
    // weights: mostly alphabetic, mild penalty for digits/punct, word length
    // sweet spot around 3..10 chars
    val lenTerm = when(meanWordLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    round(
      greatest(lit(0.0), least(lit(1.0),
        alphaRatio * lit(0.6) + lenTerm * lit(0.4)
          - digitRatio * lit(0.3) - punctRatio * lit(0.3))),
      4)
  }

  /** Canonical text normalization shared by fingerprinting + exact dedup:
    * lowercase, collapse whitespace, trim.
    */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Stable content fingerprint: md5 of the normalized text. Cross-engine
    * reproducible (oracle-checked in DuckDB with the same expression).
    */
  def fingerprintMd5(c: Column): Column = md5(normalize(c))

  /** 64-bit engine-native fingerprint (xxhash64 of normalized text) — faster
    * than md5 and joinable as a long; Spark-specific, so rows-only checked.
    */
  def fingerprint64(c: Column): Column = xxhash64(normalize(c))

  /** Tiny per-language stopword lists for the language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "pt" -> Seq("de", "que", "e", "o", "a", "do", "da", "em", "um", "para"),
    "es" -> Seq("de", "la", "que", "el", "en", "y", "los", "del", "se", "las"),
    "fr" -> Seq("de", "la", "le", "et", "les", "des", "en", "du", "un", "que"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich")
  )

  /** Language-ID heuristic: score = stopword hits per language over
    * whitespace tokens; ties broken by language code for determinism.
    * One projection pass — at scale this is a single codegen'd stage, no
    * shuffle, no UDF.
    */
  def langId(c: Column): Column = {
    val toks = wsTokens(lower(c))
    val scored = stopwords.toSeq.sortBy(_._1).map { case (langCode, words) =>
      val hits = size(filter(toks, t => array_contains(
        array(words.map(lit): _*), t)))
      struct(hits.as("hits"), lit(langCode).as("lang"))
    }
    // max by (hits, lang) — array_max on structs orders lexicographically,
    // so ties resolve to the greatest lang code deterministically.
    array_max(array(scored: _*)).getField("lang")
  }

  // ------------------------------------------------------------------ PII
  // Redaction patterns kept RE2-compatible (no backreferences/lookaround)
  // so the DuckDB oracle applies the byte-identical regex; replacement
  // order is email → IPv4 → phone on both sides (a later pattern must
  // never see text a former one should have consumed).

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  /** International-format only (leading +): unambiguous against ids/zips. */
  val phonePattern = "\\+[0-9][0-9 -]{6,}[0-9]"

  def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Scrub emails, IPv4 addresses, and international phone numbers to
    * typed placeholder tokens — the standard pre-training PII pass. One
    * projection, three codegen'd regex rewrites; at 100 TB this is a
    * map-only stage with no shuffle.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** HTML → text extraction (the boilerplate-strip pass every web-crawl
    * curation pipeline runs before any quality/dedup stage): drop
    * script/style blocks and comments wholesale, strip remaining tags,
    * decode the six entities that survive text extraction (`&amp;` LAST —
    * the standard order, so `&amp;lt;` decodes to the literal `&lt;` and
    * never double-decodes), collapse whitespace. One chain of codegen'd
    * regex/replace rewrites — map-only, no shuffle, RE2-compatible so the
    * DuckDB oracle replays it verbatim.
    */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = replace(
      replace(
        replace(
          replace(
            replace(
              replace(noTags, lit("&lt;"), lit("<")),
              lit("&gt;"), lit(">")),
            lit("&quot;"), lit("\"")),
          lit("&#39;"), lit("'")),
        lit("&nbsp;"), lit(" ")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Rolling polynomial hash over the normalized text's characters — the
    * classic Rabin-Karp document fingerprint, computed with higher-order
    * array functions entirely inside codegen. Base 257 mod the Mersenne
    * prime 2^31-1: the accumulator stays < 2^40, so the fold is safe under
    * Spark 4's default ANSI mode (a wrapping-Long variant throws
    * ARITHMETIC_OVERFLOW). Engine-native (spec-checked).
    */
  def rollingHash(c: Column): Column = {
    val norm = normalize(c)
    aggregate(
      transform(split(norm, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, cp) => (acc * lit(257L) + cp) % lit(2147483647L)
    )
  }
}
