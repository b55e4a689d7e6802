package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + domain extraction — the web-corpus curation
  * stage upstream of every text operator (CommonCrawl/FineWeb-style
  * pipelines dedup and filter BY canonical URL and registered domain
  * before a byte of text is scored).
  *
  * Everything here is a chain of built-in regex/string rewrites: map-only,
  * whole-stage codegen, no UDF. Patterns are deliberately RE2-safe (no
  * lookaround, no backreferences) and every multi-match rewrite is
  * global, so the DuckDB oracle replays the identical chain with
  * `regexp_replace(..., 'g')`.
  *
  * Canonical form: lowercase scheme and host, default port stripped
  * (`:80` for http, `:443` for https — non-default ports survive),
  * leading `www.` stripped, fragment dropped, tracking parameters
  * (`utm_*`, `fbclid`, `gclid`) removed with the rest of the query
  * preserved in order, trailing path slashes stripped.
  *
  * At 100 TB: one projection pass over the crawl table; the blocklist is
  * a literal IN set (public blocklists are KBs–MBs — broadcast range),
  * and canonical-URL dedup downstream is C1's one 16-byte-key shuffle.
  */
object UrlFunctions {

  /** `scheme` of a raw URL, lowercased ('' if malformed). */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z]+)://", 1))

  /** Canonical host: lowercased, default port for the scheme stripped,
    * leading `www.` stripped.
    */
  def canonicalHost(url: Column): Column = {
    val raw = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    val noPort = when(scheme(url) === "https",
        regexp_replace(raw, ":443$", ""))
      .when(scheme(url) === "http", regexp_replace(raw, ":80$", ""))
      .otherwise(raw)
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Path with trailing slashes stripped (root `/` canonicalizes to ''). */
  def canonicalPath(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/+$", "")

  /** Query string with tracking params removed, remaining params in
    * original order ('' if nothing survives). The amp-wrap trick makes
    * every param `&`-prefixed so one global pattern strips any position.
    */
  def canonicalQuery(url: Column): Column = {
    val q = regexp_extract(url, "[?]([^#]*)", 1)
    val wrapped = concat(lit("&"), q, lit("&"))
    val stripped = regexp_replace(wrapped,
      "&(utm_[a-z]+|fbclid|gclid)=[^&]*", "")
    regexp_replace(stripped, "^&+|&+$", "")
  }

  /** Full canonical URL from the parts above. */
  def canonicalUrl(url: Column): Column = {
    val q = canonicalQuery(url)
    concat(scheme(url), lit("://"), canonicalHost(url), canonicalPath(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Registered domain of a canonical host: last two labels, or last
    * THREE when the public-suffix is itself two labels (`co.uk`-style —
    * heuristic set of the common second-level suffixes; a production
    * deployment swaps in the full public-suffix list as the same
    * alternation, still one regex).
    */
  def registeredDomain(host: Column): Column = {
    val sl = "(co|com|org|net|gov|ac|edu)"
    when(host.rlike("\\." + sl + "\\.[a-z][a-z]$"),
        regexp_extract(host, "([^.]+\\." + sl + "\\.[a-z][a-z])$", 1))
      .when(host.rlike("\\."),
        regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
      .otherwise(host)
  }

  /** Membership of the registered domain in a literal blocklist. */
  def domainBlocked(host: Column, blocklist: Seq[String]): Column =
    registeredDomain(host).isin(blocklist: _*)
}
