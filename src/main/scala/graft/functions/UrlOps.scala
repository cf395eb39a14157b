package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus ingestion — the canonicalization pass
  * that runs between the WARC fetch and every URL-keyed stage (exact
  * URL dedup, per-domain caps and mixing weights, frontier politeness).
  * The reference pipeline never sees raw web URLs (its documents arrive
  * from curated blob storage), but a 100 TB crawl-derived corpus is
  * URL-keyed end to end, and two spellings of one page
  * (`HTTP://Host.com:80/a#frag?utm_source=x`) must collapse BEFORE the
  * content ever hashes — canonicalizing after dedup doubles the corpus.
  *
  * Everything here is a pure codegen'd expression chain (regex +
  * string ops, no UDF) built from RE2-safe patterns, so the DuckDB
  * oracles replay the identical definition: the oracle checks
  * CROSS-ENGINE REGEX PARITY, which for a canonicalizer IS the
  * semantics. Zero shuffles; per-row cost O(len).
  *
  * Scale notes: canonicalization is the key-preparation step for a
  * url-hash bucket layout — it must be deterministic and total (a null
  * or schemeless input passes through unchanged rather than crashing a
  * 10¹¹-row pass). The registered-domain heuristic embeds a bounded
  * second-level-suffix list (the high-traffic entries of the public
  * suffix list; the full PSL is a data file a deployment can join in —
  * the OPERATOR shape, one broadcast join, is what matters at scale).
  */
object UrlOps {

  /** Lowercase the scheme+host, drop the fragment, default ports and
    * tracking params (utm_*, fbclid, gclid, msclkid, mc_eid), tidy
    * separator debris (`?&`, trailing `?`/`&`), and strip a trailing
    * slash from a path-only URL. Nulls and schemeless strings pass
    * through the later stages unchanged (total function). */
  def normalizeUrl(url: Column): Column = {
    // scheme+host lowercase: split at the first '/' after '://' (the
    // authority cannot contain '/'); regexp_extract returns '' on a
    // non-match, so schemeless inputs take the otherwise branch whole
    val head = regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val tail = when(length(head) > 0,
        substring(url, length(head) + 1, lit(Int.MaxValue)))
      .otherwise(url)
    val lowered = concat(lower(head), tail)
    val noFrag = regexp_replace(lowered, "#.*$", "")
    // default ports are SCHEME-SPECIFIC: http:443 / https:80 are real,
    // distinct origins and must NOT collapse onto the portless key
    val noPort = regexp_replace(regexp_replace(noFrag,
      "^(http://[^/:?#]*):80(/|\\?|$)", "$1$2"),
      "^(https://[^/:?#]*):443(/|\\?|$)", "$1$2")
    // anchored to a ?/& boundary (kept via $1): an unanchored form
    // matched 'utm_source' INSIDE other param names ('xutm_source=1')
    // and even path segments, mangling unrelated URLs' dedup keys
    val noTrack = regexp_replace(noPort,
      "([?&])(?:utm_[a-zA-Z0-9_]+|fbclid|gclid|msclkid|mc_eid)=[^&#]*",
      "$1")
    val tidySep = regexp_replace(regexp_replace(regexp_replace(
      noTrack, "\\?&+", "?"), "&&+", "&"), "[?&]+$", "")
    regexp_replace(tidySep, "^(https?://[^/?#]+)/$", "$1")
  }

  /** Host of a URL, '' for null/schemeless (regexp_extract's no-match
    * convention — callers filter or group the empty bucket away).
    * Userinfo is skipped: 'https://user:pw@h.example/x' — and the
    * phishing-shaped 'https://evil.example@victim.com/' — key on the
    * REAL host, never on credentials or the decoy prefix. */
  def hostOf(url: Column): Column =
    regexp_extract(lower(url),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]*)", 1)

  /** Path + query of a URL (the robots.txt match target: RFC 9309
    * matches rules against the path-with-query, never the origin).
    * '/' for a URL with an empty path, '' for null/schemeless inputs
    * (regexp_extract's no-match convention — same as [[hostOf]]).
    * Fragments are excluded (they never reach a server). */
  def pathOf(url: Column): Column = {
    val p = regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    when(length(p) > 0, p)
      .when(length(hostOf(url)) > 0, lit("/"))
      .otherwise(lit(""))
  }

  /** High-traffic second-level public suffixes: a host ending in one of
    * these keeps THREE labels as its registered domain, anything else
    * two. Bounded by design (see the Scaladoc's PSL note). */
  val secondLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.in", "co.kr", "co.za", "co.nz", "co.id", "co.th")

  /** Registered domain of a host: last two labels, or last three when
    * the last two form a known second-level suffix ("a.b.co.uk" →
    * "b.co.uk"); hosts with fewer labels (bare TLDs, localhost, '')
    * pass through whole. Pure array ops over one split — the same
    * slicing the oracle replays. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = when(n >= 2,
      concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
      .otherwise(host)
    val lastThree = when(n >= 3,
      concat_ws(".", element_at(labels, -3), element_at(labels, -2),
        element_at(labels, -1)))
      .otherwise(host)
    when(n >= 3 && lastTwo.isin(secondLevelSuffixes: _*), lastThree)
      .when(n >= 2, lastTwo)
      .otherwise(host)
  }
}
