package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sitemap ingestion (sitemaps.org XML, the crawl-seed channel next to
  * robots.txt): `<urlset>` entry extraction, `<sitemapindex>` child
  * discovery, and the changefreq→revisit-interval mapping the frontier
  * consumes.
  *
  * Reference scope note: the reference app has no crawler — this family
  * extends the r15 crawl front half (WARC → robots → extract) with the
  * acquisition step a 100 TB web corpus actually starts from, the same
  * way operators/CrawlFrontier.scala adds the scheduling loop.
  *
  * Same design rules as the UrlOps/WebGraph extractors:
  *  - pure codegen'd column expressions (zero shuffle, zero UDF) —
  *    a sitemap scan is a per-row map over fetched XML bodies;
  *  - every regex is RE2-safe so the DuckDB oracle replays the
  *    IDENTICAL pattern (the cross-engine-regex-parity convention);
  *  - regex-over-XML is deliberate and bounded: sitemap files are
  *    machine-generated, schema-fixed, and size-capped by the protocol
  *    (50 k URLs / 50 MB uncompressed), so `<loc>`/`<lastmod>`/
  *    `<changefreq>`/`<priority>` tag pulls — case-insensitive, with
  *    `(?s)` for pretty-printed newlines — are the whole grammar. A
  *    namespace-prefixed feed (`<sm:url>`) is out of scope, stated
  *    here rather than half-handled.
  */
object Sitemaps {

  /** XML entity decode for `<loc>` content — sitemap URLs escape `&`
    * as `&amp;` per the protocol ("entity-escape your URLs").
    * `&amp;` decodes LAST so `&amp;lt;` yields the literal `&lt;`. */
  private def decodeXmlEntities(c: Column): Column = {
    val steps = Seq("&quot;" -> "\"", "&apos;" -> "'",
      "&lt;" -> "<", "&gt;" -> ">", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to) }
  }

  /** True when the body is a sitemap INDEX (a list of child sitemaps)
    * rather than a urlset — the dispatch test for recursive fetch. */
  def isIndex(xml: Column): Column =
    lower(xml).contains("<sitemapindex")

  /** Child sitemap locations of a `<sitemapindex>` body, in document
    * order; array<string>. Empty/absent `<loc>`s drop. */
  def indexEntries(xml: Column): Column =
    filter(
      transform(
        regexp_extract_all(xml,
          lit("(?is)<sitemap\\b[^>]*>(.*?)</sitemap>"), lit(1)),
        b => decodeXmlEntities(trim(
          regexp_extract(b, "(?is)<loc>(.*?)</loc>", 1)))),
      l => length(l) > 0)

  /** `<url>` entries of a `<urlset>` body, in document order:
    * array<struct<loc, lastmod, changefreq, priority>> with loc
    * entity-decoded and trimmed, the rest trimmed raw strings ('' when
    * the optional tag is absent — regexp_extract's no-match
    * convention). Entries with an empty loc drop (loc is the one
    * required tag; a malformed entry must not seed an empty URL). */
  def urlEntries(xml: Column): Column =
    filter(
      transform(
        regexp_extract_all(xml,
          lit("(?is)<url\\b[^>]*>(.*?)</url>"), lit(1)),
        b => struct(
          decodeXmlEntities(trim(
            regexp_extract(b, "(?is)<loc>(.*?)</loc>", 1))).as("loc"),
          trim(regexp_extract(b, "(?is)<lastmod>(.*?)</lastmod>", 1))
            .as("lastmod"),
          lower(trim(regexp_extract(b,
            "(?is)<changefreq>(.*?)</changefreq>", 1))).as("changefreq"),
          trim(regexp_extract(b, "(?is)<priority>(.*?)</priority>", 1))
            .as("priority"))),
      e => length(e("loc")) > 0)

  /** changefreq → revisit-interval seconds for the frontier's
    * `interval_s` (sitemaps.org vocabulary; 'always' floors at 5 min —
    * politeness still applies — and 'never' maps to two years, not
    * infinity: pages lie about immutability). Unknown/absent values
    * yield NULL so the caller's crawl-default applies via coalesce. */
  def changefreqSeconds(cf: Column): Column =
    when(cf === "always", lit(300L))
      .when(cf === "hourly", lit(3600L))
      .when(cf === "daily", lit(86400L))
      .when(cf === "weekly", lit(7L * 86400L))
      .when(cf === "monthly", lit(30L * 86400L))
      .when(cf === "yearly", lit(365L * 86400L))
      .when(cf === "never", lit(2L * 365L * 86400L))
      .otherwise(lit(null).cast("long"))

  /** `<priority>` string → double in [0, 1]; NULL on absent ('') or
    * unparseable, clamped otherwise (the protocol's default 0.5 is the
    * caller's coalesce, same convention as [[changefreqSeconds]]).
    * The numeric-shape gate keeps the cast ANSI-safe (a stray value
    * must yield NULL, not fail the scan) and is the exact regex the
    * oracle replays. */
  def priorityValue(p: Column): Column =
    when(p.rlike("^-?[0-9]+(\\.[0-9]+)?$"),
      greatest(lit(0.0), least(lit(1.0), p.cast("double"))))
      .otherwise(lit(null).cast("double"))
}
