package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.{Encoders => E}
import org.apache.spark.sql.types.StringType
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
  *    `(?s)` for pretty-printed newlines — are the whole grammar.
  *    Namespace-PREFIXED feeds (`<sm:url>`, common in generator
  *    output) parse via a `(?:[a-z0-9]+:)?` prefix alternative in
  *    every tag pattern — still one RE2-safe pattern per tag.
  *
  * The one non-Column entry point is [[decodeFeeds]]: real sitemap
  * feeds are overwhelmingly shipped gzipped (`sitemap.xml.gz` — the
  * protocol blesses it), and inflation cannot be a codegen'd
  * expression, so the decode is a stateless partition-local row map
  * (the io/Warc shard-read shape): gzip members are magic-sniffed and
  * inflated, plain XML passes through — one call decodes a mixed
  * plain/.gz feed column, batch or stream.
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

  /** The optional namespace prefix every tag pattern tolerates
    * (`<sm:loc>`): one label and a colon, non-capturing so entry
    * group indexes stay stable. */
  private val Ns = "(?:[a-zA-Z0-9]+:)?"

  /** True when the body is a sitemap INDEX (a list of child sitemaps)
    * rather than a urlset — the dispatch test for recursive fetch.
    * Prefix-tolerant (`<sm:sitemapindex>` dispatches too). */
  def isIndex(xml: Column): Column =
    xml.rlike(s"(?is)<${Ns}sitemapindex")

  /** Child sitemap locations of a `<sitemapindex>` body, in document
    * order; array<string>. Empty/absent `<loc>`s drop. The `\b` after
    * `sitemap` keeps `<sitemapindex>` itself from matching as an
    * entry, prefixed or not. */
  def indexEntries(xml: Column): Column =
    filter(
      transform(
        regexp_extract_all(xml,
          lit(s"(?is)<${Ns}sitemap\\b[^>]*>(.*?)</${Ns}sitemap>"),
          lit(1)),
        b => decodeXmlEntities(trim(
          regexp_extract(b, s"(?is)<${Ns}loc>(.*?)</${Ns}loc>", 1)))),
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
          lit(s"(?is)<${Ns}url\\b[^>]*>(.*?)</${Ns}url>"), lit(1)),
        b => struct(
          decodeXmlEntities(trim(
            regexp_extract(b, s"(?is)<${Ns}loc>(.*?)</${Ns}loc>", 1)))
            .as("loc"),
          trim(regexp_extract(b,
            s"(?is)<${Ns}lastmod>(.*?)</${Ns}lastmod>", 1))
            .as("lastmod"),
          lower(trim(regexp_extract(b,
            s"(?is)<${Ns}changefreq>(.*?)</${Ns}changefreq>", 1)))
            .as("changefreq"),
          trim(regexp_extract(b,
            s"(?is)<${Ns}priority>(.*?)</${Ns}priority>", 1))
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

  /** Decode a fetched feed column to XML text: gzip payloads
    * (`sitemap.xml.gz` — the wire format the protocol blesses and
    * real feeds overwhelmingly use) are magic-sniffed (0x1f 0x8b) and
    * inflated via the multi-member salvage reader io/Warc already
    * carries; anything else decodes as UTF-8 directly, so ONE call
    * handles a mixed plain/.gz column. Null bodies yield ''. Appends
    * `outCol`; every input column passes through unchanged. A
    * stateless partition-local row map (the [[graft.io.Warc]] shard
    * shape — inflation cannot be a codegen'd expression), so the
    * same decode is legal on a standing feed stream. Per-row cost
    * O(len); the protocol caps a feed at 50 MB uncompressed. */
  def decodeFeeds(feeds: DataFrame, bytesCol: String = "body",
                  outCol: String = "xml"): DataFrame = {
    require(!feeds.columns.contains(outCol),
      s"decodeFeeds: input already carries a column named '$outCol'")
    require(feeds.schema(bytesCol).dataType ==
        org.apache.spark.sql.types.BinaryType,
      s"decodeFeeds: '$bytesCol' must be BINARY (got " +
        s"${feeds.schema(bytesCol).dataType.simpleString}) — a string " +
        "column has already been decoded; pass it to the parsers " +
        "directly")
    val schema = feeds.schema.add(outCol, StringType)
    val idx = feeds.schema.fieldIndex(bytesCol)
    feeds.mapPartitions { it =>
      it.map { r =>
        val b = r.getAs[Array[Byte]](idx)
        val xml =
          if (b == null) ""
          else new String(graft.io.Warc.gunzipAuto(b), "UTF-8")
        Row.fromSeq(r.toSeq :+ xml)
      }
    }(E.row(schema))
  }
}
