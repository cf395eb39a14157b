package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → training text extraction — the step between the WARC fetch
  * and every text gate (language ID, quality, dedup): strip markup,
  * decode the common entities, and classify block elements as content
  * vs boilerplate by link density (the jusText / trafilatura family's
  * load-bearing heuristic, Pomikálek 2011: navigation/footer blocks
  * are link-dominated, body prose is not).
  *
  * Everything is a pure codegen'd expression chain over RE2-safe
  * patterns — no UDF, no shuffle, per-row cost O(len) — so the DuckDB
  * oracles replay the IDENTICAL definition and the rows check
  * cross-engine regex parity, which for an extractor IS the semantics.
  * The deliberate simplifications of a regex-class extractor (no HTML5
  * tree correction, `<title>` content survives as text, CDATA not
  * special-cased) are part of that replayable definition; a corpus
  * needing DOM fidelity swaps this stage for a parser behind the same
  * column contract. */
object TextExtraction {

  /** Block-level elements: boundaries for [[htmlBlockSplit]] and
    * newline substitutions for [[stripHtml]]. */
  private val BlockTags =
    "p|div|br|h[1-6]|li|ul|ol|tr|table|section|article|header|footer|blockquote"

  /** Drop the invisible machinery first: script/style bodies and
    * comments contribute zero training text but plenty of tokens. */
  private[graft] def dropInvisible(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", ""),
      "(?is)<style[^>]*>.*?</style>", ""),
      "(?s)<!--.*?-->", "")

  private def decodeEntities(c: Column): Column = {
    // the high-frequency five + nbsp; '&amp;' decodes LAST so
    // '&amp;lt;' correctly yields '&lt;' (text), not '<'
    val steps = Seq("&nbsp;" -> " ", "&quot;" -> "\"", "&#39;" -> "'",
      "&lt;" -> "<", "&gt;" -> ">", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to) }
  }

  /** Visible text of an HTML string: invisible machinery dropped,
    * block tags become newlines (paragraph structure survives for the
    * downstream segment/boilerplate passes), remaining tags vanish,
    * entities decode, whitespace collapses. */
  def stripHtml(html: Column): Column = {
    // \b after the name: without it 'p|li|tr|ol' + [^>]* absorbs
    // <pre>, <link>, <track>, <param>… — inline/void tags becoming
    // block boundaries splits sentences and skews block stats
    val blocksAsNewlines = regexp_replace(dropInvisible(html),
      s"(?i)</?(?:$BlockTags)\\b[^>]*>", "\n")
    val noTags = regexp_replace(blocksAsNewlines, "<[^>]*>", "")
    val decoded = decodeEntities(noTags)
    trim(regexp_replace(regexp_replace(regexp_replace(decoded,
      "[ \\t\\r]+", " "), " ?\\n[ \\n]*", "\n"), "^\\n+|\\n+$", ""))
  }

  /** Inline form (no structure): the per-BLOCK text cleaner shared with
    * the link-density math — must not introduce newlines, or block
    * character counts would drift from the oracle's. */
  def blockText(c: Column): Column = stripInline(c)

  private def stripInline(c: Column): Column =
    trim(regexp_replace(decodeEntities(
      regexp_replace(c, "<[^>]*>", "")), "\\s+", " "))

  /** Split an HTML string into block-element segments (after
    * [[dropInvisible]]): the unit of boilerplate classification. */
  def htmlBlockSplit(html: Column): Column =
    split(dropInvisible(html), s"(?i)</?(?:$BlockTags)\\b[^>]*>")

  /** Link density of ONE block segment: visible characters inside
    * `<a>…</a>` over the block's visible characters (0.0 for an empty
    * block). Double division of two exact integer counts — IEEE-exact
    * on every engine, the repo's float-parity convention. */
  def linkDensity(block: Column): Column = {
    // \b after 'a': '<a[^>]*>' also matched <abbr>/<aside>/<audio>…,
    // counting whole prose passages as link characters and flagging
    // genuine paragraphs boilerplate
    val anchors = regexp_extract_all(block,
      lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1))
    val linkChars = aggregate(
      transform(anchors, a => length(stripInline(a)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val total = length(stripInline(block)).cast("long")
    when(total > 0, linkChars.cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Soft-404 heuristic: a 200-status page whose VISIBLE text reads
    * like an error page — the real web serves 'not found' with 200
    * constantly, and uncaught soft 404s poison dedup (thousands of
    * near-identical error shells), the link graph (rank flows into
    * dead ends) and the corpus itself. Law over the stripped text
    * (run AFTER [[stripHtml]]): an error phrase from the standard
    * family ('page not found', '404', 'no longer available', 'does
    * not exist', 'page cannot be found', 'page unavailable') within
    * the first 200 characters of a SHORT page (< 500 chars — a long
    * article QUOTING '404' is content, not an error shell). Both
    * thresholds are the published heuristic shape (Bar-Yossef et al.
    * WWW'04 detect soft 404s behaviorally; content-shape is the
    * scan-time approximation). Pure codegen, oracle-replayable. */
  def isSoft404(text: Column): Column = {
    val head = lower(substring(text, 1, 200))
    // the numeric form needs error CONTEXT: a bare \b404\b flagged any
    // short page mentioning the number — street addresses, room
    // numbers, product names ('Peugeot 404') — well outside the
    // error-shell family. Context is PROXIMITY (\W{0,12}), not strict
    // adjacency (r18): real shells separate the number from the word
    // with punctuation ('404 — Not Found', 'Error… (404)'), which the
    // adjacency form missed; \W admits no letters, so 'at 404 Main
    // Street' still stays clean — words between the tokens break the
    // bridge. The http token bridges only space/colon ([\s:], never
    // '/'): a generic \W bridge made 'http' + '://' + '404' match, so
    // a short page merely LINKING to http://404.example.com or
    // /404-guide flagged as an error shell — a URL mention is not an
    // error context
    head.rlike("page not found|(error|not found)\\W{0,12}404|" +
      "http[\\s:]{0,8}404|" +
      "404\\W{0,12}(error|not found)|no longer available|" +
      "does not exist|page cannot be found|page unavailable") &&
      length(text) < 500
  }

  // ——— page-level robots directives (REP meta/header layer) ————————

  /** The comma-joined, lowercased content of every
    * `<meta name=robots content=...>` tag — the page-level half of the
    * Robots Exclusion Protocol (robots.txt governs FETCHING; these
    * govern indexing and link following AFTER the fetch). Attribute
    * order and quote style free; name matching is exact-token
    * `robots` (a `name="robotsx"` tag must not match); '' when the
    * page declares nothing. Pure codegen'd RE2-safe chain. */
  def robotsMetaContent(html: Column): Column = {
    val tags = regexp_extract_all(html, lit("(?is)<meta\\b[^>]*>"), lit(0))
    // exact-token name match, honestly: each quoted form must be
    // EXACTLY robots (name="robots next" is some other meta, not a
    // directive), the unquoted form ends at whitespace/'/'/'>' (the
    // self-closing <meta name=robots content=x/> spelling is real),
    // and the \\sname boundary keeps data-name= from matching
    val robots = filter(tags, t =>
      t.rlike("(?is)\\sname\\s*=\\s*" +
        "(\"robots\"|'robots'|robots(?=[\\s/>]))"))
    // the quoted captures keep their delimiters (the one-group quote
    // law) — strip them, or the token-boundary matching downstream
    // would see '"noindex' instead of 'noindex'. \scontent boundary
    // (r17): \b matched after a hyphen, so a data-content= decoy
    // attribute read as the directive value — the same hole class the
    // r16/r17 reviews closed in \shref/\sname/\srel
    lower(concat_ws(",",
      transform(robots, t => regexp_replace(regexp_extract(t,
        "(?is)\\scontent\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\"'\\s/>]+)", 1),
        "^[\"']|[\"']$", ""))))
  }

  /** `Retry-After` header value → seconds (RFC 9110 §10.2.3): the
    * delta-seconds form parses behind an ANSI-safe numeric-shape gate;
    * the HTTP-date form yields NULL — date arithmetic against the
    * response's own Date header is the fetcher's job (it knows the
    * wall clock; a scan-time parse of IMF-fixdate cross-engine would
    * buy little and cost parity), and NULL falls back to the revisit
    * law's own backoff via coalesce. Negative/junk → NULL. */
  def retryAfterSeconds(v: Column): Column =
    when(trim(v).rlike("^[0-9]{1,9}$"), trim(v).cast("long"))
      .otherwise(lit(null).cast("long"))

  /** IMF-fixdate → epoch seconds (RFC 9110 §5.6.7, the only
    * currently-generated HTTP date form: 'Sun, 06 Nov 1994 08:49:37
    * GMT'). The weekday is deliberately IGNORED, not validated — the
    * engines disagree on whether a wrong weekday voids the parse, and
    * a validator's job is the instant, not the calendar trivia — so
    * the law extracts day/month/year/time by regex, maps the month
    * name, try-parses the rebuilt ISO DATE and assembles the epoch by
    * zone-free arithmetic (GMT is GMT in every session timezone):
    * in-shape impossible dates (Feb 31) null out identically
    * cross-engine, off-shape
    * forms (RFC 850, asctime — obsolete; senders MUST NOT generate
    * them) null out at the shape gate. Null falls through the
    * caller's coalesce. */
  def imfFixdateEpoch(v: Column): Column = {
    val t = trim(v)
    val pat = "^[A-Za-z]{3}, ([0-9]{2}) ([A-Za-z]{3}) ([0-9]{4}) " +
      "([0-9]{2}:[0-9]{2}:[0-9]{2}) GMT$"
    val mon = lower(regexp_extract(t, pat, 2))
    val monNum = when(mon === "jan", lit("01")).when(mon === "feb", lit("02"))
      .when(mon === "mar", lit("03")).when(mon === "apr", lit("04"))
      .when(mon === "may", lit("05")).when(mon === "jun", lit("06"))
      .when(mon === "jul", lit("07")).when(mon === "aug", lit("08"))
      .when(mon === "sep", lit("09")).when(mon === "oct", lit("10"))
      .when(mon === "nov", lit("11")).when(mon === "dec", lit("12"))
      .otherwise(lit(null).cast("string"))
    // epoch = days-since-1970 × 86400 + second-of-day, assembled on
    // zone-free types (DATE + integer arithmetic): a try_to_timestamp
    // of the full datetime would parse the wall clock in the SESSION
    // zone, so a non-UTC caller got an epoch off by the zone offset
    // while the header says GMT. The calendar part still validates
    // through the try parse (Feb 31 nulls identically cross-engine;
    // the midnight instant round-trips to the same DATE in any zone);
    // the clock part range-gates explicitly (what the HH:mm:ss parse
    // pattern enforced before — zero-padded strings compare
    // lexicographically = numerically).
    val isoDate = concat(regexp_extract(t, pat, 3), lit("-"), monNum,
      lit("-"), regexp_extract(t, pat, 1))
    val d = try_to_timestamp(isoDate, lit("yyyy-MM-dd")).cast("date")
    val epochDays = datediff(d, to_date(lit("1970-01-01"))).cast("long")
    val tm = regexp_extract(t, pat, 4)
    val timeOk = substring(tm, 1, 2) <= lit("23") &&
      substring(tm, 4, 2) <= lit("59") && substring(tm, 7, 2) <= lit("59")
    when(t.rlike(pat) && monNum.isNotNull && d.isNotNull && timeOk,
      epochDays * 86400L +
        substring(tm, 1, 2).cast("long") * 3600L +
        substring(tm, 4, 2).cast("long") * 60L +
        substring(tm, 7, 2).cast("long"))
      .otherwise(lit(null).cast("long"))
  }

  /** `Cache-Control` header value → max-age seconds: the one directive
    * a robots refresh cadence may honor (RFC 9309 §2.4 caps caching at
    * ~24 h "unless the crawler has a cache-control signal saying
    * otherwise"). Token-boundary match (s-maxage and a hypothetical
    * x-max-age must not match), first occurrence wins, value behind
    * the numeric-shape gate; absent/junk → NULL (the caller's default
    * cadence applies). Pure RE2-safe codegen. */
  def cacheControlMaxAge(v: Column): Column = {
    val m = regexp_extract(lower(v),
      "(^|[,\\s])max-age\\s*=\\s*\"?([0-9]{1,9})\"?", 2)
    when(length(m) > 0, m.cast("long")).otherwise(lit(null).cast("long"))
  }

  /** (noindex, nofollow) flags from a combined directive-token string
    * — meta content plus the `X-Robots-Tag` header value, comma-
    * joined by the caller: token-boundary matching (an hypothetical
    * 'noindexing' token must not flag), `none` implies BOTH (the REP
    * shorthand), case already lowered by [[robotsMetaContent]] but
    * lowered again here so raw header values work too. Returns
    * struct<noindex, nofollow>. */
  def robotsFlags(tokens: Column): Column = {
    val t = lower(tokens)
    val none = t.rlike("(^|[,;\\s])none($|[,;\\s])")
    struct(
      (none || t.rlike("(^|[,;\\s])noindex($|[,;\\s])")).as("noindex"),
      (none || t.rlike("(^|[,;\\s])nofollow($|[,;\\s])")).as("nofollow"))
  }
}
