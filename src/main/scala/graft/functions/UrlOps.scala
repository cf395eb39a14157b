package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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

  /** RFC 3986 §5.2.4 remove_dot_segments over a URL's PATH (query and
    * fragment pass through untouched — dot-shaped query values like
    * `?next=../up` are data, not path) — the canonicalization stage
    * [[normalizeUrl]] deliberately leaves out (its Scaladoc's
    * documented simplification): `/a/./b/../c` and `/a/c` are the
    * same resource, and unnormalized spellings split dedup keys and
    * frontier identity. An OPT-IN stage, composed after normalizeUrl
    * where relative-path spellings occur (server-side links resolve
    * most of them before a crawler ever sees the URL).
    *
    * Law, replayed verbatim by the oracle: split off `[?#].*`, then
    * 12 passes of (1) `/./` and trailing `/.` collapse, (2)
    * `/segment/../` and trailing `/segment/..` collapse where the
    * popped segment is not itself a dot segment (r17: a plain [^/]+
    * ate a not-yet-collapsed '.' — see the pass comment), (3)
    * above-root `/../` absorption at the origin — each a global
    * RE2-safe replace, so up to 12 nesting levels fully normalize
    * (deeper paths keep their residual: real paths never nest that
    * far, and what does is trap fodder the template law buckets
    * anyway; one more documented deviation: '..' after an EMPTY
    * segment — '//..' — is not popped, because the seg pattern
    * requires a non-empty non-dot segment; degenerate '//' paths
    * keep their residual). Two r17 cost bounds, now that this stage rides the
    * frontier-identity hot path: (1) the 36-replace fold is GUARDED
    * by one contains('/.') test — every pass needs a '/.' substring
    * to fire, so a dotless path (the overwhelming case at crawl
    * scale) pays one substring scan; the oracle replays the guard
    * too, so the chains stay verbatim-identical; (2) the whole chain
    * binds its input ONCE via the one-element outer-transform recipe
    * (the [[graft.operators.WebGraph]] outlinks convention) — inlined
    * naively, Catalyst's projection collapse re-expands the ~60-node
    * chain at every downstream reference (host key, scheme filter,
    * group key …) and the composed crawl plans paid 4-6× in
    * planning + codegen for identical results. */
  def removeDotSegments(url: Column): Column =
    element_at(transform(array(url), u => {
      val qf = regexp_extract(u, "([?#].*)$", 1)
      val noQf = regexp_replace(u, "[?#].*$", "")
      // normalize the PATH in isolation: the `/seg/../` pass run over
      // the whole URL would happily match `/h.ex/../` ACROSS the `://`
      // authority boundary and eat the host
      val origin = regexp_extract(noQf,
        "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
      val path0 = when(length(origin) > 0,
          substring(noQf, length(origin) + 1, lit(Int.MaxValue)))
        .otherwise(noQf)
      val normalized = (1 to 12).foldLeft(path0) { (p, _) =>
        val dot = regexp_replace(p, "/\\.(/|$)", "/")
        // the popped segment must not ITSELF be a dot segment: global
        // replace leaves every other '/./' of a consecutive run for
        // the next pass (overlapping slashes), and a plain [^/]+ here
        // would eat a surviving '.' as the segment '..' pops —
        // '/a/././../b' popped '.' instead of 'a' (caught by the
        // WebCorpusSpec RFC-reference property test)
        val seg = "(?:[^/.][^/]*|\\.[^/.][^/]*|\\.\\.[^/]+)"
        val dotdot = regexp_replace(dot, s"/$seg/\\.\\.(/|$$)", "/")
        regexp_replace(dotdot, "^/\\.\\.(/|$)", "/")
      }
      concat(origin, when(path0.contains("/."), normalized)
        .otherwise(path0), qf)
    }), 1)

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

  // ——— full Public Suffix List as a joinable table ————————————————

  /** Parse raw Public Suffix List lines (publicsuffix.org/list format:
    * `//` comments and blank lines skipped, a rule is the first
    * whitespace-delimited token, `!` marks an exception, a leading
    * `*.` a wildcard label) into the rule frame
    * (suffix, rule_labels, is_wildcard, is_exception) that
    * [[registeredDomainPsl]] joins. A wildcard rule stores the suffix
    * WITHOUT the `*.` but counts it in rule_labels (`*.ck` → ("ck", 2,
    * true, false)): the wildcard matches any host suffix of exactly
    * rule_labels labels whose tail equals the stored suffix. Only the
    * leading-label wildcard the published list actually uses is
    * supported. ~10 k rules — a data table, broadcast everywhere. */
  def parsePsl(raw: DataFrame, lineCol: String = "line"): DataFrame = {
    val r = split(trim(col(lineCol)), "\\s+").getItem(0)
    raw.select(r.as("r"))
      .filter(length(col("r")) > 0 && !col("r").startsWith("//"))
      .select(
        when(col("r").startsWith("!"), expr("substring(r, 2)"))
          .when(col("r").startsWith("*."), expr("substring(r, 3)"))
          .otherwise(col("r")).as("suffix"),
        col("r").startsWith("*.").as("is_wildcard"),
        col("r").startsWith("!").as("is_exception"))
      .select(col("suffix"),
        (size(split(col("suffix"), "\\.")) +
          when(col("is_wildcard"), 1).otherwise(0)).as("rule_labels"),
        col("is_wildcard"), col("is_exception"))
  }

  /** Built-in PSL sample in the published file format: every TLD and
    * second-level suffix the bounded heuristic covers, plus the
    * classic wildcard/exception pair (`*.ck` / `!www.ck`) — the
    * zero-dependency default for tests and oracles. A deployment
    * loads the real ~10 k-line file with
    * `parsePsl(spark.read.textFile("public_suffix_list.dat").toDF("line"))`. */
  val pslSample: Seq[String] = {
    val tlds = Seq("com", "org", "net", "io") ++
      secondLevelSuffixes.map(_.split("\\.").last).distinct
    Seq("// graft built-in PSL sample (publicsuffix.org format)") ++
      tlds ++ secondLevelSuffixes ++ Seq("*.ck", "!www.ck")
  }

  /** [[pslSample]] pre-parsed to (suffix, rule_labels, is_wildcard,
    * is_exception) — the tuple form oracles interpolate as VALUES.
    * UrlOpsSpec pins this Scala parse equal to [[parsePsl]]'s frame. */
  val pslSampleRules: Seq[(String, Int, Boolean, Boolean)] = pslSample
    .map(_.trim.split("\\s+")(0))
    .filter(l => l.nonEmpty && !l.startsWith("//"))
    .map { r =>
      if (r.startsWith("!")) {
        val s = r.drop(1); (s, s.split("\\.").length, false, true)
      } else if (r.startsWith("*.")) {
        val s = r.drop(2); (s, s.split("\\.").length + 1, true, false)
      } else (r, r.split("\\.").length, false, false)
    }

  /** Registered domain via the FULL Public Suffix List algorithm
    * (publicsuffix.org): among all rules matching a suffix of the
    * host, the prevailing rule is any exception, else the one with the
    * most labels; the public suffix is the prevailing rule's labels
    * (minus one for an exception), default 1 when nothing matches; the
    * registered domain is the public suffix plus one label — or the
    * whole host when the host IS a public suffix (the
    * [[registeredDomain]] heuristic's convention, kept for parity).
    * Adds `outCol` to `df`.
    *
    * Scale shape (the operator the bounded heuristic documents): the
    * host column DEDUPLICATES first (distinct hosts are orders of
    * magnitude fewer than URLs at crawl scale), each distinct host
    * explodes into its ≤ label-count candidate suffixes probed twice
    * (exact key + wildcard-tail key) against the BROADCAST rule table
    * (one hash join — the OR-of-two-equi-conditions form would
    * degenerate to a nested-loop join), the prevailing rule is a
    * host-keyed partial-agg max of a (is_exception, rule_labels)
    * struct, and the result joins back on host (AQE broadcasts the
    * host map when it is small). Two shuffles over the DISTINCT-host
    * frame, one equi-join over the input — no per-URL window. */
  def registeredDomainPsl(df: DataFrame, psl: DataFrame,
                          hostCol: String = "host",
                          outCol: String = "registered_domain"): DataFrame = {
    Seq(outCol, "__psl_host").foreach(n =>
      require(!df.columns.contains(n),
        s"registeredDomainPsl: input must not carry a column named '$n'"))
    val hosts = df.select(col(hostCol).as("__psl_host")).distinct()
      .filter(col("__psl_host").isNotNull && length(col("__psl_host")) > 0)
    val labels = split(col("__psl_host"), "\\.")
    val n = size(labels)
    // candidate suffixes: for i = 1..n the last-i-label suffix (exact
    // rule probe) and its tail after the first label (wildcard probe:
    // `*.ck` matches a 2-label candidate whose tail is "ck")
    val cands = hosts.select(col("__psl_host"),
        explode(transform(sequence(lit(1), n), i => struct(
          array_join(slice(labels, n - i + 1, i), ".").as("cand"),
          array_join(slice(labels, n - i + 2, i - 1), ".").as("tail"))))
          .as("c"))
      .select(col("__psl_host"), col("c.cand").as("cand"),
        col("c.tail").as("tail"))
    val probes = cands
      .select(col("__psl_host"), col("cand").as("key"),
        lit(false).as("want_wild"))
      .union(cands.filter(length(col("tail")) > 0)
        .select(col("__psl_host"), col("tail").as("key"),
          lit(true).as("want_wild")))
    val best = probes.join(broadcast(psl),
        col("key") === col("suffix") &&
          col("want_wild") === col("is_wildcard"))
      .groupBy(col("__psl_host"))
      .agg(max(struct(col("is_exception").cast("int").as("exc"),
        col("rule_labels").as("rl"))).as("best"))
    val resolved = hosts.join(best, Seq("__psl_host"), "left")
      .select(col("__psl_host"),
        coalesce(col("best.rl") - col("best.exc"), lit(1)).as("ps"))
      .select(col("__psl_host"),
        when(n <= col("ps"), col("__psl_host"))
          .otherwise(array_join(
            slice(labels, n - col("ps"), col("ps") + 1), "."))
          .as(outCol))
    df.join(resolved, df(hostCol) === resolved("__psl_host"), "left")
      .drop("__psl_host")
      // degenerate hosts ('' / null) pass through whole — the
      // heuristic's totality convention
      .withColumn(outCol, coalesce(col(outCol), col(hostCol)))
  }
}
