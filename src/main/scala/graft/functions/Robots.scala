package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt compliance — the filter that decides which fetched pages
  * may enter a training corpus at all (the crawl-ethics gate every
  * responsible web pipeline runs; CommonCrawl itself honors it at
  * fetch time, and re-filtering at curation time is the standard
  * belt-and-braces). Implements the core of REP (RFC 9309): group
  * structure (consecutive User-agent lines share a group), the
  * most-specific-agent-group-wins selection — including the empty
  * matched group, which per §2.2.1 means EVERYTHING is allowed for
  * that agent (it must not fall through to `*`) — `*`/`$` match
  * patterns in rule paths (§2.2.3), and most-octets rule precedence
  * with allow winning ties. Remaining documented simplifications:
  * agent matching is exact token (or `*`), octet length is
  * approximated by character length (identical cross-engine; they
  * differ only on non-ASCII rule paths, which the RFC expects
  * percent-encoded anyway), and `Crawl-delay`/`Sitemap` lines are
  * ignored.
  *
  * Everything is joins + windows over one line explode — fully
  * oracle-replayable, shuffles keyed on (domain) and (domain, url):
  * rules tables are tiny relative to the URL corpus, so at 100 TB the
  * rules side BROADCASTS and the per-URL cost is one broadcast join +
  * one url-keyed argmax window — or ZERO extra shuffles and no window
  * at all via the stateless [[rulesByDomain]]/[[allowedCol]] form,
  * which is also the streaming-legal face. */
object Robots {

  /** Parse (domain, robots.txt text) rows into rule rows:
    * (domain, agent, rule ∈ allow|disallow, path). One posexplode +
    * two domain-keyed windows (group assignment, agent fill). Rules
    * before any User-agent line are dropped (RFC: rules belong to a
    * group); comments and blank lines vanish; an EMPTY value line
    * (`Disallow:` — the classic "allow everything" idiom) contributes
    * NO rule, per RFC 9309's empty-pattern semantics: treating it as a
    * zero-length prefix would instead match — and disallow —
    * everything. A group whose agents carry NO rules (e.g. a trailing
    * `User-agent: ccbot` at EOF) survives as one (agent, rule = null,
    * path = null) row per agent: RFC 9309 §2.2.1 makes a matched empty
    * group mean allow-all, so the group's EXISTENCE must reach
    * [[filterAllowed]]'s most-specific-group selection. */
  def parseRules(robots: DataFrame, domainCol: String = "domain",
                 txtCol: String = "robots_txt"): DataFrame = {
    val grouped = directiveGroups(robots, domainCol, txtCol,
      groupKeys = Some(Seq("user-agent", "allow", "disallow")))
    val agents = grouped.filter(col("key") === "user-agent")
      .select(col("domain"), col("grp"), lower(col("value")).as("agent"))
    val rules = grouped.filter(col("key") =!= "user-agent")
      .filter(length(col("value")) > 0) // empty pattern = no rule (RFC)
      .select(col("domain"), col("grp"), col("key").as("rule"),
        col("value").as("path"))
    // LEFT join: an empty group keeps its (agent, null, null) row so
    // group selection can see it (RFC empty-group = allow-all; an
    // inner join made the agent fall through to '*' — over-blocking)
    agents.join(rules, Seq("domain", "grp"), "left")
      .select(col("domain"), col("agent"), col("rule"), col("path"))
  }

  /** Per-domain Crawl-delay for one crawler `agent` — the de-facto
    * politeness directive (not in RFC 9309; Bing/Yandex honor it, so a
    * compliant crawler should too). Same line/grouping law as
    * [[parseRules]] but keeping `crawl-delay` directives, and with
    * EVERY directive line participating in run-breaking: a UA line
    * starts a new group unless the previous directive was also UA, so
    * `User-agent: ccbot / Disallow: /x / User-agent: *` keeps ccbot
    * and `*` in SEPARATE groups even though Disallow itself is not a
    * delay directive (filtering it out before grouping would merge the
    * two agents into one group and leak `*`'s delay onto the exact
    * agent). Group selection is [[filterAllowed]]'s law: the
    * exact-agent group when
    * one exists (even delay-less — its silence means "no declared
    * delay", NOT the `*` group's value), else `*`. Values are
    * fractional seconds behind an ANSI-safe numeric gate (junk lines
    * contribute nothing); several delays in scope take the MAX — the
    * most polite reading. Domains with no delay in scope emit no row:
    * the caller's crawl default applies. */
  def crawlDelays(robots: DataFrame, agent: String,
                  domainCol: String = "domain",
                  txtCol: String = "robots_txt"): DataFrame = {
    val a = agent.toLowerCase
    val grouped = directiveGroups(robots, domainCol, txtCol,
      groupKeys = None) // every directive run-breaks
    val agents = grouped.filter(col("key") === "user-agent")
      .select(col("domain"), col("grp"), lower(col("value")).as("agent"))
      .filter(col("agent") === a || col("agent") === "*")
    val delays = grouped.filter(col("key") === "crawl-delay")
      .filter(col("value").rlike("^[0-9]+(\\.[0-9]+)?$"))
      .select(col("domain"), col("grp"),
        col("value").cast("double").as("delay_s"))
    val hasExact = agents.groupBy(col("domain"))
      .agg(max(when(col("agent") === a, 1).otherwise(0)).as("has_exact"))
    agents.join(hasExact, Seq("domain"))
      .filter((col("has_exact") === 1 && col("agent") === a) ||
        (col("has_exact") === 0 && col("agent") === "*"))
      .join(delays, Seq("domain", "grp"))
      .groupBy(col("domain"))
      .agg(max(col("delay_s")).as("crawl_delay_s"))
  }

  /** `Sitemap:` directives of each domain's robots.txt — the sitemap
    * DISCOVERY channel (sitemaps.org's robots.txt inclusion; RFC 9309
    * treats it as an "other record" that belongs to NO group and
    * applies to all agents, so it extracts independently of UA groups
    * and even BEFORE the first one — where [[directiveGroups]] would
    * drop it). Values are absolute URLs per the protocol, emitted
    * trimmed with their line position (document order). */
  def sitemapUrls(robots: DataFrame, domainCol: String = "domain",
                  txtCol: String = "robots_txt"): DataFrame =
    robots
      .select(col(domainCol).as("domain"),
        posexplode(split(col(txtCol), "\r?\n")).as(Seq("pos", "line")))
      .select(col("domain"), col("pos"),
        trim(regexp_replace(col("line"), "#.*$", "")).as("l"))
      .select(col("domain"), col("pos"),
        trim(regexp_extract(col("l"), "(?i)^sitemap\\s*:(.*)$", 1))
          .as("sitemap_url"))
      .filter(length(col("sitemap_url")) > 0)

  /** The line→directive→group pipeline shared by [[parseRules]] and
    * [[crawlDelays]]: CRLF-tolerant split (`\r?\n` — real-world
    * robots.txt is frequently CRLF; WARC payloads are CRLF by spec,
    * and a trailing \r would make every prefix match fail OPEN),
    * comment/blank strip, key:value parse, then group assignment — a
    * User-agent line starts a NEW group unless the previous KEPT line
    * was also a User-agent (consecutive UA lines share a group), and
    * rows before any UA line drop. `groupKeys` decides which
    * directives exist for run-breaking: parseRules keeps only its
    * three keys (its oracle-pinned law), crawlDelays keeps every
    * recognized directive so a Disallow between two UA lines separates
    * their groups. Output: (domain, pos, key, value, grp). */
  private def directiveGroups(robots: DataFrame, domainCol: String,
                              txtCol: String,
                              groupKeys: Option[Seq[String]]): DataFrame = {
    val kv = robots
      .select(col(domainCol).as("domain"),
        posexplode(split(col(txtCol), "\r?\n")).as(Seq("pos", "line")))
      .select(col("domain"), col("pos"),
        trim(regexp_replace(col("line"), "#.*$", "")).as("l"))
      .filter(length(col("l")) > 0)
      .select(col("domain"), col("pos"),
        lower(regexp_extract(col("l"), "^([A-Za-z-]+)\\s*:", 1)).as("key"),
        trim(regexp_extract(col("l"), "^[A-Za-z-]+\\s*:(.*)$", 1))
          .as("value"))
    val lines = groupKeys match {
      case Some(ks) => kv.filter(col("key").isin(ks: _*))
      case None => kv.filter(length(col("key")) > 0)
    }
    val byPos = Window.partitionBy(col("domain")).orderBy(col("pos"))
    lines
      .withColumn("prev_key", lag(col("key"), 1).over(byPos))
      .withColumn("starts_group",
        (col("key") === "user-agent") &&
          (col("prev_key").isNull || col("prev_key") =!= "user-agent"))
      .withColumn("grp",
        sum(when(col("starts_group"), 1).otherwise(0)).over(byPos))
      .filter(col("grp") > 0)
  }

  /** True when a rule path uses RFC 9309 §2.2.3 special characters:
    * `*` (matches any octet sequence) anywhere, or `$` as the LAST
    * character (anchors the end of the URL path). Plain rules keep the
    * codegen'd prefix fast path — no per-row regex compilation. */
  def isPatternRule(path: Column): Column =
    path.contains("*") || path.endsWith("$")

  /** Translate one rule path to an anchored regex implementing the RFC
    * 9309 §2.2.3 match semantics: regex metacharacters escaped, `*` →
    * `.*`, a trailing `$` becomes the end anchor (a `$` anywhere else
    * is a literal octet). Escapes ONLY the true metacharacters — a
    * backslash before an arbitrary letter is an ERROR in
    * java.util.regex (`\é`), and unescaped `/ - = :` are literals in
    * both engines — so the translation is RE2-safe and the DuckDB
    * oracle replays it verbatim (the UrlOps cross-engine-regex-parity
    * convention). Translation runs once per RULE (the tiny broadcast
    * side), never per URL. */
  def rulePathRegex(path: Column): Column = {
    val anchored = path.endsWith("$")
    val body = when(anchored, path.substr(lit(1), length(path) - 1))
      .otherwise(path)
    val escaped =
      regexp_replace(body, "([.^$+?(){}\\[\\]|\\\\])", "\\\\$1")
    val wild = regexp_replace(escaped, "\\*", ".*")
    concat(lit("^"), wild, when(anchored, lit("$")).otherwise(lit("")))
  }

  /** The match predicate shared by both verdict forms: pattern rules
    * (pre-translated regex) via regexp_like, plain rules via the
    * codegen'd prefix test. */
  private def ruleMatches(path: Column, rulePath: Column,
                          isPattern: Column, regex: Column): Column =
    when(isPattern, regexp_like(path, regex))
      .otherwise(path.startsWith(rulePath))

  /** RFC group selection on the rules side: the agent's exact-group
    * rows when the domain has ANY exact group (even an empty one),
    * else its `*` rows. Shared by [[filterAllowed]] and
    * [[rulesByDomain]]. */
  private def scopedRules(rules: DataFrame, agent: String): DataFrame = {
    val a = lit(agent.toLowerCase)
    val scoped0 = rules.filter(col("agent") === a || col("agent") === "*")
    // has_exact judges AGENT rows (null-path empty-group rows count):
    // an agent whose exact group is empty gets allow-all, not the '*'
    // fallback
    val hasExact = scoped0.groupBy(col("domain"))
      .agg(max(when(col("agent") === a, 1).otherwise(0)).as("has_exact"))
    scoped0.join(hasExact, Seq("domain"))
      .filter((col("has_exact") === 1 && col("agent") === a) ||
        (col("has_exact") === 0 && col("agent") === "*"))
      .select(col("domain"), col("rule"), col("path").as("rule_path"))
  }

  /** Verdict per URL row for one crawler `agent`: RFC 9309 group
    * selection (the domain's exact-agent group when one exists — even
    * empty, which allows everything — else its `*` rules, else
    * everything is allowed) + most-octets precedence with allow
    * winning ties; `*`/`$` patterns per §2.2.3. Input needs (domain,
    * `urlCol` path); emits the input columns + `allowed` boolean. */
  def filterAllowed(urls: DataFrame, rules: DataFrame, agent: String,
                    domainCol: String = "domain",
                    pathCol: String = "path"): DataFrame = {
    val scoped = scopedRules(rules, agent)
      .withColumn("is_pattern", isPatternRule(col("rule_path")))
      .withColumn("rule_regex", rulePathRegex(col("rule_path")))
    // candidate matches: the rules side is tiny — broadcast, per-URL
    // cost one join + one argmax window. The window partitions on a
    // per-ROW tag, not the url columns: duplicate input rows (a
    // re-crawled page, a projection collapsing distinct urls onto one
    // path) must each keep their verdict row, never silently merge.
    // Internal names are guarded loudly: withColumn would silently
    // OVERWRITE a caller column of the same name, and the rules side's
    // names would make the final select ambiguous. Empty-group rows
    // (rule_path null) never match — they exist only to steer group
    // selection above — so their URLs take the left-join null row:
    // allowed.
    Seq("__robots_uid", "rule", "rule_path", "is_pattern", "rule_regex")
      .foreach(n => require(!urls.columns.contains(n),
        s"filterAllowed: the urls frame must not carry a column named " +
          s"'$n' (internal to the verdict computation) — rename it"))
    val tagged = urls.withColumn("__robots_uid",
      monotonically_increasing_id())
    val cand = tagged.join(broadcast(scoped),
        tagged(domainCol) === scoped("domain") &&
          ruleMatches(col(pathCol), col("rule_path"), col("is_pattern"),
            col("rule_regex")), "left")
      .drop(scoped("domain"))
    // most octets wins (wildcards and the $ anchor count — RFC §2.2.2's
    // "most specific match is the match that has the most octets")
    val w = Window
      .partitionBy(col("__robots_uid"))
      .orderBy(length(col("rule_path")).desc,
        // allow wins ties at equal pattern length
        when(col("rule") === "allow", 0).otherwise(1).asc)
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(urls.columns.map(col) :+
        (col("rule").isNull || col("rule") === "allow").as("allowed"): _*)
  }

  /** The static side of the STREAMING-legal robots gate: the agent's
    * scoped rules per domain collapsed into one array row
    * (domain, robots_rules: array<struct<is_allow, path, is_pattern,
    * regex, plen>>). Group selection — exact agent else `*`, empty
    * exact group wins as allow-all — resolves here on the tiny rules
    * side, so the per-URL side needs NO window and NO aggregation:
    * broadcast-join this frame on `domain` and gate with
    * [[allowedCol]]. Legal in a stateless streaming chain
    * (stream-static join + scalar expression) and zero extra shuffles
    * in batch. Domains whose scoped rules are empty (or absent) simply
    * have no row — the left join's null array is allow-all. */
  def rulesByDomain(rules: DataFrame, agent: String): DataFrame =
    scopedRules(rules, agent)
      .filter(col("rule_path").isNotNull)
      .groupBy(col("domain"))
      .agg(collect_list(struct(
        (col("rule") === "allow").as("is_allow"),
        col("rule_path").as("path"),
        isPatternRule(col("rule_path")).as("is_pattern"),
        rulePathRegex(col("rule_path")).as("regex"),
        length(col("rule_path")).as("plen"))).as("robots_rules"))

  /** Verdict for one path against a [[rulesByDomain]] array: the same
    * most-octets / allow-wins-ties law as [[filterAllowed]], computed
    * by ONE order-independent aggregate over the rule array (a
    * strictly longer match replaces the incumbent; at equal length
    * only allow replaces disallow — two same-length same-verdict rules
    * are verdict-equal, so no array ordering changes the answer).
    * Null / empty arrays (unknown domain, no scoped rules) allow. */
  def allowedCol(path: Column, rules: Column): Column = {
    val best = aggregate(rules,
      struct(lit(-1).as("plen"), lit(true).as("is_allow")),
      (acc, r) => {
        val m = ruleMatches(path, r("path"), r("is_pattern"), r("regex"))
        val better = m && (r("plen") > acc("plen") ||
          (r("plen") === acc("plen") && r("is_allow") && !acc("is_allow")))
        when(better,
          struct(r("plen").as("plen"), r("is_allow").as("is_allow")))
          .otherwise(acc)
      })
    coalesce(best("plen") < 0 || best("is_allow"), lit(true))
  }

  // ——— the robots.txt lifecycle: fetch-status → rules (RFC 9309) ———

  /** The synthetic complete-disallow rule array (§2.3.1.4: a robots
    * fetch failing on server/network errors means the crawler MUST
    * assume total disallow until a definitive answer arrives). One
    * `Disallow: /` rule in [[rulesByDomain]]'s struct shape, so
    * [[allowedCol]]/[[gateRobots]] consume it like any parsed rule. */
  private def disallowAllRules: Column =
    array(struct(lit(false).as("is_allow"), lit("/").as("path"),
      lit(false).as("is_pattern"), lit("^/").as("regex"),
      lit(1).as("plen")))

  /** RFC 9309 §2.3.1 fetch-status semantics over one cycle's
    * robots.txt fetch results — the stage between the fetch loop and
    * the maintained rules frame. Input rows: (domain, status,
    * robots_txt, fetch_ts); duplicate domains (retries within one
    * cycle, unioned fetcher shards) collapse HERE, latest-fetch_ts
    * wins with full deterministic tie-breaks — enforced, not a doc
    * precondition, because a duplicate per-domain row would ride the
    * full-outer merge into [[updateRules]] and then FAN OUT every
    * discovered URL of that host through gateRobots' join.
    * Output: (domain, robots_rules, robots_status, fetched_at) —
    * [[rulesByDomain]]'s shape plus the lifecycle metadata, consumed
    * unchanged by CrawlFrontier.gateRobots and maintained by
    * [[updateRules]]. The status law:
    *  - 2xx → parse and scope the body for `agent` ('rules'); a body
    *    whose scoped rules are empty keeps the null array = allow-all
    *    (a published robots.txt that allows everything);
    *  - 3xx/4xx EXCEPT 429 → 'allow_all', null rules: §2.3.1.2-3 —
    *    "unavailable" (404 and friends) means unrestricted access,
    *    and a redirect the fetcher did not resolve (it SHOULD follow
    *    ≥ 5 hops upstream) falls to the same MAY-assume-unavailable
    *    clause;
    *  - 429, 5xx, status ≤ 0 (network error/timeout) →
    *    'disallow_all' with the synthetic Disallow:/ rule — §2.3.1.4's
    *    temporarily-assume-total-disallow. 429 sits here, NOT in
    *    allow-all: rate-limited means the server delivered no verdict
    *    and explicitly asked not to be asked again yet — reading it
    *    as "unrestricted access" would open a host BECAUSE it
    *    throttled us.
    * One parse over the 2xx slice (tiny — one row per fetched host) +
    * one domain-keyed window + left join. */
  def rulesFromFetch(fetched: DataFrame, agent: String,
                     domainCol: String = "domain",
                     statusCol: String = "status",
                     txtCol: String = "robots_txt",
                     tsCol: String = "fetch_ts"): DataFrame = {
    val base0 = fetched.select(col(domainCol).as("domain"),
      col(statusCol).cast("int").as("__rf_status"),
      col(txtCol).cast("string").as("__rf_txt"),
      col(tsCol).cast("long").as("fetched_at"))
    val w = Window.partitionBy("domain")
      .orderBy(col("fetched_at").desc_nulls_last,
        col("__rf_status").desc, col("__rf_txt").desc_nulls_last)
    val base = base0.withColumn("__rf_rn", row_number().over(w))
      .filter(col("__rf_rn") === 1).drop("__rf_rn")
    val ok = col("__rf_status") >= 200 && col("__rf_status") <= 299
    val soft = col("__rf_status") >= 300 && col("__rf_status") <= 499 &&
      col("__rf_status") =!= 429
    val parsed = rulesByDomain(
      parseRules(base.filter(ok)
        .select(col("domain"), coalesce(col("__rf_txt"), lit(""))
          .as("robots_txt"))), agent)
      .withColumnRenamed("robots_rules", "__rf_rules")
    base.join(parsed, Seq("domain"), "left")
      .select(col("domain"),
        when(ok, col("__rf_rules"))
          .when(soft, lit(null).cast(
            "array<struct<is_allow:boolean,path:string," +
              "is_pattern:boolean,regex:string,plen:int>>"))
          .otherwise(disallowAllRules).as("robots_rules"),
        when(ok, lit("rules")).when(soft, lit("allow_all"))
          .otherwise(lit("disallow_all")).as("robots_status"),
        col("fetched_at"))
  }

  /** Fold a fresh [[rulesFromFetch]] batch into the maintained
    * per-domain rules frame: rules REPLACE (they are a snapshot, not a
    * count — the updateTrapStats convention's merge join, but
    * latest-fetched_at-wins instead of summed). Ties go to the fresh
    * side (a redelivered batch converges — at-least-once safe), and a
    * stale redelivery of an OLD batch loses to the maintained row, so
    * the merge is order-insensitive across replays. One domain-keyed
    * full-outer merge join over two frames that are one-row-per-host
    * tiny next to any URL corpus. */
  def updateRules(maintained: DataFrame, fresh: DataFrame): DataFrame = {
    val m = maintained.select(col("domain"),
      col("robots_rules").as("__m_rules"),
      col("robots_status").as("__m_status"),
      col("fetched_at").as("__m_at"), lit(true).as("__m_present"))
    val f = fresh.select(col("domain"),
      col("robots_rules").as("__f_rules"),
      col("robots_status").as("__f_status"),
      col("fetched_at").as("__f_at"), lit(true).as("__f_present"))
    // row PRESENCE is judged by its own marker, never by fetched_at
    // being null: a maintained row whose fetched_at is null (an
    // undated fetch upstream) must lose to a dated fresh row, not be
    // WIPED to all-null fields when no fresh row arrived at all —
    // null robots_rules means allow-all downstream, so that wipe
    // would silently open a host held at complete-disallow
    val freshWins = col("__f_present").isNotNull &&
      (col("__m_present").isNull || col("__m_at").isNull ||
        (col("__f_at").isNotNull && col("__f_at") >= col("__m_at")))
    m.join(f, Seq("domain"), "full_outer")
      .select(col("domain"),
        when(freshWins, col("__f_rules")).otherwise(col("__m_rules"))
          .as("robots_rules"),
        when(freshWins, col("__f_status")).otherwise(col("__m_status"))
          .as("robots_status"),
        when(freshWins, col("__f_at")).otherwise(col("__m_at"))
          .as("fetched_at"))
  }

  /** [[filterAllowed]]'s verdict via the stateless form: left
    * broadcast-join [[rulesByDomain]]'s frame and evaluate
    * [[allowedCol]] per row. Emits the input columns + `allowed` —
    * byte-identical verdicts to the window form (WebCorpusSpec pins
    * the equivalence), with no window shuffle and streaming-legal. */
  def filterAllowedStateless(urls: DataFrame, byDomain: DataFrame,
                             domainCol: String = "domain",
                             pathCol: String = "path"): DataFrame = {
    require(!urls.columns.contains("robots_rules"),
      "filterAllowedStateless: the urls frame must not carry a column " +
        "named 'robots_rules' (internal to the verdict) — rename it")
    urls.join(broadcast(byDomain),
        urls(domainCol) === byDomain("domain"), "left")
      .drop(byDomain("domain"))
      .withColumn("allowed", allowedCol(col(pathCol), col("robots_rules")))
      .drop("robots_rules")
  }
}
