package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt compliance — the filter that decides which fetched pages
  * may enter a training corpus at all (the crawl-ethics gate every
  * responsible web pipeline runs; CommonCrawl itself honors it at
  * fetch time, and re-filtering at curation time is the standard
  * belt-and-braces). Implements the core of REP (RFC 9309): group
  * structure (consecutive User-agent lines share a group), the
  * most-specific-agent-group-wins selection, and longest-path-prefix
  * rule precedence with allow winning ties. Deliberate, documented
  * simplifications of a relational implementation: no `*`/`$` wildcard
  * patterns inside paths (plain prefix match), agent matching is exact
  * token (or `*`), and `Crawl-delay`/`Sitemap` lines are ignored.
  *
  * Everything is joins + windows over one line explode — fully
  * oracle-replayable, shuffles keyed on (domain) and (domain, url):
  * rules tables are tiny relative to the URL corpus, so at 100 TB the
  * rules side BROADCASTS and the per-URL cost is one broadcast join +
  * one url-keyed argmax window. */
object Robots {

  /** Parse (domain, robots.txt text) rows into rule rows:
    * (domain, agent, rule ∈ allow|disallow, path). One posexplode +
    * two domain-keyed windows (group assignment, agent fill). Rules
    * before any User-agent line are dropped (RFC: rules belong to a
    * group); comments and blank lines vanish; an EMPTY value line
    * (`Disallow:` — the classic "allow everything" idiom) contributes
    * NO rule, per RFC 9309's empty-pattern semantics: treating it as a
    * zero-length prefix would instead match — and disallow —
    * everything. */
  def parseRules(robots: DataFrame, domainCol: String = "domain",
                 txtCol: String = "robots_txt"): DataFrame = {
    val lines = robots
      // \r?\n: real-world robots.txt is frequently CRLF (Windows-served
      // files; WARC payloads are CRLF by spec) — splitting on \n alone
      // leaves a trailing \r on every token, the prefix match never
      // fires, and the compliance gate FAILS OPEN
      .select(col(domainCol).as("domain"),
        posexplode(split(col(txtCol), "\r?\n")).as(Seq("pos", "line")))
      .select(col("domain"), col("pos"),
        trim(regexp_replace(col("line"), "#.*$", "")).as("l"))
      .filter(length(col("l")) > 0)
      .select(col("domain"), col("pos"),
        lower(regexp_extract(col("l"), "^([A-Za-z-]+)\\s*:", 1)).as("key"),
        trim(regexp_extract(col("l"), "^[A-Za-z-]+\\s*:(.*)$", 1)).as("value"))
      .filter(col("key").isin("user-agent", "allow", "disallow"))
    val byPos = Window.partitionBy(col("domain")).orderBy(col("pos"))
    // a User-agent line starts a NEW group unless the previous kept
    // line was also a User-agent (consecutive UA lines share a group)
    val grouped = lines
      .withColumn("prev_key", lag(col("key"), 1).over(byPos))
      .withColumn("starts_group",
        (col("key") === "user-agent") &&
          (col("prev_key").isNull || col("prev_key") =!= "user-agent"))
      .withColumn("grp",
        sum(when(col("starts_group"), 1).otherwise(0)).over(byPos))
      .filter(col("grp") > 0) // rules before any UA line: dropped
    val agents = grouped.filter(col("key") === "user-agent")
      .select(col("domain"), col("grp"), lower(col("value")).as("agent"))
    val rules = grouped.filter(col("key") =!= "user-agent")
      .filter(length(col("value")) > 0) // empty pattern = no rule (RFC)
      .select(col("domain"), col("grp"), col("key").as("rule"),
        col("value").as("path"))
    // a group with UA lines but no rules contributes nothing (inner
    // join) — matching RFC 9309's empty-group semantics
    agents.join(rules, Seq("domain", "grp"))
      .select(col("domain"), col("agent"), col("rule"), col("path"))
  }

  /** Verdict per URL row for one crawler `agent`: RFC 9309 group
    * selection (the domain's exact-agent rules when any exist, else
    * its `*` rules, else everything is allowed) + longest-prefix
    * precedence with allow winning ties. Input needs (domain, `urlCol`
    * path); emits the input columns + `allowed` boolean. */
  def filterAllowed(urls: DataFrame, rules: DataFrame, agent: String,
                    domainCol: String = "domain",
                    pathCol: String = "path"): DataFrame = {
    val a = lit(agent.toLowerCase)
    // most-specific-group-wins: domains with exact-agent rules use
    // ONLY those; others fall back to '*'
    val scoped0 = rules.filter(col("agent") === a || col("agent") === "*")
    val hasExact = scoped0.groupBy(col("domain"))
      .agg(max(when(col("agent") === a, 1).otherwise(0)).as("has_exact"))
    val scoped = scoped0.join(hasExact, Seq("domain"))
      .filter((col("has_exact") === 1 && col("agent") === a) ||
        (col("has_exact") === 0 && col("agent") === "*"))
      .select(col("domain"), col("rule"), col("path").as("rule_path"))
    // candidate matches: prefix rule paths; the rules side is tiny —
    // broadcast, per-URL cost one join + one argmax window. The window
    // partitions on a per-ROW tag, not the url columns: duplicate
    // input rows (a re-crawled page, a projection collapsing distinct
    // urls onto one path) must each keep their verdict row, never
    // silently merge. Internal names are guarded loudly: withColumn
    // would silently OVERWRITE a caller column of the same name, and
    // the rules side's names would make the final select ambiguous.
    Seq("__robots_uid", "rule", "rule_path").foreach(n =>
      require(!urls.columns.contains(n),
        s"filterAllowed: the urls frame must not carry a column named " +
          s"'$n' (internal to the verdict computation) — rename it"))
    val tagged = urls.withColumn("__robots_uid",
      monotonically_increasing_id())
    val cand = tagged.join(broadcast(scoped),
        tagged(domainCol) === scoped("domain") &&
          col(pathCol).startsWith(col("rule_path")), "left")
      .drop(scoped("domain"))
    val w = Window
      .partitionBy(col("__robots_uid"))
      .orderBy(length(col("rule_path")).desc,
        // allow wins ties at equal prefix length
        when(col("rule") === "allow", 0).otherwise(1).asc)
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(urls.columns.map(col) :+
        (col("rule").isNull || col("rule") === "allow").as("allowed"): _*)
  }
}
