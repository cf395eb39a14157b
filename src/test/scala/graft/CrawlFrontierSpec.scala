package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.Sitemaps
import graft.operators.CrawlFrontier
import graft.operators.CrawlFrontier.Revisit

/** The crawl middle half: sitemap ingestion and the URL-frontier
  * scheduling loop (seed → politeness-bounded batch selection →
  * adaptive revisit → discovery admission). */
class CrawlFrontierSpec extends SparkSpec {
  import spark.implicits._

  // ——— sitemaps ————————————————————————————————————————————————————

  test("sitemap urlset entries parse in order with entity-decoded locs; empty locs drop") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        | <url>
        |  <loc> https://a.example/p?x=1&amp;y=2 </loc>
        |  <lastmod>2026-01-05</lastmod>
        |  <changefreq>Daily</changefreq>
        |  <priority>0.8</priority>
        | </url>
        | <url><loc>https://a.example/q</loc></url>
        | <url><lastmod>2026-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val out = Seq(xml).toDF("xml")
      .select(explode(Sitemaps.urlEntries(col("xml"))).as("e"))
      .select(col("e.loc"), col("e.lastmod"), col("e.changefreq"),
        col("e.priority"))
      .collect()
    out.length shouldBe 2 // the loc-less third entry dropped
    out(0).getString(0) shouldBe "https://a.example/p?x=1&y=2"
    out(0).getString(1) shouldBe "2026-01-05"
    out(0).getString(2) shouldBe "daily" // lowercased vocabulary
    out(0).getString(3) shouldBe "0.8"
    out(1).getString(0) shouldBe "https://a.example/q"
    out(1).getString(1) shouldBe "" // absent optional tag → ''
  }

  test("sitemap index dispatch and child extraction") {
    val idx =
      """<sitemapindex><sitemap><loc>https://a.example/s1.xml</loc>
        |</sitemap><sitemap><loc>https://a.example/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val df = Seq(("i", idx), ("u", "<urlset><url><loc>x</loc></url></urlset>"))
      .toDF("k", "xml")
    val byK = df.select(col("k"), Sitemaps.isIndex(col("xml")).as("i"),
      Sitemaps.indexEntries(col("xml")).as("c")).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), r.getSeq[String](2))))
      .toMap
    byK("i")._1 shouldBe true
    byK("i")._2 shouldBe Seq("https://a.example/s1.xml",
      "https://a.example/s2.xml")
    byK("u")._1 shouldBe false
    byK("u")._2 shouldBe Seq.empty
  }

  test("namespace-prefixed sitemaps parse identically: <sm:url>/<sm:loc> entries, prefixed index dispatch, <sitemapindex> never an entry") {
    val xml =
      """<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sm:url><sm:loc>https://p.ex/a?x=1&amp;y=2</sm:loc>
        |<sm:lastmod>2026-02-01</sm:lastmod>
        |<sm:changefreq>Weekly</sm:changefreq>
        |<sm:priority>0.4</sm:priority></sm:url>
        |<sm:url><sm:loc>https://p.ex/b</sm:loc></sm:url>
        |</sm:urlset>""".stripMargin
    val out = Seq(xml).toDF("xml")
      .select(explode(Sitemaps.urlEntries(col("xml"))).as("e"))
      .select(col("e.loc"), col("e.lastmod"), col("e.changefreq"),
        col("e.priority")).collect()
    out.length shouldBe 2
    out(0).getString(0) shouldBe "https://p.ex/a?x=1&y=2"
    out(0).getString(1) shouldBe "2026-02-01"
    out(0).getString(2) shouldBe "weekly"
    out(0).getString(3) shouldBe "0.4"
    out(1).getString(0) shouldBe "https://p.ex/b"
    // prefixed index: dispatch flag + child locs; the <sm:sitemapindex>
    // wrapper tag must not match the <sm:sitemap> entry pattern
    val idx = "<sm:sitemapindex><sm:sitemap><sm:loc>https://p.ex/s1.xml.gz" +
      "</sm:loc></sm:sitemap></sm:sitemapindex>"
    val got = Seq(idx).toDF("xml")
      .select(Sitemaps.isIndex(col("xml")),
        Sitemaps.indexEntries(col("xml"))).collect()(0)
    got.getBoolean(0) shouldBe true
    got.getSeq[String](1) shouldBe Seq("https://p.ex/s1.xml.gz")
    // an UNPREFIXED urlset must not dispatch as an index
    Seq("<urlset><url><loc>x</loc></url></urlset>").toDF("xml")
      .select(Sitemaps.isIndex(col("xml"))).as[Boolean]
      .head() shouldBe false
  }

  test("decodeFeeds: gzip payloads magic-sniff and inflate, plain XML passes through, nulls yield '', truncation salvages, columns survive") {
    import graft.io.Warc
    val xml = "<urlset><url><loc>https://g.ex/p</loc></url></urlset>"
    val gz = Warc.gzipBytes(xml.getBytes("UTF-8"))
    val truncated = gz.take(gz.length - 6) // cut inside the member
    val feeds = Seq(
      ("gz", gz), ("plain", xml.getBytes("UTF-8")),
      ("null", null.asInstanceOf[Array[Byte]]),
      ("cut", truncated))
      .toDF("tag", "body")
    val out = Sitemaps.decodeFeeds(feeds)
      .select(col("tag"), col("xml")).as[(String, String)]
      .collect().toMap
    out("gz") shouldBe xml
    out("plain") shouldBe xml
    out("null") shouldBe ""
    // the cut member salvages a PREFIX (possibly empty), never throws
    xml.startsWith(out("cut")) shouldBe true
    // the decoded face feeds the parsers directly
    Sitemaps.decodeFeeds(feeds).filter(col("tag") === "gz")
      .select(explode(Sitemaps.urlEntries(col("xml"))).as("e"))
      .select(col("e.loc")).as[String].head() shouldBe "https://g.ex/p"
    // the stateless map is STREAMING-legal (the Scaladoc's claim):
    // the same decode+parse chain on a feed stream matches batch
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Array[Byte])]
    val q = Sitemaps.decodeFeeds(input.toDF().toDF("tag", "body"))
      .select(col("tag"), explode(Sitemaps.urlEntries(col("xml"))).as("e"))
      .select(col("tag"), col("e.loc").as("loc"))
      .writeStream.format("memory").queryName("feeds_parity")
      .outputMode("append").start()
    try {
      input.addData(("gz", gz), ("plain", xml.getBytes("UTF-8")))
      q.processAllAvailable()
    } finally q.stop()
    spark.table("feeds_parity").select("loc").as[String]
      .collect().toSeq shouldBe Seq.fill(2)("https://g.ex/p")
  }

  test("changefreq and priority mappings: vocabulary, clamping, null fallbacks") {
    val df = Seq("always", "hourly", "daily", "weekly", "monthly",
      "yearly", "never", "sometimes", "").toDF("cf")
    val secs = df.select(Sitemaps.changefreqSeconds(col("cf")))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    secs shouldBe Array(300L, 3600L, 86400L, 604800L, 2592000L,
      31536000L, 63072000L, -1L, -1L)
    val pr = Seq("0.8", "1.7", "-3", "", "x").toDF("p")
      .select(Sitemaps.priorityValue(col("p")))
      .collect().map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    pr(0) shouldBe 0.8
    pr(1) shouldBe 1.0 // clamped
    pr(2) shouldBe 0.0 // clamped
    pr(3).isNaN shouldBe true
    pr(4).isNaN shouldBe true
  }

  // ——— frontier helpers ————————————————————————————————————————————

  // the r17 11-column shape plus null validators (the r18 contract
  // appends etag/last_modified; most scheduling tests don't exercise
  // them — the validator laws have their own tests and oracle rows)
  private def mkFrontier(rows: Seq[(String, String, Int, Double, Long, Int,
      Option[Long], Option[String], Long, Long, String)]): DataFrame =
    rows.toDF("url", "host", "depth", "priority", "fetch_count",
      "fail_count", "last_fetch_ts", "content_hash", "interval_s",
      "next_fetch_ts", "state")
      .withColumn("etag", lit(null).cast("string"))
      .withColumn("last_modified", lit(null).cast("long"))

  private def row(url: String, priority: Double = 0.5,
                  interval: Long = 3600L, next: Long = 1000L,
                  state: String = "active", hash: Option[String] = None,
                  fails: Int = 0, fetches: Long = 0L)
      : (String, String, Int, Double, Long, Int, Option[Long],
         Option[String], Long, Long, String) = {
    val host = url.replaceAll("^https?://", "").takeWhile(_ != '/')
    (url, host, 0, priority, fetches, fails, None, hash, interval, next,
      state)
  }

  // ——— seed ————————————————————————————————————————————————————————

  test("seed canonicalizes, drops non-http(s), and collapses spelling variants deterministically") {
    val urls = Seq(
      "HTTPS://A.Example/p?utm_source=x&q=1#frag", // variant 1
      "https://a.example/p?q=1",                   // variant 2 (same page)
      "https://a.example/x/../p?q=1",              // variant 3: dot segment
      "https://b.example/./q",                     // dot segment, same page
      "ftp://skip.me/x",
      "not a url",
      "https://b.example/q").toDF("url")
    val f = CrawlFrontier.seed(urls, now = 500L, defaultIntervalS = 60L)
    val got = f.orderBy("url").collect()
    got.map(_.getString(0)) shouldBe Array(
      "https://a.example/p?q=1", "https://b.example/q")
    got.foreach { r =>
      r.getString(1) should not be empty      // host
      r.getInt(2) shouldBe 0                  // depth
      r.getLong(4) shouldBe 0L                // fetch_count
      r.getLong(8) shouldBe 60L               // interval_s
      r.getLong(9) shouldBe 500L              // next_fetch_ts
      r.getString(10) shouldBe "active"
    }
  }

  test("seed parses <lastmod> into last_modified (strict shape, day resolution, max per url); reseed pulls only genuinely-changed known rows") {
    val entries = Seq(
      ("https://a.ex/p", "2026-01-05"),              // date form
      ("https://a.ex/p", "2026-01-07T09:30:00Z"),    // datetime → its day
      ("https://a.ex/q", "last tuesday"),            // junk → null
      ("https://a.ex/r", "2026-2-3"),                // non-padded → null
      ("https://a.ex/s", null)).toDF("url", "lastmod")
    val f = CrawlFrontier.seed(entries, now = 1000L,
      lastmodCol = Some("lastmod"))
    val lm = f.collect().map(r => r.getString(0) ->
      (if (r.isNullAt(12)) None else Some(r.getLong(12)))).toMap
    lm("https://a.ex/p") shouldBe Some(1767744000L) // 2026-01-07 (max)
    lm("https://a.ex/q") shouldBe None
    lm("https://a.ex/r") shouldBe None
    lm("https://a.ex/s") shouldBe None
    // every row still schedules due-now (lastmod is a validator HINT,
    // not a schedule override)
    f.select("next_fetch_ts").as[Long].collect().toSet shouldBe Set(1000L)
    // reseed: only a known row whose seed lastmod is NEWER than its
    // last fetch — and not already due — pulls forward; everything
    // else (older lastmod, unfetched, already-due, dead, unknown)
    // emits nothing (changed-rows-only)
    val frontier = mkFrontier(Seq(
      row("https://a.ex/old", next = 9999L),   // fetched, stale lastmod
      row("https://a.ex/new", next = 9999L),   // fetched, fresh lastmod
      row("https://a.ex/unfetched", next = 9999L),
      row("https://a.ex/due", next = 10L),     // fresh lastmod, but due
      row("https://a.ex/dead", next = 9999L, state = "dead")))
      .withColumn("last_fetch_ts",
        when(col("url") =!= "https://a.ex/unfetched", lit(5000L)))
    val seeds = CrawlFrontier.seed(Seq(
        ("https://a.ex/old", "1970-01-01"),  // epoch 0 < last_fetch
        ("https://a.ex/new", "2026-01-05"),
        ("https://a.ex/unfetched", "2026-01-05"),
        ("https://a.ex/due", "2026-01-05"),
        ("https://a.ex/dead", "2026-01-05"),
        ("https://a.ex/unknown", "2026-01-05")).toDF("url", "lastmod"),
      now = 6000L, lastmodCol = Some("lastmod"))
    val out = CrawlFrontier.reseed(frontier, seeds, now = 6000L).collect()
    out.map(_.getString(0)).toSeq shouldBe Seq("https://a.ex/new")
    out(0).getLong(9) shouldBe 6000L       // pulled due-now
    out(0).getLong(12) shouldBe 1767571200L // the seed's claim recorded
    out(0).getString(10) shouldBe "active"
  }

  test("seed carries sitemap priority/interval columns; nulls fall back; dup keeps max-priority min-interval") {
    val entries = Seq(
      ("https://a.example/p", Some(0.9), Some(600L)),
      ("https://a.example/p", Some(0.2), Some(60L)), // same url: max pr, min iv
      ("https://c.example/r", None, None))
      .toDF("url", "pr", "iv")
    val f = CrawlFrontier.seed(entries, now = 500L,
      priorityCol = Some("pr"), intervalCol = Some("iv"),
      defaultIntervalS = 86400L)
    val byUrl = f.collect().map(r => r.getString(0) ->
      ((r.getDouble(3), r.getLong(8)))).toMap
    byUrl("https://a.example/p") shouldBe ((0.9, 60L))
    byUrl("https://c.example/r") shouldBe ((1.0, 86400L)) // depth-0 default
  }

  // ——— selectBatch —————————————————————————————————————————————————

  test("selectBatch: due+active only, per-host politeness cap, global top-k by priority") {
    val f = mkFrontier(
      (1 to 5).map(i => row(s"https://hot.example/p$i", priority = 0.9)) ++
      Seq(
        row("https://cold.example/a", priority = 0.5),
        row("https://cold.example/b", priority = 0.4),
        row("https://late.example/x", priority = 1.0, next = 9999L), // not due
        row("https://dead.example/y", priority = 1.0, state = "dead")))
    val batch = CrawlFrontier.selectBatch(f, now = 1000L,
      batchSize = 4, perHostCap = 2)
    val urls = batch.collect().map(_.getString(0))
    urls.length shouldBe 4
    // hot.example capped at 2 despite 5 due high-priority rows
    urls.count(_.startsWith("https://hot.example/")) shouldBe 2
    urls should contain("https://cold.example/a")
    urls should not contain "https://late.example/x"
    urls should not contain "https://dead.example/y"
    // within host: priority desc then url asc → p1, p2 for hot
    urls.filter(_.startsWith("https://hot.example/")) shouldBe
      Array("https://hot.example/p1", "https://hot.example/p2")
  }

  test("selectBatch plans the global top-k as TakeOrderedAndProject, never a full sort") {
    // more rows than batchSize, or EliminateLimits drops the Limit
    // node (child maxRows <= limit) and no top-k rewrite can fire
    val f = mkFrontier((1 to 40).map(i => row(s"https://h$i.example/$i")))
    val df = CrawlFrontier.selectBatch(f, 1000L, 10, 3)
    df.collect() // AQE: the final plan carries the top-k rewrite
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    withClue(plan) {
      plan should include("TakeOrderedAndProject")
      plan should not include "CartesianProduct"
    }
  }

  test("crawlDelays: group selection, max-in-scope, fractional values, junk skipped; an exact delay-less group silences the '*' value") {
    import graft.functions.Robots
    val robots = Seq(
      ("a.ex", "User-agent: ccbot\nCrawl-delay: 60\nUser-agent: *\n" +
        "Crawl-delay: 1"),
      ("b.ex", "User-agent: *\nCrawl-delay: 0.5"),
      // exact group exists but declares no delay: its silence means
      // the crawl default, NOT the '*' group's 30
      ("c.ex", "User-agent: ccbot\nDisallow: /x\nUser-agent: *\n" +
        "Crawl-delay: 30"),
      ("d.ex", "User-agent: *\nCrawl-delay: abc"),
      ("e.ex", "User-agent: ccbot\nCrawl-delay: 2\nCrawl-delay: 7"))
      .toDF("domain", "robots_txt")
    val got = Robots.crawlDelays(robots, "ccbot").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    got shouldBe Map("a.ex" -> 60.0, "b.ex" -> 0.5, "e.ex" -> 7.0)
  }

  test("sitemapUrls: Sitemap directives extract group-independently, case-insensitively, in document order") {
    import graft.functions.Robots
    val robots = Seq(
      // before any UA group, after one, multiple, lowercase key,
      // comment-stripped, and one domain with none
      ("a.ex", "Sitemap: https://a.ex/pre.xml\nUser-agent: *\n" +
        "Disallow: /x\nsitemap: https://a.ex/post.xml # main map"),
      ("b.ex", "User-agent: *\nAllow: /")).toDF("domain", "robots_txt")
    val got = Robots.sitemapUrls(robots)
      .orderBy("domain", "pos").collect()
      .map(r => (r.getString(0), r.getString(2)))
    got shouldBe Array(
      ("a.ex", "https://a.ex/pre.xml"), ("a.ex", "https://a.ex/post.xml"))
  }

  test("politenessBudgets + selectBatch: a declared delay tightens the per-host cap, never widens it") {
    val delays = Seq(("slow.ex", 300.0), ("fast.ex", 0.5),
      ("zero.ex", 0.0), ("tiny.ex", 1e-9))
      .toDF("domain", "crawl_delay_s")
    val budgets = CrawlFrontier.politenessBudgets(delays, windowS = 600)
    // 'Crawl-delay: 0' and any sub-nanosecond delay mean UNTHROTTLED
    // (Int.MaxValue), never an int overflow that would starve the host
    budgets.collect().map(r => r.getString(0) -> r.getInt(1)).toMap shouldBe
      Map("slow.ex" -> 2, "fast.ex" -> 1200,
        "zero.ex" -> Int.MaxValue, "tiny.ex" -> Int.MaxValue)
    val f = mkFrontier(
      (1 to 5).map(i => row(s"https://slow.ex/$i")) ++
      (1 to 5).map(i => row(s"https://fast.ex/$i")) ++
      (1 to 5).map(i => row(s"https://none.ex/$i")))
    val urls = CrawlFrontier.selectBatch(f, 2000L, 100, 3, Some(budgets))
      .collect().map(_.getString(0))
    urls.count(_.contains("slow.ex")) shouldBe 2 // 600s / 300s delay
    urls.count(_.contains("fast.ex")) shouldBe 3 // budget never widens
    urls.count(_.contains("none.ex")) shouldBe 3 // unbudgeted = global
  }

  // ——— revisit law —————————————————————————————————————————————————

  test("politeness budgets carry ACROSS waves: a second wave in the same window gets only the remainder, a window rollover re-grants, stale usage rows drop") {
    def mk(host: String, n: Int): Seq[(String, String, Int, Double, Long,
        Int, Option[Long], Option[String], Long, Long, String)] =
      (0 until n).map(i => row(s"https://$host/p$i",
        priority = 1.0 - i * 0.1))
    val f = mkFrontier(mk("a.ex", 5) ++ mk("b.ex", 5) ++ mk("c.ex", 5))
    val budgets = Seq(("a.ex", 3), ("b.ex", 2)).toDF("host", "cap")
    val empty = budgets.select(col("host"), lit(0L).as("window_start"),
      lit(0L).as("used")).filter(lit(false))
    def hostsOf(b: DataFrame): Map[String, Int] =
      b.groupBy("host").count().collect()
        .map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    // wave 1 (window [600,1200)): full budgets; c.ex unbudgeted →
    // the global cap
    val w1 = CrawlFrontier.selectBatch(f, now = 1000L, batchSize = 100,
      perHostCap = 4, hostBudgets = Some(
        CrawlFrontier.remainingBudgets(budgets, empty, 1000L, 600L)))
    hostsOf(w1) shouldBe Map("a.ex" -> 3, "b.ex" -> 2, "c.ex" -> 4)
    val usage1 = CrawlFrontier.updateHostUsage(empty, w1, 1000L, 600L)
    // wave 2, SAME window: budgeted hosts exhausted — they sit it
    // out; the unbudgeted host just keeps the global cap
    val f2 = f.join(w1.select("url"), Seq("url"), "left_anti")
    val w2 = CrawlFrontier.selectBatch(f2, now = 1100L, batchSize = 100,
      perHostCap = 4, hostBudgets = Some(
        CrawlFrontier.remainingBudgets(budgets, usage1, 1100L, 600L)))
    hostsOf(w2) shouldBe Map("c.ex" -> 1)
    // wave 3 crosses into window [1200,1800): budgets re-grant
    val f3 = f2.join(w2.select("url"), Seq("url"), "left_anti")
    val usage2 = CrawlFrontier.updateHostUsage(usage1, w2, 1100L, 600L)
    val w3 = CrawlFrontier.selectBatch(f3, now = 1300L, batchSize = 100,
      perHostCap = 4, hostBudgets = Some(
        CrawlFrontier.remainingBudgets(budgets, usage2, 1300L, 600L)))
    hostsOf(w3) shouldBe Map("a.ex" -> 2, "b.ex" -> 2)
    // the maintained frame: new-window counts only, stale rows gone
    val u3 = CrawlFrontier.updateHostUsage(usage2, w3, 1300L, 600L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    u3 shouldBe Map("a.ex" -> ((1200L, 2L)), "b.ex" -> ((1200L, 2L)))
  }

  private val rv = Revisit(minIntervalS = 100L, maxIntervalS = 10000L,
    grow = 2.0, shrink = 2.0, maxFails = 2)

  test("recrawlSchedule: changed halves (clamped), unchanged doubles (clamped), 404 dies, failures back off to dead; untouched rows pass through") {
    val f = mkFrontier(Seq(
      row("https://a.example/changed", interval = 1000L, hash = Some("old")),
      row("https://a.example/floor", interval = 150L, hash = Some("old")),
      row("https://a.example/same", interval = 1000L, hash = Some("h1")),
      row("https://a.example/ceil", interval = 9000L, hash = Some("h2")),
      row("https://a.example/gone", interval = 1000L, hash = Some("h3"),
        fetches = 7L),
      row("https://a.example/fail1", interval = 1000L, fails = 0),
      row("https://a.example/fail2", interval = 1000L, fails = 1),
      row("https://a.example/untouched", interval = 777L)))
    val fetched = Seq(
      ("https://a.example/changed", 2000L, 200, Some("new")),
      ("https://a.example/floor", 2000L, 200, Some("new")),
      ("https://a.example/same", 2000L, 200, Some("h1")),
      ("https://a.example/ceil", 2000L, 200, Some("h2")),
      ("https://a.example/gone", 2000L, 404, None: Option[String]),
      ("https://a.example/fail1", 2000L, 503, None: Option[String]),
      ("https://a.example/fail2", 2000L, 0, None: Option[String]))
      .toDF("url", "fetch_ts", "status", "content_hash")
    val out = CrawlFrontier.recrawlSchedule(f, fetched, rv)
    out.count() shouldBe 8 // full frontier, nothing dropped
    val m = out.collect().map(r => r.getString(0) -> r).toMap
    def g(u: String) = m(s"https://a.example/$u")
    // changed: 1000/2=500, hash updated, next = 2000+500
    g("changed").getLong(8) shouldBe 500L
    g("changed").getString(7) shouldBe "new"
    g("changed").getLong(9) shouldBe 2500L
    g("changed").getInt(5) shouldBe 0
    // floor clamp: 150/2=75 → 100
    g("floor").getLong(8) shouldBe 100L
    // unchanged: 1000*2=2000
    g("same").getLong(8) shouldBe 2000L
    g("same").getString(7) shouldBe "h1"
    // ceil clamp: 9000*2=18000 → 10000
    g("ceil").getLong(8) shouldBe 10000L
    // gone: dead, interval kept, hash kept, fetch_count bumped, and
    // the clock FROZEN at the death fetch (corpses land in the
    // death-day bucket — what makes GC's day bound sound)
    g("gone").getString(10) shouldBe "dead"
    g("gone").getLong(8) shouldBe 1000L
    g("gone").getLong(4) shouldBe 8L
    g("gone").getLong(9) shouldBe 2000L
    // first transient failure: backoff, still active, fail_count 1
    g("fail1").getString(10) shouldBe "active"
    g("fail1").getInt(5) shouldBe 1
    g("fail1").getLong(8) shouldBe 2000L
    // second consecutive failure hits maxFails=2 → dead, clock frozen
    g("fail2").getString(10) shouldBe "dead"
    g("fail2").getInt(5) shouldBe 2
    g("fail2").getLong(9) shouldBe 2000L
    // untouched row byte-identical
    g("untouched").getLong(8) shouldBe 777L
    g("untouched").getLong(4) shouldBe 0L
    g("untouched").getString(10) shouldBe "active"
  }

  test("recrawlSchedule: the LATEST attempt per url wins when a cycle retried") {
    val f = mkFrontier(Seq(
      row("https://a.example/p", interval = 1000L, hash = Some("h"))))
    val fetched = Seq(
      ("https://a.example/p", 2000L, 503, None: Option[String]),
      ("https://a.example/p", 3000L, 200, Some("h"))) // retry succeeded
      .toDF("url", "fetch_ts", "status", "content_hash")
    val out = CrawlFrontier.recrawlSchedule(f, fetched, rv).collect()(0)
    out.getString(10) shouldBe "active"
    out.getInt(5) shouldBe 0
    out.getLong(9) shouldBe 3000L + 2000L // latest ts + doubled interval
  }

  test("recrawlUpdates: batch/stream row parity — the stateless law runs unchanged on a fetch-result stream") {
    val f = mkFrontier(Seq(
      row("https://a.example/p", interval = 1000L, hash = Some("old")),
      row("https://a.example/q", interval = 1000L, hash = Some("k"))))
    val events = Seq(
      ("https://a.example/p", 2000L, 200, Some("new")),
      ("https://a.example/q", 2000L, 404, None: Option[String]))
    val batch = CrawlFrontier.recrawlUpdates(
      events.toDF("url", "fetch_ts", "status", "content_hash"), f, rv)
      .orderBy("url").collect().map(_.toString)

    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, Long, Int, Option[String])]
    val stream = CrawlFrontier.recrawlUpdates(
      input.toDF().toDF("url", "fetch_ts", "status", "content_hash"), f, rv)
    val q = stream.writeStream.format("memory")
      .queryName("crawl_updates_parity").outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("crawl_updates_parity")
        .orderBy("url").collect().map(_.toString)
      streamed shouldBe batch
    } finally q.stop()
  }

  // ——— the 3xx regime ——————————————————————————————————————————————

  test("redirect law: 301/308 retire the row as 'redirected' (healthy answer), 302/307 keep it on the unchanged schedule, a 3xx missing Location stays a transient failure") {
    val f = mkFrontier(Seq(
      row("https://a.example/p301", interval = 1000L, fails = 1,
        hash = Some("h1")),
      row("https://a.example/p308", interval = 1000L, fails = 0),
      row("https://a.example/p302", interval = 1000L, fails = 1,
        hash = Some("h2")),
      row("https://a.example/p307", interval = 1000L, fails = 0),
      row("https://a.example/noloc", interval = 1000L, fails = 1)))
    val fetched = Seq(
      ("https://a.example/p301", 2000L, 301,
        Some("https://a.example/t1")),
      ("https://a.example/p308", 2000L, 308,
        Some("https://a.example/t2")),
      ("https://a.example/p302", 2000L, 302,
        Some("https://a.example/elsewhere")),
      ("https://a.example/p307", 2000L, 307,
        Some("https://a.example/elsewhere")),
      ("https://a.example/noloc", 2000L, 301, None: Option[String]))
      .toDF("url", "fetch_ts", "status", "location")
      .withColumn("content_hash", lit(null).cast("string"))
    val m = CrawlFrontier.recrawlSchedule(f, fetched, rv).collect()
      .map(r => r.getString(0) -> r).toMap
    def g(u: String) = m(s"https://a.example/$u")
    Seq("p301", "p308").foreach { u =>
      g(u).getString(10) shouldBe "redirected"
      g(u).getInt(5) shouldBe 0          // healthy answer: fails reset
      g(u).getLong(8) shouldBe 1000L     // retired row keeps interval
      g(u).getLong(4) shouldBe 1L        // the attempt still counts
      g(u).getLong(9) shouldBe 2000L     // the retired clock stops
    }
    g("p301").getString(7) shouldBe "h1" // content kept, not wiped
    Seq("p302", "p307").foreach { u =>
      g(u).getString(10) shouldBe "active"
      g(u).getInt(5) shouldBe 0
      g(u).getLong(8) shouldBe 2000L     // unchanged law: interval grows
      g(u).getLong(9) shouldBe 2000L + 2000L
    }
    // malformed 301 (no Location): second consecutive failure at
    // maxFails=2 → dead, exactly the pre-redirect law — and the dead
    // row's clock freezes at the death fetch (the GC day-bucket law)
    g("noloc").getString(10) shouldBe "dead"
    g("noloc").getInt(5) shouldBe 2
    g("noloc").getLong(9) shouldBe 2000L
  }

  test("redirectAdmissions: targets admitted at the SOURCE's depth through admit's full gate; known targets and temp redirects mint nothing; latest attempt wins; a 2-cycle terminates") {
    val f = mkFrontier(Seq(
      row("https://a.example/moved"), row("https://a.example/known"),
      row("https://a.example/temp"), row("https://a.example/retry"),
      row("https://a.example/cyc1"), row("https://a.example/cyc2")))
      .withColumn("depth", when(col("url").endsWith("moved"), lit(3))
        .otherwise(lit(0)))
    val fetched = Seq(
      ("https://a.example/moved", 2000L, 301,
        Some("https://a.example/target")),
      ("https://a.example/known", 2000L, 308,
        Some("https://a.example/temp")),      // already a frontier row
      ("https://a.example/temp", 2000L, 302,
        Some("https://a.example/tmp-target")), // temporary: no admission
      ("https://a.example/retry", 2000L, 301,
        Some("https://a.example/stale")),
      ("https://a.example/retry", 3000L, 301,
        Some("https://a.example/fresh")),      // latest attempt wins
      ("https://a.example/cyc1", 2000L, 301,
        Some("https://a.example/cyc2")),       // both ends known:
      ("https://a.example/cyc2", 2000L, 301,
        Some("https://a.example/cyc1")))       // the cycle mints nothing
      .toDF("url", "fetch_ts", "status", "location")
      .withColumn("content_hash", lit(null).cast("string"))
    val adm = CrawlFrontier.redirectAdmissions(fetched, f, now = 5000L)
      .orderBy("url").collect()
    adm.map(_.getString(0)) shouldBe Array(
      "https://a.example/fresh", "https://a.example/target")
    val byUrl = adm.map(r => r.getString(0) -> r).toMap
    val t = byUrl("https://a.example/target")
    t.getInt(2) shouldBe 3                  // the SOURCE's depth
    t.getDouble(3) shouldBe 0.25            // 1/(1+3)
    t.getLong(9) shouldBe 5000L             // due now
    t.getString(10) shouldBe "active"
    byUrl("https://a.example/fresh").getInt(2) shouldBe 0
    // the permanent-alias edge frame: canonical endpoints, temp
    // redirects absent, latest-wins — resolveRedirects-ready
    val edges = CrawlFrontier.redirectEdges(fetched).orderBy("src")
      .collect().map(r => (r.getString(0), r.getString(1)))
    edges shouldBe Array(
      ("https://a.example/cyc1", "https://a.example/cyc2"),
      ("https://a.example/cyc2", "https://a.example/cyc1"),
      ("https://a.example/known", "https://a.example/temp"),
      ("https://a.example/moved", "https://a.example/target"),
      ("https://a.example/retry", "https://a.example/fresh"))
  }

  test("fetchResults: the wire→law bridge — decoded raw captures drive the revisit law, redirect admissions, the robots cadence and the politeness headers end to end") {
    import graft.io.Warc
    def http(status: String, headers: String, body: String): Array[Byte] = {
      val b = body.getBytes("UTF-8")
      (s"HTTP/1.1 $status\r\n" +
        "Content-Type: text/html; charset=utf-8\r\n" + headers +
        s"Content-Length: ${b.length}\r\n\r\n").getBytes("US-ASCII") ++ b
    }
    val shard = Warc.writeRecordShardGz(Seq(
      ("https://w.ex/ok", http("200 OK",
        "ETag: \"v1\"\r\nLast-Modified: Wed, 07 Jan 2026 00:00:00 GMT\r\n",
        "hello")),
      ("https://w.ex/moved", http("301 Moved Permanently",
        "Location: /target\r\n", "")), // RELATIVE — must resolve
      ("https://w.ex/nolocation", http("301 Moved Permanently", "", "")),
      ("https://w.ex/busy", http("503 Service Unavailable",
        "Retry-After: 7200\r\n", "")),
      ("https://w.ex/robots.txt", http("200 OK",
        "Cache-Control: public, max-age=7200\r\n",
        "User-agent: *\nDisallow:\n"))),
      "response", "application/http;msgtype=response")
    val fr = CrawlFrontier.fetchResults(
      Warc.fromShardsDecoded(Seq((1L, shard)).toDF("id", "shard")),
      fetchTs = 2000L).localCheckpoint(true)
    val m = fr.collect().map(r => r.getString(0) -> r).toMap
    // (url, fetch_ts, status, content_hash, etag, last_modified,
    //  retry_after, max_age, location)
    val ok = m("https://w.ex/ok")
    ok.getInt(2) shouldBe 200
    ok.getString(3) shouldBe java.security.MessageDigest
      .getInstance("MD5").digest("hello".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    ok.getString(4) shouldBe "\"v1\"" // verbatim, quotes included
    ok.getLong(5) shouldBe 1767744000L
    m("https://w.ex/moved").getString(8) shouldBe "https://w.ex/target"
    m("https://w.ex/moved").isNullAt(3) shouldBe true // no hash off 3xx
    m("https://w.ex/nolocation").isNullAt(8) shouldBe true // '' → null
    m("https://w.ex/busy").getLong(6) shouldBe 7200L
    m("https://w.ex/robots.txt").getLong(7) shouldBe 7200L
    // and the laws consume it UNCHANGED: revisit + redirect + robots
    val f = mkFrontier(Seq(row("https://w.ex/ok", interval = 3600L),
      row("https://w.ex/moved"), row("https://w.ex/nolocation"),
      row("https://w.ex/busy", interval = 3600L),
      row("https://w.ex/robots.txt")))
    val isR = CrawlFrontier.isRobotsUrl(col("url"))
    val upd = CrawlFrontier.recrawlUpdates(fr.filter(!isR), f, rv)
      .collect().map(r => r.getString(0) -> r).toMap
    upd("https://w.ex/ok").getString(11) shouldBe "\"v1\""
    upd("https://w.ex/ok").getLong(12) shouldBe 1767744000L
    upd("https://w.ex/moved").getString(10) shouldBe "redirected"
    upd("https://w.ex/nolocation").getString(10) shouldBe "active"
    upd("https://w.ex/nolocation").getInt(5) shouldBe 1 // a failure
    // Retry-After 7200 beats the doubled 3600 exactly at par → 9200
    upd("https://w.ex/busy").getLong(9) shouldBe 2000L + 7200L
    CrawlFrontier.redirectAdmissions(fr, f, now = 2500L)
      .select("url").as[String].collect().toSeq shouldBe
      Seq("https://w.ex/target")
    val rb = CrawlFrontier.robotsRecrawlUpdates(fr.filter(isR), f,
      refreshIntervalS = 86400L).collect()(0)
    rb.getLong(8) shouldBe 86400L // the cadence survives the max-age
    rb.getLong(9) shouldBe 2000L + 7200L // …which postpones this once
  }

  test("archivePlan → revisit writer: the cycle's unchanged half becomes linkage records, the changed half keeps its body, errors store nothing") {
    import graft.io.Warc
    val f = mkFrontier(Seq(
      row("https://ar.ex/same", hash = Some("h1")),
      row("https://ar.ex/cond", hash = Some("h2")),
      row("https://ar.ex/changed", hash = Some("h3")),
      row("https://ar.ex/first"),
      row("https://ar.ex/condfirst"), // 304 but NO held capture
      row("https://ar.ex/err", hash = Some("h5"))))
    val fetched = Seq(
      ("https://ar.ex/same", 2000L, 200, Some("h1")),   // same hash
      ("https://ar.ex/cond", 2000L, 304, None),          // validator hit
      ("https://ar.ex/changed", 2000L, 200, Some("NEW")),
      ("https://ar.ex/first", 2000L, 200, Some("h4")),
      ("https://ar.ex/condfirst", 2000L, 304, None),
      ("https://ar.ex/err", 2000L, 503, None))
      .toDF("url", "fetch_ts", "status", "content_hash")
    val plan = CrawlFrontier.archivePlan(fetched, f)
      .orderBy("url").collect()
    // condfirst absent: a 304 with nothing to refer to stores nothing
    plan.map(r => (r.getString(0), r.getString(1))) shouldBe Array(
      ("https://ar.ex/changed", "response"),
      ("https://ar.ex/cond", "revisit"),
      ("https://ar.ex/first", "response"),
      ("https://ar.ex/same", "revisit"))
    val byUrl = plan.map(r => r.getString(0) -> r).toMap
    // the 2xx-verified identity vs the server's 304 assertion carry
    // DIFFERENT profiles — §6.7.2 vs §6.7.3
    byUrl("https://ar.ex/same").getString(4) shouldBe
      Warc.RevisitIdenticalDigest
    byUrl("https://ar.ex/cond").getString(4) shouldBe
      Warc.RevisitServerNotModified
    // the revisit slice feeds the WARC writer directly and resolves
    // back to its own prior capture, profile riding
    val back = Warc.fromRevisitShards(Warc.toRevisitShards(
      CrawlFrontier.archivePlan(fetched, f)
        .filter(col("kind") === "revisit")
        .select("url", "refers_to", "payload_digest", "profile")))
      .orderBy("target_uri").collect()
    back.map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getString(3))) shouldBe
      Array(
        ("https://ar.ex/cond", "https://ar.ex/cond", "md5:h2",
          Warc.RevisitServerNotModified),
        ("https://ar.ex/same", "https://ar.ex/same", "md5:h1",
          Warc.RevisitIdenticalDigest))
  }

  test("fetchRequests + imfFixdateEpoch are session-timezone-free: a non-UTC session renders and parses the same GMT instants") {
    import graft.functions.TextExtraction.imfFixdateEpoch
    import java.time.format.DateTimeFormatter
    import java.time.{Instant, ZoneOffset}
    import java.util.Locale
    val ref = DateTimeFormatter
      .ofPattern("EEE, dd MMM yyyy HH:mm:ss 'GMT'", Locale.US)
      .withZone(ZoneOffset.UTC)
    // winter (EST, -5), summer (EDT, -4), and epochs landing inside
    // the US DST transitions — the offsets a session-zone leak would
    // shift by
    val epochs = Seq(1767744000L, 1754000000L, 1772930000L, 1761040000L,
      0L, 86399L)
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val f = epochs.toDF("epoch").select(
        concat(lit("https://tz.ex/"), col("epoch")).as("url"),
        lit("tz.ex").as("host"),
        lit(null).cast("string").as("etag"),
        col("epoch").as("last_modified"))
      val got = CrawlFrontier.fetchRequests(f)
        .select(col("url"), col("if_modified_since"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      epochs.foreach { e =>
        got(s"https://tz.ex/$e") shouldBe
          ref.format(Instant.ofEpochSecond(e))
      }
      // parse side under the same non-UTC session
      val parsed = epochs.map(e => ref.format(Instant.ofEpochSecond(e)))
        .toDF("s").select(imfFixdateEpoch(col("s"))).as[Long]
        .collect().toSeq
      parsed shouldBe epochs
    } finally spark.conf.set(tzKey, saved)
  }

  // ——— admit ———————————————————————————————————————————————————————

  test("admit: canonicalize, min-depth collapse, depth bound, anti-join vs frontier, priority law") {
    val f = mkFrontier(Seq(row("https://a.ex0.com/existing")))
    val disc = Seq(
      ("https://a.ex0.com/existing?utm_source=x", 1), // already known
      ("https://a.ex0.com/sub/../existing", 1),       // known, dot-spelled
      ("https://a.ex0.com/new", 2),
      ("https://a.ex0.com/new#frag", 1),              // same page, shallower
      ("https://a.ex0.com/./x/../new", 3),            // same page, dotted
      ("https://a.ex0.com/deep", 9),                  // over maxDepth
      ("mailto:x@y.z", 1))
      .toDF("url", "depth")
    val out = CrawlFrontier.admit(f, disc, now = 500L, maxDepth = 8)
      .collect()
    out.length shouldBe 1
    out(0).getString(0) shouldBe "https://a.ex0.com/new"
    out(0).getInt(2) shouldBe 1                 // min depth won
    out(0).getDouble(3) shouldBe 0.5            // 1/(1+1)
    out(0).getLong(9) shouldBe 500L
  }

  test("admit: per-registered-domain budget counts existing frontier rows; co.uk slices correctly") {
    val f = mkFrontier(Seq(
      row("https://x.site1.com/a"), row("https://y.site1.com/b")))
    val disc = Seq(
      ("https://z.site1.com/c", 1), // domain site1.com: 2 existing + this
      ("https://z.site1.com/d", 1), // would be 4th → cut by cap 3
      ("https://a.b.co.uk/p", 1),   // domain b.co.uk (3-label suffix rule)
      ("https://c.b.co.uk/q", 1))
      .toDF("url", "depth")
    val out = CrawlFrontier.admit(f, disc, now = 500L, maxDepth = 8,
      perDomainCap = 3L)
    val urls = out.collect().map(_.getString(0)).sorted
    // site1.com admits exactly 1 (2 existing + cap 3); b.co.uk has 0
    // existing so admits up to 3 → both
    urls shouldBe Array("https://a.b.co.uk/p", "https://c.b.co.uk/q",
      "https://z.site1.com/c")
  }

  test("admit: a maintained stats frame replaces the frontier scan; uncapped skips the domain machinery entirely") {
    val f = mkFrontier(Seq(row("https://x.site1.com/a")))
    val disc = Seq(("https://z.site1.com/new", 1)).toDF("url", "depth")
    // stats say site1.com already holds 10 rows → cap 5 admits nothing
    val stats = Seq(("site1.com", 10L)).toDF("domain", "n_existing")
    CrawlFrontier.admit(f, disc, 500L, perDomainCap = 5L,
      existingCounts = Some(stats)).count() shouldBe 0L
    // uncapped: no Window in the plan (the domain rank never runs)
    val un = CrawlFrontier.admit(f, disc, 500L)
    val plan = un.queryExecution.executedPlan.toString
    withClue(plan) { plan should not include "Window" }
    un.count() shouldBe 1L
  }

  test("store-held frontier: revisit updates upsert into the snapshot store, replays converge, untouched rows keep serving") {
    import graft.streaming.StreamingOps
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-fstore")
      .toString + "/frontier"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-fstore-ck").toString
    type Ev = (String, Long, String, String, Int, Double, Long, Int,
      Option[Long], Option[String], Long, Long, String, Option[String],
      Option[Long])
    val payloadCols = Seq("host", "depth", "priority", "fetch_count",
      "fail_count", "last_fetch_ts", "content_hash", "interval_s",
      "next_fetch_ts", "state", "etag", "last_modified")
    // frontier-shaped rows → change events at `seq` (column order is
    // the frontier contract's)
    def toEvents(df: DataFrame, seq: Long): Seq[Ev] =
      df.collect().map { r => (r.getString(0), seq, "upsert",
        r.getString(1), r.getInt(2), r.getDouble(3), r.getLong(4),
        r.getInt(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)),
        if (r.isNullAt(7)) None else Some(r.getString(7)),
        r.getLong(8), r.getLong(9), r.getString(10),
        if (r.isNullAt(11)) None else Some(r.getString(11)),
        if (r.isNullAt(12)) None else Some(r.getLong(12))) }.toSeq
    // the encoder derives from the literal tuple type, not the alias
    val input = MemoryStream[(String, Long, String, String, Int, Double,
      Long, Int, Option[Long], Option[String], Long, Long, String,
      Option[String], Option[Long])]
    val query = StreamingOps.snapshotUpsertSink(
        input.toDF().toDF(("url" +: "seq" +: "op" +: payloadCols): _*),
        root, idCol = "url", seqCol = "seq", opCol = "op",
        payloadCols = payloadCols, numBuckets = 4)
      .option("checkpointLocation", ckpt).start()
    try {
      // cycle 0: seed → initial publish at seq 0
      val seeds = CrawlFrontier.seed(
        Seq("https://a.example/p", "https://a.example/q",
          "https://b.example/r").toDF("url"),
        now = 1000L, defaultIntervalS = 1000L)
      input.addData(toEvents(seeds, 0L): _*); query.processAllAvailable()
      val served = StreamingOps.readSnapshot(spark, root).get
      served.count() shouldBe 3
      // cycle 1: one fetch result against the SERVED frontier → the
      // changed-rows-only face is exactly the next upsert batch
      val fetched = Seq(("https://a.example/p", 2000L, 200, Some("h1")))
        .toDF("url", "fetch_ts", "status", "content_hash")
      val updates = CrawlFrontier.recrawlUpdates(fetched, served, rv)
      updates.count() shouldBe 1
      val evs = toEvents(updates, 2000L)
      input.addData(evs: _*); query.processAllAvailable()
      def state(): Map[String, (Long, Long, String)] =
        StreamingOps.readSnapshot(spark, root).get
          .select("url", "interval_s", "next_fetch_ts", "state")
          .collect()
          .map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      val s1 = state()
      // changed page: interval halved (1000→500), rescheduled from the
      // fetch time; untouched rows serve their seeded schedule intact
      s1("https://a.example/p") shouldBe ((500L, 2500L, "active"))
      s1("https://a.example/q") shouldBe ((1000L, 1000L, "active"))
      s1("https://b.example/r") shouldBe ((1000L, 1000L, "active"))
      // at-least-once: replaying the same update batch converges (the
      // store's max-seq idempotence, the contract recrawlUpdates
      // documents)
      input.addData(evs: _*); query.processAllAvailable()
      state() shouldBe s1
    } finally query.stop()
  }

  test("store-held standing loop WITH robots rows: both row kinds live in the snapshot store, results route by isRobotsUrl, the rules frame maintains read-modify-write, a robots change flips admission through the store") {
    import graft.functions.Robots
    import graft.streaming.StreamingOps
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-scl-robots").toString
    val root = s"$base/frontier"
    val rulesDir = s"$base/rules"
    val payloadCols = Seq("host", "depth", "priority", "fetch_count",
      "fail_count", "last_fetch_ts", "content_hash", "interval_s",
      "next_fetch_ts", "state", "etag", "last_modified")
    val contract = "url" +: payloadCols
    def toEvents(df: DataFrame, seq: Long) =
      df.collect().map { r => (r.getString(0), seq, "upsert",
        r.getString(1), r.getInt(2), r.getDouble(3), r.getLong(4),
        r.getInt(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)),
        if (r.isNullAt(7)) None else Some(r.getString(7)),
        r.getLong(8), r.getLong(9), r.getString(10),
        if (r.isNullAt(11)) None else Some(r.getString(11)),
        if (r.isNullAt(12)) None else Some(r.getLong(12))) }.toSeq
    val input = MemoryStream[(String, Long, String, String, Int, Double,
      Long, Int, Option[Long], Option[String], Long, Long, String,
      Option[String], Option[Long])]
    val q = StreamingOps.snapshotUpsertSink(
        input.toDF().toDF(("url" +: "seq" +: "op" +: payloadCols): _*),
        root, idCol = "url", seqCol = "seq", opCol = "op",
        payloadCols = payloadCols, numBuckets = 4)
      .option("checkpointLocation", s"$base/ckpt").start()
    def served(): DataFrame = StreamingOps.readSnapshot(spark, root).get
      .select(contract.map(col): _*)
    def saveRules(df: DataFrame): Unit = {
      val tmp = s"$rulesDir.next"
      df.write.mode("overwrite").parquet(tmp)
      val old = new java.io.File(rulesDir)
      if (old.exists()) {
        val bak = new java.io.File(s"$rulesDir.old")
        old.renameTo(bak)
        new java.io.File(tmp).renameTo(old)
        org.apache.commons.io.FileUtils.deleteDirectory(bak)
      } else new java.io.File(tmp).renameTo(old)
    }
    // one store seeds BOTH kinds: the origin's robots row (priority
    // 2.0, fixed 24 h cadence) and its pages
    val seeds = CrawlFrontier.robotsSeeds(Seq("a.ex").toDF("host"),
        now = 1000L)
      .unionByName(CrawlFrontier.seed(
        Seq("https://a.ex/ok/0", "https://a.ex/blocked/0").toDF("url"),
        now = 1000L, defaultIntervalS = 1000L))
    def cycle(now: Long, robotsTxt: Option[(Int, String)])
        : (Seq[String], Seq[String]) = {
      val sv = served().localCheckpoint(true)
      val batch = CrawlFrontier.selectBatch(sv, now,
        batchSize = 10, perHostCap = 10).localCheckpoint(true)
      val isR = CrawlFrontier.isRobotsUrl(col("url"))
      val robotsBatch = batch.filter(isR)
      val pageBatch = batch.filter(!isR)
      var events = Seq.empty[(String, Long, String, String, Int, Double,
        Long, Int, Option[Long], Option[String], Long, Long, String,
        Option[String], Option[Long])]
      robotsTxt.foreach { case (status, txt) =>
        val fetched = robotsBatch.select(col("host").as("domain"),
          lit(status).as("status"), lit(txt).as("robots_txt"),
          lit(now + 1L).as("fetch_ts"))
        val fresh = Robots.rulesFromFetch(fetched, "graftbot")
        saveRules(if (new java.io.File(rulesDir).exists())
          Robots.updateRules(spark.read.parquet(rulesDir), fresh)
        else fresh)
        events ++= toEvents(CrawlFrontier.robotsRecrawlUpdates(
          robotsBatch.select(col("url"), lit(now + 1L).as("fetch_ts"),
            lit(status).as("status"),
            lit(null).cast("string").as("content_hash")), sv), now)
      }
      val pageResults = pageBatch.select(col("url"),
        lit(now + 2L).as("fetch_ts"), lit(200).as("status"),
        md5(concat(lit(now.toString), col("url"))).as("content_hash"))
      val disc = pageBatch.select(
        regexp_replace(col("url"), "/[0-9]+$", s"/$now").as("url"),
        (col("depth") + 1).as("depth"))
      val admitted = CrawlFrontier.admit(sv,
        CrawlFrontier.gateRobots(disc, spark.read.parquet(rulesDir)),
        now).localCheckpoint(true)
      events ++= toEvents(
        CrawlFrontier.recrawlUpdates(pageResults, sv)
          .unionByName(admitted), now)
      input.addData(events: _*); q.processAllAvailable()
      (batch.select("url").as[String].collect().sorted.toSeq,
        admitted.select("url").as[String].collect().sorted.toSeq)
    }
    try {
      // seed at seq 0: wave events carry seq=now, and the max-seq
      // upsert must see every wave STRICTLY after the seed
      input.addData(toEvents(seeds, 0L): _*); q.processAllAvailable()
      // wave 1: robots row leads through the STORE's served frontier;
      // rules land disallowing /blocked — the admit gate holds
      val (b1, a1) = cycle(1000L, Some((200,
        "User-agent: *\nDisallow: /blocked\n")))
      b1 should contain("https://a.ex/robots.txt")
      a1 shouldBe Seq("https://a.ex/ok/1000")
      // wave 2 two hours on: robots not due (24 h cadence held by the
      // store's row), pages due; the MAINTAINED rules still gate
      val (b2, a2) = cycle(1000L + 7200L, None)
      b2 should not contain "https://a.ex/robots.txt"
      a2.foreach(u => u should not include "/blocked")
      // wave 3 past the cadence: the refresh reads a CHANGED
      // robots.txt (allow-all) — the same chain now admits /blocked
      val (b3, a3) = cycle(1000L + 86400L + 7300L, Some((200,
        "User-agent: *\nDisallow:\n")))
      b3 should contain("https://a.ex/robots.txt")
      a3.exists(_.contains("/blocked")) shouldBe true
      // the robots row survived in the STORE on its fixed cadence
      val rrow = served().filter(CrawlFrontier.isRobotsUrl(col("url")))
        .collect()(0)
      rrow.getString(10) shouldBe "active"
      rrow.getLong(9) shouldBe (1000L + 86400L + 7300L + 1L + 86400L)
    } finally q.stop()
  }

  test("store-held standing loop WITH sitemap rows: the feed row routes by isSitemapUrl, its body folds through reseed+seed in the same cycle, a changed lastmod pulls EXACTLY its page row due with zero churn for the re-announced rest, the feed cadence holds") {
    import graft.streaming.StreamingOps
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-scl-sitemap").toString
    val root = s"$base/frontier"
    val payloadCols = Seq("host", "depth", "priority", "fetch_count",
      "fail_count", "last_fetch_ts", "content_hash", "interval_s",
      "next_fetch_ts", "state", "etag", "last_modified")
    val contract = "url" +: payloadCols
    def toEvents(df: DataFrame, seq: Long) =
      df.collect().map { r => (r.getString(0), seq, "upsert",
        r.getString(1), r.getInt(2), r.getDouble(3), r.getLong(4),
        r.getInt(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)),
        if (r.isNullAt(7)) None else Some(r.getString(7)),
        r.getLong(8), r.getLong(9), r.getString(10),
        if (r.isNullAt(11)) None else Some(r.getString(11)),
        if (r.isNullAt(12)) None else Some(r.getLong(12))) }.toSeq
    val input = MemoryStream[(String, Long, String, String, Int, Double,
      Long, Int, Option[Long], Option[String], Long, Long, String,
      Option[String], Option[Long])]
    val q = StreamingOps.snapshotUpsertSink(
        input.toDF().toDF(("url" +: "seq" +: "op" +: payloadCols): _*),
        root, idCol = "url", seqCol = "seq", opCol = "op",
        payloadCols = payloadCols, numBuckets = 4)
      .option("checkpointLocation", s"$base/ckpt").start()
    def served(): DataFrame = StreamingOps.readSnapshot(spark, root).get
      .select(contract.map(col): _*)
    val T0 = 1754000000L
    // a feed body: p1's lastmod varies per wave, p2's stays 2025-01-01
    // (older than any fetch in the test — a pure re-announcement)
    def body(p1Lastmod: String): String =
      s"""<urlset>
         |<url><loc>https://a.ex/p1</loc><lastmod>$p1Lastmod</lastmod>
         |<changefreq>monthly</changefreq></url>
         |<url><loc>https://a.ex/p2</loc><lastmod>2025-01-01</lastmod>
         |<changefreq>monthly</changefreq></url>
         |</urlset>""".stripMargin
    // one cycle: select off the SERVED store, route by isSitemapUrl,
    // feed rows take the sitemap law + their body folds entries in the
    // same step, page rows take the page law
    def cycle(now: Long, p1Lastmod: String)
        : (Seq[String], Seq[String]) = {
      val sv = served().localCheckpoint(true)
      val batch = CrawlFrontier.selectBatch(sv, now,
        batchSize = 10, perHostCap = 10).localCheckpoint(true)
      val isSm = CrawlFrontier.isSitemapUrl(col("url"))
      val smBatch = batch.filter(isSm)
      val pageBatch = batch.filter(!isSm)
      var events = toEvents(CrawlFrontier.recrawlUpdates(
        pageBatch.select(col("url"), lit(now + 1L).as("fetch_ts"),
          lit(200).as("status"),
          md5(concat(lit(now.toString), col("url"))).as("content_hash")),
        sv), now)
      var folded = Seq.empty[String]
      if (smBatch.count() > 0) {
        events ++= toEvents(CrawlFrontier.sitemapRecrawlUpdates(
          smBatch.select(col("url"), lit(now + 1L).as("fetch_ts"),
            lit(200).as("status"),
            md5(lit(p1Lastmod)).as("content_hash")), sv), now)
        val entries = Seq(body(p1Lastmod)).toDF("xml")
          .select(explode(Sitemaps.urlEntries(col("xml"))))
          .select(col("col.*"))
        val fold = CrawlFrontier.sitemapFold(sv, entries, now)
          .localCheckpoint(true)
        folded = fold.select("url").as[String].collect().sorted.toSeq
        events ++= toEvents(fold, now)
      }
      input.addData(events: _*); q.processAllAvailable()
      (batch.select("url").as[String].collect().sorted.toSeq, folded)
    }
    try {
      val seeds = CrawlFrontier.sitemapSeeds(
        Seq("https://a.ex/sitemap.xml").toDF("url"), now = T0)
      input.addData(toEvents(seeds, 0L): _*); q.processAllAvailable()
      // wave 1: only the feed row exists; its body seeds p1+p2 due now
      val (b1, f1) = cycle(T0, "2025-01-01")
      b1 shouldBe Seq("https://a.ex/sitemap.xml")
      f1 shouldBe Seq("https://a.ex/p1", "https://a.ex/p2")
      // wave 2: pages fetch (monthly changefreq → 30 d interval,
      // halved by the changed law); the feed row holds its cadence
      val (b2, f2) = cycle(T0 + 600L, "2025-01-01")
      b2 shouldBe Seq("https://a.ex/p1", "https://a.ex/p2")
      f2 shouldBe empty
      // wave 3, past the feed cadence: the re-read announces a NEWER
      // p1 lastmod; the fold pulls EXACTLY p1 due — p2's
      // re-announcement emits nothing (zero schedule churn)
      val now3 = T0 + 86400L + 700L
      val (b3, f3) = cycle(now3, "2026-02-01")
      b3 shouldBe Seq("https://a.ex/sitemap.xml")
      f3 shouldBe Seq("https://a.ex/p1")
      // wave 4: the pulled row — and ONLY it — schedules next
      val b4 = CrawlFrontier.selectBatch(served(), now3 + 10L,
        batchSize = 10, perHostCap = 10)
        .select("url").as[String].collect().toSeq
      b4 shouldBe Seq("https://a.ex/p1")
      // the store's feed row kept its 24 h cadence through wave 3
      val sm = served()
        .filter(CrawlFrontier.isSitemapUrl(col("url"))).collect()(0)
      sm.getString(10) shouldBe "active"
      sm.getLong(9) shouldBe (now3 + 1L + 86400L)
      // and p1's pulled row carries the announced lastmod validator
      val p1 = served().filter(col("url") === "https://a.ex/p1")
        .collect()(0)
      p1.getLong(9) shouldBe now3
      p1.getLong(12) shouldBe 1769904000L // 2026-02-01 UTC midnight
    } finally q.stop()
  }

  test("sitemapBodiesFold: index bodies seed their CHILD feeds (known children keep their schedule), urlset bodies take the fold laws — one dispatch, one upsert batch") {
    val T0 = 1754000000L
    // frontier: one known child feed, one known fetched page
    val f = CrawlFrontier.sitemapSeeds(
        Seq("https://a.ex/sitemaps/c1.xml").toDF("url"), now = T0 - 500L)
      .unionByName(mkFrontier(Seq(
        row("https://a.ex/p1", next = T0 + 5000L, hash = Some("h"))))
        .withColumn("last_fetch_ts", lit(T0 - 5000L)))
    val index =
      """<sitemapindex>
        |<sitemap><loc>https://a.ex/sitemaps/c1.xml</loc></sitemap>
        |<sitemap><loc>https://a.ex/sitemaps/c2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    // the urlset ALSO announces c2 as a page — a conflicting role in
    // the same batch; the feed reading must win with ONE row
    val urlset =
      """<urlset>
        |<url><loc>https://a.ex/p1</loc><lastmod>2026-01-05</lastmod></url>
        |<url><loc>https://a.ex/p2</loc><changefreq>hourly</changefreq>
        |</url>
        |<url><loc>https://a.ex/sitemaps/c2.xml</loc></url>
        |</urlset>""".stripMargin
    val out = CrawlFrontier.sitemapBodiesFold(f,
      Seq(("https://a.ex/sitemap.xml", index),
        ("https://a.ex/sitemaps/c1.xml", urlset)).toDF("url", "xml"),
      now = T0).orderBy("url").collect()
    out.map(_.getString(0)) shouldBe Array(
      "https://a.ex/p1",              // known page pulled (lastmod > fetch)
      "https://a.ex/p2",              // new page seeded
      "https://a.ex/sitemaps/c2.xml") // NEW child feed only — c1 known
    val m = out.map(r => r.getString(0) -> r).toMap
    m("https://a.ex/p1").getLong(9) shouldBe T0        // pulled due
    m("https://a.ex/p2").getLong(8) shouldBe 3600L     // hourly
    val c2 = m("https://a.ex/sitemaps/c2.xml")
    c2.getDouble(3) shouldBe 1.5                       // feed priority
    c2.getLong(8) shouldBe 86400L                      // feed cadence
  }

  test("the full composition: robots (2.0) → sitemap (1.5) → pages in ONE frontier, results routed by isRobotsUrl/isSitemapUrl, the maintained rules gating what the sitemap announces") {
    import graft.functions.Robots
    var frontier = CrawlFrontier.robotsSeeds(Seq("a.ex").toDF("host"),
        now = 1000L)
      .unionByName(CrawlFrontier.sitemapSeeds(
        Seq("https://a.ex/sitemap.xml").toDF("url"), now = 1000L))
      .localCheckpoint(true)
    def nextUp(now: Long): DataFrame =
      CrawlFrontier.selectBatch(frontier, now, batchSize = 1,
        perHostCap = 10)
    // wave 1: the robots row LEADS — rules must land before the feed
    // that announces pages, which lands before the pages
    val b1 = nextUp(1000L)
    b1.select("url").as[String].head() shouldBe "https://a.ex/robots.txt"
    val rules = Robots.rulesFromFetch(
      b1.select(col("host").as("domain"), lit(200).as("status"),
        lit("User-agent: *\nDisallow: /blocked\n").as("robots_txt"),
        lit(1001L).as("fetch_ts")), "graftbot").localCheckpoint(true)
    // fold each law's upsert batch into the materialized frontier by
    // anti-join + union (the read-modify-write a store does by key)
    def upsert(f: DataFrame, batch: DataFrame): DataFrame =
      f.join(batch.select("url"), Seq("url"), "left_anti")
        .unionByName(batch).localCheckpoint(true)
    frontier = upsert(frontier, CrawlFrontier.robotsRecrawlUpdates(
      b1.select(col("url"), lit(1001L).as("fetch_ts"),
        lit(200).as("status"), md5(col("url")).as("content_hash")),
      frontier))
    // wave 2: the sitemap row is next; its body announces one allowed
    // and one robots-BLOCKED page — the gate holds at the fold
    val b2 = nextUp(1010L)
    b2.select("url").as[String].head() shouldBe "https://a.ex/sitemap.xml"
    val xml = """<urlset><url><loc>https://a.ex/ok/1</loc></url>
                |<url><loc>https://a.ex/blocked/1</loc></url>
                |</urlset>""".stripMargin
    val entries = Seq(xml).toDF("x")
      .select(explode(Sitemaps.urlEntries(col("x")))).select(col("col.*"))
    val gated = CrawlFrontier.gateRobots(entries, rules, urlCol = "loc")
    val folded = CrawlFrontier.sitemapFold(frontier, gated, now = 1010L)
    folded.select("url").as[String].collect().toSeq shouldBe
      Seq("https://a.ex/ok/1")
    frontier = upsert(frontier, CrawlFrontier.sitemapRecrawlUpdates(
      b2.select(col("url"), lit(1011L).as("fetch_ts"),
        lit(200).as("status"), md5(col("url")).as("content_hash")),
      frontier).unionByName(folded))
    // wave 3: the allowed page — and only it — is what's left due
    nextUp(1020L).select("url").as[String].head() shouldBe
      "https://a.ex/ok/1"
    // both governance rows held their cadence through the loop
    val byUrl = frontier.collect().map(r => r.getString(0) -> r).toMap
    byUrl("https://a.ex/robots.txt").getLong(9) shouldBe 1001L + 86400L
    byUrl("https://a.ex/sitemap.xml").getLong(9) shouldBe 1011L + 86400L
  }

  test("store-held standing loop with carried politeness budgets: a declared Crawl-delay budget spans the wave boundary — the mid-window wave gets only the remainder, the next window re-grants") {
    import graft.streaming.StreamingOps
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-scl-budget").toString
    val payloadCols = Seq("host", "depth", "priority", "fetch_count",
      "fail_count", "last_fetch_ts", "content_hash", "interval_s",
      "next_fetch_ts", "state", "etag", "last_modified")
    def toEvents(df: DataFrame, seq: Long) =
      df.collect().map { r => (r.getString(0), seq, "upsert",
        r.getString(1), r.getInt(2), r.getDouble(3), r.getLong(4),
        r.getInt(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)),
        if (r.isNullAt(7)) None else Some(r.getString(7)),
        r.getLong(8), r.getLong(9), r.getString(10),
        if (r.isNullAt(11)) None else Some(r.getString(11)),
        if (r.isNullAt(12)) None else Some(r.getLong(12))) }.toSeq
    val input = MemoryStream[(String, Long, String, String, Int, Double,
      Long, Int, Option[Long], Option[String], Long, Long, String,
      Option[String], Option[Long])]
    val q = StreamingOps.snapshotUpsertSink(
        input.toDF().toDF(("url" +: "seq" +: "op" +: payloadCols): _*),
        s"$base/frontier", idCol = "url", seqCol = "seq", opCol = "op",
        payloadCols = payloadCols, numBuckets = 4)
      .option("checkpointLocation", s"$base/ckpt").start()
    def served(): DataFrame =
      StreamingOps.readSnapshot(spark, s"$base/frontier").get
        .select(("url" +: payloadCols).map(col): _*)
    // a.ex declares Crawl-delay 300 → cap floor(600/300)=2 per window
    val budgets = graft.operators.CrawlFrontier.politenessBudgets(
      Seq(("a.ex", 300.0)).toDF("domain", "crawl_delay_s"),
      windowS = 600L).localCheckpoint(true)
    // the usage ledger lives beside the store, read-modify-write per
    // wave (the maintained-rules convention)
    var usage = budgets.select(col("host"), lit(0L).as("window_start"),
      lit(0L).as("used")).filter(lit(false)).localCheckpoint(true)
    def wave(now: Long): Seq[String] = {
      val sv = served().localCheckpoint(true)
      val batch = CrawlFrontier.selectBatch(sv, now, batchSize = 10,
        perHostCap = 10, hostBudgets = Some(
          CrawlFrontier.remainingBudgets(budgets, usage, now, 600L)))
        .localCheckpoint(true)
      usage = CrawlFrontier.updateHostUsage(usage, batch, now, 600L)
        .localCheckpoint(true)
      input.addData(toEvents(CrawlFrontier.recrawlUpdates(
        batch.select(col("url"), lit(now + 1L).as("fetch_ts"),
          lit(200).as("status"), md5(col("url")).as("content_hash")),
        sv), now): _*)
      q.processAllAvailable()
      batch.select("url").as[String].collect().sorted.toSeq
    }
    try {
      input.addData(toEvents(CrawlFrontier.seed(
        (0 until 5).map(i => s"https://a.ex/p$i").toDF("url"),
        now = 1000L, defaultIntervalS = 50000L), 0L): _*)
      q.processAllAvailable()
      // window [600,1200): wave 1 spends the whole budget of 2
      wave(1000L).size shouldBe 2
      // wave 2, same window, 3 rows still due: the carried ledger
      // leaves NOTHING — without it this wave re-granted 2 more
      wave(1100L) shouldBe empty
      // wave 3 in window [1200,1800): re-granted in full
      wave(1300L).size shouldBe 2
      // and the frontier really advanced only where waves fetched
      served().filter(col("fetch_count") === 1L).count() shouldBe 4
    } finally q.stop()
  }

  test("store-held standing loop with a redirect wave: a 301 retires the source row IN THE STORE and mints the target, which fetches next wave at the source's depth") {
    import graft.streaming.StreamingOps
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-scl-redirect").toString
    val payloadCols = Seq("host", "depth", "priority", "fetch_count",
      "fail_count", "last_fetch_ts", "content_hash", "interval_s",
      "next_fetch_ts", "state", "etag", "last_modified")
    def toEvents(df: DataFrame, seq: Long) =
      df.collect().map { r => (r.getString(0), seq, "upsert",
        r.getString(1), r.getInt(2), r.getDouble(3), r.getLong(4),
        r.getInt(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)),
        if (r.isNullAt(7)) None else Some(r.getString(7)),
        r.getLong(8), r.getLong(9), r.getString(10),
        if (r.isNullAt(11)) None else Some(r.getString(11)),
        if (r.isNullAt(12)) None else Some(r.getLong(12))) }.toSeq
    val input = MemoryStream[(String, Long, String, String, Int, Double,
      Long, Int, Option[Long], Option[String], Long, Long, String,
      Option[String], Option[Long])]
    val q = StreamingOps.snapshotUpsertSink(
        input.toDF().toDF(("url" +: "seq" +: "op" +: payloadCols): _*),
        s"$base/frontier", idCol = "url", seqCol = "seq", opCol = "op",
        payloadCols = payloadCols, numBuckets = 4)
      .option("checkpointLocation", s"$base/ckpt").start()
    def served(): DataFrame =
      StreamingOps.readSnapshot(spark, s"$base/frontier").get
        .select(("url" +: payloadCols).map(col): _*)
    try {
      // /old sits at depth 2 (an admitted discovery, not a seed)
      val seeds = CrawlFrontier.seed(
          Seq("https://a.ex/q").toDF("url"), now = 1000L,
          defaultIntervalS = 1000L)
        .unionByName(CrawlFrontier.admit(
          CrawlFrontier.seed(Seq("https://a.ex/q").toDF("url"), 1000L),
          Seq(("https://a.ex/old", 2)).toDF("url", "depth"), now = 1000L,
          defaultIntervalS = 1000L))
      input.addData(toEvents(seeds, 0L): _*); q.processAllAvailable()
      // wave 1: /old answers 301 → /new, /q answers 200; the upsert
      // batch is the law output ∪ the redirect admissions
      val sv1 = served().localCheckpoint(true)
      val b1 = CrawlFrontier.selectBatch(sv1, 1000L, 10, 10)
      val fetched1 = b1.select(col("url"),
        lit(1001L).as("fetch_ts"),
        when(col("url").endsWith("old"), lit(301)).otherwise(lit(200))
          .as("status"),
        when(col("url").endsWith("old"), lit(null).cast("string"))
          .otherwise(md5(col("url"))).as("content_hash"),
        when(col("url").endsWith("old"), lit("https://a.ex/new"))
          .otherwise(lit(null).cast("string")).as("location"))
        .localCheckpoint(true)
      input.addData(toEvents(
        CrawlFrontier.recrawlUpdates(fetched1, sv1)
          .unionByName(CrawlFrontier.redirectAdmissions(fetched1, sv1,
            now = 1000L)), 1000L): _*)
      q.processAllAvailable()
      val s1 = served().collect().map(r => r.getString(0) -> r).toMap
      s1("https://a.ex/old").getString(10) shouldBe "redirected"
      s1("https://a.ex/new").getString(10) shouldBe "active"
      s1("https://a.ex/new").getInt(2) shouldBe 2 // the source's depth
      // wave 2: the target — and only it — is due; its fetch lands
      // content ('redirected' rows are unselectable by state)
      val sv2 = served().localCheckpoint(true)
      val b2 = CrawlFrontier.selectBatch(sv2, 1010L, 10, 10)
      b2.select("url").as[String].collect().toSeq shouldBe
        Seq("https://a.ex/new")
      input.addData(toEvents(CrawlFrontier.recrawlUpdates(
        b2.select(col("url"), lit(1011L).as("fetch_ts"),
          lit(200).as("status"), md5(col("url")).as("content_hash")),
        sv2), 1010L): _*)
      q.processAllAvailable()
      val n2 = served().collect().map(r => r.getString(0) -> r).toMap
      n2("https://a.ex/new").getString(7) should not be null
      n2("https://a.ex/new").getLong(4) shouldBe 1L
      n2("https://a.ex/old").getString(10) shouldBe "redirected"
    } finally q.stop()
  }

  test("the COMPLETE standing crawler in one store-held loop: robots rules gate a sitemap's announcements, budgets carry across waves, a 301 aliases through the store, and the archive plan tracks first-capture vs revisit") {
    import graft.functions.Robots
    import graft.streaming.StreamingOps
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-scl-full").toString
    val payloadCols = Seq("host", "depth", "priority", "fetch_count",
      "fail_count", "last_fetch_ts", "content_hash", "interval_s",
      "next_fetch_ts", "state", "etag", "last_modified")
    def toEvents(df: DataFrame, seq: Long) =
      df.collect().map { r => (r.getString(0), seq, "upsert",
        r.getString(1), r.getInt(2), r.getDouble(3), r.getLong(4),
        r.getInt(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)),
        if (r.isNullAt(7)) None else Some(r.getString(7)),
        r.getLong(8), r.getLong(9), r.getString(10),
        if (r.isNullAt(11)) None else Some(r.getString(11)),
        if (r.isNullAt(12)) None else Some(r.getLong(12))) }.toSeq
    val input = MemoryStream[(String, Long, String, String, Int, Double,
      Long, Int, Option[Long], Option[String], Long, Long, String,
      Option[String], Option[Long])]
    val q = StreamingOps.snapshotUpsertSink(
        input.toDF().toDF(("url" +: "seq" +: "op" +: payloadCols): _*),
        s"$base/frontier", idCol = "url", seqCol = "seq", opCol = "op",
        payloadCols = payloadCols, numBuckets = 4)
      .option("checkpointLocation", s"$base/ckpt").start()
    def served(): DataFrame =
      StreamingOps.readSnapshot(spark, s"$base/frontier").get
        .select(("url" +: payloadCols).map(col): _*)
    val T0 = 1754000000L
    val budgets = Seq(("a.ex", 3)).toDF("host", "cap")
    var usage = budgets.select(col("host"), lit(0L).as("window_start"),
      lit(0L).as("used")).filter(lit(false)).localCheckpoint(true)
    var rules: DataFrame = null
    val urlset =
      """<urlset>
        |<url><loc>https://a.ex/ok1</loc><lastmod>2025-01-01</lastmod>
        |<changefreq>monthly</changefreq></url>
        |<url><loc>https://a.ex/blocked/1</loc></url>
        |<url><loc>https://a.ex/moved</loc>
        |<changefreq>monthly</changefreq></url>
        |</urlset>""".stripMargin
    // one cycle of the COMPLETE loop: budgeted select → route by the
    // two routers → per-kind laws → rules/usage read-modify-write →
    // one upsert batch into the store; returns (batch urls, the
    // archive plan's (url, kind) pairs for the page slice)
    def cycle(now: Long): (Seq[String], Seq[(String, String)]) = {
      val sv = served().localCheckpoint(true)
      val batch = CrawlFrontier.selectBatch(sv, now, batchSize = 10,
        perHostCap = 10, hostBudgets = Some(
          CrawlFrontier.remainingBudgets(budgets, usage, now, 600L)))
        .localCheckpoint(true)
      usage = CrawlFrontier.updateHostUsage(usage, batch, now, 600L)
        .localCheckpoint(true)
      val isR = CrawlFrontier.isRobotsUrl(col("url"))
      val isS = CrawlFrontier.isSitemapUrl(col("url"))
      var events = Seq.empty[(String, Long, String, String, Int, Double,
        Long, Int, Option[Long], Option[String], Long, Long, String,
        Option[String], Option[Long])]
      val robotsBatch = batch.filter(isR).localCheckpoint(true)
      if (robotsBatch.count() > 0) {
        val fetched = robotsBatch.select(col("host").as("domain"),
          lit(200).as("status"),
          lit("User-agent: *\nDisallow: /blocked\n").as("robots_txt"),
          lit(now + 1L).as("fetch_ts"))
        val fresh = Robots.rulesFromFetch(fetched, "graftbot")
        rules = (if (rules == null) fresh
          else Robots.updateRules(rules, fresh)).localCheckpoint(true)
        events ++= toEvents(CrawlFrontier.robotsRecrawlUpdates(
          robotsBatch.select(col("url"), lit(now + 1L).as("fetch_ts"),
            lit(200).as("status"),
            lit(null).cast("string").as("content_hash")), sv), now)
      }
      val smBatch = batch.filter(isS).localCheckpoint(true)
      if (smBatch.count() > 0) {
        events ++= toEvents(CrawlFrontier.sitemapRecrawlUpdates(
          smBatch.select(col("url"), lit(now + 1L).as("fetch_ts"),
            lit(200).as("status"), md5(lit("sm")).as("content_hash")),
          sv), now)
        val entries = Seq(urlset).toDF("x")
          .select(explode(Sitemaps.urlEntries(col("x"))))
          .select(col("col.*"))
        events ++= toEvents(CrawlFrontier.sitemapFold(sv,
          CrawlFrontier.gateRobots(entries, rules, urlCol = "loc"),
          now), now)
      }
      val pageBatch = batch.filter(!isR && !isS).localCheckpoint(true)
      var plan = Seq.empty[(String, String)]
      if (pageBatch.count() > 0) {
        val fetched = pageBatch.select(col("url"),
          lit(now + 1L).as("fetch_ts"),
          when(col("url").endsWith("moved"), lit(301)).otherwise(lit(200))
            .as("status"),
          when(col("url").endsWith("moved"), lit(null).cast("string"))
            .otherwise(md5(col("url"))).as("content_hash"),
          when(col("url").endsWith("moved"), lit("https://a.ex/target"))
            .otherwise(lit(null).cast("string")).as("location"))
          .localCheckpoint(true)
        plan = CrawlFrontier.archivePlan(fetched, sv).collect()
          .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
        events ++= toEvents(CrawlFrontier.recrawlUpdates(fetched, sv)
          .unionByName(CrawlFrontier.redirectAdmissions(fetched, sv,
            now)), now)
      }
      input.addData(events: _*); q.processAllAvailable()
      (batch.select("url").as[String].collect().sorted.toSeq, plan)
    }
    try {
      input.addData(toEvents(CrawlFrontier.robotsSeeds(
          Seq("a.ex").toDF("host"), now = T0)
        .unionByName(CrawlFrontier.sitemapSeeds(
          Seq("https://a.ex/sitemap.xml").toDF("url"), now = T0)),
        0L): _*)
      q.processAllAvailable()
      // wave 1: governance first — robots (2.0) then sitemap (1.5),
      // both within the budget; the feed's announcements arrive
      // gated (/blocked never enters the store)
      val (b1, _) = cycle(T0)
      b1 shouldBe Seq("https://a.ex/robots.txt", "https://a.ex/sitemap.xml")
      served().filter(col("url").contains("/blocked")).count() shouldBe 0
      // wave 2, same window: ONE unit of budget left (cap 3, 2 spent)
      // → one page; the 301 retires it and mints /target; the archive
      // plan stores nothing for a redirect
      val (b2, p2) = cycle(T0 + 60L)
      b2 shouldBe Seq("https://a.ex/moved")
      p2 shouldBe empty
      // wave 3, same window: budget exhausted — due rows wait
      val (b3, _) = cycle(T0 + 120L)
      b3 shouldBe empty
      // wave 4, next window: re-granted; the remaining page AND the
      // redirect target fetch; both are first captures
      val (b4, p4) = cycle(T0 + 700L)
      b4 shouldBe Seq("https://a.ex/ok1", "https://a.ex/target")
      p4 shouldBe Seq(("https://a.ex/ok1", "response"),
        ("https://a.ex/target", "response"))
      // the store's ledger: the alias retired, the target carries
      // content at the source's depth, governance rows on cadence
      val m = served().collect().map(r => r.getString(0) -> r).toMap
      m("https://a.ex/moved").getString(10) shouldBe "redirected"
      m("https://a.ex/target").getString(7) should not be null
      m("https://a.ex/robots.txt").getLong(9) shouldBe T0 + 1L + 86400L
      m("https://a.ex/sitemap.xml").getLong(9) shouldBe T0 + 1L + 86400L
      // and a re-fetch of unchanged content would archive as a
      // REVISIT against the held capture
      CrawlFrontier.archivePlan(
        Seq(("https://a.ex/ok1", T0 + 1300L, 200,
          Some(m("https://a.ex/ok1").getString(7))))
          .toDF("url", "fetch_ts", "status", "content_hash"),
        served()).collect().map(r => (r.getString(1), r.getString(4)))
        .toSeq shouldBe Seq(("revisit",
          graft.io.Warc.RevisitIdenticalDigest))
    } finally q.stop()
  }

  test("standing crawl loop: store-held cycles (loadDue face → selectBatch → fetch → recrawlUpdates+admit upserts) run wave-for-wave equal to step() across 3 cycles with a crash-restart and an at-least-once replay") {
    import graft.streaming.StreamingOps
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-scl")
      .toString + "/frontier"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-scl-ck").toString
    val payloadCols = Seq("host", "depth", "priority", "fetch_count",
      "fail_count", "last_fetch_ts", "content_hash", "interval_s",
      "next_fetch_ts", "state", "etag", "last_modified")
    val contract = "url" +: payloadCols
    def toEvents(df: DataFrame, seq: Long) =
      df.collect().map { r => (r.getString(0), seq, "upsert",
        r.getString(1), r.getInt(2), r.getDouble(3), r.getLong(4),
        r.getInt(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)),
        if (r.isNullAt(7)) None else Some(r.getString(7)),
        r.getLong(8), r.getLong(9), r.getString(10),
        if (r.isNullAt(11)) None else Some(r.getString(11)),
        if (r.isNullAt(12)) None else Some(r.getLong(12))) }.toSeq
    val input = MemoryStream[(String, Long, String, String, Int, Double,
      Long, Int, Option[Long], Option[String], Long, Long, String,
      Option[String], Option[Long])]
    def startSink() = StreamingOps.snapshotUpsertSink(
        input.toDF().toDF(("url" +: "seq" +: "op" +: payloadCols): _*),
        root, idCol = "url", seqCol = "seq", opCol = "op",
        payloadCols = payloadCols, numBuckets = 4)
      .option("checkpointLocation", ckpt).start()
    // the deterministic fake fetcher: trailing digit picks the
    // outcome — '1' a hard 404 (dies), '2' a 503 (backs off, dies at
    // the 2nd consecutive failure under rv.maxFails=2), anything
    // else 200 with a PER-CYCLE hash (the page keeps changing, so
    // the revisit law keeps halving) and a per-cycle ETag. Cycle 3 is
    // the CONDITIONAL-REVISIT wave: the would-be-200 pages answer 304
    // (validators matched — zero body bytes), which must keep the
    // cycle-2 hash AND etag, reset fails, and grow the interval.
    def fakeFetch(batch: DataFrame, now: Long, k: Int): DataFrame = {
      val ok200 = !col("url").endsWith("1") && !col("url").endsWith("2")
      batch.select(col("url"), lit(now + 10L).as("fetch_ts"),
        when(col("url").endsWith("1"), lit(404))
          .when(col("url").endsWith("2"), lit(503))
          .otherwise(lit(if (k == 3) 304 else 200)).as("status"),
        when(ok200 && lit(k) =!= 3, concat(lit(s"h$k-"), col("url")))
          .otherwise(lit(null).cast("string")).as("content_hash"),
        when(ok200 && lit(k) =!= 3, concat(lit(s"E$k-"), col("url")))
          .otherwise(lit(null).cast("string")).as("etag"))
    }
    def discoveries(batch: DataFrame, k: Int): DataFrame =
      batch.select(concat(col("url"), lit(s"/c$k")).as("url"),
        (col("depth") + 1).as("depth"))
    def served(): DataFrame =
      StreamingOps.readSnapshot(spark, root).get
        .select(contract.map(col): _*)
    def rows(df: DataFrame): Seq[String] =
      df.select(contract.map(col): _*).collect()
        .map(_.toString).sorted.toSeq
    val seeds = CrawlFrontier.seed(
      Seq("https://a.example/p0", "https://a.example/p1",
        "https://a.example/p2", "https://b.example/q0",
        "https://b.example/q1", "https://b.example/q2").toDF("url"),
      now = 1000L, defaultIntervalS = 1000L)
    var mat = seeds // the materialized twin, advanced by step()
    var q = startSink()
    try {
      input.addData(toEvents(seeds, 1000L): _*); q.processAllAvailable()
      rows(served()) shouldBe rows(mat)
      var replayEvents: Seq[(String, Long, String, String, Int, Double,
        Long, Int, Option[Long], Option[String], Long, Long, String,
        Option[String], Option[Long])] = Seq.empty
      Seq((1, 2000L), (2, 5000L), (3, 12000L)).foreach { case (k, now) =>
        val sv = served()
        // the scheduling wave comes off the SERVED frontier and must
        // match the materialized twin's wave exactly
        val batch = CrawlFrontier.selectBatch(sv, now,
          batchSize = 4, perHostCap = 2)
        rows(batch) shouldBe rows(CrawlFrontier.selectBatch(mat, now,
          batchSize = 4, perHostCap = 2))
        val fetched = fakeFetch(batch, now, k).persist()
        val disc = discoveries(batch, k)
        // the store face: changed rows + admitted rows, ONE upsert
        // batch — never a full-table rewrite
        val updates = CrawlFrontier.recrawlUpdates(fetched, sv, rv)
        val admits = CrawlFrontier.admit(sv, disc, now)
        val evs = toEvents(updates.unionByName(admits), now)
        if (k == 2) replayEvents = evs
        input.addData(evs: _*); q.processAllAvailable()
        mat = CrawlFrontier.step(mat, fetched, disc, now, rv)
          .localCheckpoint(true)
        rows(served()) shouldBe rows(mat)
        if (k == 1) {
          // crash-restart: kill the standing sink and bring it back
          // on the same checkpoint — the loop must not notice
          q.stop(); q = startSink()
        }
        if (k == 2) {
          // at-least-once: the whole cycle-2 upsert batch redelivers
          // (a crashed fetcher re-emits); max-seq idempotence holds
          input.addData(replayEvents: _*); q.processAllAvailable()
          rows(served()) shouldBe rows(mat)
        }
        fetched.unpersist()
      }
      // the loop actually exercised the laws: deaths by 404 and by
      // consecutive 503s, halving revisits, per-cycle admits, and the
      // cycle-3 304 wave (hash + ETag keep their cycle-2 values, the
      // fail streak stays reset, the row stays alive)
      val fin = served().collect()
        .map(r => r.getString(0) ->
          ((r.getString(10),
            if (r.isNullAt(7)) null else r.getString(7),
            if (r.isNullAt(11)) null else r.getString(11),
            r.getInt(5)))).toMap
      fin("https://a.example/p1")._1 shouldBe "dead" // 404 on cycle 1
      fin("https://a.example/p2")._1 shouldBe "dead" // 503 at cycles 2+3
      fin("https://a.example/p0") shouldBe
        (("active", "h2-https://a.example/p0", "E2-https://a.example/p0",
          0)) // 304'd on cycle 3: cycle-2 validators survive
      fin.keys.count(_.contains("/c")) should be >= 8 // admits landed
    } finally q.stop()
  }

  test("step: updated frontier unions the revisit output with the admitted discoveries") {
    val f = mkFrontier(Seq(
      row("https://a.example/p", interval = 1000L, hash = Some("h"))))
    val fetched = Seq(("https://a.example/p", 2000L, 200, Some("h")))
      .toDF("url", "fetch_ts", "status", "content_hash")
    val disc = Seq(("https://a.example/q", 1)).toDF("url", "depth")
    val out = CrawlFrontier.step(f, fetched, disc, now = 2000L, rv = rv)
      .orderBy("url").collect()
    out.length shouldBe 2
    out(0).getString(0) shouldBe "https://a.example/p"
    out(0).getLong(8) shouldBe 2000L // doubled
    out(1).getString(0) shouldBe "https://a.example/q"
    out(1).getLong(4) shouldBe 0L
    // a 301 in the cycle's results: the retired source AND its target
    // ride the same step() output, through ONE admit call — a URL
    // that is both linked-to and moved-to mints one row, not two
    val f2 = mkFrontier(Seq(
      row("https://a.example/moved", interval = 1000L)))
    val redirected = Seq(
      ("https://a.example/moved", 2000L, 301, Option.empty[String],
        Some("https://a.example/t")))
      .toDF("url", "fetch_ts", "status", "content_hash", "location")
    val disc2 = Seq(("https://a.example/t", 4)).toDF("url", "depth")
    val out2 = CrawlFrontier.step(f2, redirected, disc2, now = 2000L,
      rv = rv).orderBy("url").collect()
    out2.length shouldBe 2
    out2(0).getString(10) shouldBe "redirected"
    out2(1).getString(0) shouldBe "https://a.example/t"
    out2(1).getInt(2) shouldBe 0 // min(link depth 4, source depth 0)
  }

  test("rescorePriorities: the blend normalizes on the fly, unscored hosts take zero, degenerate scores refuse") {
    val f = mkFrontier(Seq(
      row("https://a.example/p"), row("https://b.example/q"),
      row("https://c.example/r")))
    val scores = Seq(("a.example", 0.004), ("b.example", 0.001))
      .toDF("host", "score")
    val out = CrawlFrontier.rescorePriorities(f, scores, alpha = 0.5)
      .select(col("host"), col("priority"))
      .as[(String, Double)].collect().toMap
    // base priority is 0.5 (row()'s default); max score 0.004
    out("a.example") shouldBe 0.5 * 0.5 + 0.5 * 1.0 +- 1e-12
    out("b.example") shouldBe 0.5 * 0.5 + 0.5 * 0.25 +- 1e-12
    out("c.example") shouldBe 0.5 * 0.5 +- 1e-12 // unscored → 0
    // every other column passes through byte-identical, order kept
    CrawlFrontier.rescorePriorities(f, scores).drop("priority")
      .collect().map(_.toString).sorted shouldBe
      f.drop("priority").collect().map(_.toString).sorted
    CrawlFrontier.rescorePriorities(f, scores).columns.toSeq shouldBe
      f.columns.toSeq
    // alpha=0 keeps the prior; empty/all-zero score frames refuse
    CrawlFrontier.rescorePriorities(f, scores, alpha = 0.0)
      .select("priority").as[Double].collect().toSet shouldBe Set(0.5)
    intercept[IllegalArgumentException] {
      CrawlFrontier.rescorePriorities(f,
        Seq(("a.example", 0.0)).toDF("host", "score"))
    }.getMessage should include("degenerate")
    // duplicate host rows in the score feed collapse by max instead of
    // fanning the join out and duplicating frontier rows
    val dup = CrawlFrontier.rescorePriorities(f,
      Seq(("a.example", 0.002), ("a.example", 0.004))
        .toDF("host", "score"))
    dup.count() shouldBe f.count()
    dup.filter(col("host") === "a.example").select("priority")
      .as[Double].head() shouldBe 0.5 * 0.5 + 0.5 * 1.0 +- 1e-12
    intercept[IllegalArgumentException] {
      CrawlFrontier.rescorePriorities(f,
        Seq.empty[(String, Double)].toDF("host", "score"))
    }.getMessage should include("degenerate")
  }

  test("day-bucketed frontier: the due filter is partition pruning, the boundary day comes back whole") {
    val day = 86400L
    val f = mkFrontier(Seq(
      row("https://d1.example/a", next = 1 * day + 10),   // overdue
      row("https://d2.example/b", next = 2 * day + 10),   // boundary day
      row("https://d2.example/c", next = 2 * day + 9000), // same day, later
      row("https://d9.example/d", next = 9 * day)))       // future
    val path = java.nio.file.Files
      .createTempDirectory("graft-frontier-days").toString + "/f"
    CrawlFrontier.writeDayBucketed(f, path)
    // directory layout: one partition dir per next-fetch day
    new java.io.File(path).list().count(_.startsWith("next_fetch_day="))
      .shouldBe(3)
    val now = 2 * day + 100
    val due = CrawlFrontier.loadDue(spark, path, now)
    // the boundary day comes back WHOLE (row-exact gating is
    // selectBatch's job); the future day never loads
    due.select("url").as[String].collect().sorted.toSeq shouldBe Seq(
      "https://d1.example/a", "https://d2.example/b",
      "https://d2.example/c")
    due.columns.toSeq shouldBe f.columns.toSeq // contract restored
    // the plan PRUNES: a non-empty PartitionFilters on the day column
    val plan = due.queryExecution.executedPlan.toString
    plan should include regex "PartitionFilters: \\[[^\\]]*next_fetch_day"
    // and the composed face: selectBatch over the pruned slice applies
    // the exact gate (d2's 9000-offset row is beyond `now`)
    val composed = CrawlFrontier.selectBatch(due, now,
      batchSize = 10, perHostCap = 5)
    composed.select("url").as[String].collect().sorted.toSeq shouldBe Seq(
      "https://d1.example/a", "https://d2.example/b")
    // the pruning pin SURVIVES the composition: the window + top-k
    // plan still reads a day-pruned scan, not the whole frontier
    val cPlan = composed.queryExecution.executedPlan.toString
    cPlan should include regex "PartitionFilters: \\[[^\\]]*next_fetch_day"
    // ON-DISK COMPAT: a frontier persisted under the r17 11-column
    // contract (before the validator columns existed) reads back with
    // null validators instead of failing the contract select — the
    // store outlives code versions
    val path17 = java.nio.file.Files
      .createTempDirectory("graft-frontier-r17").toString + "/f"
    CrawlFrontier.writeDayBucketed(
      f.drop("etag", "last_modified"), path17)
    val legacy = spark.read.parquet(path17)
    legacy.columns should not contain "etag"
    val due17 = CrawlFrontier.loadDue(spark, path17, now)
    due17.columns.toSeq shouldBe f.columns.toSeq
    due17.filter(col("etag").isNotNull).count() shouldBe 0L
    // and the r18 law runs over it unchanged
    CrawlFrontier.selectBatch(due17, now, batchSize = 10,
      perHostCap = 5).count() shouldBe 2L
  }

  test("frontier GC on the day-bucketed layout: compactionDayBound's read predicate PRUNES to the old buckets, is sound (finds every expired corpse), and the two faces partition the frontier exactly") {
    val day = 86400L
    val now = 400L * day
    val retention = 90L * day
    val f = mkFrontier(Seq(
      // died long ago: the law froze next at the death fetch, so the
      // corpse sits in the death-day bucket
      row("https://g.ex/olddead", next = 200L * day, state = "dead"),
      // died recently: inside retention, must keep
      row("https://g.ex/newdead", next = 396L * day, state = "dead"),
      // the alias map keeps at ANY age
      row("https://g.ex/alias", next = 200L * day, state = "redirected"),
      // live schedule: future buckets the GC scan must never read
      row("https://g.ex/live", next = 401L * day)))
      .withColumn("last_fetch_ts",
        when(col("url").endsWith("olddead") ||
          col("url").endsWith("alias"), lit(200L * day - 3600L))
        .when(col("url").endsWith("newdead"), lit(395L * day))
        .otherwise(lit(399L * day)))
    val path = java.nio.file.Files
      .createTempDirectory("graft-gc-days").toString + "/f"
    CrawlFrontier.writeDayBucketed(f, path)
    val bound = CrawlFrontier.compactionDayBound(now, retention)
    // soundness: every row the UNBOUNDED pass would retire sits at or
    // below the bound (the law freezes a retiring row's next at its
    // death fetch, so expired ⇒ frozen next < now − retention)
    val allDeletes = CrawlFrontier.compactionDeletes(f, now, retention)
    allDeletes.filter(floor(col("next_fetch_ts") / lit(day)) > bound)
      .count() shouldBe 0L
    // the pruned GC pass: read only old buckets, same deletes
    val pruned = spark.read.parquet(path)
      .filter(col("next_fetch_day") <= lit(bound))
      .drop("next_fetch_day")
    val prunedDeletes = CrawlFrontier.compactionDeletes(
      pruned.select(f.columns.map(col): _*), now, retention)
    prunedDeletes.select("url").as[String].collect().toSeq shouldBe
      Seq("https://g.ex/olddead")
    // and the plan really pruned on the partition column
    prunedDeletes.queryExecution.executedPlan.toString should
      include regex "PartitionFilters: \\[[^\\]]*next_fetch_day"
    // the two faces partition the frontier exactly: kept ∪ deletes =
    // input, disjoint
    val kept = CrawlFrontier.compactFrontier(f, now, retention)
    kept.count() + allDeletes.count() shouldBe 4L
    kept.join(allDeletes.select("url"), Seq("url"), "inner")
      .count() shouldBe 0L
    kept.select("url").as[String].collect().sorted.toSeq shouldBe Seq(
      "https://g.ex/alias", "https://g.ex/live", "https://g.ex/newdead")
  }

  // ——— crawler traps ———————————————————————————————————————————————

  test("urlTemplate: hex before digits, query values collapse but keys survive, scheme drops") {
    def tpl(u: String): String = Seq(u).toDF("u")
      .select(CrawlFrontier.urlTemplate(col("u"))).as[String].head()
    tpl("https://h.ex/cal/2026/8/16") shouldBe "h.ex/cal/D/D/D"
    // the hex run (hash-like) collapses WHOLE, not as digit fragments
    tpl("https://h.ex/obj/deadbeef1234") shouldBe "h.ex/obj/H"
    // a LETTER-bearing session token defeats the digit stage — the
    // 16+-alnum rule collapses it (base64-ish path ids), and it runs
    // FIRST so a 16+ all-hex run is 'S' too, never split
    tpl("https://h.ex/s/AbCdEfGhIjKlMnOp") shouldBe "h.ex/s/S"
    tpl("https://h.ex/s/deadbeefdeadbeef") shouldBe "h.ex/s/S"
    // 15 alnum chars are NOT a session token; a real word neither
    tpl("https://h.ex/s/AbCdEfGhIjKlMnO") shouldBe "h.ex/s/AbCdEfGhIjKlMnO"
    tpl("https://h.ex/documentation") shouldBe "h.ex/documentation"
    // short hex-ish tokens (< 8) are NOT hashes: digits only
    tpl("https://h.ex/v2/beef") shouldBe "h.ex/vD/beef"
    tpl("https://h.ex/find?q=abc&page=4") shouldBe "h.ex/find?q=V&page=V"
    // http/https twins share a template; ports belong to the host
    tpl("http://h.ex/p/1") shouldBe tpl("https://h.ex/p/1")
    tpl("https://h.ex/") shouldBe "h.ex/"
    tpl("https://h.ex") shouldBe "h.ex/" // pathOf's '/' fallback
    tpl("not a url") shouldBe ""
    // the trap law under the r17 frontier identity: dot-segment
    // spellings reach the template ALREADY collapsed (canonicalUrl
    // runs dot removal before normalizeUrl), so /x/../y and /y share
    // one bucket instead of minting two templates
    def ctpl(u: String): String = Seq(u).toDF("u")
      .select(CrawlFrontier.urlTemplate(
        CrawlFrontier.canonicalUrl(col("u")))).as[String].head()
    ctpl("https://h.ex/x/../cal/2026/8") shouldBe
      ctpl("https://h.ex/cal/2026/8")
    ctpl("https://h.ex/x/../cal/2026/8") shouldBe "h.ex/cal/D/D"
  }

  test("trapTemplates: fanout above the cap flags, at the cap does not; duplicate spellings count once") {
    val urls = ((1 to 5).map(i => s"https://t.ex/cal/$i/$i") ++
      (1 to 4).map(i => s"https://t.ex/page/about$i") ++
      Seq("https://t.ex/cal/1/1", "https://t.ex/cal/2/2")) // dups
      .toDF("url")
    val flagged = CrawlFrontier.trapTemplates(urls, maxPerTemplate = 4)
      .as[(String, String, Long)].collect()
    flagged.length shouldBe 1
    flagged.head shouldBe (("t.ex", "t.ex/cal/D/D", 5L)) // distinct, not 7
    // cap boundary: exactly 4 distinct is NOT a trap
    CrawlFrontier.trapTemplates(urls, maxPerTemplate = 5)
      .count() shouldBe 0L
  }

  test("updateTrapStats: admit batches fold in by full-outer sum; flagging off the maintained frame matches a rescan") {
    val w1 = (1 to 4).map(i => s"https://t.ex/cal/$i").toDF("url")
    val w2 = (Seq("https://t.ex/cal/99", "https://t.ex/cal/99") ++ // dup within batch counts once
      Seq("https://n.ex/p/1")).toDF("url")
    val s1 = CrawlFrontier.trapStats(w1)
    val s2 = CrawlFrontier.updateTrapStats(s1, w2)
    val m = s2.as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    m(("t.ex", "t.ex/cal/D")) shouldBe 5L // 4 + 1 distinct new
    m(("n.ex", "n.ex/p/D")) shouldBe 1L   // brand-new key inserted
    m.size shouldBe 2
    // the maintained frame flags exactly what a full rescan would
    val rescan = CrawlFrontier.trapTemplates(
      w1.unionByName(w2), maxPerTemplate = 4)
    s2.filter(col("n_urls") > 4).collect().map(_.toString).sorted shouldBe
      rescan.collect().map(_.toString).sorted
  }

  test("standing trap stats: a stream of admit batches maintains the frame; the result equals a full rescan") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-trap-stats").toString
    val statsDir = s"$dir/stats"
    val input = MemoryStream[String]
    // read-modify-write per micro-batch: the stats frame is SMALL by
    // nature (templates, not URLs), so the standing face is a plain
    // foreachBatch merge — the same updateTrapStats law as batch
    val q = input.toDF().toDF("url").writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val merged =
          if (new java.io.File(statsDir).exists())
            CrawlFrontier.updateTrapStats(spark.read.parquet(statsDir), b)
          else CrawlFrontier.trapStats(b)
        val tmp = s"$statsDir.next"
        merged.write.mode("overwrite").parquet(tmp)
        // atomic-enough swap for the spec; a production pump uses the
        // snapshot store's claim machinery
        val old = new java.io.File(statsDir)
        if (old.exists()) {
          val bak = new java.io.File(s"$statsDir.old")
          old.renameTo(bak)
          new java.io.File(tmp).renameTo(old)
          org.apache.commons.io.FileUtils.deleteDirectory(bak)
        } else new java.io.File(tmp).renameTo(old)
        (): Unit
      }
      .option("checkpointLocation", s"$dir/ckpt").start()
    val w1 = (1 to 60).map(i => s"https://t.ex/cal/2026/$i")
    val w2 = (1 to 10).map(i => s"https://t.ex/cal/2027/$i") ++
      Seq("https://n.ex/about")
    try {
      input.addData(w1: _*); q.processAllAvailable()
      input.addData(w2: _*); q.processAllAvailable()
    } finally q.stop()
    val standing = spark.read.parquet(statsDir)
      .collect().map(_.toString).sorted
    val rescan = CrawlFrontier.trapStats((w1 ++ w2).toDF("url"))
      .collect().map(_.toString).sorted
    standing shouldBe rescan
    spark.read.parquet(statsDir).filter(col("n_urls") > 50)
      .select("template").as[String].collect().toSeq shouldBe
      Seq("t.ex/cal/D/D")
  }

  test("filterTraps: flagged templates gate discoveries (new values of the same shape), columns pass through") {
    val seen = (1 to 60).map(i => s"https://t.ex/cal/2026/$i").toDF("url")
    val traps = CrawlFrontier.trapTemplates(seen, maxPerTemplate = 50)
    val disc = Seq(
      ("https://t.ex/cal/2027/9", 3), // NEW year, SAME template → drop
      ("https://t.ex/about", 3),
      ("https://fresh.ex/cal/2026/9", 3)) // other host's template → keep
      .toDF("url", "depth")
    val kept = CrawlFrontier.filterTraps(disc, traps)
      .as[(String, Int)].collect().sortBy(_._1)
    kept.map(_._1).toSeq shouldBe Seq(
      "https://fresh.ex/cal/2026/9", "https://t.ex/about")
    kept.map(_._2).distinct.toSeq shouldBe Seq(3) // depth survived
    // composed with admission: the gate runs BEFORE admit, so trap
    // rows never consume the domain budget
    val frontier = CrawlFrontier.seed(
      Seq("https://t.ex/about").toDF("url"), now = 1000L)
    val admitted = CrawlFrontier.admit(frontier,
      CrawlFrontier.filterTraps(disc, traps), now = 1000L)
      .select("url").as[String].collect().sorted
    // the trap row never reached admit; /about was already known
    admitted.toSeq shouldBe Seq("https://fresh.ex/cal/2026/9")
  }

  // ——— robots gate at admission ————————————————————————————————————

  private def robotsByHost(pairs: (String, String)*) = {
    import graft.functions.Robots
    Robots.rulesByDomain(
      Robots.parseRules(pairs.toDF("domain", "robots_txt")), "graftbot")
  }

  test("gateRobots: disallowed URLs drop pre-admit, verdicts ride the canonical identity, unknown hosts allow, columns pass through") {
    val byHost = robotsByHost(
      "a.ex.com" -> "User-agent: *\nDisallow: /private\n")
    val disc = Seq(
      ("https://a.ex.com/pub/1", 2),
      ("https://a.ex.com/private/1", 1),
      // a dotted spelling of a disallowed path: the verdict must see
      // the CANONICAL path the crawler would fetch, not the spelling
      ("https://a.ex.com/x/../private/2", 1),
      ("https://other.ex.com/private/9", 3)) // no rules → allowed
      .toDF("url", "depth")
    val kept = CrawlFrontier.gateRobots(disc, byHost)
      .as[(String, Int)].collect().sortBy(_._1)
    kept.map(_._1).toSeq shouldBe Seq(
      "https://a.ex.com/pub/1", "https://other.ex.com/private/9")
    kept.map(_._2).toSeq shouldBe Seq(2, 3) // depth passed through
    // the scale escape hatch: broadcastRules=false drops the FORCED
    // hint so the planner chooses by SIZE — a tiny frame still
    // broadcasts (fine), a 10^8-host frame would shuffle instead of
    // OOM-broadcasting. Verdict parity either way; with the size
    // gate closed the partitioned path actually runs and agrees.
    val keptPart = CrawlFrontier.gateRobots(disc, byHost,
        broadcastRules = false)
      .as[(String, Int)].collect().sortBy(_._1)
    keptPart shouldBe kept
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val gated = CrawlFrontier.gateRobots(disc, byHost,
        broadcastRules = false)
      gated.as[(String, Int)].collect().sortBy(_._1) shouldBe kept
      val plan = gated.queryExecution.executedPlan.toString
      withClue(plan) { plan should not include "BroadcastHashJoin" }
      // the default path keeps its forced broadcast even with the
      // size gate closed (the zero-shuffle streaming shape)
      val forced = CrawlFrontier.gateRobots(disc, byHost)
        .queryExecution.executedPlan.toString
      withClue(forced) { forced should include("BroadcastHashJoin") }
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("gateRobots + admit: a disallowed URL never consumes the domain budget (tighten-only, never reorder)") {
    val byHost = robotsByHost(
      "a.site1.com" -> "User-agent: *\nDisallow: /blocked\n")
    val f = mkFrontier(Seq.empty)
    // the disallowed row sorts FIRST in admit's (depth, url) rank, so
    // an admit WITHOUT the gate spends a budget slot on it and cuts
    // the last allowed URL — the gate must prevent exactly that
    val disc = Seq(
      ("https://a.site1.com/blocked/0", 1),
      ("https://a.site1.com/keep/1", 1),
      ("https://a.site1.com/keep/2", 1))
      .toDF("url", "depth")
    val unGated = CrawlFrontier.admit(f, disc, now = 500L,
      perDomainCap = 2L).select("url").as[String].collect().sorted
    unGated.toSeq shouldBe Seq("https://a.site1.com/blocked/0",
      "https://a.site1.com/keep/1") // the compliance violation
    val gated = CrawlFrontier.admit(f,
        CrawlFrontier.gateRobots(disc, byHost), now = 500L,
        perDomainCap = 2L)
      .select("url").as[String].collect().sorted
    gated.toSeq shouldBe Seq("https://a.site1.com/keep/1",
      "https://a.site1.com/keep/2")
  }

  test("gateRobots: batch/stream parity — the stateless gate runs unchanged on a standing discovery stream") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val byHost = robotsByHost(
      "a.ex.com" -> "User-agent: *\nDisallow: /private\nAllow: /private/ok\n")
    val urls = Seq(
      "https://a.ex.com/pub/1", "https://a.ex.com/private/1",
      "https://a.ex.com/private/ok/2", "https://a.ex.com/y/../private/3",
      "https://b.ex.com/anything")
    val batchKept = CrawlFrontier.gateRobots(
        urls.toDF("url").withColumn("depth", lit(1)), byHost)
      .select("url").as[String].collect().sorted.toSeq
    val input = MemoryStream[String]
    val q = CrawlFrontier.gateRobots(
        input.toDF().toDF("url").withColumn("depth", lit(1)), byHost)
      .writeStream.format("memory").queryName("gate_parity")
      .outputMode("append").start()
    try {
      input.addData(urls: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamKept = spark.table("gate_parity")
      .select("url").as[String].collect().sorted.toSeq
    streamKept shouldBe batchKept
    batchKept shouldBe Seq("https://a.ex.com/private/ok/2",
      "https://a.ex.com/pub/1", "https://b.ex.com/anything")
  }

  // ——— the robots.txt LIFECYCLE (RFC 9309 §2.3.1-2.4) ——————————————

  test("rulesFromFetch: the §2.3.1 status law — 2xx parses, 4xx/unresolved-3xx allow all, 5xx/network assume complete disallow") {
    import graft.functions.Robots
    val fetched = Seq(
      ("rules.ex", 200, "User-agent: *\nDisallow: /private\n", 100L),
      ("empty.ex", 200, "User-agent: *\nDisallow:\n", 100L),
      ("gone.ex", 404, null.asInstanceOf[String], 100L),
      ("moved.ex", 301, null.asInstanceOf[String], 100L),
      ("down.ex", 503, null.asInstanceOf[String], 100L),
      ("dark.ex", 0, null.asInstanceOf[String], 100L))
      .toDF("domain", "status", "robots_txt", "fetch_ts")
    val rules = Robots.rulesFromFetch(fetched, "graftbot")
    val byDomain = rules.collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    byDomain shouldBe Map("rules.ex" -> "rules", "empty.ex" -> "rules",
      "gone.ex" -> "allow_all", "moved.ex" -> "allow_all",
      "down.ex" -> "disallow_all", "dark.ex" -> "disallow_all")
    // the verdicts the gate derives: /private blocked only on rules.ex;
    // the disallow_all hosts block EVERYTHING, /robots.txt included
    val disc = byDomain.keys.toSeq.flatMap(h => Seq(
      (s"https://$h/private/1", 1), (s"https://$h/pub/1", 1)))
      .toDF("url", "depth")
    val kept = CrawlFrontier.gateRobots(disc, rules)
      .select("url").as[String].collect().sorted.toSeq
    kept shouldBe Seq(
      "https://empty.ex/private/1", "https://empty.ex/pub/1",
      "https://gone.ex/private/1", "https://gone.ex/pub/1",
      "https://moved.ex/private/1", "https://moved.ex/pub/1",
      "https://rules.ex/pub/1")
    rules.columns.toSeq shouldBe
      Seq("domain", "robots_rules", "robots_status", "fetched_at")
  }

  test("rulesFromFetch: 429 files as complete-disallow (no verdict was delivered), and duplicate domains collapse latest-fetch-wins before the merge") {
    import graft.functions.Robots
    val fetched = Seq(
      ("throttled.ex", 429, null.asInstanceOf[String], 100L),
      // two attempts for one domain in one cycle: the later 404 must
      // win, and exactly ONE row may reach updateRules/gateRobots —
      // a duplicate would fan out every discovered URL of the host
      ("dup.ex", 200, "User-agent: *\nDisallow: /\n", 100L),
      ("dup.ex", 404, null.asInstanceOf[String], 200L))
      .toDF("domain", "status", "robots_txt", "fetch_ts")
    val rules = Robots.rulesFromFetch(fetched, "graftbot")
    rules.count() shouldBe 2 // one row per domain, enforced
    val byDomain = rules.collect()
      .map(r => r.getString(0) -> ((r.getString(2), r.getLong(3)))).toMap
    byDomain("throttled.ex")._1 shouldBe "disallow_all"
    byDomain("dup.ex") shouldBe (("allow_all", 200L))
    // the 429 verdict gates like an outage: nothing admitted
    val kept = CrawlFrontier.gateRobots(
      Seq(("https://throttled.ex/pub/1", 1), ("https://dup.ex/pub/1", 1))
        .toDF("url", "depth"), rules)
      .select("url").as[String].collect().toSeq
    kept shouldBe Seq("https://dup.ex/pub/1")
  }

  test("robotsRecrawlUpdates: 429 counts the failure and keeps the default cadence; retries dedup to one upsert row; max-age clamps at 7× the cadence") {
    val f = mkFrontier(Seq(
      row("https://a.ex/robots.txt", interval = 86400L, fails = 1),
      row("https://b.ex/robots.txt", interval = 86400L, fails = 1)))
    // a.ex: a 500 then a 429 retry in ONE cycle — latest wins, ONE row
    // out, the 429 is not an answer (fail streak continues), cadence
    // stays the default. b.ex: a 200 declaring a decades-long max-age
    // — honored only up to 7× the refresh cadence.
    val fetched = Seq(
      ("https://a.ex/robots.txt", 100L, 500, None, None),
      ("https://a.ex/robots.txt", 200L, 429, None, None),
      ("https://b.ex/robots.txt", 200L, 200, Some("h"),
        Some(999999999L)))
      .toDF("url", "fetch_ts", "status", "content_hash", "max_age")
    val out = CrawlFrontier.robotsRecrawlUpdates(fetched, f,
      refreshIntervalS = 86400L).orderBy("url").collect()
    out.length shouldBe 2
    val a = out(0); val b = out(1)
    a.getString(0) shouldBe "https://a.ex/robots.txt"
    a.getInt(5) shouldBe 2                  // 429: failure counted
    a.getLong(8) shouldBe 86400L            // default cadence held
    a.getLong(9) shouldBe 200L + 86400L     // latest attempt's clock
    a.getString(10) shouldBe "active"       // the row never dies
    b.getInt(5) shouldBe 0
    b.getLong(8) shouldBe 86400L            // the cadence survives
    b.getLong(9) shouldBe 200L + 7L * 86400L // clamped, not 31 years
  }

  test("sitemapRecrawlUpdates: a declared max-age postpones ONE refresh at the 7x ceiling but never compounds — the stored cadence is the clamp's base every time") {
    var f = CrawlFrontier.sitemapSeeds(
      Seq("https://a.ex/sitemap.xml").toDF("url"), now = 1000L)
    def hit(ts: Long): org.apache.spark.sql.Row = {
      val up = CrawlFrontier.sitemapRecrawlUpdates(
        Seq(("https://a.ex/sitemap.xml", ts, 200, Some("h"),
          Some(999999999L)))
          .toDF("url", "fetch_ts", "status", "content_hash", "max_age"),
        f)
      f = up.localCheckpoint(true)
      up.collect()(0)
    }
    val r1 = hit(2000L)
    (r1.getLong(8), r1.getLong(9)) shouldBe
      ((86400L, 2000L + 7L * 86400L))
    // second hostile answer: the ceiling is STILL 7×86400 — were the
    // honored wait stored as the cadence, this would be 7×604800 and
    // each fetch would escalate 7× toward decades
    val r2 = hit(700000L)
    (r2.getLong(8), r2.getLong(9)) shouldBe
      ((86400L, 700000L + 7L * 86400L))
  }

  test("updateRules: rules REPLACE latest-fetched-at-wins; redelivery converges; stale redelivery loses") {
    import graft.functions.Robots
    def fetchAt(ts: Long, status: Int, txt: String) = Robots.rulesFromFetch(
      Seq(("a.ex", status, txt, ts)).toDF("domain", "status",
        "robots_txt", "fetch_ts"), "graftbot")
    val day1 = fetchAt(100L, 503, null) // outage: assume disallow-all
    val day2 = fetchAt(200L, 200, "User-agent: *\nDisallow: /private\n")
    val m1 = Robots.updateRules(
      Robots.rulesFromFetch(Seq.empty[(String, Int, String, Long)]
        .toDF("domain", "status", "robots_txt", "fetch_ts"), "graftbot"),
      day1)
    m1.select("robots_status").as[String].head() shouldBe "disallow_all"
    val m2 = Robots.updateRules(m1, day2)
    m2.select("robots_status").as[String].head() shouldBe "rules"
    // at-least-once: redelivering day2 converges (ties → fresh)
    val m2r = Robots.updateRules(m2, day2)
    m2r.collect().map(_.toString).sorted shouldBe
      m2.collect().map(_.toString).sorted
    // a STALE redelivery (day1 arriving after day2 applied) loses
    val m2s = Robots.updateRules(m2, day1)
    m2s.select("robots_status").as[String].head() shouldBe "rules"
    // a brand-new domain inserts alongside
    val other = fetchAt(150L, 404, null).withColumn("domain", lit("b.ex"))
    Robots.updateRules(m2, other).count() shouldBe 2L
    // an UNDATED maintained row (fetched_at null — a malformed
    // upstream stamp) must survive a merge that brings no fresh row
    // for its domain: wiping it to all-null fields would read as
    // allow-all downstream and silently open a disallow-all host
    val undated = m1.withColumn("fetched_at",
      lit(null).cast("long"))
    val merged = Robots.updateRules(undated, other)
    val aRow = merged.filter(col("domain") === "a.ex").collect()(0)
    aRow.getString(2) shouldBe "disallow_all" // kept, not wiped
    aRow.getSeq[org.apache.spark.sql.Row](1) should not be null
    // ...and it LOSES to a dated fresh row for the same domain
    Robots.updateRules(undated, day2)
      .filter(col("domain") === "a.ex")
      .select("robots_status").as[String].head() shouldBe "rules"
  }

  test("robotsSeeds + isRobotsUrl + robotsRecrawlUpdates: fixed cadence, priority above page rows, never dies, 304/validators ride") {
    val seeds = CrawlFrontier.robotsSeeds(
      Seq("a.ex", "a.ex", "b.ex").toDF("host"), now = 1000L,
      refreshIntervalS = 86400L)
    val got = seeds.orderBy("url").collect()
    got.map(_.getString(0)) shouldBe Array(
      "https://a.ex/robots.txt", "https://b.ex/robots.txt") // deduped
    got.foreach { r =>
      r.getDouble(3) shouldBe 2.0   // above every 1/(1+depth) page prior
      r.getLong(8) shouldBe 86400L  // the refresh cadence
      r.getLong(9) shouldBe 1000L   // due now
    }
    Seq("https://a.ex/robots.txt", "https://a.ex/p/robots.txt",
      "https://a.ex/p").toDF("u")
      .select(CrawlFrontier.isRobotsUrl(col("u"))).as[Boolean]
      .collect().toSeq shouldBe Seq(true, false, false)
    // a robots row outlives a 404 (the host may publish tomorrow) and
    // keeps the FIXED cadence; a 200 stamps hash + validators; a 304
    // keeps them; a 503 counts the fail but never kills
    def fetch(ts: Long, status: Int, hash: Option[String],
              etag: Option[String]) =
      Seq(("https://a.ex/robots.txt", ts, status, hash, etag))
        .toDF("url", "fetch_ts", "status", "content_hash", "etag")
    var f = seeds.filter(col("host") === "a.ex")
    def step(ts: Long, status: Int, hash: Option[String] = None,
             etag: Option[String] = None): org.apache.spark.sql.Row = {
      val up = CrawlFrontier.robotsRecrawlUpdates(
        fetch(ts, status, hash, etag), f, refreshIntervalS = 86400L)
      f = up.localCheckpoint(true)
      up.collect()(0)
    }
    val r200 = step(2000L, 200, Some("h1"), Some("\"v1\""))
    (r200.getInt(5), r200.getString(7), r200.getLong(9),
      r200.getString(10), r200.getString(11)) shouldBe
      ((0, "h1", 2000L + 86400L, "active", "\"v1\""))
    val r304 = step(90000L, 304)
    (r304.getInt(5), r304.getString(7), r304.getLong(9),
      r304.getString(11)) shouldBe
      ((0, "h1", 90000L + 86400L, "\"v1\"")) // validators kept
    val r404 = step(180000L, 404)
    (r404.getInt(5), r404.getString(10)) shouldBe ((0, "active"))
    val r503a = step(270000L, 503)
    val r503b = step(360000L, 503)
    (r503a.getInt(5), r503b.getInt(5)) shouldBe ((1, 2)) // counted...
    r503b.getString(10) shouldBe "active" // ...but NEVER lethal
    r503b.getLong(9) shouldBe 360000L + 86400L // cadence holds
    // Cache-Control max-age postpones THIS refresh per row (§2.4's
    // "unless a cache-control signal says otherwise"), floored so a
    // hostile max-age=0 cannot turn the refresh loop into a hammer;
    // the STORED cadence (interval_s) never changes — the honored
    // wait must not become the next ceiling's base
    def fetchMa(ts: Long, ma: Option[Long]) =
      Seq(("https://a.ex/robots.txt", ts, 200,
        Some("h2"), Option.empty[String], ma))
        .toDF("url", "fetch_ts", "status", "content_hash", "etag",
          "max_age")
    val rMa = CrawlFrontier.robotsRecrawlUpdates(
      fetchMa(450000L, Some(3600L)), f).collect()(0)
    (rMa.getLong(8), rMa.getLong(9)) shouldBe ((86400L, 450000L + 3600L))
    val rMa0 = CrawlFrontier.robotsRecrawlUpdates(
      fetchMa(450000L, Some(0L)), f).collect()(0)
    rMa0.getLong(9) shouldBe 450000L + 300L // the floor
    val rMaAbsent = CrawlFrontier.robotsRecrawlUpdates(
      fetchMa(450000L, None), f).collect()(0)
    rMaAbsent.getLong(9) shouldBe 450000L + 86400L // default cadence
    // a FAILED fetch's max-age is ignored (a CDN error shell
    // declaring max-age=1 week must not postpone the disallow-all
    // recovery) — the failure cadence stays the default
    def fetch503Ma(ts: Long, ma: Long) =
      Seq(("https://a.ex/robots.txt", ts, 503,
        Option.empty[String], Option.empty[String], Some(ma)))
        .toDF("url", "fetch_ts", "status", "content_hash", "etag",
          "max_age")
    val rErr = CrawlFrontier.robotsRecrawlUpdates(
      fetch503Ma(540000L, 604800L), f).collect()(0)
    (rErr.getLong(8), rErr.getLong(9), rErr.getString(10)) shouldBe
      ((86400L, 540000L + 86400L, "active"))
  }

  test("fetchRequests ∘ imfFixdateEpoch round-trips: the rendered If-Modified-Since parses back to the stored epoch; validator-less rows go unconditional") {
    import graft.functions.TextExtraction.imfFixdateEpoch
    val f = mkFrontier(Seq(
        row("https://rt.ex/a", hash = Some("h")),
        row("https://rt.ex/b")))
      .withColumn("etag",
        when(col("url").endsWith("a"), lit("W/\"v7\"")))
      .withColumn("last_modified",
        when(col("url").endsWith("a"), lit(1767744000L))) // 2026-01-07
    val req = CrawlFrontier.fetchRequests(f).orderBy("url").collect()
    req(0).getString(2) shouldBe "W/\"v7\"" // ETag echoes verbatim
    req(0).getString(3) shouldBe "Wed, 07 Jan 2026 00:00:00 GMT"
    req(1).isNullAt(2) shouldBe true // unconditional
    req(1).isNullAt(3) shouldBe true
    // the round trip: render → parse = identity (day-ignoring parse,
    // UTC session)
    CrawlFrontier.fetchRequests(f)
      .filter(col("if_modified_since").isNotNull)
      .select(imfFixdateEpoch(col("if_modified_since"))).as[Long]
      .head() shouldBe 1767744000L
    // the parse law alone: wrong weekday tolerated (the instant is
    // the validator, not the calendar), RFC-850/asctime/junk refuse
    Seq("Sun, 06 Nov 1994 08:49:37 GMT",   // the RFC example
      "Xxx, 06 Nov 1994 08:49:37 GMT",     // wrong weekday: tolerated
      "Mon, 31 Feb 2026 00:00:00 GMT",     // in-shape impossible date
      "Sunday, 06-Nov-94 08:49:37 GMT",    // RFC 850: obsolete
      "Sun Nov  6 08:49:37 1994",          // asctime: obsolete
      "junk").toDF("v")
      .select(imfFixdateEpoch(col("v"))).as[Option[Long]]
      .collect().toSeq shouldBe Seq(Some(784111777L), Some(784111777L),
        None, None, None, None)
  }

  test("IMF-fixdate render+parse match a java.time reference on 200 seeded random epochs (rightness, not just cross-engine sameness)") {
    // the oracle proves the two ENGINES agree; this proves they agree
    // with the CALENDAR — the render (fetchRequests' date_format) and
    // the parse (imfFixdateEpoch's rebuilt-ISO law) both checked
    // against java.time with correct weekdays, leap days included
    import graft.functions.TextExtraction.imfFixdateEpoch
    import java.time.format.DateTimeFormatter
    import java.time.{Instant, ZoneOffset}
    import java.util.Locale
    val ref = DateTimeFormatter
      .ofPattern("EEE, dd MMM yyyy HH:mm:ss 'GMT'", Locale.US)
      .withZone(ZoneOffset.UTC)
    val rnd = new scala.util.Random(20260816L)
    val epochs = Seq.fill(200)(rnd.nextLong(4102444800L)) :+ // to 2100
      951782400L :+ 4107542400L // 2000-02-29 and 2100-02-28 edges
    val rendered = epochs.map(e => (e, ref.format(Instant.ofEpochSecond(e))))
    // parse side: the Column law recovers every reference rendering
    val parsed = rendered.toDF("epoch", "s")
      .select(col("epoch"), imfFixdateEpoch(col("s")).as("got"))
      .as[(Long, Long)].collect()
    parsed.foreach { case (e, got) => got shouldBe e }
    // render side: fetchRequests' date_format equals the reference
    // string (weekday and month names included — Spark's US-locale
    // pattern vs java.time's must not drift)
    val f = rendered.toDF("epoch", "expected")
      .select(concat(lit("https://pt.ex/"), col("epoch")).as("url"),
        lit("pt.ex").as("host"), col("expected"),
        lit(null).cast("string").as("etag"),
        col("epoch").as("last_modified"))
    CrawlFrontier.fetchRequests(f)
      .join(rendered.toDF("epoch", "expected"),
        col("url") === concat(lit("https://pt.ex/"), col("epoch")))
      .filter(col("if_modified_since") =!= col("expected"))
      .count() shouldBe 0L
  }

  test("retryAfterSeconds / cacheControlMaxAge: numeric-gated, token-bounded, date/junk forms null out") {
    import graft.functions.TextExtraction.{retryAfterSeconds,
      cacheControlMaxAge}
    Seq("120", " 7200 ", "Fri, 31 Dec 1999 23:59:59 GMT", "-5", "abc",
      "", "12.5")
      .toDF("v").select(retryAfterSeconds(col("v"))).as[Option[Long]]
      .collect().toSeq shouldBe Seq(Some(120L), Some(7200L), None, None,
        None, None, None)
    Seq("max-age=3600", "public, max-age=600, must-revalidate",
      "MAX-AGE=60", "max-age=\"120\"", "s-maxage=99", "x-max-age=99",
      "max-age=abc", "no-cache")
      .toDF("v").select(cacheControlMaxAge(col("v"))).as[Option[Long]]
      .collect().toSeq shouldBe Seq(Some(3600L), Some(600L), Some(60L),
        Some(120L), None, None, None, None)
    // Retry-After only POSTPONES, only on failing answers: a declared
    // 8000 beats the doubled 3600-seeded interval but a declared
    // 99999 clamps at the law's own maxIntervalS (a hostile header
    // cannot freeze a row past the longest wait the law itself ever
    // takes); a declared 10 does not shorten it; a 200 ignores the
    // header entirely
    val f = mkFrontier(Seq(
      row("https://ra.ex/a", interval = 3600L),
      row("https://ra.ex/b", interval = 3600L),
      row("https://ra.ex/c", interval = 3600L, hash = Some("h")),
      row("https://ra.ex/d", interval = 3600L)))
    val fetched = Seq(
      ("https://ra.ex/a", 2000L, 503, Option.empty[String], Some(99999L)),
      ("https://ra.ex/b", 2000L, 429, Option.empty[String], Some(10L)),
      ("https://ra.ex/c", 2000L, 200, Some("h"), Some(99999L)),
      ("https://ra.ex/d", 2000L, 503, Option.empty[String], Some(8000L)))
      .toDF("url", "fetch_ts", "status", "content_hash", "retry_after")
    val out = CrawlFrontier.recrawlSchedule(f, fetched, rv)
      .orderBy("url").collect()
    // rv: min 100 max 10000; 3600 doubles to 7200
    out(0).getLong(9) shouldBe 2000L + 10000L // declared wait, clamped
    out(0).getLong(8) shouldBe 7200L          // stored backoff unchanged
    out(1).getLong(9) shouldBe 2000L + 7200L  // never shortens
    out(2).getLong(9) shouldBe 2000L + 7200L  // ok: header ignored
    out(3).getLong(9) shouldBe 2000L + 8000L  // in-range declaration wins
  }

  test("composed crawl loop with robots routing: robots rows lead their host's wave, results route by isRobotsUrl, the maintained rules gate admission, the refresh cadence holds") {
    import graft.functions.Robots
    val t0 = 1000L
    val hour = 3600L
    val day = 86400L
    // ONE frontier holds both row kinds: the origin's robots.txt at
    // priority 2.0 / fixed 24 h cadence, and its pages
    var frontier = CrawlFrontier.robotsSeeds(
        Seq("a.ex").toDF("host"), now = t0)
      .unionByName(CrawlFrontier.seed(
        Seq("https://a.ex/ok/0", "https://a.ex/blocked/0").toDF("url"),
        now = t0, defaultIntervalS = 1000L))
    var rules: DataFrame = null
    def cycle(now: Long, robotsTxt: Option[(Int, String)])
        : (Seq[String], Seq[String]) = {
      val batch = CrawlFrontier.selectBatch(frontier, now,
        batchSize = 10, perHostCap = 10).localCheckpoint(true)
      val isR = CrawlFrontier.isRobotsUrl(col("url"))
      // the router: robots rows to the lifecycle, pages to the law
      val robotsBatch = batch.filter(isR)
      val pageBatch = batch.filter(!isR)
      robotsTxt.foreach { case (status, txt) =>
        val fetched = robotsBatch.select(col("host").as("domain"),
          lit(status).as("status"), lit(txt).as("robots_txt"),
          lit(now + 1L).as("fetch_ts"))
        val fresh = Robots.rulesFromFetch(fetched, "graftbot")
        rules = (if (rules == null) fresh
                 else Robots.updateRules(rules, fresh))
          .localCheckpoint(true)
        val robotsResults = robotsBatch.select(col("url"),
          lit(now + 1L).as("fetch_ts"), lit(status).as("status"),
          lit(null).cast("string").as("content_hash"))
        frontier = CrawlFrontier.robotsRecrawlUpdates(robotsResults,
            frontier)
          .unionByName(frontier.join(robotsResults.select("url"),
            Seq("url"), "left_anti"))
      }
      val pageResults = pageBatch.select(col("url"),
        lit(now + 2L).as("fetch_ts"), lit(200).as("status"),
        md5(concat(lit(now.toString), col("url"))).as("content_hash"))
      val disc = pageBatch.select(
        regexp_replace(col("url"), "/[0-9]+$", s"/$now").as("url"),
        (col("depth") + 1).as("depth"))
      val admitted = CrawlFrontier.admit(frontier,
        CrawlFrontier.gateRobots(disc, rules), now)
      frontier = CrawlFrontier.recrawlUpdates(pageResults, frontier)
        .unionByName(admitted)
        .unionByName(frontier.join(
          pageResults.select("url").unionByName(admitted.select("url")),
          Seq("url"), "left_anti"))
        .localCheckpoint(true)
      (batch.select("url").as[String].collect().sorted.toSeq,
        admitted.select("url").as[String].collect().sorted.toSeq)
    }
    // wave 1: robots row LEADS (priority 2.0 beats the pages' 1.0),
    // rules arrive disallowing /blocked — the admission gate holds
    val (b1, a1) = cycle(t0, Some((200,
      "User-agent: *\nDisallow: /blocked\n")))
    b1 should contain("https://a.ex/robots.txt")
    b1.head shouldBe "https://a.ex/blocked/0" // sorted; batch HAS all 3
    a1 shouldBe Seq(s"https://a.ex/ok/$t0") // /blocked/1000 gated out
    // wave 2 an hour later: the robots row is NOT due (24 h cadence) —
    // only pages fetch; the maintained rules still gate
    val (b2, a2) = cycle(t0 + hour, None)
    b2 should not contain "https://a.ex/robots.txt"
    a2.foreach(u => u should not include "/blocked")
    // wave 3 past the cadence: the refresh fetches a CHANGED robots.txt
    // (allow-all) — the SAME admission chain now admits /blocked paths
    val (b3, a3) = cycle(t0 + day + 2 * hour, Some((200,
      "User-agent: *\nDisallow:\n")))
    b3 should contain("https://a.ex/robots.txt")
    a3.exists(_.contains("/blocked")) shouldBe true
    // the robots row survived every wave, still on the fixed cadence
    val rrow = frontier.filter(CrawlFrontier.isRobotsUrl(col("url")))
      .collect()(0)
    rrow.getString(10) shouldBe "active"
    rrow.getLong(9) shouldBe (t0 + day + 2 * hour + 1L + day)
  }

  test("standing robots lifecycle: a mid-loop robots change flips the next wave's admission; the maintained frame feeds gateRobots unchanged") {
    import graft.functions.Robots
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-robots-loop").toString
    val rulesDir = s"$dir/rules"
    // the read-modify-write standing face (the trap-stats convention):
    // each micro-batch of robots fetch results folds into the
    // maintained per-host frame via rulesFromFetch → updateRules
    val input = MemoryStream[(String, Int, String, Long)]
    val q = input.toDF()
      .toDF("domain", "status", "robots_txt", "fetch_ts").writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val fresh = Robots.rulesFromFetch(b, "graftbot")
        val merged =
          if (new java.io.File(rulesDir).exists())
            Robots.updateRules(spark.read.parquet(rulesDir), fresh)
          else fresh
        val tmp = s"$rulesDir.next"
        merged.write.mode("overwrite").parquet(tmp)
        val old = new java.io.File(rulesDir)
        if (old.exists()) {
          val bak = new java.io.File(s"$rulesDir.old")
          old.renameTo(bak)
          new java.io.File(tmp).renameTo(old)
          org.apache.commons.io.FileUtils.deleteDirectory(bak)
        } else new java.io.File(tmp).renameTo(old)
        (): Unit
      }
      .option("checkpointLocation", s"$dir/ckpt").start()
    val disc = Seq(("https://a.ex/private/1", 1),
      ("https://a.ex/pub/1", 1)).toDF("url", "depth")
    def admitted(): Seq[String] = CrawlFrontier.admit(mkFrontier(Seq.empty),
      CrawlFrontier.gateRobots(disc, spark.read.parquet(rulesDir)),
      now = 500L).select("url").as[String].collect().sorted.toSeq
    try {
      // wave 1: the host's robots.txt allows everything
      input.addData(("a.ex", 200, "User-agent: *\nDisallow:\n", 100L))
      q.processAllAvailable()
      admitted() shouldBe Seq("https://a.ex/private/1",
        "https://a.ex/pub/1")
      // wave 2: the ~24 h refresh fetches a CHANGED robots.txt — the
      // next admission wave must flip /private to blocked
      input.addData(
        ("a.ex", 200, "User-agent: *\nDisallow: /private\n", 86500L))
      q.processAllAvailable()
      admitted() shouldBe Seq("https://a.ex/pub/1")
      // wave 3: the host goes DARK (503) — §2.3.1 flips to complete
      // disallow until a definitive answer returns
      input.addData(("a.ex", 503, null.asInstanceOf[String], 173000L))
      q.processAllAvailable()
      admitted() shouldBe Seq.empty
    } finally q.stop()
  }
}
