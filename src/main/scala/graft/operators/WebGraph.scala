package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The link graph of a web corpus — outlink extraction from HTML and
  * PageRank over the resulting edges (Page et al. 1999): the quality
  * signal a crawl pipeline computes right after ingest (link-farm
  * demotion, crawl-frontier prioritization, quality-weighted mixing).
  *
  * Outlink extraction is a pure codegen'd regex/HOF chain (RE2-safe,
  * oracle-replayable — the cross-engine-parity convention of
  * [[graft.functions.TextExtraction]]); PageRank is the standard
  * distributed shape: per iteration one src-keyed equi-join, one
  * dst-keyed partial-agg sum, and ONE scalar (the dangling mass)
  * across the driver — the Lloyd-transfer bound. Iterations
  * localCheckpoint like the alt-star component loop, so lineage stays
  * flat at any iteration count. */
object WebGraph {

  /** href targets of `<a href=...>` anchors — double-quoted,
    * single-quoted, AND unquoted values, all common in real HTML —
    * RESOLVED against the page's own URL: absolute links pass
    * through, protocol-relative (`//h/p`) take the base's scheme,
    * root-relative (`/p`) take the base's origin, and everything else
    * resolves against the base's directory. Fragments drop (an
    * in-page anchor is not an edge). Documented regex-class
    * simplifications: `../` segments are NOT normalized (the
    * canonicalizer downstream treats the spelled path as the key
    * either way), and a quoted href containing a literal space,
    * quote, or `>` truncates at it (a matching-quote law needs a
    * backreference, which RE2 — and therefore the cross-engine oracle
    * — cannot express; real URLs percent-encode all three). The
    * `\shref` boundary keeps `data-href=` from matching. Returns
    * array<string>. */
  def outlinks(html: Column, baseUrl: Column): Column = {
    val hrefs = regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*?\\shref\\s*=\\s*[\"']?([^\"'#\\s>]*)"), lit(1))
    // one-element OUTER transform: Catalyst does not CSE across HOF
    // lambda bodies, so both the base-URL regexes AND the full-page
    // href scan must be bound ONCE per row — ctx as the outer lambda
    // var, hrefs referenced inside the outer body (evaluated once for
    // the single element). A zip_with(hrefs, array_repeat(ctx,
    // size(hrefs))) form re-evaluates the PAGE scan through size() —
    // doubling the dominant cost it meant to remove.
    filter(
      flatten(transform(array(baseCtx(baseUrl)), c =>
        transform(hrefs, h => resolve(h, c)))),
      h => length(h) > 0)
  }

  /** The base URL's (scheme, origin, dir) struct — always bind it as a
    * one-element outer-transform lambda var (see [[outlinks]]); used
    * inline it re-evaluates its three regexes per href. */
  private def baseCtx(baseUrl: Column): Column =
    struct(
      regexp_extract(baseUrl, "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
        .as("scheme"),
      regexp_extract(baseUrl, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
        .as("origin"),
      regexp_replace(regexp_replace(baseUrl, "[?#].*$", ""),
        "/[^/]*$", "/").as("dir"))

  /** The resolution law shared by [[outlinks]] and [[anchorTexts]]. */
  private def resolve(h: Column, ctx: Column): Column =
    when(h.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), h)
      .when(h.startsWith("//"), concat(ctx("scheme"), lit(":"), h))
      .when(h.startsWith("/"), concat(ctx("origin"), h))
      .when(length(h) > 0, concat(ctx("dir"), h))
      .otherwise(lit(""))

  /** (resolved link, anchor text) pairs of a page's `<a href>`
    * anchors — the inlink-description signal (anchor text describes
    * the TARGET better than the target's own boilerplate; the classic
    * ranking feature and a retrieval-training augmentation). ONE
    * pattern matched twice (group 1 = href, group 2 = inner text)
    * guarantees the two arrays zip positionally; resolution is
    * [[outlinks]]'s law; anchor text is tag-stripped/entity-decoded
    * inline ([[graft.functions.TextExtraction.blockText]]).
    * Fragment-only anchors drop. Returns array<struct<link, text>>. */
  def anchorTexts(html: Column, baseUrl: Column): Column = {
    // quote law as [[outlinks]] (double/single/unquoted, `\shref`
    // boundary), but the href capture KEEPS fragments ([#] stays in
    // the class) and strips them afterwards: a '#'-excluding capture
    // cannot match a fragment-carrying href at all, so
    // '<a href="/p#intro">x</a>' would silently lose its anchor text
    // while outlinks keeps the edge — the two laws must agree
    val pat =
      lit("(?is)<a\\b[^>]*?\\shref\\s*=\\s*[\"']?([^\"'\\s>]*)[\"']?" +
        "[^>]*>(.*?)</a>")
    val hrefs = regexp_extract_all(html, pat, lit(1))
    val texts = regexp_extract_all(html, pat, lit(2))
    // the outlinks one-element-outer-transform recipe: ctx bound once,
    // and the two full-page scans (hrefs, texts) evaluated once each
    // inside the outer lambda — the structural floor for a two-group
    // extraction
    filter(
      flatten(transform(array(baseCtx(baseUrl)), c =>
        zip_with(hrefs, texts, (h, t) => struct(
          resolve(regexp_replace(h, "#.*$", ""), c).as("link"),
          graft.functions.TextExtraction.blockText(t).as("text"))))),
      p => length(p("link")) > 0)
  }

  /** HITS hubs & authorities (Kleinberg 1999, JACM): the OTHER classic
    * link-quality pair — authorities are pages good hubs point AT,
    * hubs are pages that point at good authorities; iterate
    * a ← Aᵀh, h ← Aa with L2 normalization after each half-step.
    * Same distributed shape as [[pageRank]]: per half-step one
    * edge-keyed join + one partial-agg sum, the L2 norm is ONE driver
    * scalar, and each half-step localCheckpoints (flat lineage).
    * Duplicate edges vote once. A normless half-step (no edges) keeps
    * its zeros instead of dividing by zero. Returns
    * (id, hub, authority). */
  def hits(nodes: DataFrame, edges: DataFrame, iters: Int = 2,
           idCol: String = "id", srcCol: String = "src",
           dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val ids = nodes.select(col(idCol).as("id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count() // materialize: reused 2× per iteration
    def normalized(scored: DataFrame, c: String): DataFrame = {
      // coalesce: sum over ZERO rows (an empty node set) is null, and
      // getDouble would NPE — pageRank guards its analogous scalar the
      // same way
      val nrm = math.sqrt(scored
        .agg(coalesce(sum(col(c) * col(c)), lit(0.0)))
        .head().getDouble(0))
      val div = if (nrm > 0) nrm else 1.0
      scored.select(col("id"), (col(c) / lit(div)).as(c))
        .localCheckpoint(true)
    }
    try {
      var hub = ids.select(col("id"), lit(1.0).as("hub"))
        .localCheckpoint(true)
      var auth = ids.select(col("id"), lit(0.0).as("authority"))
        .localCheckpoint(true)
      (1 to iters).foreach { _ =>
        val a0 = e.join(hub, e("src") === hub("id"))
          .groupBy(col("dst")).agg(sum(col("hub")).as("s"))
        auth = normalized(ids.join(a0, ids("id") === a0("dst"), "left")
          .select(ids("id"), coalesce(col("s"), lit(0.0)).as("authority")),
          "authority")
        val h0 = e.join(auth, e("dst") === auth("id"))
          .groupBy(col("src")).agg(sum(col("authority")).as("s"))
        hub = normalized(ids.join(h0, ids("id") === h0("src"), "left")
          .select(ids("id"), coalesce(col("s"), lit(0.0)).as("hub")),
          "hub")
      }
      hub.join(auth, Seq("id"))
        .select(col("id"), col("hub"), col("authority"))
    } finally { ids.unpersist(); e.unpersist() }
  }

  /** PageRank over (src, dst) edges for the given node set: `iters`
    * power iterations at damping `d`, dangling mass redistributed
    * uniformly (the standard correction — without it rank leaks and
    * the vector stops summing to 1).
    *
    * Per iteration: contributions = edges ⋈ ranks ⋈ out-degrees (one
    * src-keyed shuffle), summed per dst (partial-agg combinable), the
    * dangling mass is ONE driver scalar (an anti-join aggregate), and
    * the new vector localCheckpoints (truncated lineage — the alt-star
    * recipe; an unbroken 20-iteration plan would be exponential to
    * analyze). Duplicate edges count once (a page linking twice votes
    * once — the convention the oracle replays).
    *
    * Returns (id, pagerank) — callers round for oracles (unordered
    * float summation is ulp-stable far below the repo's round-6
    * convention). */
  def pageRank(nodes: DataFrame, edges: DataFrame,
               iters: Int = 3, d: Double = 0.85,
               idCol: String = "id", srcCol: String = "src",
               dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(d > 0.0 && d < 1.0, s"damping must be in (0,1): $d")
    val spark = nodes.sparkSession
    val ids = nodes.select(col(idCol).as("id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = ids.count().toDouble
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    outdeg.count() // materialize: the loop reuses it every iteration
    try {
      var ranks = ids.select(col("id"), lit(1.0 / n).as("pagerank"))
        .localCheckpoint(true)
      (1 to iters).foreach { _ =>
        // one scalar across the driver: the rank mass sitting on
        // dangling (outdegree-0) nodes this iteration
        val dangling = ranks.join(outdeg,
            ranks("id") === outdeg("src"), "left_anti")
          .agg(coalesce(sum(col("pagerank")), lit(0.0)))
          .head().getDouble(0)
        val contrib = e
          .join(ranks, e("src") === ranks("id"))
          .join(outdeg, Seq("src"))
          .select(col("dst"), (col("pagerank") / col("deg")).as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
        ranks = ids
          .join(contrib, ids("id") === contrib("dst"), "left")
          .select(col("id"),
            (lit((1.0 - d) / n) +
              lit(d) * (coalesce(col("inflow"), lit(0.0)) +
                lit(dangling / n))).as("pagerank"))
          .localCheckpoint(true)
      }
      ranks
    } finally { ids.unpersist(); e.unpersist(); outdeg.unpersist() }
  }
}
