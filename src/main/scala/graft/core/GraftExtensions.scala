package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CharEntropy, CosineSimilarityFloat, DotProductFloat, IndexedVectorSearchRule, MaxSimDotFloat, MlPredictExpression, SplitTextGenerator, SquaredL2Float, VectorSearchDiverseGenerator, VectorSearchGenerator, WinnowGenerator}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions in the SQL function registry, so `spark.sql` users get
  * the same codegen'd operators as the DataFrame API
  * (`SELECT vector_cosine(a.embedding, b.embedding) ...`), plus the
  * generator/lateral spellings of the reference's SQL surface:
  * `LATERAL VIEW split_text_gen(text, ...)` for
  * `CROSS JOIN UNNEST(ML_CHARACTER_TEXT_SPLITTER(...))`,
  * `ml_predict('model', col)` for `LATERAL TABLE(ML_PREDICT(...))`,
  * `LATERAL VIEW vector_search('store', k, emb)` for
  * `LATERAL TABLE(VECTOR_SEARCH(...))` (the array-returning
  * `split_text` UDF stays registered for scalar call sites).
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.core.GraftExtensions")`
  * (done by Sessions.local) or on any existing cluster config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Shared validation for operator-shaping arguments: they configure
    * the expression (chunk sizes, window widths, registry names), not
    * per-row data, so they must be non-NULL literals; conversion
    * failures name the function and argument instead of surfacing a
    * bare NumberFormatException. */
  private def literalArg[T](fn: String, children: Seq[Expression], i: Int,
                            name: String, f: Any => T): T = {
    require(children(i).foldable, s"$fn argument $name must be a literal")
    val v = children(i).eval(null)
    require(v != null, s"$fn argument $name must not be NULL")
    try f(v) catch {
      case e @ (_: NumberFormatException | _: IllegalArgumentException) =>
        throw new IllegalArgumentException(
          s"$fn argument $name has the wrong type (got '$v'): ${e.getMessage}", e)
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // CREATE MODEL / CONNECTION / VECTOR INDEX DDL (GraftSqlParser);
    // every other statement passes through to the delegate Spark parser
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // serve lateral vector_search over a PERSISTED index as a
    // partition-pruned join instead of per-row evaluation (which would
    // launch a Spark job inside each task) — see IndexedVectorSearchRule
    ext.injectPostHocResolutionRule(IndexedVectorSearchRule)
    ext.injectFunction((
      new FunctionIdentifier("split_text_gen"),
      new ExpressionInfo(classOf[SplitTextGenerator].getName, "split_text_gen"),
      (children: Seq[Expression]) => {
        require(children.nonEmpty && children.length <= 8,
          "split_text_gen(text[, size, overlap, sep, is_regex, " +
            "keep_separator, trim_chunks, sep_position]) takes 1-8 arguments")
        def arg[T](i: Int, default: T, f: Any => T): T =
          if (children.length <= i) default
          else literalArg("split_text_gen", children, i, s"${i + 1}", f)
        SplitTextGenerator(children(0),
          size = arg(1, 200, _.toString.toInt),
          overlap = arg(2, 20, _.toString.toInt),
          sep = arg(3, "###", _.toString),
          isRegex = arg(4, false, _.toString.toBoolean),
          keepSeparator = arg(5, false, _.toString.toBoolean),
          trimChunks = arg(6, true, _.toString.toBoolean),
          sepPosition = arg(7, "START", _.toString))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vector_cosine"),
      new ExpressionInfo(classOf[CosineSimilarityFloat].getName, "vector_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vector_cosine(a, b) takes 2 arguments")
        CosineSimilarityFloat(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vector_dot(a, b) takes 2 arguments")
        DotProductFloat(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vector_sqdist"),
      new ExpressionInfo(classOf[SquaredL2Float].getName, "vector_sqdist"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vector_sqdist(a, b) takes 2 arguments")
        SquaredL2Float(children(0), children(1))
      }))
    // ColBERT-style late interaction over token slices of a flat
    // embedding (normalize slices upstream for cosine MaxSim)
    ext.injectFunction((
      new FunctionIdentifier("vector_maxsim"),
      new ExpressionInfo(classOf[MaxSimDotFloat].getName, "vector_maxsim"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "vector_maxsim(a, b, tokens) takes 3 arguments")
        MaxSimDotFloat(children(0), children(1),
          literalArg("vector_maxsim", children, 2, "tokens", _.toString.toInt))
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_gen"),
      new ExpressionInfo(classOf[WinnowGenerator].getName, "winnow_gen"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "winnow_gen(text, k, w) takes 3 arguments")
        WinnowGenerator(children(0),
          literalArg("winnow_gen", children, 1, "k", _.toString.toInt),
          literalArg("winnow_gen", children, 2, "w", _.toString.toInt))
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "char_entropy(text) takes 1 argument")
        CharEntropy(children(0))
      }))
    // the reference's LATERAL TABLE(ML_PREDICT('model', col)) — model
    // resolution via ModelRegistry, output type from the model's task
    ext.injectFunction((
      new FunctionIdentifier("ml_predict"),
      new ExpressionInfo(classOf[MlPredictExpression].getName, "ml_predict"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "ml_predict(model, input) takes 2 arguments")
        MlPredictExpression(
          literalArg("ml_predict", children, 0, "1 (model name)", _.toString),
          children(1))
      }))
    // the reference's LATERAL TABLE(VECTOR_SEARCH(table, k,
    // DESCRIPTOR(embedding), qe.embedding)) — store resolved by name,
    // one (rank, document_id, chunks, score) row per hit; the optional
    // 4th argument is the numCandidates recall knob (defaults to the
    // store's registered value)
    ext.injectFunction((
      new FunctionIdentifier("vector_search"),
      new ExpressionInfo(classOf[VectorSearchGenerator].getName, "vector_search"),
      (children: Seq[Expression]) => {
        require(children.length == 3 || children.length == 4,
          "vector_search(store, k, query_embedding[, num_candidates]) " +
            "takes 3-4 arguments")
        VectorSearchGenerator(
          literalArg("vector_search", children, 0, "store", _.toString),
          literalArg("vector_search", children, 1, "k", _.toString.toInt),
          children(2),
          if (children.length < 4) None
          else Some(literalArg("vector_search", children, 3,
            "num_candidates", _.toString.toInt)))
      }))
    // MMR-diversified retrieval through the same lateral spelling —
    // lambda is the relevance/diversity trade-off (1.0 = plain cosine
    // order); over a persisted index the lateral rewrites to the
    // pruned-join + bounded re-rank plan (IndexedVectorSearchRule)
    ext.injectFunction((
      new FunctionIdentifier("vector_search_diverse"),
      new ExpressionInfo(classOf[VectorSearchDiverseGenerator].getName,
        "vector_search_diverse"),
      (children: Seq[Expression]) => {
        require(children.length == 4 || children.length == 5,
          "vector_search_diverse(store, k, lambda, query_embedding" +
            "[, num_candidates]) takes 4-5 arguments")
        VectorSearchDiverseGenerator(
          literalArg("vector_search_diverse", children, 0, "store", _.toString),
          literalArg("vector_search_diverse", children, 1, "k", _.toString.toInt),
          literalArg("vector_search_diverse", children, 2, "lambda",
            _.toString.toDouble),
          children(3),
          if (children.length < 5) None
          else Some(literalArg("vector_search_diverse", children, 4,
            "num_candidates", _.toString.toInt)))
      }))
    webFunctions.foreach(ext.injectFunction)
  }

  /** The r16 web/crawl scalar laws as SQL functions — COMPOSED column
    * expressions registered through the Expression↔Column bridge, so
    * `spark.sql` users run the exact codegen'd chains the DataFrame
    * API runs (no UDF detour, identical results by construction —
    * SqlSurfaceSpec pins the parity). */
  private def composed(name: String, arity: Int, doc: String)(
      law: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(doc, name),
    (children: Seq[Expression]) => {
      require(children.length == arity,
        s"$name takes $arity argument(s), got ${children.length}")
      import org.apache.spark.sql.graft.VectorExpressions.{toColumn, toExpression}
      toExpression(law(children.map(toColumn)))
    })

  private val webFunctions = Seq(
    composed("url_normalize", 1, "graft.functions.UrlOps")(c =>
      graft.functions.UrlOps.normalizeUrl(c(0))),
    composed("url_host", 1, "graft.functions.UrlOps")(c =>
      graft.functions.UrlOps.hostOf(c(0))),
    composed("url_path", 1, "graft.functions.UrlOps")(c =>
      graft.functions.UrlOps.pathOf(c(0))),
    composed("registered_domain", 1, "graft.functions.UrlOps")(c =>
      graft.functions.UrlOps.registeredDomain(c(0))),
    composed("url_template", 1, "graft.operators.CrawlFrontier")(c =>
      graft.operators.CrawlFrontier.urlTemplate(c(0))),
    composed("resolve_url", 2, "graft.operators.WebGraph")(c =>
      graft.operators.WebGraph.resolveUrl(c(0), c(1))),
    composed("canonical_url", 2, "graft.operators.WebGraph")(c =>
      graft.operators.WebGraph.canonicalUrl(c(0), c(1))),
    composed("outlinks", 2, "graft.operators.WebGraph")(c =>
      graft.operators.WebGraph.outlinks(c(0), c(1))),
    composed("followed_outlinks", 2, "graft.operators.WebGraph")(c =>
      graft.operators.WebGraph.followedOutlinks(c(0), c(1))),
    composed("html_text", 1, "graft.functions.TextExtraction")(c =>
      graft.functions.TextExtraction.stripHtml(c(0))),
    composed("is_soft404", 1, "graft.functions.TextExtraction")(c =>
      graft.functions.TextExtraction.isSoft404(c(0))),
    composed("robots_meta", 1, "graft.functions.TextExtraction")(c =>
      graft.functions.TextExtraction.robotsMetaContent(c(0))),
    // the two REP flags as boolean scalars (not the struct form:
    // field extraction on a bridge-composed struct does not resolve
    // from SQL, and two booleans are the better SQL ergonomics anyway)
    composed("robots_noindex", 1, "graft.functions.TextExtraction")(c =>
      graft.functions.TextExtraction.robotsFlags(c(0))("noindex")),
    composed("robots_nofollow", 1, "graft.functions.TextExtraction")(c =>
      graft.functions.TextExtraction.robotsFlags(c(0))("nofollow")),
    // the r18 politeness-header scalars (fetch loops parse these
    // in-plan: Retry-After delta-seconds, Cache-Control max-age)
    composed("retry_after_seconds", 1,
      "graft.functions.TextExtraction")(c =>
      graft.functions.TextExtraction.retryAfterSeconds(c(0))),
    composed("cache_max_age", 1, "graft.functions.TextExtraction")(c =>
      graft.functions.TextExtraction.cacheControlMaxAge(c(0))),
    // the r19 loop routers (a SQL-built crawl cycle splits its fetch
    // results between the page / robots / sitemap laws with these)
    composed("is_robots_url", 1, "graft.operators.CrawlFrontier")(c =>
      graft.operators.CrawlFrontier.isRobotsUrl(c(0))),
    composed("is_sitemap_url", 1, "graft.operators.CrawlFrontier")(c =>
      graft.operators.CrawlFrontier.isSitemapUrl(c(0))),
    // and the IMF-fixdate validator parse (zone-free)
    composed("http_date_epoch", 1, "graft.functions.TextExtraction")(c =>
      graft.functions.TextExtraction.imfFixdateEpoch(c(0))))
}
