package graft.serve

import org.apache.spark.sql.SparkSession

import graft.io.CsvCache

/** The response-cache surface the HTTP CRUD routes operate on —
  * decouples [[CoachingServer]] (zero-Spark transport) from the
  * Spark-backed store. Row maps are keyed by [[CsvCache.columns]]
  * (`Message`, `Response`, `Reasoning`, `Used Excerpts`,
  * `RAG sources`). */
trait CacheBackend {
  /** All sanitized rows, alphabetical by Message (the reference's
    * cached-questions order, api_routes.py:48-87 / W4). */
  def list(): Seq[Map[String, String]]

  /** Exact-match lookup — case-insensitive, trimmed, the F5 key rule
    * (reference api_routes.py:35-40's `message in message_cache`). */
  def lookup(message: String): Option[Map[String, String]]

  /** Append one Q&A row (reference cache_utils.py:83-132). */
  def add(question: String, response: String, reasoning: String = "",
          usedExcerpts: String = "", ragSources: String = ""): Unit

  /** Delete rows by Message key. Returns whether anything matched.
    * DELTA vs the reference (cache_utils.py:134-191 deletes by 0-based
    * ROW INDEX): a rewritten CSV directory has no stable row order, so
    * the row's natural key — the same trimmed, case-folded Message the
    * lookup uses — replaces the positional index. */
  def delete(message: String): Boolean
}

/** [[CacheBackend]] over the reference-format CSV cache directory
  * ([[CsvCache]] — S10): reads are header-checked sanitized scans,
  * mutations rewrite/append the directory exactly like the query-side
  * surface, so HTTP CRUD and the rag_cache_* queries see ONE store.
  * The cache is app-managed and small by contract (the reference keeps
  * it in a Python dict); each call runs a tiny Spark job. */
final class CsvCacheBackend(spark: SparkSession, path: String)
    extends CacheBackend {
  import org.apache.spark.sql.Row

  private def exists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  override def list(): Seq[Map[String, String]] =
    if (!exists) Seq.empty
    else CsvCache.read(spark, path)
      .orderBy(org.apache.spark.sql.functions.col("Message"))
      .collect().toSeq.map(rowToMap)

  private def rowToMap(r: Row): Map[String, String] =
    CsvCache.columns.map(c =>
      c -> Option(r.getAs[String](c)).getOrElse("")).toMap

  override def lookup(message: String): Option[Map[String, String]] =
    if (!exists) None
    else {
      // single filtered scan — not list()'s full sorted collect: the
      // send-message hot path probes one key per request
      val key = message.trim.toLowerCase
      CsvCache.read(spark, path)
        .filter(org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.trim(
            org.apache.spark.sql.functions.col("Message"))) === key)
        .limit(1).collect().headOption.map(rowToMap)
    }

  override def add(question: String, response: String, reasoning: String,
                   usedExcerpts: String, ragSources: String): Unit = {
    import spark.implicits._
    CsvCache.append(
      Seq((question, response, reasoning, usedExcerpts, ragSources))
        .toDF(CsvCache.columns: _*),
      path)
  }

  override def delete(message: String): Boolean =
    // one read: CsvCache.delete reports how many rows it removed, so
    // no pre-flight lookup scan is needed
    exists && CsvCache.delete(spark, path, message) > 0
}
