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
  * ([[CsvCache]] — S10): the directory stays the STORE OF RECORD —
  * mutations rewrite/append it exactly like the query-side surface, so
  * HTTP CRUD and the rag_cache_* queries see ONE store — but reads
  * serve from an in-memory image (the reference keeps the whole cache
  * in a Python dict, api_routes.py). One Spark job loads the sanitized
  * sorted rows on the first read after any mutation; every later
  * `list`/`lookup` is a map probe with NO Spark job (ServeSpec pins
  * this with a job-count listener), so per-request latency is
  * scheduler-free — the cache is app-managed and small by contract,
  * which is what makes a full materialized image correct to hold.
  *
  * Single-writer like the CSV layout itself: a writer OUTSIDE this
  * instance (a second backend, a direct CsvCache.append) isn't seen
  * until [[invalidate]] — the same exclusion every non-catalog
  * file-format store documents. */
final class CsvCacheBackend(spark: SparkSession, path: String)
    extends CacheBackend {
  import org.apache.spark.sql.Row

  /** Sorted rows (the list order) + the trimmed-case-folded Message
    * index (the F5 lookup key rule). For duplicate keys the FIRST row
    * in Message order wins — deterministic, where the previous
    * per-request `limit(1)` scan took an arbitrary partition's row. */
  private final case class Image(rows: Seq[Map[String, String]],
      byKey: Map[String, Map[String, String]])
  @volatile private var image: Image = null

  /** Drop the memory image; the next read reloads from the directory.
    * For coordinating with an external writer (see class doc). */
  def invalidate(): Unit = image = null

  private def exists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The ONE read job: sanitized scan, sorted in the load (Spark's
    * UTF8 binary Message order — byte-identical to the previous
    * per-request orderBy, so list() output is unchanged). */
  private def current(): Image = {
    val i = image
    if (i != null) i
    else synchronized {
      val i2 = image // double-checked: a racing reader may have loaded
      if (i2 != null) i2
      else {
        val rows =
          if (!exists) Seq.empty[Map[String, String]]
          else CsvCache.read(spark, path)
            .orderBy(org.apache.spark.sql.functions.col("Message"))
            .collect().toSeq.map(rowToMap)
        val byKey = rows.reverseIterator // first-in-order wins
          .map(r => r("Message").trim.toLowerCase -> r).toMap
        val loaded = Image(rows, byKey)
        image = loaded
        loaded
      }
    }
  }

  private def rowToMap(r: Row): Map[String, String] =
    CsvCache.columns.map(c =>
      c -> Option(r.getAs[String](c)).getOrElse("")).toMap

  override def list(): Seq[Map[String, String]] = current().rows

  override def lookup(message: String): Option[Map[String, String]] =
    current().byKey.get(message.trim.toLowerCase)

  override def add(question: String, response: String, reasoning: String,
                   usedExcerpts: String, ragSources: String): Unit =
    synchronized {
      import spark.implicits._
      CsvCache.append(
        Seq((question, response, reasoning, usedExcerpts, ragSources))
          .toDF(CsvCache.columns: _*),
        path)
      image = null
    }

  override def delete(message: String): Boolean = synchronized {
    // one rewrite job: CsvCache.delete reports how many rows it
    // removed, so no pre-flight lookup scan is needed
    val hit = exists && CsvCache.delete(spark, path, message) > 0
    image = null
    hit
  }
}
