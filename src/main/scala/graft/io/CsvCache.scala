package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The response-cache surface (S10/F7): the reference keeps a CSV of
  * cached Q&A rows with header `Message, Response, Reasoning,
  * Used Excerpts, RAG sources`, read into memory at boot, appended on
  * Ctrl+Shift+C saves, deleted from via the cache CRUD routes, and
  * sanitized on every pass (None→"", drop rows missing Message/Response)
  * — reference app/utils/cache_utils.py:32-81 read, :83-132 append,
  * :134-191 delete, :68-75,234-246 + app/routes/api_routes.py:57-78
  * sanitize.
  *
  * Spark-native: the cache is a small DataFrame; reads are header-checked
  * CSV scans, mutations rewrite the directory (CSV has no upsert — same
  * as the reference rewriting the file), and the sanitize pass is F7's
  * null-scrub as catalyst expressions.
  *
  * FORMAT: RFC-4180-style quoting with '"' as the escape character
  * (quotes doubled) on BOTH the writer and reader — the format Python's
  * csv module (the reference's writer, cache_utils.py) produces, unlike
  * Spark's nonstandard backslash default. A cache directory written with
  * backslash escaping (pre-format builds) needs a one-time rewrite.
  */
object CsvCache {

  val columns: Seq[String] =
    Seq("Message", "Response", "Reasoning", "Used Excerpts", "RAG sources")

  val schema: StructType =
    StructType(columns.map(c => StructField(c, StringType)))

  /** F7: replace NULL with "" in every column, then drop rows without a
    * usable Message and Response (api_routes.py:57-78). Columns are cast
    * to string first: na.fill silently skips non-string columns (e.g. the
    * NullType a literal null produces), which would leave nulls behind. */
  def sanitize(df: DataFrame): DataFrame =
    df.select(columns.map(c => col(c).cast("string").as(c)): _*)
      .na.fill("", columns)
      .filter(trim(col("Message")) =!= "" && trim(col("Response")) =!= "")

  /** Header-checked read + sanitize (cache_utils.py:32-81: a cache file
    * with a wrong header is treated as corrupt, not silently misparsed).
    *
    * ONE scan: column names come from header inference (Spark reads just
    * the first header line at planning time — never a data row, unlike a
    * headerless limit(1) which has no ordering guarantee), and the same
    * DataFrame is the data read. multiLine + escape match [[append]]'s
    * writer so quoted embedded newlines round-trip. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", true).option("multiLine", true).option("escape", "\"")
      .csv(path)
    require(raw.columns.toSeq == columns,
      s"cache header mismatch: ${raw.columns.toSeq}")
    sanitize(raw)
  }

  /** Append rows (sanitized first, like the reference's save path). */
  def append(df: DataFrame, path: String): Unit =
    sanitize(df.select(columns.map(col): _*))
      .write.mode(SaveMode.Append)
      .option("header", true).option("escape", "\"").csv(path)

  /** The cached-questions surface (reference api_routes.py:48-87): all
    * cached questions alphabetically (W4). */
  def questions(cache: DataFrame): DataFrame =
    sanitize(cache).select(col("Message").as("question"))
      .orderBy(col("question"))

  /** Seeded shuffle of `n` suggested questions (W5, reference
    * script.js:426-428) — deterministic for a fixed seed. */
  def suggestQuestions(cache: DataFrame, n: Int, seed: Long = 42): DataFrame =
    sanitize(cache).select(col("Message").as("question"))
      .orderBy(rand(seed), col("question")).limit(n)

  /** Delete rows whose Message matches (case-insensitive, trimmed — the
    * same key rule as the F5 lookup). CSV has no delete: read, filter,
    * rewrite — cache_utils.py:134-191 does the same file rewrite.
    * Returns the number of rows removed (0 = key absent, nothing
    * rewritten — the CRUD route's found/not-found signal without a
    * second scan). */
  def delete(spark: SparkSession, path: String, message: String): Int = {
    val all = read(spark, path)
      .collect() // cache is small by contract (an app-managed CSV)
    val key = message.trim.toLowerCase
    val (removed, kept) = all.partition(r =>
      Option(r.getAs[String]("Message")).exists(_.trim.toLowerCase == key))
    if (removed.nonEmpty) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(kept.toIndexedSeq), schema)
      df.write.mode(SaveMode.Overwrite)
        .option("header", true).option("escape", "\"").csv(path)
    }
    removed.length
  }
}
