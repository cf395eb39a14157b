package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Knowledge-base ingestion sources (S6/S11).
  *
  * The reference stages markdown→JSON files and ingests them either via a
  * managed blob-storage source connector (reference main.tf:263-282,
  * README.md:101) or a Python publisher that walks the JSON directory and
  * maps fields onto the `knowledge` schema
  * (terraform/publish_knowledge_documents.py:177-254; transform at
  * :219-225: document_id←source_file, document_name←title,
  * document_category←parent directory, document_text←content).
  *
  * Spark-native: the blob connector is the file source —
  * `spark.read.json` for batch backfill, `spark.readStream.json` for
  * continuous ingestion (new files = new records, the same semantics as
  * the blob connector watching a container). The publisher's field
  * mapping is a declarative projection, so it fuses into the scan.
  */
object KnowledgeSource {

  /** On-disk JSON document shape (sample-data/process_md_to_json.py:51-56
    * writes {document_id, document_name, document_category, document_text};
    * the publisher re-derives them from {source_file, title, content} +
    * directory layout — both shapes are accepted). */
  val fileSchema: StructType = StructType(Seq(
    StructField("source_file", StringType),
    StructField("title", StringType),
    StructField("content", StringType)))

  /** The publisher transform (S11): file fields → knowledge schema.
    * Category = parent directory of the source path, like the publisher
    * deriving it from the folder the file sits in. */
  def publisherTransform(files: DataFrame): DataFrame =
    files.select(
      col("source_file").as("document_id"),
      col("title").as("document_name"),
      regexp_extract(col("source_file"), "^(?:(.*)/)?[^/]*$", 1)
        .as("document_category"),
      col("content").as("document_text"))

  /** Batch read of a JSON knowledge directory → `knowledge` rows. */
  def readKnowledgeDir(spark: SparkSession, dir: String): DataFrame =
    publisherTransform(spark.read.schema(fileSchema).json(dir))

  /** Streaming file source over the same directory — the blob-connector
    * analog: each new JSON file lands as new knowledge rows. */
  def streamKnowledgeDir(spark: SparkSession, dir: String,
                         maxFilesPerTrigger: Int = 100): DataFrame =
    publisherTransform(
      spark.readStream.schema(fileSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .json(dir))

  /** Pre-mapped JSON (the process_md_to_json.py output shape) — read
    * directly against the knowledge schema. */
  def readMappedKnowledgeDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(Tables.knowledgeSchema).json(dir)
}
