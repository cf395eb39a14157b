package graft.io

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Avro Object Container Files as a source/sink — the FILE half of the
  * Avro surface (the wire half is [[AvroCodec]]'s Schema-Registry-framed
  * topic values; reference kafka_utils.py:266-339). OCF is the standard
  * at-rest interchange for Avro-modeled corpora: self-describing header,
  * per-block deflate compression (JDK zlib — no external codec jar),
  * splittable by block.
  *
  * Built on plain Apache Avro (on the Spark classpath; there is no
  * spark-avro connector jar in this build): the WRITE runs one container
  * file per partition inside `foreachPartition` (no driver hop), the
  * READ parallelizes the file list and decodes each container in the
  * executor that owns it. Part files inherit upstream partition sizing,
  * which bounds the per-file decode; at 100 TB the file list itself is
  * the only driver-side state (same as any file-based source).
  */
object AvroFiles {

  /** Write `df` as deflate-compressed OCF part files under `dir` (one
    * per non-empty partition).
    *
    * Task-commit discipline: each task writes a `.tmp`-suffixed file and
    * atomically renames it on successful close, so a task that dies
    * mid-write leaves only an ignorable temp (readers filter on
    * `.avro`), never a truncated container. A SPECULATIVE duplicate of a
    * successful task would still commit a second complete file — this
    * sink has no output-coordinator; run it with speculation off (the
    * default) or behind a real committer at cluster scale. */
  def write(df: DataFrame, dir: String, recordName: String = "record"): Unit = {
    val json = AvroCodec.avroSchemaFor(df.schema, recordName).toString
    new java.io.File(dir).mkdirs()
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(json)
        val name = s"part-${java.util.UUID.randomUUID().toString.take(12)}.avro"
        val tmp = new java.io.File(dir, s".$name.tmp")
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(CodecFactory.deflateCodec(6))
        w.create(schema, tmp)
        var ok = false
        try {
          it.foreach(r => w.append(AvroCodec.toRecord(r, schema)))
          ok = true
        } finally {
          w.close()
          if (ok)
            java.nio.file.Files.move(tmp.toPath,
              new java.io.File(dir, name).toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          else tmp.delete()
        }
      }
    }
  }

  /** Read every `.avro` container under `dir` back into a DataFrame with
    * schema `st` — one task per part file; each task materializes its
    * file's records (bounded by the writer's partition sizing). */
  def read(spark: SparkSession, dir: String, st: StructType,
           recordName: String = "record"): DataFrame = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).map(_.getAbsolutePath).sorted.toSeq
    val json = AvroCodec.avroSchemaFor(st, recordName).toString
    val rows = spark.sparkContext
      .parallelize(files, math.max(files.length, 1))
      .flatMap { path =>
        val schema = new Schema.Parser().parse(json)
        val reader = DataFileReader.openReader(new java.io.File(path),
          new GenericDatumReader[GenericRecord](schema))
        try reader.iterator().asScala.map(AvroCodec.fromRecord(_, st)).toList
        finally reader.close()
      }
    spark.createDataFrame(rows, st)
  }
}
