package graft.io

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.{Encoders => E}
import org.apache.spark.sql.types._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, VarBinaryVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel

/** Arrow IPC (Feather v2) sharding — the interchange container of the
  * ML data ecosystem (HuggingFace `datasets` memory-maps exactly this
  * format; the random-access file variant with the ARROW1 magic and a
  * trailing footer). Built on the arrow-vector library Spark itself
  * ships for its Arrow interchange — columnar batches, zero per-record
  * framing overhead, and readable by pyarrow/polars/duckdb as-is.
  *
  * Same conventions as the [[WebDataset]]/[[TfRecord]]/[[AvroFiles]]
  * containers: ONE shard per partition built in a single
  * `mapPartitions` pass (no shuffle — at 100 TB the shard writer is a
  * pure map stage; partition count = shard count is the caller's
  * repartition decision), shard bytes stay a column for any sink, and
  * round-trips are content-exact (`ArrowIpcSpec` property-checks
  * random payloads; the mm_arrow_roundtrip oracle hash-checks the
  * documents corpus end to end).
  *
  * Record schema mirrors the other containers: media_id int64 NOT
  * NULL, content binary, source utf8. Rows with a null id are dropped
  * (the quarantine policy); null content/source round-trip as Arrow
  * validity-bitmap nulls — the nullability story TFRecord's required
  * features cannot express. */
object ArrowIpc {

  private val arrowSchema = new Schema(java.util.Arrays.asList(
    new Field("media_id", FieldType.notNullable(new ArrowType.Int(64, true)), null),
    new Field("content", FieldType.nullable(ArrowType.Binary.INSTANCE), null),
    new Field("source", FieldType.nullable(ArrowType.Utf8.INSTANCE), null)))

  /** Encode (media_id, content, source) rows into ONE Arrow IPC file's
    * bytes, chunked into record batches of `batchRows` — real Arrow
    * files are multi-batch (the record batch is the mmap/scan unit;
    * HuggingFace datasets writes ~1000-row batches so a reader never
    * materializes a shard at once), and a multi-batch writer keeps this
    * encoder's memory bounded by the batch, not the partition. The
    * per-partition unit of [[toShards]]. */
  def encode(rows: Seq[(Long, Array[Byte], String)],
             batchRows: Int = 1024): Array[Byte] = {
    require(batchRows > 0, s"invalid batchRows=$batchRows")
    val allocator = new RootAllocator()
    try {
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      try {
        val ids = root.getVector("media_id").asInstanceOf[BigIntVector]
        val contents = root.getVector("content").asInstanceOf[VarBinaryVector]
        val sources = root.getVector("source").asInstanceOf[VarCharVector]
        val out = new java.io.ByteArrayOutputStream()
        val writer = new ArrowFileWriter(root, null,
          java.nio.channels.Channels.newChannel(out))
        try {
          writer.start()
          rows.grouped(batchRows).foreach { batch =>
            root.allocateNew()
            batch.zipWithIndex.foreach { case ((id, content, source), i) =>
              ids.setSafe(i, id)
              if (content == null) contents.setNull(i)
              else contents.setSafe(i, content)
              if (source == null) sources.setNull(i)
              else sources.setSafe(i, source.getBytes("UTF-8"))
            }
            root.setRowCount(batch.length)
            writer.writeBatch()
          }
          writer.end()
        } finally writer.close()
        out.toByteArray
      } finally root.close()
    } finally allocator.close()
  }

  /** Decode one Arrow IPC file's bytes back to rows, walking every
    * record batch. Invalid bytes (no ARROW1 magic / mangled footer)
    * yield no rows — the corpus byte-parser policy, never a crash. */
  def decode(bytes: Array[Byte]): Seq[(Long, Array[Byte], String)] = {
    if (bytes == null) return Seq.empty
    val allocator = new RootAllocator()
    try {
      val reader = new ArrowFileReader(
        new ByteArrayReadableSeekableByteChannel(bytes), allocator)
      try {
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte], String)]
        while (reader.loadNextBatch()) {
          val root = reader.getVectorSchemaRoot
          val ids = root.getVector("media_id").asInstanceOf[BigIntVector]
          val contents = root.getVector("content").asInstanceOf[VarBinaryVector]
          val sources = root.getVector("source").asInstanceOf[VarCharVector]
          var i = 0
          while (i < root.getRowCount) {
            out += ((ids.get(i),
              if (contents.isNull(i)) null else contents.get(i),
              if (sources.isNull(i)) null
              else new String(sources.get(i), "UTF-8")))
            i += 1
          }
        }
        out.toSeq
      } finally reader.close()
    } catch {
      case _: Exception => Seq.empty
    } finally allocator.close()
  }

  /** Media rows → one Arrow IPC shard per partition:
    * (shard BINARY, n_records BIGINT). Null-id rows are dropped. */
  def toShards(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("shard", BinaryType),
      StructField("n_records", LongType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val binIdx = media.schema.fieldIndex("content")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { it =>
      val rows = it.flatMap { r =>
        if (r.isNullAt(idIdx)) None
        else {
          val meta = r.getStruct(metaIdx)
          Some((r.getLong(idIdx), r.getAs[Array[Byte]](binIdx),
            if (meta == null) null else meta.getString(2)))
        }
      }.toSeq
      if (rows.isEmpty) Iterator.empty
      else Iterator(Row(encode(rows), rows.length.toLong))
    }(E.row(schema))
  }

  /** Arrow IPC shards → (media_id, content, source). */
  def fromShards(shards: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("source", StringType)))
    val shardIdx = shards.schema.fieldIndex("shard")
    shards.mapPartitions { it =>
      it.flatMap { r =>
        decode(r.getAs[Array[Byte]](shardIdx))
          .map { case (id, data, src) => Row(id, data, src) }
      }
    }(E.row(schema))
  }
}
