package graft.io

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.{Encoders => E}
import org.apache.spark.sql.types._

/** safetensors sharding — the tensor-interchange format of the HF
  * ecosystem (the PUBLIC spec: a u64-LE header length, a JSON header
  * mapping tensor name → {dtype, shape, data_offsets}, then the raw
  * little-endian tensor bytes, nothing executable — the whole point of
  * the format). Embedding corpora ship to training jobs as exactly
  * this: per shard one `embeddings` F32 [n, d] matrix plus an `ids`
  * I64 [n] row-id tensor, so a loader mmaps the matrix without row
  * reassembly.
  *
  * Same conventions as the other containers: ONE shard per partition
  * from a single `mapPartitions` pass (no shuffle; shard count = the
  * caller's repartition decision), shard bytes stay a column, floats
  * round-trip BIT-exactly (raw IEEE bytes, no text), and the byte
  * parser policy holds — truncated or garbage bytes yield no rows.
  * Header JSON via the Jackson that Spark itself ships. */
object SafeTensors {

  // ObjectMapper is expensive to build and thread-safe for reads —
  // one per JVM, reused by every decode
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Encode (id, vec) rows into one safetensors blob: `embeddings` F32
    * [n, d] + `ids` I64 [n]. Rows must share one dimensionality (the
    * matrix layout requires it — callers with ragged corpora filter
    * first); empty input encodes a valid zero-row file. */
  def encode(rows: Seq[(Long, Array[Float])]): Array[Byte] = {
    val d = if (rows.isEmpty) 0 else rows.head._2.length
    require(rows.forall(_._2.length == d),
      s"safetensors matrix layout requires one dim, got ${
        rows.map(_._2.length).distinct.sorted.mkString("/")}")
    val n = rows.length
    val embBytes = 4L * n * d
    val idBytes = 8L * n
    val header =
      s"""{"embeddings":{"dtype":"F32","shape":[$n,$d],""" +
        s""""data_offsets":[0,$embBytes]},""" +
        s""""ids":{"dtype":"I64","shape":[$n],""" +
        s""""data_offsets":[$embBytes,${embBytes + idBytes}]}}"""
    val hb = header.getBytes("UTF-8")
    // a JVM byte[] caps a shard at 2 GB — fail with the remedy rather
    // than let the Int truncation surface as a cryptic allocate error
    require(8L + hb.length + embBytes + idBytes <= Int.MaxValue,
      s"safetensors shard too large (${embBytes + idBytes} tensor " +
        "bytes > 2GB buffer cap): repartition the frame finer before " +
        "toShards")
    val buf = java.nio.ByteBuffer
      .allocate(8 + hb.length + (embBytes + idBytes).toInt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(hb.length.toLong)
    buf.put(hb)
    rows.foreach(r => r._2.foreach(buf.putFloat))
    rows.foreach(r => buf.putLong(r._1))
    buf.array()
  }

  /** Decode one safetensors blob produced by [[encode]] (tolerates
    * extra tensors and a `__metadata__` entry — the general header
    * shape, not just our writer's). Returns (id, vec) rows; anything
    * that fails to parse — bad header length, malformed JSON, offsets
    * past the buffer — yields no rows. */
  def decode(bytes: Array[Byte]): Seq[(Long, Array[Float])] =
    try {
      if (bytes == null || bytes.length < 8) return Seq.empty
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val hlen = bb.getLong(0)
      if (hlen < 2 || 8 + hlen > bytes.length) return Seq.empty
      val header = new String(bytes, 8, hlen.toInt, "UTF-8")
      val root = mapper.readTree(header)
      val emb = root.get("embeddings"); val ids = root.get("ids")
      if (emb == null || ids == null) return Seq.empty
      require(emb.get("dtype").asText == "F32" &&
        ids.get("dtype").asText == "I64", "unexpected dtypes")
      // validate shapes BEFORE trusting them in offset arithmetic: a
      // negative or >Int dim would otherwise make 4L*n*d wrap/shrink,
      // pass the buffer check, and fabricate rows — the policy is that
      // anything malformed yields NO rows
      val nL = emb.get("shape").get(0).asLong
      val dL = emb.get("shape").get(1).asLong
      require(nL >= 0 && nL <= Int.MaxValue && dL >= 0 &&
        dL <= Int.MaxValue, "shape out of range")
      val n = nL.toInt
      val d = dL.toInt
      require(ids.get("shape").get(0).asLong == nL, "shape mismatch")
      val base = 8 + hlen.toInt
      val eOffL = emb.get("data_offsets").get(0).asLong
      val iOffL = ids.get("data_offsets").get(0).asLong
      require(eOffL >= 0 && iOffL >= 0, "negative offset")
      val eOff = eOffL.toInt
      val iOff = iOffL.toInt
      require(base + eOffL + 4L * n * d <= bytes.length &&
        base + iOffL + 8L * n <= bytes.length, "offsets past buffer")
      (0 until n).map { r =>
        val vec = Array.tabulate(d)(c =>
          bb.getFloat(base + eOff + 4 * (r * d + c)))
        (bb.getLong(base + iOff + 8 * r), vec)
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** (id, vec) frame → one safetensors shard per partition:
    * (shard BINARY, n_records BIGINT). Null ids/vecs are dropped (the
    * quarantine policy). */
  def toShards(df: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val schema = StructType(Seq(
      StructField("shard", BinaryType),
      StructField("n_records", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val vecIdx = df.schema.fieldIndex(vecCol)
    df.mapPartitions { it =>
      val rows = it.flatMap { r =>
        if (r.isNullAt(idIdx) || r.isNullAt(vecIdx)) None
        else Some((r.getLong(idIdx), r.getSeq[Float](vecIdx).toArray))
      }.toSeq
      if (rows.isEmpty) Iterator.empty
      else Iterator(Row(encode(rows), rows.length.toLong))
    }(E.row(schema))
  }

  /** safetensors shards → (vec_id, embedding). */
  def fromShards(shards: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val shardIdx = shards.schema.fieldIndex("shard")
    shards.mapPartitions { it =>
      it.flatMap { r =>
        decode(r.getAs[Array[Byte]](shardIdx))
          .map { case (id, vec) => Row(id, vec.toSeq) }
      }
    }(E.row(schema))
  }
}
