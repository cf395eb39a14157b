package graft.io

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.{Encoders => E}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord sharding, pure JDK — the other de-facto training-shard
  * container next to [[WebDataset]]: a flat sequence of length-framed
  * records, each guarded by MASKED CRC32C checksums (the public
  * tensorflow record format: u64-LE length, u32-LE masked crc of the
  * length bytes, payload, u32-LE masked crc of the payload; mask =
  * ((crc >>> 15) | (crc << 17)) + 0xa282ead8, all uint32 arithmetic).
  * Java 17's java.util.zip.CRC32C supplies the checksum, so no
  * dependencies.
  *
  * Records here carry a minimal hand-encoded `tf.Example` protobuf
  * (features map with "id" int64, "source"/"data" bytes — varint +
  * length-delimited wire format only, encoded in fixed key order so
  * shard bytes are deterministic), which is what TF/JAX input
  * pipelines actually read; the container layer is payload-agnostic.
  *
  * Same conventions as the tar/Avro containers: one shard per
  * partition, shard bytes stay a column, and the corpus byte-parser
  * policy holds — a truncated shard yields the records before the
  * cut, a CRC mismatch stops the walk (framing after corrupt bytes is
  * untrustworthy), garbage yields none. */
object TfRecord {

  // ---- container framing -------------------------------------------------

  private def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue.toInt // low 32 bits; int arithmetic wraps like uint32
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def putIntLE(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  private def readIntLE(b: Array[Byte], pos: Int): Int =
    (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
      ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)

  def frame(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { data =>
      val lenBytes = new Array[Byte](8)
      var v = data.length.toLong
      var i = 0
      while (i < 8) { lenBytes(i) = (v & 0xff).toByte; v >>>= 8; i += 1 }
      out.write(lenBytes)
      putIntLE(out, maskedCrc(lenBytes, 0, 8))
      out.write(data)
      putIntLE(out, maskedCrc(data, 0, data.length))
    }
    out.toByteArray
  }

  def unframe(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null) return Seq.empty
    val records = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    var walking = true
    while (walking && pos + 12 <= bytes.length) {
      var len = 0L
      var i = 7
      while (i >= 0) { len = (len << 8) | (bytes(pos + i) & 0xff); i -= 1 }
      val lenCrc = readIntLE(bytes, pos + 8)
      if (lenCrc != maskedCrc(bytes, pos, 8) ||
          len < 0 || pos + 12 + len + 4 > bytes.length) walking = false
      else {
        val data = java.util.Arrays.copyOfRange(bytes,
          pos + 12, pos + 12 + len.toInt)
        if (readIntLE(bytes, pos + 12 + len.toInt) !=
            maskedCrc(data, 0, data.length)) walking = false
        else { records += data; pos += 12 + len.toInt + 4 }
      }
    }
    records.toSeq
  }

  // ---- minimal tf.Example wire codec ------------------------------------
  // Example{ features: Features=1 } / Features{ map<string,Feature>=1 }
  // map entry { key: string=1, value: Feature=2 }
  // Feature{ bytes_list: BytesList=1, int64_list: Int64List=3 }
  // BytesList{ repeated bytes value=1 } / Int64List{ packed int64 value=1 }

  private def varint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write((v & 0x7f).toInt)
  }

  private def lenDelim(out: java.io.ByteArrayOutputStream, field: Int,
                       body: Array[Byte]): Unit = {
    varint(out, (field << 3) | 2); varint(out, body.length); out.write(body)
  }

  private def msg(build: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(); build(out); out.toByteArray
  }

  private def bytesFeature(data: Array[Byte]): Array[Byte] =
    msg(f => lenDelim(f, 1, msg(bl => lenDelim(bl, 1, data)))) // Feature.bytes_list.value

  private def int64Feature(v: Long): Array[Byte] =
    msg(f => lenDelim(f, 3, msg(il => {                        // Feature.int64_list
      varint(il, (1 << 3) | 2)                                 // packed value field
      val payload = msg(p => varint(p, v))
      varint(il, payload.length); il.write(payload)
    })))

  private def mapEntry(key: String, feature: Array[Byte]): Array[Byte] =
    msg(e => { lenDelim(e, 1, key.getBytes("UTF-8")); lenDelim(e, 2, feature) })

  /** (id, source, payload) → serialized tf.Example, fixed feature order
    * ("data", "id", "source") for byte-deterministic shards. */
  def example(id: Long, source: String, data: Array[Byte]): Array[Byte] =
    msg(ex => lenDelim(ex, 1, msg { fs =>
      lenDelim(fs, 1, mapEntry("data", bytesFeature(data)))
      lenDelim(fs, 1, mapEntry("id", int64Feature(id)))
      lenDelim(fs, 1, mapEntry("source",
        bytesFeature(source.getBytes("UTF-8"))))
    }))

  /** Parse a tf.Example produced by [[example]] (tolerates unknown
    * fields and unpacked int64s — the general wire format, not just our
    * writer's bytes). Returns None when required features are absent or
    * the buffer is not a valid message. */
  def parseExample(bytes: Array[Byte]): Option[(Long, String, Array[Byte])] =
    try {
      var id: Option[Long] = None
      var source: Option[String] = None
      var data: Option[Array[Byte]] = None

      final class Reader(b: Array[Byte], var pos: Int, val end: Int) {
        def varint(): Long = {
          var v = 0L; var shift = 0; var more = true
          while (more) {
            require(pos < end, "varint past end")
            val x = b(pos); pos += 1
            v |= (x & 0x7fL) << shift; shift += 7; more = (x & 0x80) != 0
          }
          v
        }
        def slice(): (Int, Int) = {
          val len = varint().toInt
          require(len >= 0 && pos + len <= end, "length past end")
          val s = (pos, pos + len); pos += len; s
        }
        def skip(wire: Int): Unit = wire match {
          case 0 => varint()
          case 1 => require(pos + 8 <= end, "f64 past end"); pos += 8
          case 2 => slice()
          case 5 => require(pos + 4 <= end, "f32 past end"); pos += 4
          case w => sys.error(s"unsupported wire type $w")
        }
      }

      // f takes ONE (field, wire, reader) tuple so call sites can use
      // pattern-matching anonymous functions (Function3 cannot)
      def fields(r: Reader)(f: ((Int, Int, Reader)) => Unit): Unit =
        while (r.pos < r.end) {
          val tag = r.varint()
          f(((tag >>> 3).toInt, (tag & 7).toInt, r))
        }

      def parseFeature(r: Reader): (Option[Long], Option[Array[Byte]]) = {
        var i64: Option[Long] = None; var bs: Option[Array[Byte]] = None
        fields(r) {
          case (1, 2, rr) => // bytes_list
            val (s, e) = rr.slice()
            val bl = new Reader(bytes, s, e)
            fields(bl) {
              case (1, 2, b2) =>
                val (ds, de) = b2.slice()
                bs = Some(java.util.Arrays.copyOfRange(bytes, ds, de))
              case (_, w, b2) => b2.skip(w)
            }
          case (3, 2, rr) => // int64_list
            val (s, e) = rr.slice()
            val il = new Reader(bytes, s, e)
            fields(il) {
              case (1, 2, p) => // packed
                val (ps, pe) = p.slice()
                val pr = new Reader(bytes, ps, pe)
                while (pr.pos < pr.end) i64 = Some(pr.varint())
              case (1, 0, p) => i64 = Some(p.varint()) // unpacked
              case (_, w, p) => p.skip(w)
            }
          case (_, w, rr) => rr.skip(w)
        }
        (i64, bs)
      }

      val ex = new Reader(bytes, 0, bytes.length)
      fields(ex) {
        case (1, 2, r) => // features
          val (fs, fe) = r.slice()
          val feats = new Reader(bytes, fs, fe)
          fields(feats) {
            case (1, 2, fr) => // one map entry
              val (es, ee) = fr.slice()
              val entry = new Reader(bytes, es, ee)
              var key: String = null
              var value: (Option[Long], Option[Array[Byte]]) = (None, None)
              fields(entry) {
                case (1, 2, er) =>
                  val (ks, ke) = er.slice()
                  key = new String(bytes, ks, ke - ks, "UTF-8")
                case (2, 2, er) =>
                  val (vs, ve) = er.slice()
                  value = parseFeature(new Reader(bytes, vs, ve))
                case (_, w, er) => er.skip(w)
              }
              key match {
                case "id" => id = value._1
                case "source" => source = value._2.map(new String(_, "UTF-8"))
                case "data" => data = value._2
                case _ => ()
              }
            case (_, w, fr) => fr.skip(w)
          }
        case (_, w, r) => r.skip(w)
      }
      for (i <- id; s <- source; d <- data) yield (i, s, d)
    } catch { case _: Exception => None }

  // ---- shard stages (the WebDataset convention) --------------------------

  /** Media rows → one TFRecord shard per partition: (shard, n_records).
    * Partition-local, zero shuffle — repartition upstream to size
    * shards. Rows with a NULL payload or NULL source are not encodable
    * samples and are SKIPPED (the corpus policy's encode half: one bad
    * row must never crash the shard write; count dropped rows upstream
    * with a null filter if the loss needs auditing — n_records makes
    * the skip visible per shard). */
  def toShards(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("shard", BinaryType),
      StructField("n_records", LongType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val binIdx = media.schema.fieldIndex("content")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { it =>
      val records = it.flatMap { r =>
        val data = r.getAs[Array[Byte]](binIdx)
        val meta = r.getStruct(metaIdx)
        val source = if (meta == null) null else meta.getString(2)
        if (r.isNullAt(idIdx) || data == null || source == null) None
        else Some(example(r.getLong(idIdx), source, data))
      }.toSeq
      if (records.isEmpty) Iterator.empty
      else Iterator(Row(frame(records), records.length.toLong))
    }(E.row(schema))
  }

  /** TFRecord shards → (media_id, content, source); records whose
    * tf.Example is missing required features are dropped (the
    * quarantine policy — never a fabricated row). */
  def fromShards(shards: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("source", StringType)))
    val shardIdx = shards.schema.fieldIndex("shard")
    shards.mapPartitions { it =>
      it.flatMap { r =>
        unframe(r.getAs[Array[Byte]](shardIdx))
          .flatMap(parseExample)
          .map { case (id, src, data) => Row(id, data, src) }
      }
    }(E.row(schema))
  }
}
