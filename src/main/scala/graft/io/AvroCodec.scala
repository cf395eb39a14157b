package graft.io

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** Avro wire codec for the Kafka-parity surface (S7/S8): every topic in
  * the reference carries Avro-encoded record values with Schema Registry
  * framing — magic byte 0x00 + 4-byte big-endian schema id + Avro binary
  * (reference app/utils/kafka_utils.py:266-339 producer, :342-455
  * consumer; fallback wire schemas :283-294 and :362-374 make every field
  * a nullable union).
  *
  * Implemented on plain Apache Avro (on the Spark classpath) — no
  * external services: [[SchemaRegistry]] is the in-process stand-in for
  * the Confluent registry (producers fetch by subject, never register —
  * kafka_utils.py:296-301), and the UDFs below convert Spark structs to
  * framed Avro bytes and back inside executors (no driver hops).
  *
  * Type surface: the recursive StructType↔Avro mapping covers everything
  * the reference schemas use (nullable string, float array, record array)
  * plus the other primitive Spark types so new topics come free.
  */
object AvroCodec {

  // --- StructType → Avro schema (all fields nullable unions, like the
  // registry schemas Flink registers) ---

  def avroSchemaFor(st: StructType, name: String, namespace: String = "graft"): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, nullable(avroType(f.dataType, s"${name}_${f.name}")),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, namespace, false, fields.toList.asJava)
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(Schema.create(Schema.Type.NULL), s)

  private def avroType(dt: DataType, name: String): Schema = dt match {
    case StringType     => Schema.create(Schema.Type.STRING)
    case FloatType      => Schema.create(Schema.Type.FLOAT)
    case DoubleType     => Schema.create(Schema.Type.DOUBLE)
    case IntegerType    => Schema.create(Schema.Type.INT)
    case LongType       => Schema.create(Schema.Type.LONG)
    case BooleanType    => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType     => Schema.create(Schema.Type.BYTES)
    case ArrayType(e, _) => Schema.createArray(nullable(avroType(e, name)))
    case st: StructType => avroSchemaFor(st, name)
    case other => sys.error(s"unsupported Spark type for Avro wire: $other")
  }

  // --- Row ↔ GenericRecord (recursive, executor-side) ---

  private def toAvro(v: Any, s: Schema): Any = {
    val sch = if (s.getType == Schema.Type.UNION) s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s
    v match {
      case null => null
      case r: Row =>
        val rec = new GenericData.Record(sch)
        sch.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name(), toAvro(r.get(i), f.schema()))
        }
        rec
      case seq: scala.collection.Seq[_] =>
        seq.map(toAvro(_, sch.getElementType)).asJava
      case bytes: Array[Byte] => ByteBuffer.wrap(bytes)
      case other => other
    }
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (rec: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.map(f => fromAvro(rec.get(f.name), f.dataType)).toSeq)
    case (list: java.util.Collection[_], ArrayType(e, _)) =>
      list.asScala.map(fromAvro(_, e)).toSeq
    case (s: CharSequence, StringType) => s.toString
    case (b: ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (other, _) => other
  }

  // --- Schema-Registry wire framing (magic 0x00 + int32 id + payload) ---

  def frame(schemaId: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(5 + payload.length)
    bb.put(0: Byte).putInt(schemaId).put(payload)
    bb.array()
  }

  /** Returns (schemaId, payload); rejects unknown magic like the
    * reference consumer's deserializer would. */
  def unframe(bytes: Array[Byte]): (Int, Array[Byte]) = {
    require(bytes.length >= 5 && bytes(0) == 0,
      s"not Schema-Registry-framed Avro (len=${bytes.length})")
    val bb = ByteBuffer.wrap(bytes)
    bb.get()
    val id = bb.getInt
    (id, bytes.drop(5))
  }

  /** Row → GenericRecord / back — the converter pair behind both the
    * wire codec (encode/decode) and the container-file format
    * ([[AvroFiles]]). */
  def toRecord(row: Row, schema: Schema): GenericRecord =
    toAvro(row, schema).asInstanceOf[GenericRecord]

  def fromRecord(rec: GenericRecord, dt: StructType): Row =
    fromAvro(rec, dt).asInstanceOf[Row]

  def encode(row: Row, schema: Schema): Array[Byte] = {
    val rec = toAvro(row, schema).asInstanceOf[GenericRecord]
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  def decode(bytes: Array[Byte], schema: Schema, dt: StructType): Row = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    val rec = new GenericDatumReader[GenericRecord](schema).read(null, dec)
    fromAvro(rec, dt).asInstanceOf[Row]
  }

  /** The ONE subject → record-name rule (Avro names reject '-'). Every
    * registration path must build schemas through this, or the strict
    * registry rejects the second registration as an evolved schema. */
  def schemaForSubject(st: StructType, subject: String): Schema =
    avroSchemaFor(st, subject.replace('-', '_'))

  /** struct(col...) → framed Avro bytes. Row-typed UDFs go through the
    * Java UDF1 API (the untyped Scala overload is gone in Spark 4); the
    * Avro Schema is re-parsed lazily per executor from its JSON because
    * Schema itself is not serializable. */
  def encodeUdf(st: StructType, subject: String): UserDefinedFunction = {
    val json = SchemaRegistry.getOrRegister(subject, schemaForSubject(st, subject))
    val id = SchemaRegistry.id(subject)
    val f = new org.apache.spark.sql.api.java.UDF1[Row, Array[Byte]] with Serializable {
      @transient private lazy val schema = new Schema.Parser().parse(json)
      override def call(r: Row): Array[Byte] =
        if (r == null) null else frame(id, encode(r, schema))
    }
    udf(f, BinaryType)
  }

  /** framed Avro bytes → struct with schema `st`. */
  def decodeUdf(st: StructType, subject: String): UserDefinedFunction = {
    val json = SchemaRegistry.get(subject)
    val f = new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] with Serializable {
      @transient private lazy val schema = new Schema.Parser().parse(json)
      override def call(b: Array[Byte]): Row =
        if (b == null) null else decode(unframe(b)._2, schema, st)
    }
    udf(f, st)
  }
}

/** In-process stand-in for the Confluent Schema Registry: subject
  * (`<topic>-value`) → Avro schema JSON + numeric id. The reference app
  * fetches the latest schema per subject and never auto-registers
  * (kafka_utils.py:296-301); tests pre-register via getOrRegister. */
object SchemaRegistry {
  private val subjects = scala.collection.concurrent.TrieMap.empty[String, (Int, String)]
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(1)

  /** Register-or-fetch, failing LOUDLY if the subject is already bound to
    * a different schema — silently returning a stale writer schema would
    * let an encoder produce wire bytes its registered schema can't read
    * (schema evolution needs an explicit re-register, not an ignore). */
  def getOrRegister(subject: String, schema: Schema): String = {
    val json = schema.toString
    val existing = subjects.getOrElseUpdate(subject,
      (nextId.getAndIncrement(), json))._2
    require(existing == json,
      s"subject '$subject' already registered with a different schema; " +
        "clear() or use a new subject for an evolved type")
    existing
  }

  def get(subject: String): String =
    subjects.getOrElse(subject, sys.error(s"unknown subject '$subject'"))._2

  def id(subject: String): Int =
    subjects.getOrElse(subject, sys.error(s"unknown subject '$subject'"))._1

  def clear(): Unit = { subjects.clear(); nextId.set(1) }
}
