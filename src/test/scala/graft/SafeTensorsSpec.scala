package graft

import org.apache.spark.sql.functions._

import graft.io.SafeTensors

/** safetensors container: spec-level byte invariants, exact-float
  * round-trips, corruption policy, and the Spark shard path. */
class SafeTensorsSpec extends SparkSpec {
  import spark.implicits._

  test("encode follows the public layout: u64-LE header length, JSON header, raw LE data") {
    val bytes = SafeTensors.encode(Seq((7L, Array(1.5f, -2.25f))))
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val hlen = bb.getLong(0)
    val header = new String(bytes, 8, hlen.toInt, "UTF-8")
    header should include(""""embeddings":{"dtype":"F32","shape":[1,2]""")
    header should include(""""ids":{"dtype":"I64","shape":[1]""")
    // raw little-endian IEEE floats immediately after the header
    bb.getFloat(8 + hlen.toInt) shouldBe 1.5f
    bb.getFloat(8 + hlen.toInt + 4) shouldBe -2.25f
    bb.getLong(8 + hlen.toInt + 8) shouldBe 7L
  }

  test("random vectors round-trip bit-exactly, including NaN/Inf and negative ids") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 30).foreach { _ =>
      val d = 1 + rnd.nextInt(12)
      val rows = (0 until rnd.nextInt(40)).map { _ =>
        val v = Array.fill(d)(rnd.nextInt(6) match {
          case 0 => Float.NaN
          case 1 => Float.PositiveInfinity
          case _ => java.lang.Float.intBitsToFloat(rnd.nextInt())
        })
        (rnd.nextLong(), v)
      }
      val got = SafeTensors.decode(SafeTensors.encode(rows))
      got.length shouldBe rows.length
      got.zip(rows).foreach { case ((gi, gv), (ei, ev)) =>
        gi shouldBe ei
        // bit-compare (NaN != NaN under ==)
        gv.map(java.lang.Float.floatToRawIntBits) shouldBe
          ev.map(java.lang.Float.floatToRawIntBits)
      }
    }
  }

  test("ragged inputs are refused; garbage and truncated bytes yield no rows") {
    an[IllegalArgumentException] should be thrownBy
      SafeTensors.encode(Seq((1L, Array(1f)), (2L, Array(1f, 2f))))
    SafeTensors.decode(null) shouldBe Seq.empty
    SafeTensors.decode("totally not a safetensors file".getBytes) shouldBe Seq.empty
    val good = SafeTensors.encode(Seq((1L, Array(1f, 2f))))
    SafeTensors.decode(good.dropRight(6)) shouldBe Seq.empty // ids cut off
    SafeTensors.decode(good.take(4)) shouldBe Seq.empty
  }

  test("malformed header shapes yield no rows, never fabricated ones") {
    // hand-build headers whose declared shapes would pass the offset
    // check only via arithmetic wrap/truncation
    def withHeader(header: String, dataBytes: Int): Array[Byte] = {
      val hb = header.getBytes("UTF-8")
      val buf = java.nio.ByteBuffer.allocate(8 + hb.length + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putLong(hb.length.toLong); buf.put(hb)
      buf.array()
    }
    // negative dim: 4L*n*(-1) < 0 would pass "offsets past buffer"
    SafeTensors.decode(withHeader(
      """{"embeddings":{"dtype":"F32","shape":[2,-1],"data_offsets":[0,0]},""" +
        """"ids":{"dtype":"I64","shape":[2],"data_offsets":[0,16]}}""",
      16)) shouldBe Seq.empty
    // dim past Int.MaxValue: asLong.toInt truncation would shrink n
    SafeTensors.decode(withHeader(
      """{"embeddings":{"dtype":"F32","shape":[4294967297,1],""" +
        """"data_offsets":[0,4]},""" +
        """"ids":{"dtype":"I64","shape":[4294967297],"data_offsets":[4,12]}}""",
      12)) shouldBe Seq.empty
    // negative data offset
    SafeTensors.decode(withHeader(
      """{"embeddings":{"dtype":"F32","shape":[1,1],"data_offsets":[-8,-4]},""" +
        """"ids":{"dtype":"I64","shape":[1],"data_offsets":[-4,4]}}""",
      12)) shouldBe Seq.empty
  }

  test("byte layout interop: an independent python stdlib parser reads our shards bit-exactly") {
    val py = Seq("/usr/bin/python3", "/usr/local/bin/python3",
      sys.env.getOrElse("HOME", "/root") + "/.pyenv/shims/python3")
      .find(p => new java.io.File(p).exists())
    assume(py.isDefined, "no python3 available")
    val rows = Seq((42L, Array(1.5f, Float.NaN, -0.0f)),
      (-7L, Array(Float.PositiveInfinity, 3.25f, 1e-30f)))
    val dir = java.nio.file.Files.createTempDirectory("stcheck")
    val f = dir.resolve("shard.safetensors")
    java.nio.file.Files.write(f, SafeTensors.encode(rows))
    val script = dir.resolve("parse.py")
    // independent decode from the PUBLIC spec only: u64-LE header
    // length, JSON header, dtype/shape/data_offsets — no code shared
    // with the Scala encoder; floats printed as raw IEEE bit patterns
    java.nio.file.Files.write(script,
      """import json, struct, sys
        |raw = open(sys.argv[1], 'rb').read()
        |hlen = struct.unpack('<Q', raw[:8])[0]
        |hdr = json.loads(raw[8:8 + hlen].decode('utf-8'))
        |base = 8 + hlen
        |e, i = hdr['embeddings'], hdr['ids']
        |assert e['dtype'] == 'F32' and i['dtype'] == 'I64'
        |n, d = e['shape']
        |eo, io_ = e['data_offsets'][0], i['data_offsets'][0]
        |bits = struct.unpack('<%dI' % (n * d), raw[base + eo:base + eo + 4 * n * d])
        |ids = struct.unpack('<%dq' % n, raw[base + io_:base + io_ + 8 * n])
        |for r in range(n):
        |    print(ids[r], *bits[r * d:(r + 1) * d])
        |""".stripMargin.getBytes("UTF-8"))
    import scala.sys.process._
    val out = Seq(py.get, script.toString, f.toString).!!.trim
      .split("\n").toSeq.map(_.trim)
    val expected = rows.map { case (id, v) =>
      (Seq(id.toString) ++ v.map(x =>
        java.lang.Integer.toUnsignedLong(
          java.lang.Float.floatToRawIntBits(x)).toString)).mkString(" ")
    }
    out shouldBe expected
  }

  test("shard path: one shard per partition, floats and ids exact through Spark") {
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").repartition(3)
    val shards = SafeTensors.toShards(emb).cache()
    try {
      shards.count() should be <= 3L
      shards.agg(sum(col("n_records"))).as[Long].head() shouldBe emb.count()
      val back = SafeTensors.fromShards(shards)
        .select(col("vec_id"), md5(col("embedding").cast("string")).as("h"))
        .as[(Long, String)].collect().sorted.toSeq
      val exp = emb
        .select(col("vec_id"), md5(col("embedding").cast("string")).as("h"))
        .as[(Long, String)].collect().sorted.toSeq
      back shouldBe exp
    } finally shards.unpersist()
  }
}
