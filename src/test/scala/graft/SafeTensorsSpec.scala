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
