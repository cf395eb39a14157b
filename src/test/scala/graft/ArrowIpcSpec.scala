package graft

import org.apache.spark.sql.functions._

import graft.io.ArrowIpc

/** Arrow IPC container: byte-level format invariants, random-payload
  * round-trips, and the Spark shard path. */
class ArrowIpcSpec extends SparkSpec {
  import spark.implicits._

  test("encode emits the ARROW1 random-access format (magic at both ends)") {
    val bytes = ArrowIpc.encode(Seq((1L, Array[Byte](1, 2, 3), "src")))
    bytes.take(6) shouldBe "ARROW1".getBytes("ASCII")
    bytes.takeRight(6) shouldBe "ARROW1".getBytes("ASCII")
  }

  test("random payloads round-trip exactly, including empty and null content/source") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 50).foreach { _ =>
      val rows = (0 until rnd.nextInt(20)).map { i =>
        val content = rnd.nextInt(4) match {
          case 0 => null
          case 1 => Array.empty[Byte]
          case _ => Array.fill(rnd.nextInt(200))(rnd.nextInt().toByte)
        }
        val source = if (rnd.nextBoolean()) null
          else new String(Array.fill(rnd.nextInt(10))(('a' + rnd.nextInt(26)).toChar))
        (rnd.nextLong(), content, source)
      }
      val got = ArrowIpc.decode(ArrowIpc.encode(rows))
      got.length shouldBe rows.length
      got.zip(rows).foreach { case ((gi, gc, gs), (ei, ec, es)) =>
        gi shouldBe ei
        (if (gc == null) null else gc.toSeq) shouldBe
          (if (ec == null) null else ec.toSeq)
        gs shouldBe es
      }
    }
  }

  test("multi-batch files round-trip: decode walks every record batch in order") {
    val rows = (0 until 2500).map(i =>
      (i.toLong, Array(i.toByte, (i >> 8).toByte), s"s$i"))
    // batchRows 1000 → 3 record batches (1000/1000/500)
    val bytes = ArrowIpc.encode(rows, batchRows = 1000)
    val got = ArrowIpc.decode(bytes)
    got.length shouldBe 2500
    got.map(_._1) shouldBe rows.map(_._1) // order preserved across batches
    got.zip(rows).foreach { case ((_, gc, gs), (_, ec, es)) =>
      gc.toSeq shouldBe ec.toSeq; gs shouldBe es
    }
    // single-batch and multi-batch encodings carry identical content
    ArrowIpc.decode(ArrowIpc.encode(rows, batchRows = Int.MaxValue))
      .map(_._1) shouldBe got.map(_._1)
  }

  test("garbage and truncated bytes yield no rows, never a crash") {
    ArrowIpc.decode(null) shouldBe Seq.empty
    ArrowIpc.decode(Array.empty[Byte]) shouldBe Seq.empty
    ArrowIpc.decode("not an arrow file at all".getBytes) shouldBe Seq.empty
    val good = ArrowIpc.encode(Seq((1L, Array[Byte](9, 9), "s")))
    ArrowIpc.decode(good.dropRight(10)) shouldBe Seq.empty // footer gone
  }

  test("shard path: one shard per partition, content set preserved through Spark") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val media = graft.operators.Multimodal.asMedia(
      docs, "doc_id", "text", "image", "source").repartition(4)
    val shards = ArrowIpc.toShards(media).cache()
    try {
      shards.count() should be <= 4L
      shards.agg(sum(col("n_records"))).as[Long].head() shouldBe docs.count()
      val back = ArrowIpc.fromShards(shards)
        .select(col("media_id"), md5(col("content")).as("h"))
        .as[(Long, String)].collect().sorted.toSeq
      val exp = docs.select(col("doc_id"), md5(col("text").cast("binary")))
        .as[(Long, String)].collect().sorted.toSeq
      back shouldBe exp
    } finally shards.unpersist()
  }
}
