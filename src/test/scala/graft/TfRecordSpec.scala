package graft

import org.apache.spark.sql.functions._

import graft.io.TfRecord

/** TFRecord container + tf.Example wire format: known-byte framing,
  * round-trips, and the corpus corruption policy (truncation yields the
  * records before the cut, CRC mismatch stops the walk). */
class TfRecordSpec extends SparkSpec {
  import spark.implicits._

  test("framing matches the public record layout byte-for-byte") {
    val rec = "hello".getBytes("UTF-8")
    val framed = TfRecord.frame(Seq(rec))
    framed.length shouldBe 8 + 4 + 5 + 4
    // u64-LE length
    framed.take(8).toSeq shouldBe Seq[Byte](5, 0, 0, 0, 0, 0, 0, 0)
    // payload sits after length+crc
    framed.slice(12, 17).toSeq shouldBe rec.toSeq
    // masked CRC32C of "hello": crc32c(hello) = 0x9a71bb4c (externally
    // computed); mask = ((c >>> 15) | (c << 17)) + 0xa282ead8 = 0x191c1fbb
    val dataCrc = framed.slice(17, 21).map(_ & 0xff)
    (dataCrc(0) | (dataCrc(1) << 8) | (dataCrc(2) << 16) |
      (dataCrc(3) << 24)) shouldBe 0x191c1fbb
    TfRecord.unframe(framed).map(_.toSeq) shouldBe Seq(rec.toSeq)
  }

  test("tf.Example encode/decode round-trips ids, sources and binary payloads") {
    val payload = Array.tabulate(300)(i => (i % 251).toByte) // >127 varint len
    val ex = TfRecord.example(1234567890123L, "web/crawl", payload)
    TfRecord.parseExample(ex) match {
      case Some((id, src, data)) =>
        id shouldBe 1234567890123L
        src shouldBe "web/crawl"
        data.toSeq shouldBe payload.toSeq
      case None => fail("did not parse")
    }
    // unknown trailing field is skipped, not fatal: append field 9 varint
    val extended = ex ++ Array[Byte]((9 << 3).toByte, 1)
    TfRecord.parseExample(extended).map(_._1) shouldBe Some(1234567890123L)
    // garbage is None, never a throw or a fabricated row
    TfRecord.parseExample(Array[Byte](0x0a, 0x7f)) shouldBe None
  }

  test("truncation yields records before the cut; a flipped payload byte stops the walk") {
    val recs = Seq("alpha", "beta", "gamma").map(_.getBytes("UTF-8"))
    val framed = TfRecord.frame(recs)
    // cut inside the third record
    val cut = framed.take(framed.length - 3)
    TfRecord.unframe(cut).map(new String(_, "UTF-8")) shouldBe Seq("alpha", "beta")
    // corrupt one payload byte of the second record → only the first
    // survives (framing after corrupt bytes is untrustworthy)
    val corrupt = framed.clone()
    corrupt(12 + 5 + 4 + 12) = 'X'.toByte
    TfRecord.unframe(corrupt).map(new String(_, "UTF-8")) shouldBe Seq("alpha")
    // garbage yields none
    TfRecord.unframe("not a tfrecord at all".getBytes) shouldBe empty
    TfRecord.unframe(null) shouldBe empty
  }

  test("null payloads are skipped by the shard writers, never a stage crash") {
    val rows = Seq(
      (1L, "good".getBytes("UTF-8"), "image", "s"),
      (2L, null.asInstanceOf[Array[Byte]], "image", "s"))
      .toDF("media_id", "content", "media_type", "source")
    val media = rows.select(col("media_id"), col("content"), col("media_type"),
      struct(lit(4L).as("n_bytes"), lit("h").as("content_hash"),
        col("source").as("source")).as("meta"))
    val tfr = TfRecord.toShards(media)
    tfr.agg(sum("n_records")).as[Long].collect().head shouldBe 1L
    TfRecord.fromShards(tfr).count() shouldBe 1L
    val wds = graft.io.WebDataset.toShards(media)
    wds.agg(sum("n_samples")).as[Long].collect().head shouldBe 1L
  }

  test("shard stages round-trip through the engine, one shard per partition") {
    val docs = (0L until 40L).map(i => (i, s"text body $i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source").repartition(4)
    val media = graft.operators.Multimodal.asMedia(
      docs, "doc_id", "text", "image", "source")
    val shards = TfRecord.toShards(media)
    shards.count() shouldBe 4
    shards.agg(sum("n_records")).as[Long].collect().head shouldBe 40L
    val back = TfRecord.fromShards(shards)
      .select(col("media_id"), col("content").cast("string").as("text"),
        col("source"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    back shouldBe (0L until 40L).map(i => (i, s"text body $i", s"src${i % 3}"))
  }
}
