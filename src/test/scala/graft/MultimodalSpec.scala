package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: typed metadata, real javax.imageio decode, frame
  * sampling (the mm_* driver queries' operator level). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    Seq((1L, "payload one", "s1"), (2L, "", "s2"), (3L, "payload three", "s3"))
      .toDF("id", "payload", "src"),
    "id", "payload", "image", "src")

  test("asMedia derives metadata without touching payload semantics") {
    val rows = media.select("media_id", "media_type", "meta.n_bytes", "meta.source")
      .as[(Long, String, Long, String)].collect().sortBy(_._1)
    rows.toSeq shouldBe Seq(
      (1L, "image", 11L, "s1"), (2L, "image", 0L, "s2"), (3L, "image", 13L, "s3"))
  }

  test("ImageCodec decodes a real PNG: exact dims, exact strip luminance") {
    // solid 16x8 mid-gray image encoded by the JDK itself
    val img = new java.awt.image.BufferedImage(
      16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val (w, h, f) = Multimodal.ImageCodec.decode(out.toByteArray)
    (w, h) shouldBe ((16, 8))
    f should have length Multimodal.ImageCodec.featureDim
    // every strip of a solid 0x80 image has mean luminance 128/255
    f.foreach(_ shouldBe (128f / 255f) +- 1e-6f)
  }

  test("synthetic PNGs round-trip their dims through a real decode") {
    val docs = Seq((0L, "s"), (13L, "s"), (80L, "s")).toDF("id", "src")
    val decoded = Multimodal.withDecodedFeatures(
        Multimodal.withSyntheticImages(docs, "id", "src"))
      .select("media_id", "width", "height")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    decoded.toSeq shouldBe Seq(
      (0L, Multimodal.syntheticWidth(0), Multimodal.syntheticHeight(0)),
      (13L, Multimodal.syntheticWidth(13), Multimodal.syntheticHeight(13)),
      (80L, Multimodal.syntheticWidth(80), Multimodal.syntheticHeight(80)))
    decoded.foreach { case (_, w, h) => w should be >= 8; h should be >= 8 }
  }

  test("decode is deterministic, batch-shaped, and degrades on non-images") {
    val a = Multimodal.withDecodedFeatures(media, batchSize = 2)
      .select("media_id", "width", "height", "features")
      .as[(Long, Int, Int, Seq[Float])].collect().sortBy(_._1)
    val b = Multimodal.withDecodedFeatures(media, batchSize = 32)
      .select("media_id", "width", "height", "features")
      .as[(Long, Int, Int, Seq[Float])].collect().sortBy(_._1)
    a.toSeq shouldBe b.toSeq // batch size never changes results
    // text payloads are not decodable images: zero row, not a crash
    a.foreach { case (_, w, h, f) =>
      f should have length Multimodal.ImageCodec.featureDim
      (w, h) shouldBe ((0, 0))
      f.foreach(_ shouldBe 0f)
    }
  }

  test("withResized derives deterministic dims + hash from content metadata") {
    val got = Multimodal.withResized(media, 224, 224)
      .select("media_id", "resized_width", "resized_height", "resized_hash")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    got.foreach { case (_, w, h, hash) =>
      w shouldBe 224; h shouldBe 224
      hash should fullyMatch regex "[0-9a-f]{32}"
    }
    got.map(_._4).distinct should have length 3 // per-content hashes differ
  }

  test("sampleFrames emits n deterministic rows per video and none for images") {
    val videos = Multimodal.asMedia(
      Seq((7L, "vid bytes", "s")).toDF("id", "payload", "src"),
      "id", "payload", "video", "src")
    val frames = Multimodal.sampleFrames(videos.union(media), 3)
      .select("media_id", "frame_idx", "frame_hash")
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2))
    frames.map(_._1).distinct.toSeq shouldBe Seq(7L) // image rows filtered
    frames.map(_._2).toSeq shouldBe Seq(0, 1, 2)
    frames.map(_._3).distinct should have length 3   // per-frame hashes differ
  }
}
