package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: typed metadata, stub decode determinism, frame
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

  test("stub decode is deterministic and batch-shaped") {
    val a = Multimodal.withDecodedFeatures(media, batchSize = 2)
      .select("media_id", "width", "height", "features")
      .as[(Long, Int, Int, Seq[Float])].collect().sortBy(_._1)
    val b = Multimodal.withDecodedFeatures(media, batchSize = 32)
      .select("media_id", "width", "height", "features")
      .as[(Long, Int, Int, Seq[Float])].collect().sortBy(_._1)
    a.toSeq shouldBe b.toSeq // batch size never changes results
    a.foreach { case (_, w, h, f) =>
      f should have length Multimodal.StubImageDecoder.featureDim
      w should be >= 0
      h should be >= 0
    }
    // empty payload decodes to the zero row, not a crash
    val empty = a.find(_._1 == 2L).get
    (empty._2, empty._3) shouldBe ((0, 0))
    empty._4.foreach(_ shouldBe 0f)
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
