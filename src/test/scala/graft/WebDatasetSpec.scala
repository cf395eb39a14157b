package graft

import org.apache.spark.sql.functions._

import graft.io.WebDataset
import graft.io.WebDataset.Sample
import graft.operators.Multimodal

/** The WebDataset tar sharding: byte-exact round-trip, ustar spec
  * interop (the SYSTEM tar must list and extract our shards), and the
  * truncation/garbage quarantine. */
class WebDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def sampleSet: Seq[Sample] = Seq(
    Sample("000000000001", Array[Byte](1, 2, 3, 0, -1), """{"media_id":1}"""),
    // payload of exactly one block: the zero-padding edge
    Sample("000000000002", Array.fill[Byte](512)(7), """{"media_id":2}"""),
    Sample("000000000003", Array.emptyByteArray, """{"media_id":3}"""))

  test("tar round-trips keys, binary payloads, and metadata byte-exactly") {
    val tar = WebDataset.writeTar(sampleSet)
    tar.length % 512 shouldBe 0
    val back = WebDataset.readTar(tar)
    back.map(_.key) shouldBe sampleSet.map(_.key)
    back.zip(sampleSet).foreach { case (g, w) =>
      g.bin.toSeq shouldBe w.bin.toSeq
      g.json shouldBe w.json
    }
    // truncation keeps the samples before the cut; garbage yields none
    WebDataset.readTar(java.util.Arrays.copyOf(tar, 1200))
      .map(_.key) shouldBe Seq("000000000001")
    WebDataset.readTar(Array.fill[Byte](300)(0x41)) shouldBe empty
    WebDataset.readTar(null) shouldBe empty
  }

  test("shards are spec-correct ustar: the system tar lists and extracts them") {
    val tarBin = new java.io.File("/usr/bin/tar")
    assume(tarBin.exists() || new java.io.File("/bin/tar").exists(),
      "no system tar available")
    val bytes = WebDataset.writeTar(sampleSet)
    val dir = java.nio.file.Files.createTempDirectory("graft-wds")
    val f = dir.resolve("shard.tar")
    java.nio.file.Files.write(f, bytes)
    import scala.sys.process._
    val listing = Seq("tar", "-tf", f.toString).!!.trim.split("\n").toSeq
    listing shouldBe sampleSet.flatMap(s => Seq(s"${s.key}.bin", s"${s.key}.json"))
    Seq("tar", "-xf", f.toString, "-C", dir.toString).! shouldBe 0
    java.nio.file.Files.readAllBytes(
      dir.resolve("000000000002.bin")).toSeq shouldBe Array.fill[Byte](512)(7).toSeq
    new String(java.nio.file.Files.readAllBytes(
      dir.resolve("000000000001.json")), "UTF-8") shouldBe """{"media_id":1}"""
  }

  test("toShards/fromShards round-trips a distributed media frame") {
    val docs = Seq((1L, "alpha text", "s1"), (2L, "beta", "s2"),
      (3L, "gamma gamma", "s1")).toDF("id", "text", "src")
    val media = Multimodal.asMedia(docs, "id", "text", "image", "src")
      .repartition(2)
    val shards = WebDataset.toShards(media)
    shards.agg(sum(col("n_samples"))).as[Long].collect().head shouldBe 3L
    val back = WebDataset.fromShards(shards)
      .select(col("media_id"),
        col("content").cast("string").as("text"),
        get_json_object(col("meta_json"), "$.source").as("src"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    back shouldBe Seq((1L, "alpha text", "s1"), (2L, "beta", "s2"),
      (3L, "gamma gamma", "s1"))
  }
}
