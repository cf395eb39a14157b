package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.io.{KnowledgeSource, LocalTopicStore}
import graft.pipeline.{CoachingPipeline, TopicParityPipeline}
import graft.providers.{MockChat, MockEmbedder, ModelRegistry}
import graft.store.{BroadcastBruteForceStore, InMemoryVectorStore}
import graft.streaming.StreamingOps

/** S6 JSON-dir source + S11 publisher transform + the §3.2 ingestion
  * track end-to-end (file source → chunk+embed → chunked topic → store
  * upsert), batch and streaming. */
class KnowledgeSourceSpec extends SparkSpec {

  private def writeDoc(dir: String, name: String, sourceFile: String,
                       title: String, content: String): Unit =
    Files.write(Paths.get(dir, name),
      s"""{"source_file": "$sourceFile", "title": "$title", "content": "$content"}"""
        .getBytes("UTF-8"))

  private def freshDir(): String =
    Files.createTempDirectory("graft-kb").toString

  test("publisher transform maps file fields onto the knowledge schema") {
    val dir = freshDir()
    writeDoc(dir, "a.json", "playbooks/pricing.md", "Pricing Playbook",
      "handle pricing objections with value framing")
    writeDoc(dir, "b.json", "rootdoc.md", "Root", "no directory here")

    val got = KnowledgeSource.readKnowledgeDir(spark, dir)
      .orderBy("document_id").collect()
    got.map(_.toSeq).toSeq shouldBe Seq(
      Seq("playbooks/pricing.md", "Pricing Playbook", "playbooks",
        "handle pricing objections with value framing"),
      Seq("rootdoc.md", "Root", "", "no directory here"))
  }

  test("pre-mapped JSON (the md->json output shape) reads straight into the schema") {
    val dir = freshDir()
    Files.write(Paths.get(dir, "doc.json"),
      ("""{"document_id": "a/b.md", "document_name": "B", """ +
        """"document_category": "a", "document_text": "body"}""").getBytes("UTF-8"))
    val got = KnowledgeSource.readMappedKnowledgeDir(spark, dir).collect()
    got.map(_.toSeq).toSeq shouldBe Seq(Seq("a/b.md", "B", "a", "body"))
  }

  test("offset reset deletes the checkpoint so a restart re-reads per startingOffsets (T6)") {
    val ckpt = freshDir()
    Files.write(Paths.get(ckpt, "offsets"), "state".getBytes("UTF-8"))
    StreamingOps.resetOffsets(ckpt)
    Files.exists(Paths.get(ckpt)) shouldBe false
    StreamingOps.resetOffsets(ckpt) // idempotent on a missing dir
  }

  test("ingestion track: file source -> chunk+embed -> chunked topic -> store (S3/S4)") {
    ModelRegistry.registerReferenceModels()
    val dir = freshDir()
    writeDoc(dir, "a.json", "kb/one.md", "One", "alpha document body")
    writeDoc(dir, "b.json", "kb/two.md", "Two", "beta document body")

    val pipeline = new CoachingPipeline(new MockEmbedder(16), new MockChat,
      new BroadcastBruteForceStore(Array.empty))
    val topics = new LocalTopicStore(freshDir())
    val parity = new TopicParityPipeline(pipeline, topics)

    parity.publishIndex(KnowledgeSource.readKnowledgeDir(spark, dir))
    topics.exists(TopicParityPipeline.TopicChunked) shouldBe true

    val store = new InMemoryVectorStore
    parity.upsertIndexFromTopic(spark, store)
    store.size shouldBe 2
    store.search(new MockEmbedder(16).embed("alpha document body"), 1)
      .head.document_id shouldBe "kb/one.md"
    // replaying the sink is idempotent (at-least-once topic semantics)
    parity.upsertIndexFromTopic(spark, store)
    store.size shouldBe 2
  }

  test("streaming file source continuously feeds the upsert sink (S6 streaming)") {
    ModelRegistry.registerReferenceModels()
    val dir = freshDir()
    writeDoc(dir, "a.json", "kb/first.md", "First", "first streaming doc")

    val store = new InMemoryVectorStore
    val e = new MockEmbedder(16)
    val indexed = graft.operators.MlPredict.withEmbedding(
      KnowledgeSource.streamKnowledgeDir(spark, dir)
        .select(col("document_id"), col("document_text").as("chunks")),
      e, "chunks", "embedding")
    val q = StreamingOps.upsertSink(indexed, store)
      .option("checkpointLocation", freshDir())
      .start()
    try {
      q.processAllAvailable()
      store.size shouldBe 1
      // a new file arriving in the watched dir = new index rows
      writeDoc(dir, "b.json", "kb/second.md", "Second", "second streaming doc")
      q.processAllAvailable()
      store.size shouldBe 2
      store.search(e.embed("second streaming doc"), 1)
        .head.document_id shouldBe "kb/second.md"
    } finally q.stop()
  }
}
