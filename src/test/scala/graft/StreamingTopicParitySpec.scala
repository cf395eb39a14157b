package graft

import org.apache.spark.sql.functions._

import graft.io.LocalTopicStore
import graft.pipeline.{CoachingPipeline, TopicParityPipeline}
import graft.providers.{MockChat, MockEmbedder, ModelRegistry}
import graft.store.BroadcastBruteForceStore

/** T1 full form: the coaching chain as three STANDING continuous queries
  * chained through topics, with producers publishing while the chain
  * runs — the reference's 4-statement execution model. */
class StreamingTopicParitySpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-stream-topics").toString

  test("chained continuous stages process publishes across the topic chain") {
    ModelRegistry.registerReferenceModels()
    val embedder = new MockEmbedder(32)
    val knowledge = Seq(
      ("kb/pricing.md", "Pricing", "kb", "pricing objection handling with discounts"),
      ("kb/impl.md", "Impl", "kb", "implementation rollout and integration guide"))
      .toDF("document_id", "document_name", "document_category", "document_text")
    val boot = new CoachingPipeline(embedder, new MockChat,
      new BroadcastBruteForceStore(Array.empty))
    val store = BroadcastBruteForceStore.fromDataFrame(boot.indexKnowledge(knowledge))
    val pipeline = new CoachingPipeline(embedder, new MockChat, store)

    val topics = new LocalTopicStore(freshDir())
    val parity = new TopicParityPipeline(pipeline, topics)
    val queries = parity.streamStages(spark, freshDir())
    try {
      def pump(): Unit = queries.foreach(_.processAllAvailable())

      // wave 1: publish the raw transcript; the standing F1 CTAS stage
      // routes prospect rows into the chain
      parity.publishConversation(Seq(
        ("what does pricing look like", "prospect"),
        ("noise", "salesperson")).toDF("message", "speaker"))
      pump()
      val wave1 = parity.consumeResponses(spark)
        .select("message", "coaching_response").collect()
      wave1.map(_.getString(0)).toSeq shouldBe Seq("what does pricing look like")
      wave1.head.getString(1) should include("suggested_response")

      // wave 2: a later publish flows through WITHOUT restarting anything
      parity.publishConversation(Seq(
        ("how hard is integration", "prospect")).toDF("message", "speaker"))
      pump()

      // W1/W2/E7: the recent-history view over the conversation topic's
      // record timestamps sees BOTH speakers, capped at n
      val view = parity.recentConversationHistory(spark, n = 2)
        .select("message").as[String].collect()
      view should have length 2
      view should contain("how hard is integration")
      val wave2 = parity.consumeResponses(spark)
        .select("message").as[String].collect().sorted
      wave2.toSeq shouldBe Seq("how hard is integration", "what does pricing look like")

      // and the standing-chain output matches fused mode content-for-content
      val fused = pipeline.coach(Seq(
        ("what does pricing look like", "prospect"),
        ("how hard is integration", "prospect")).toDF("message", "speaker"))
        .select("message", "rag_results_string", "coaching_response")
        .orderBy("message").collect()
      parity.consumeResponses(spark)
        .select("message", "rag_results_string", "coaching_response")
        .orderBy("message").collect() shouldBe fused
    } finally queries.foreach(_.stop())
  }
}
