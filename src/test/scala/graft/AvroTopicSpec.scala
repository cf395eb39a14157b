package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.io.{AvroCodec, LocalTopicStore, SchemaRegistry}
import graft.pipeline.{CoachingPipeline, TopicParityPipeline}
import graft.providers.{MockChat, MockEmbedder, ModelRegistry}
import graft.store.{BroadcastBruteForceStore, InMemoryVectorStore}
import graft.streaming.StreamingOps

/** S2/S7/S8 Avro wire surface + topic-parity mode + S4 upsert sink. */
class AvroCodecSpec extends SparkSpec {
  import spark.implicits._

  test("wire framing: magic byte + schema id round-trip, garbage rejected") {
    val framed = AvroCodec.frame(7, Array[Byte](1, 2, 3))
    framed(0) shouldBe 0
    val (id, payload) = AvroCodec.unframe(framed)
    id shouldBe 7
    payload.toSeq shouldBe Seq[Byte](1, 2, 3)
    an[IllegalArgumentException] should be thrownBy
      AvroCodec.unframe(Array[Byte](9, 9))
  }

  test("nested struct/array round-trips through framed Avro bytes") {
    val st = TopicParityPipeline.ragResultsSchema // string, string, array<struct>
    val enc = AvroCodec.encodeUdf(st, "spec-nested-value")
    val dec = AvroCodec.decodeUdf(st, "spec-nested-value")
    val df = spark.sql(
      """SELECT 'the msg' AS message, 'prospect' AS speaker, array(
        |  named_struct('document_id', 'a/b.md', 'chunks', 'c1'),
        |  named_struct('document_id', cast(null as string), 'chunks', cast(null as string))
        |) AS rag_results""".stripMargin)
    val back = df
      .select(dec(enc(struct(col("message"), col("speaker"), col("rag_results")))).as("r"))
      .select("r.*")
    back.collect() shouldBe df.collect()
    // decoded schema is all-nullable (registry unions); names/types match
    back.schema.map(f => (f.name, f.dataType.sql)) shouldBe
      df.schema.map(f => (f.name, f.dataType.sql))
  }

  test("embedding array survives the wire with float precision") {
    val st = TopicParityPipeline.embeddingsSchema
    val enc = AvroCodec.encodeUdf(st, "spec-emb-value")
    val dec = AvroCodec.decodeUdf(st, "spec-emb-value")
    val vec = new MockEmbedder(16).embed("x").toSeq
    val df = Seq(("m", "prospect", vec)).toDF("message", "speaker", "embedding")
    val got = df.select(dec(enc(struct(col("message"), col("speaker"), col("embedding")))).as("r"))
      .select("r.embedding").as[Seq[Float]].collect().head
    got shouldBe vec
  }

  test("OCF container files round-trip nulls, arrays, and multiple partitions") {
    val df = Seq(
      (1L, "alpha", Seq(1.5f, -2f), "s1"),
      (2L, null.asInstanceOf[String], Seq.empty[Float], "s2"),
      (3L, "gamma \"quoted\"\nline", Seq(0f), null.asInstanceOf[String]))
      .toDF("id", "text", "vec", "src").repartition(3)
    val dir = java.nio.file.Files.createTempDirectory("graft-ocf-spec").toString
    graft.io.AvroFiles.write(df, dir, "doc")
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    parts.length should be >= 2 // one container per non-empty partition
    // container magic: 'O' 'b' 'j' 1
    val head = java.nio.file.Files.readAllBytes(parts.head.toPath).take(4)
    head shouldBe Array[Byte]('O', 'b', 'j', 1)
    val back = graft.io.AvroFiles.read(spark, dir, df.schema, "doc")
      .as[(Long, String, Seq[Float], String)].collect().sortBy(_._1)
    back.toSeq shouldBe Seq(
      (1L, "alpha", Seq(1.5f, -2f), "s1"),
      (2L, null, Seq.empty[Float], "s2"),
      (3L, "gamma \"quoted\"\nline", Seq(0f), null))
    // empty dir reads as an empty frame with the right schema
    val none = graft.io.AvroFiles.read(spark,
      java.nio.file.Files.createTempDirectory("graft-ocf-empty").toString, df.schema)
    none.count() shouldBe 0L
    none.schema shouldBe df.schema
  }

  test("registry: producers fetch by subject; unknown subject fails like the reference") {
    SchemaRegistry.getOrRegister("known-value",
      AvroCodec.avroSchemaFor(Tables.messageSchema, "known"))
    SchemaRegistry.get("known-value") should include("\"message\"")
    an[RuntimeException] should be thrownBy SchemaRegistry.get("never-registered-value")
  }

  test("registry rejects silent re-registration with a different schema") {
    SchemaRegistry.getOrRegister("strict-value",
      AvroCodec.schemaForSubject(Tables.messageSchema, "strict-value"))
    // same subject, same schema: idempotent
    SchemaRegistry.getOrRegister("strict-value",
      AvroCodec.schemaForSubject(Tables.messageSchema, "strict-value"))
    // evolved type under the same subject: loud failure, not stale bytes
    an[IllegalArgumentException] should be thrownBy
      SchemaRegistry.getOrRegister("strict-value",
        AvroCodec.schemaForSubject(TopicParityPipeline.embeddingsSchema,
          "strict-value"))
  }
}

class TopicParitySpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-topics").toString

  private lazy val fixture: (CoachingPipeline, org.apache.spark.sql.DataFrame) = {
    ModelRegistry.registerReferenceModels()
    val embedder = new MockEmbedder(32)
    val knowledge = Seq(
      ("kb/pricing.md", "Pricing", "kb", "pricing objection handling with discounts and budget talk"),
      ("kb/compete.md", "Compete", "kb", "competitor battlecard for competex and techriva"),
      ("kb/impl.md", "Impl", "kb", "implementation and integration rollout guide"))
      .toDF("document_id", "document_name", "document_category", "document_text")
    val boot = new CoachingPipeline(embedder, new MockChat,
      new BroadcastBruteForceStore(Array.empty))
    val index = boot.indexKnowledge(knowledge)
    val store = BroadcastBruteForceStore.fromDataFrame(index)
    (new CoachingPipeline(embedder, new MockChat, store), index)
  }

  test("topic-parity chain materializes every stage and matches fused mode") {
    val (pipeline, _) = fixture
    val store = new LocalTopicStore(freshDir())
    val parity = new TopicParityPipeline(pipeline, store)

    val messages = Seq(
      ("what about the pricing and budget", "prospect"),
      ("internal note", "salesperson"),
      ("how does competex compare", "prospect")).toDF("message", "speaker")

    val tail = parity.runAll(spark, messages)

    // every intermediate topic exists with wire records (chained-topic
    // contract, SURVEY.md §7.4 #3)
    Seq(TopicParityPipeline.TopicProspect, TopicParityPipeline.TopicEmbeddings,
      TopicParityPipeline.TopicRagResults, TopicParityPipeline.TopicResponse)
      .foreach { t =>
        store.exists(t) shouldBe true
        val recs = store.read(spark, t)
        recs.count() shouldBe 2 // salesperson filtered at stage 0
        // keys are UUIDs (E10, kafka_utils.py:323)
        recs.select("key").as[String].collect()
          .foreach(_ should fullyMatch regex "[0-9a-f-]{36}")
      }

    // stage-for-stage equality with fused mode, modulo row order
    val fused = pipeline.coach(messages)
      .select("message", "rag_results_string", "coaching_response")
      .orderBy("message").collect()
    tail.select("message", "rag_results_string", "coaching_response")
      .orderBy("message").collect() shouldBe fused
  }

  test("join-path retrieval matches the broadcast-store path") {
    val (pipeline, index) = fixture
    val messages = Seq(
      ("tell me about pricing discounts", "prospect"),
      ("is integration hard", "prospect")).toDF("message", "speaker")
    val viaStore = pipeline.coach(messages)
      .select("message", "rag_results_string").orderBy("message").collect()
    val viaJoin = pipeline.coachJoin(messages, index)
      .select("message", "rag_results_string").orderBy("message").collect()
    viaJoin shouldBe viaStore
  }
}

class UpsertStoreSpec extends SparkSpec {
  import spark.implicits._

  test("upsert is idempotent on replays and searchable") {
    val store = new InMemoryVectorStore
    val e = new MockEmbedder(16)
    store.upsert("d1", "chunk one", e.embed("chunk one"))
    store.upsert("d1", "chunk one", e.embed("chunk one")) // replay
    store.upsert("d1", "chunk two", e.embed("chunk two")) // same doc, new chunk
    store.upsert("d2", "other", e.embed("other"))
    store.size shouldBe 3
    store.search(e.embed("chunk one"), 1).head.chunks shouldBe "chunk one"
    store.delete("d2", "other")
    store.size shouldBe 2
  }

  test("streaming upsert sink maintains the index across micro-batches") {
    implicit val ctx = spark.sqlContext
    val store = new InMemoryVectorStore
    val e = new MockEmbedder(16)
    val input = MemoryStream[(String, String)]
    val indexed = graft.operators.MlPredict.withEmbedding(
      input.toDF.toDF("document_id", "chunks"), e, "chunks", "embedding")
    val q = StreamingOps.upsertSink(indexed, store)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-upsert").toString)
      .start()
    try {
      input.addData(("d1", "alpha text"), ("d2", "beta text"))
      q.processAllAvailable()
      store.size shouldBe 2
      input.addData(("d1", "alpha text"), ("d3", "gamma text")) // replay + new
      q.processAllAvailable()
      store.size shouldBe 3
      store.search(e.embed("gamma text"), 1).head.document_id shouldBe "d3"
    } finally q.stop()
  }
}
