package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingOps

/** Real-broker integration for S1 (Kafka source) / S2 (Kafka sink) —
  * gated on `SPARK_GRAFT_KAFKA=<bootstrap.servers>` so the two
  * shape-only functions get executed end-to-end the day an environment
  * provides a broker (this sandbox is offline: no broker and no
  * spark-sql-kafka connector jar, so every test here cancels cleanly
  * via `assume`, which ScalaTest reports as canceled, not failed).
  *
  * Run against a local broker:
  *   SPARK_GRAFT_KAFKA=localhost:9092 sbt "testOnly graft.KafkaIntegrationSpec"
  * (also requires spark-sql-kafka and kafka-clients jars on the
  * classpath — not shipped in this image.)
  *
  * Why NOT an embedded KRaft broker (the obvious ungating move):
  * Kafka's server artifact would indeed run in-process on the JVM, but
  * this build resolves dependencies offline against a pre-warmed cache
  * that carries neither the Kafka server/clients jars nor Spark's
  * spark-sql-kafka connector (verified: no kafka artifact under
  * /opt/spark/jars or the coursier cache), and the build rules forbid
  * new libraryDependencies. Until an environment ships those jars, the
  * env gate is the honest boundary; everything transport-independent
  * (Avro SR framing, topic-chain semantics, offset bookkeeping) is
  * oracle- or spec-covered against the local topic store.
  *
  * Per-round resolution re-check (one cheap attempt each round):
  *  - r16: still absent — the offline coursier cache carries no
  *    org/apache/kafka group and no spark-sql-kafka artifact, and
  *    /opt/spark/jars ships no kafka jar. Gate stays.
  *  - r17: still absent — same two locations re-checked, no
  *    org/apache/kafka group, no kafka jar. Gate stays.
  *  - r18: still absent — /opt/spark/jars and the coursier/ivy caches
  *    re-searched for any kafka artifact: zero hits. Gate stays.
  *  - r19: still absent — a filesystem-wide jar search plus the
  *    coursier/ivy cache roots: zero kafka artifacts. Gate stays.
  */
class KafkaIntegrationSpec extends SparkSpec {

  private val brokers = sys.env.get("SPARK_GRAFT_KAFKA")

  private def withBroker(f: String => Unit): Unit = {
    assume(brokers.isDefined,
      "SPARK_GRAFT_KAFKA not set — skipping real-broker Kafka integration")
    assume(
      try { Class.forName(
        "org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
      catch { case _: ClassNotFoundException => false },
      "spark-sql-kafka connector jar not on classpath")
    f(brokers.get)
  }

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("S2→S1 round-trip: Avro-framed rows survive a real topic hop") {
    withBroker { bs =>
      val topic = s"graft-it-${java.util.UUID.randomUUID().toString.take(8)}"
      val rows = spark.range(10).select(
        col("id").cast("string").as("key"),
        encode(concat(lit("msg-"), col("id").cast("string")), "UTF-8")
          .as("value"))
      // S2: sink a bounded stream of (key, value) to the topic
      val src = tmp("graft-kafka-src")
      rows.write.parquet(s"$src/batch")
      val stream = spark.readStream.schema(rows.schema).parquet(s"$src/batch")
      val sink = StreamingOps.kafkaSink(stream, bs, topic, tmp("graft-kafka-ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      withClue("sink did not terminate within 60s") {
        sink.awaitTermination(60000) shouldBe true
      }

      // S1: read back from earliest and count via an in-memory sink
      val read = StreamingOps.kafkaSource(spark, bs, topic,
        startingOffsets = "earliest")
      val q = read.selectExpr("CAST(value AS STRING) AS v")
        .writeStream.format("memory").queryName("graft_kafka_it")
        .trigger(Trigger.AvailableNow()).start()
      withClue("source did not terminate within 60s") {
        q.awaitTermination(60000) shouldBe true
      }
      val got = spark.table("graft_kafka_it").collect().map(_.getString(0)).sorted
      got.length shouldBe 10
      got.head shouldBe "msg-0"
    }
  }

  test("S1 honors read_uncommitted isolation and startingOffsets") {
    withBroker { bs =>
      val df = StreamingOps.kafkaSource(spark, bs, "graft-it-opts", "earliest")
      // source loads with the reference's isolation option without throwing
      df.isStreaming shouldBe true
    }
  }
}
