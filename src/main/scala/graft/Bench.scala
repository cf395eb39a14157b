package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main — driver runs this per-round with
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 and records the single JSON
  * line against BASELINE.md. Runs the headline (scale-sensitive) subset
  * of SparkEntry.queries (each timing covers plan + execution to a
  * count), then the standing 4-stage streaming chain for a rows/s
  * throughput figure.
  */
object Bench {

  /** T1 throughput: drive the 4-stage standing chain (filter → embed →
    * retrieve → generate, Avro-framed topic hops) over `waves` publishes
    * of `rowsPerWave` messages, pumping every stage's micro-batches after
    * each publish. Returns (prospect rows processed end-to-end, seconds,
    * rows/s). One warm-up wave runs untimed (JIT + stream init). */
  def streamingThroughput(spark: SparkSession, rowsPerWave: Int,
                          waves: Int): (Long, Double, Double) = {
    import graft.pipeline.{CoachingPipeline, TopicParityPipeline}
    import graft.providers.{MockChat, MockEmbedder, ModelRegistry}
    import graft.store.BroadcastBruteForceStore

    ModelRegistry.registerReferenceModels()
    val embedder = new MockEmbedder(32)
    val knowledge = spark.createDataFrame(Seq(
      ("kb/pricing.md", "Pricing", "kb", "pricing objection handling with discounts"),
      ("kb/impl.md", "Impl", "kb", "implementation rollout and integration guide"),
      ("kb/comp.md", "Comp", "kb", "competitor comparison and differentiation")))
      .toDF("document_id", "document_name", "document_category", "document_text")
    val boot = new CoachingPipeline(embedder, new MockChat,
      new BroadcastBruteForceStore(Array.empty))
    val store = BroadcastBruteForceStore.fromDataFrame(boot.indexKnowledge(knowledge))
    val pipeline = new CoachingPipeline(embedder, new MockChat, store)

    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val topics = new graft.io.LocalTopicStore(tmp("graft-bench-topics"))
    val parity = new TopicParityPipeline(pipeline, topics)
    val queries = parity.streamStages(spark, tmp("graft-bench-ckpt"))
    try {
      def wave(n: Int, salt: String): Unit = {
        parity.publishConversation(spark.range(n).select(
          concat(lit(s"message $salt "), col("id").cast("string"),
            lit(" about pricing and integration")).as("message"),
          when(col("id") % 4 === 0, "salesperson").otherwise("prospect")
            .as("speaker")))
        queries.foreach(_.processAllAvailable())
      }
      wave(rowsPerWave, "warm") // untimed: stream init + JIT
      val t0 = System.nanoTime()
      (1 to waves).foreach(i => wave(rowsPerWave, s"w$i"))
      val secs = (System.nanoTime() - t0) / 1e9
      // end-to-end evidence: rows that reached the LAST topic — one
      // scan/decode pass counting total and warm-up rows together
      val counts = parity.consumeResponses(spark).agg(
        count(lit(1)).as("total"),
        count(when(col("message").startsWith("message warm"), 1)).as("warm"))
        .collect().head
      val timedRows = counts.getLong(0) - counts.getLong(1)
      (timedRows, secs, timedRows / secs)
    } finally queries.foreach(_.stop())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus, "graft-bench")

    // Warm EVERY bench plan shape on sf0.01 first: first execution of a
    // plan pays 10-25 s of classloading + JIT + codegen compile in this
    // JVM (measured: identical job 19.4 s cold / 1.1 s warm), and one
    // tiny-sf pass is not enough invocations for the JIT to finish —
    // totals swung 2-4× between identical runs. Warming per shape is
    // sound because the codegen cache is keyed by generated source,
    // which is data-independent.
    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.01").count()
      catch { case _: Throwable => () }
    }

    // Best of three timed runs per query: a single shot still carries
    // residual-JIT/GC noise; the min is the operator's cost. The
    // median/min spread is emitted per run as a noise indicator —
    // round 4 recorded 7.5-10.5× inflation on byte-identical code
    // (machine contention during the driver run), and a figure that
    // carries its own noise evidence can be trusted or discounted
    // without a re-run (see BENCH_NOTES.md).
    val results = names.map { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(name)(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val sorted = times.map(_._1).sorted
      (name, sorted.head, times.forall(_._2), sorted(sorted.size / 2))
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a failed query's "time to crash" must not pass as a measurement —
    // total covers successful queries only, failures are listed explicitly.
    val failed = results.collect { case (k, _, false, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true, _) => v }.sum
    // noise evidence: aggregate median/min ratio (1.0 = perfectly quiet
    // machine; round-4-style contention shows up as >>1) plus the OS
    // 1-minute load average sampled after the run.
    val noise = {
      val mins = results.collect { case (_, mn, true, _) => mn }.sum
      val medians = results.collect { case (_, _, true, md) => md }.sum
      if (mins > 0) medians / mins else 1.0
    }
    val loadAvg =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
      catch { case _: Throwable => -1.0 }
    // streaming chain throughput (independent of sf — topic-driven)
    val streaming =
      try {
        val (rows, secs, rps) = streamingThroughput(spark,
          rowsPerWave = 500, waves = 4)
        s""","streaming":{"rows":$rows,"sec":$secs,"rows_per_sec":$rps}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] streaming failed: ${e.getMessage}")
        ""","streaming":null"""
      }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed$streaming,"noise_median_over_min":$noise,"load_avg":$loadAvg,"sf":"$sfDir"}""")
    spark.stop()
  }
}
