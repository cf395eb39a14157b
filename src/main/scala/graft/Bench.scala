package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs this per-round with
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 and records the single JSON
  * line against BASELINE.md. Runs the headline (scale-sensitive) subset
  * of SparkEntry.queries; each timing covers plan + execution to a count.
  */
object Bench {
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
    // residual-JIT/GC noise; the min is the operator's cost.
    val results = names.map { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(name)(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      (name, times.map(_._1).min, times.forall(_._2))
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a failed query's "time to crash" must not pass as a measurement —
    // total covers successful queries only, failures are listed explicitly.
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
