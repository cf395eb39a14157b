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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the JVM/codegen once on the smallest sf so per-query numbers
    // measure the operator, not first-call JIT + classloading.
    try SparkEntry.queries("q01_agg_summary")(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => () }

    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
