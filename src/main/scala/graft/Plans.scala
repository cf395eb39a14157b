package graft

import java.nio.file.{Files, Paths}

/** Plan-capture main for the optimization rounds: writes
  * `.explain("formatted")` for each declared query to
  * `<outDir>/<name>_<suffix>.txt` so plan claims (Exchange count, join
  * strategy, PushedFilters/ReadSchema) are checkable without running
  * Spark. Building a query's DataFrame may run its bounded side jobs
  * (centroid collects, index writes) — the captured plan is the final
  * returned frame's, the same one Bench times.
  *
  * Usage: runMain graft.Plans <outDir> <suffix> [name1,name2,...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r19")
    val suffix = if (args.length > 1) args(1) else "before"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').map(_.trim)
        .filter(_.nonEmpty).toSet)
      else None
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-plans")
    Files.createDirectories(Paths.get(outDir))
    val names = SparkEntry.all.map(_._1).filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(txt).length
        println(s"[plans] $name: $exchanges Exchange, ${txt.length} chars")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
