package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Sessions.local(cpus, "graft-verify")
    new java.io.File(outDir).mkdirs()
    // Oracle sidecars: queries whose DuckDB oracle needs an
    // engine-trained artifact (the OPQ rotations) export it to the
    // PID-scoped path QueriesDataOps.oracleSidecarRoot embeds into the
    // oracle SQL at string-construction time — but only under Verify,
    // so a later Bench invocation at another scale factor cannot
    // overwrite the artifact between this dump and the driver's DuckDB
    // compare. Deliberately NOT deleted at exit: the driver's DuckDB
    // replay reads the sidecars AFTER this process ends (tiny parquet
    // files in java.io.tmpdir; the OS tmp reaper owns their lifetime).
    System.setProperty("graft.oracle.sidecars", "1")
    // A failed query must be LOUD: queries without an oracle are simply
    // absent from the driver's correctness report when they crash, so a
    // swallowed exception reads as "not checked" instead of "broken".
    // SPARK_GRAFT_VERIFY_ONLY=a,b restricts the dump — local iteration
    // on one operator without the 100+-query full pass (the driver
    // leaves it unset, so the gate still covers everything)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val failed = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        Some(name)
      } finally
        // deterministic release of any frames the query closure
        // persisted (cluster_best / incremental_fuzzy / token_budget):
        // 100+ queries in one session would otherwise pin blocks until
        // driver GC lets the ContextCleaner run
        spark.catalog.clearCache()
    }
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} queries failed: " +
        failed.mkString(", "))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
