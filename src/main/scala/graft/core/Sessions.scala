package graft.core

import org.apache.spark.sql.SparkSession

/** One SparkSession recipe shared by Verify, Bench, and the test suite so
  * every execution path gets the same semantics-critical config:
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong=true`: the driver test parquet
  *    stores `events.ts` as INT64 TIMESTAMP(NANOS), which Spark 4 rejects
  *    at schema conversion unless read as a plain long (nanoseconds since
  *    epoch). Queries reduce it with `ts div 1e9` (see Queries.tsSec).
  *  - UTC session timezone: timestamp formatting parity with the DuckDB
  *    oracle.
  *  - shuffle partitions = cores: local[N] has no reason for 200-partition
  *    shuffles; on a real cluster this would be sized to executors × cores
  *    (with AQE coalescing handling the tail).
  */
object Sessions {
  def local(cpus: String, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
