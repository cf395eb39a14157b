package graft.core

import org.apache.spark.sql.SparkSession

/** One SparkSession recipe shared by Verify, Bench, and the test suite so
  * every execution path gets the same semantics-critical config:
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong=true`: tolerance for event
  *    parquet that stores INT64 TIMESTAMP(NANOS), which Spark 4 rejects
  *    at schema conversion unless read as a plain long (nanoseconds since
  *    epoch). Queries.tsSec/tsStamp dispatch on the resolved type, so
  *    both nanos-long and the standard TIMESTAMP(MICROS/MILLIS) encodings
  *    work without config changes.
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
      // let the planner pick shuffled-hash over sort-merge when its
      // size conditions hold (guide §3.1/§9): both sides still shuffle
      // on the equi key, but the per-partition build replaces two
      // sorts. The planner only chooses SHJ when a build-side
      // partition's ESTIMATED size fits its local hash map (estimates
      // can be wrong after UDFs/explodes, and SHJ's build side does
      // not spill), and the bound scales with shuffle.partitions
      // (= $SPARK_GRAFT_CPUS here, executors x cores on a cluster).
      // SPARK_GRAFT_PREFER_SMJ=1 reverts to sort-merge preference
      // without a rebuild — the deployment escape hatch for workloads
      // where size misestimates make SHJ's non-spilling build risky,
      // and the lever for same-binary A/B measurement.
      .config("spark.sql.join.preferSortMergeJoin",
        if (sys.env.get("SPARK_GRAFT_PREFER_SMJ").contains("1")) "true"
        else "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.core.GraftExtensions")
      // saveAsTable targets (bucketed tables) land in a per-process temp
      // warehouse (deleted at JVM exit), not the working directory
      .config("spark.sql.warehouse.dir", TempRoots.scratch("warehouse"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    registerUdfs(spark)
    spark
  }

  /** SQL-surface registration of the UDF-shaped operators (the
    * expression-shaped ones are injected by GraftExtensions). Idempotent. */
  def registerUdfs(spark: SparkSession): Unit = {
    // full 8-arg reference signature, positional order matching
    // ML_CHARACTER_TEXT_SPLITTER(input, chunk_size, chunk_overlap,
    // separator, is_separator_regex, keep_separator, trim_whitespace,
    // keep_separator_position)
    spark.udf.register("split_text",
      (t: String, size: Int, overlap: Int, sep: String, isRegex: Boolean,
       keepSep: Boolean, trim: Boolean, position: String) =>
        graft.functions.TextSplit.splitText(t, size, overlap, sep,
          trimChunks = trim, isRegex = isRegex, keepSeparator = keepSep,
          sepPosition = position))
    spark.udf.register("minhash_band_keys",
      (t: String, shingleN: Int, bands: Int, rowsPerBand: Int) =>
        graft.functions.Hashing.bandKeysScala(t, shingleN, bands, rowsPerBand))
  }
}
