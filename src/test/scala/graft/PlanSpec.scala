package graft

/** Physical-plan guards: the scale properties claimed in the operator
  * docs, asserted against the actual planned strings so a regression
  * (lost pushdown, join degrading to cartesian/sort-merge, top-N
  * degrading to a global sort) fails CI instead of only showing up at
  * 100 TB. Run on the smallest sf — plan shape is data-independent here.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q02: filter and projection push into the parquet scan") {
    val p = plan("q02_filter_project")
    p should include("PushedFilters: [")
    p should include("event_type")
    // pruned read schema — the timestamp column never reaches the scan
    p should not include "ts:"
  }

  test("q03: small dimension joins as broadcast, not shuffle") {
    val p = plan("q03_join_broadcast")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("q05/q06: semi and anti joins stay semi/anti (no row multiplication)") {
    plan("q05_semi_join") should include("LeftSemi")
    plan("q06_anti_join") should include("LeftAnti")
  }

  test("recent history plans TakeOrderedAndProject, not a global window sort") {
    val p = plan("rag_recent_history")
    p should include("TakeOrderedAndProject")
    p should not include "Window"
  }

  test("vector topk broadcasts the corpus; queries never shuffle for the join") {
    val p = plan("rag_vector_topk")
    p should include("BroadcastNestedLoopJoin")
    p should not include "CartesianProduct"
  }

  test("per-group topk window is hash-partitioned by the group key") {
    val p = plan("q07_window_topk_group")
    p should include("Window")
    p should include("hashpartitioning(o_custkey")
  }

  test("shipping priority: selective predicates reach the scans, top-10 merges") {
    val p = plan("q12_shipping_priority")
    p should include("TakeOrderedAndProject")
    p should include("EqualTo(c_mktsegment,BUILDING)") // pushed to the scan
    p should include("LessThan(o_orderdate")
    p should include("GreaterThan(l_shipdate")
  }

  test("exact dedup is a partial-aggregate groupBy (map-side combine)") {
    val p = plan("dedup_exact")
    p should include("partial_count")
    p should not include "CartesianProduct"
  }

  test("minhash LSH pair expansion has no self-join and no cartesian product") {
    val p = plan("dedup_minhash_lsh")
    p should not include "CartesianProduct"
    p should not include "SortMergeJoin"
  }

  test("semantic dedup pairs only within cells: cluster equi-join, no cartesian") {
    val p = plan("dedup_semantic")
    // the pair expansion is keyed on the IVF cell — an equi-join whose
    // blowup is bounded by the cluster (broadcast at this sf, shuffle
    // on the cluster key at scale), never an all-pairs product
    p should include regex """(BroadcastHash|SortMerge|ShuffledHash)Join \[cluster"""
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoop"
  }

  test("multi-table LSH is a signature equi-join — no cartesian, no BNLJ") {
    val p = plan("ann_lsh_multitable")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("ivf training step is one aggregate — no joins, partial agg kept") {
    val p = plan("ann_ivf_train")
    // member counts ride the (cluster, dim) aggregate; a second corpus
    // scan + count join would show a join node here
    p should not include "Join"
    p should include("partial_count") // map-side combine on (cluster, dim)
    p should not include "CartesianProduct"
  }

  test("winnowing is a partition-local generator: zero hash exchanges") {
    val p = plan("text_winnowing")
    // selection happens inside the Generate operator; the only exchanges
    // are the harness round-robin spread and the final range sort
    "hashpartitioning".r.findAllIn(p).length shouldBe 0
    p should include("Generate")
    p should not include "Window"
    p should not include "CartesianProduct"
  }

  test("PQ ADC search: corpus streams, LUT-bearing queries broadcast") {
    val p = plan("ann_pq_adc")
    // the inverse of brute force's broadcast: the encoded corpus (huge
    // at scale, m ints per row) must never shuffle OR broadcast — the
    // tiny query side with its lookup tables rides the broadcast, which
    // with enc on the left means BuildRight specifically
    p should include("BroadcastNestedLoopJoin BuildRight")
    p should not include "SortMergeJoin"
    p should not include "ShuffledHashJoin"
  }

  test("IVFADC: corpus streams, probe-expanded LUT queries broadcast into one cluster equi-join") {
    val p = plan("ann_ivfpq_adc")
    // the encoded corpus (m ints per row, huge at scale) streams on the
    // left while the probe×LUT query side rides a broadcast into a hash
    // join keyed on the coarse cell — only probed cells are ever scored,
    // vs pqAdcTopK's full-scan cartesian
    p should include("BroadcastHashJoin [cluster")
    p should include("BuildRight")
    p should not include "SortMergeJoin"
    p should not include "ShuffledHashJoin"
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("IVFADC refine: point-lookup equi-joins only — candidates and queries broadcast") {
    val p = plan("ann_ivfpq_rerank")
    // ADC stage keeps its cluster equi-join; the refine adds the
    // shortlist→raw-corpus id join and the qid join, both broadcast —
    // the raw corpus is never shuffled and nothing degrades to a
    // cartesian or sort-merge
    p should include("BroadcastHashJoin [cluster")
    p should include("BroadcastHashJoin [nid")
    p should include("BroadcastHashJoin [qid")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("mojibake gate is a per-row map: zero hash exchanges, zero joins") {
    val p = plan("text_mojibake")
    "hashpartitioning".r.findAllIn(p).length shouldBe 0
    p should not include "Join"
  }

  test("boilerplate strip: equi-keyed shuffles only, never a cartesian") {
    val p = plan("curate_boilerplate")
    // (source, line-hash) count + left join + doc reassembly — all
    // equi-keyed; a line-vs-line comparison would show as a cartesian
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("ngram repetition is a per-row scan: zero hash exchanges, zero joins") {
    val p = plan("text_ngram_repetition")
    // the gram multiset is per-document — a corpus explode+groupBy
    // form would show doc-keyed exchanges here (the charEntropy lesson)
    "hashpartitioning".r.findAllIn(p).length shouldBe 0
    p should not include "Join"
  }

  test("gopher rule card is a per-row map: zero hash exchanges, zero joins") {
    val p = plan("text_gopher_rules")
    "hashpartitioning".r.findAllIn(p).length shouldBe 0
    p should not include "Join"
  }

  test("contamination report broadcasts bench pairs; argmax is an aggregate") {
    val p = plan("curate_contamination_report")
    p should include("BroadcastHashJoin")
    // the per-doc argmax is a combinable min_by aggregate — a window
    // here would mean a doc-keyed sort re-appeared
    p should not include "Window"
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
  }

  test("fuzzy decontamination broadcasts the benchmark fingerprint set") {
    val p = plan("curate_decontaminate_fuzzy")
    // the corpus side must never shuffle against the benchmark — the
    // bench hash set rides a broadcast; one doc-keyed aggregate follows
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
  }

  test("char entropy is a per-row map: zero hash exchanges before the final sort") {
    val p = plan("text_char_entropy")
    // the only exchanges are the harness round-robin spread and the
    // presentation range sort — a doc-keyed aggregation would show here
    "hashpartitioning".r.findAllIn(p).length shouldBe 0
    p should not include "Join"
  }

  test("tfidf: high-cardinality term join, no cartesian blowup from N") {
    val p = plan("text_tfidf")
    p should not include "CartesianProduct" // 1-row N rides a broadcast
  }

  test("bigram surprisal: pair zip is per-row — no window, no cartesian") {
    val p = plan("text_bigram_surprisal")
    // adjacent pairs come from zip_with over two slices inside a
    // Generate, never a positional window over exploded tokens; the
    // Generate itself sits behind the (doc, l, r)-count checkpoint, so
    // the final plan reads the materialized pair counts (ExistingRDD)
    p should not include "Window"
    p should not include "CartesianProduct"
    p should include("ExistingRDD")
  }

  test("temperature mix expansion broadcasts the strata rollup") {
    val p = plan("curate_temperature_mix")
    // the #strata (stratum, floor, threshold) table rides a broadcast;
    // a when-chain would show zero joins but O(#strata) per row, a
    // sort-merge join would shuffle the corpus on the stratum key
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "Window"
  }

  test("cluster-best: equi-joins and one comp window, never a cartesian") {
    val p = plan("dedup_cluster_best")
    // scores→labels is an id-keyed equi-join (the label set is the full
    // duplicate-node set — must NOT plan as a broadcast-nested-loop or
    // cartesian), and the keep decision is one comp-partitioned window
    p should include("Window")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("fuzzy incremental: band equi-join + anti join, never a cartesian") {
    val p = plan("dedup_incremental_fuzzy")
    // batch x index meet ONLY on band_key / shingle equi-keys and the
    // final anti join — an all-pairs comparison would show as cartesian
    p should include("LeftAnti")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("incremental dedup plans an anti join against the hash index") {
    val p = plan("dedup_incremental")
    p should include("LeftAnti")
    p should not include "CartesianProduct"
  }

  test("curate_pack running-sum window is hash-partitioned by source") {
    val p = plan("curate_pack")
    p should include("Window")
    p should include("hashpartitioning(source")
    // a global running sum would serialize the corpus through one task
    p should not include "SinglePartition"
  }

  test("curate_best_per_source rank window is hash-partitioned by source") {
    val p = plan("curate_best_per_source")
    p should include("Window")
    p should include("hashpartitioning(source")
    p should not include "SinglePartition"
  }

  test("altstar components: per-round u-keyed windows only, never a cartesian") {
    // plan ONE ROUND BODY directly: the loop localCheckpoints each round,
    // so planning the final labels would show only the last scan — a
    // vacuous guard over the shuffles this test exists to pin. The round
    // computes both stars' neighbourhood minima as u-partitioned windows
    // (one hash shuffle each, single evaluation of the subtree) — the
    // former agg+self-join form re-ran the large-star subtree 4x/round
    import org.apache.spark.sql.functions.col
    val edges = spark.range(100).select(col("id").as("u"),
      (col("id") + 1).as("v"))
    val p = graft.operators.Dedup.altStarRound(edges)
      .queryExecution.executedPlan.toString
    p should include("Window")
    p should include regex "windowspecdefinition\\(u"
    p should not include "Join"              // min rides the window now
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("segment dedup: md5 equi-join against the flagged sliver, no cartesian") {
    val p = plan("dedup_segments")
    p should include("partial_count")  // distinct-doc count combines map-side
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("video frame stages are shuffle-free partition maps up to the output sort") {
    // demux + per-frame rows come from mapPartitions — the only exchanges
    // allowed are the final presentation orderBy (range) and the
    // signature groupBy in the neardup variant (hash on media_id/sig)
    val p = plan("mm_frame_decode")
    p should not include "Join"
    "hashpartitioning".r.findAllIn(p).length shouldBe 0
    val p2 = plan("mm_video_neardup")
    p2 should not include "CartesianProduct"
    p2 should not include "SortMergeJoin" // window+agg, never a join
  }

  test("sampled IVF search joins corpus to probes on the cluster id only") {
    val p = plan("ann_ivf_sampled")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("cluster") // the equi-join key
  }

  test("token budget: doc-side window hashes on the bucket key, buckets broadcast") {
    val p = plan("curate_token_budget")
    // the per-doc running sum is partitioned by the quality bucket — the
    // global window runs only over the bounded bucket ROLLUP, and the
    // surviving buckets come back as a broadcast, never a shuffled join
    p should include("hashpartitioning(q")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
  }

  test("hash split is a pure per-row map: no shuffle before the compare sort") {
    val p = plan("curate_split")
    // the split label is md5-threshold bands on each row's own id —
    // the only exchange is the driver-compare orderBy's range partition
    p should not include "hashpartitioning"
    p should not include "Join"
    p should not include "Window"
  }

  test("shuffle shard: doc-side window hashes on the key prefix, rollup broadcast") {
    val p = plan("curate_shuffle_shard")
    // same two-phase shape as token budget: the single-partition window
    // runs only over the 16^len-row bucket rollup; the corpus side takes
    // one hash exchange on the bucket and gets the rollup as a broadcast
    p should include("hashpartitioning(bucket")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
  }

  test("snapshot diff is one co-partitioned full-outer join, nothing more") {
    val p = plan("curate_snapshot_diff")
    p should include("FullOuter")
    "hashpartitioning".r.findAllIn(p).length should be <= 2 // one per side
    p should not include "CartesianProduct"
  }

  test("cardinality sketch-only plan is one partial-combinable aggregate, no expand") {
    spark.conf.set("graft.hll.sketchOnly", "true")
    try {
      val p = plan("curate_cardinality_sketch")
      // the HLL estimate merges map-side; exact countDistinct would plan
      // a second aggregate pass over (source, h)
      p should include("partial_approx_count_distinct")
      p should not include "Join"
    } finally spark.conf.unset("graft.hll.sketchOnly")
  }

  test("prompt-assembly neighbour window is hash-partitioned, not global") {
    val p = plan("rag_prompt_assembly")
    p should include("Window")
    // the lead() window exchange hashes on the block key — a global
    // Window.orderBy would show Exchange SinglePartition feeding Window
    p should not include "SinglePartition"
  }

  test("rolling anomaly stats: per-user windows, never a single global sort partition") {
    val p = plan("q17_rolling_anomaly")
    p should include("Window")
    "windowspecdefinition\\((\\w+)#".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq.distinct shouldBe Seq("user_id")
  }

  test("rollup runs as one Expand + one aggregate over a single scan — no per-level rescans") {
    val p = plan("q19_rollup")
    p should include("Expand")
    "FileScan".r.findAllIn(p).size shouldBe 1
    p should include("HashAggregate") // partial agg survives the expand
    p should not include "Join"
  }

  test("pivot lowers to conditional aggregates: one scan, no join, static schema") {
    val p = plan("q20_pivot")
    "FileScan".r.findAllIn(p).size shouldBe 1
    p should not include "Join"
  }

  test("unpivot lowers to one Expand over a single scan — no union of rescans") {
    val p = plan("q21_unpivot")
    p should include("Expand")
    "FileScan".r.findAllIn(p).size shouldBe 1
    p should not include "Join"
  }

  test("quality deciles: ntile windows partition on source, never a global sort") {
    val p = plan("curate_quality_deciles")
    p should include("ntile")
    p should not include "SinglePartition"
  }

  test("resample+ffill: equi-joins on (user, bin) only — no cartesian grid") {
    val p = plan("q18_resample_ffill")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // the fill window partitions on the series key, never globally
    p should not include "SinglePartition"
  }

  test("gateRobots: one broadcast join, zero shuffles — the streaming-legal shape") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    import graft.functions.Robots
    import graft.operators.CrawlFrontier
    import spark.implicits._
    val disc = spark.read.parquet(s"$dir/documents.parquet")
      .select(concat(lit("https://h.ex.com/p/"), col("doc_id")).as("url"),
        lit(1).as("depth"))
    // materialize the (tiny) rules frame so its own one-off
    // aggregation exchanges don't appear in the gate's plan — the
    // claim under test is that the DISCOVERED side never shuffles
    val byHost = Robots.rulesByDomain(Robots.parseRules(
      Seq(("h.ex.com", "User-agent: *\nDisallow: /private\n"))
        .toDF("domain", "robots_txt")), "*").localCheckpoint(true)
    val p = CrawlFrontier.gateRobots(disc, byHost)
      .queryExecution.executedPlan.toString
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 0
  }

  test("langid NB classify: the model rides broadcasts, the argmax window partitions per doc — never a global sort, never a real cartesian") {
    val p = plan("text_langid_nb")
    // the langs×doc cross join is a broadcast nested loop over a
    // ≤3-row frame (expected and bounded); a CartesianProduct would
    // mean the broadcast hint was lost
    p should not include "CartesianProduct"
    p should include("BroadcastHashJoin") // the (lang, bucket) model probe
    // the per-doc argmax window partitions on the doc key and plans
    // with the rank-1 WindowGroupLimit pushdown — never a global sort
    // (the only SinglePartition exchange allowed is the 1-row priors
    // total, which carries no Window)
    p should include("WindowGroupLimit")
    p should include regex "windowspecdefinition\\(__nb_id"
  }

  test("reseed: one url-equi join over the frontier, no window, no cartesian — the seed wave broadcasts") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    import graft.operators.CrawlFrontier
    val urls = spark.read.parquet(s"$dir/documents.parquet")
      .select(concat(lit("https://h.ex.com/p/"), col("doc_id")).as("url"),
        lit("2026-01-05").as("lastmod"))
    val frontier = CrawlFrontier.seed(urls, now = 1000L)
      .withColumn("last_fetch_ts", lit(5000L))
      .withColumn("next_fetch_ts", lit(99999L))
      .localCheckpoint(true)
    val seeds = CrawlFrontier.seed(urls, now = 6000L,
      lastmodCol = Some("lastmod")).localCheckpoint(true)
    val p = CrawlFrontier.reseed(frontier, seeds, now = 6000L)
      .queryExecution.executedPlan.toString
    // the frontier side takes ONE equi join against the (small,
    // aggregated) seed wave — never a window, never a cartesian; the
    // only exchanges belong to the seed side's url aggregate
    p should not include "Window"
    p should not include "CartesianProduct"
    // any EQUI join strategy satisfies the pin (the session prefers
    // shuffled-hash over sort-merge since r19) — the guard is against
    // a cartesian/window regression, not a particular hash family
    p should include regex "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"
  }

  test("seed with lastmod keeps the single url-keyed shuffle (the parse is a per-row map inside the aggregate)") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    import graft.operators.CrawlFrontier
    val urls = spark.read.parquet(s"$dir/documents.parquet")
      .select(concat(lit("https://h.ex.com/p/"), col("doc_id")).as("url"),
        lit("2026-01-05").as("lastmod"))
    val p = CrawlFrontier.seed(urls, now = 1000L,
        lastmodCol = Some("lastmod"))
      .queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
    p should not include "Window"
  }
}
