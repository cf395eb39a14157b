package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, TextAnalysis}
import graft.operators.Dedup

/** The training-data counterpart of CoachingPipeline: corpus curation as
  * one declarative flow — exact dedup, language allowlist, quality floor,
  * token-count band — producing the rows a pretraining run keeps, plus
  * the per-stage reason for every row it drops.
  *
  * Plan shape at 100 TB: one shuffle (the dedup window on the content
  * hash); every filter is a pure codegen'd column expression fused into
  * the same stage, evaluated after dedup so surviving rows are scored
  * once. Keep/drop accounting is a projection, not a second pass.
  */
object CurationPipeline {

  final case class Config(minQuality: Double = 0.5,
                          langs: Seq[String] = Seq("en"),
                          minTokens: Int = 10,
                          maxTokens: Int = 100000)

  /** Reason column: first failed gate in a fixed order (dedup loss is
    * encoded by absence — deduped rows never reach scoring). */
  private def dropReason(text: Column, cfg: Config): Column =
    when(!TextAnalysis.langId(text).isin(cfg.langs: _*), "lang")
      .when(TextAnalysis.qualityScore(text) < cfg.minQuality, "quality")
      .when(TextAnalysis.tokenCount(text) < cfg.minTokens ||
        TextAnalysis.tokenCount(text) > cfg.maxTokens, "tokens")
      .otherwise("keep")

  /** The gate verdict as a plain column expression — public so the
    * STREAMING curation path (StreamingOps.curateStream) applies the
    * exact same gates behind a watermark dedup: one definition, both
    * execution models. */
  def verdict(text: Column, cfg: Config = Config()): Column =
    dropReason(text, cfg)

  /** Rows that survive every gate. */
  def curate(docs: DataFrame, cfg: Config = Config(),
             textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    annotate(docs, cfg, textCol, idCol).filter(col("verdict") === "keep")

  /** Every post-dedup row annotated with its verdict — the audit view
    * (what was dropped, and why) a curation run reports. */
  def annotate(docs: DataFrame, cfg: Config = Config(),
               textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    Dedup.exact(docs, textCol, idCol)
      .withColumn("verdict", dropReason(col(textCol), cfg))

  /** Sequence packing — the last curation stage before training: lay
    * documents head-to-tail into fixed-capacity token bins (contiguous
    * fill in deterministic (stratum, id) order; a document belongs to
    * the bin where its first token lands). Emits (id, stratum,
    * n_tokens, bin, offset) so the trainer can materialize each bin's
    * member list with one groupBy.
    *
    * Plan shape: one hash-partitioned running-sum window per stratum —
    * packing is inherently sequential, so the stratum IS the
    * parallelism unit (a global pack would be one partition; per-source
    * packing is what a sharded corpus does anyway). Bin ids use exact
    * integral division. */
  def packSequences(docs: DataFrame, capacity: Int,
                    strataCol: String = "source", textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(capacity > 0, s"invalid capacity=$capacity")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), col(strataCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col(strataCol), col("n_tokens"),
        expr(s"cum_before div ${capacity}L").as("bin"),
        (col("cum_before") % capacity).as("offset"))
  }

  /** Sequence-length bucket report — the batch-assembly planning view
    * for fixed-shape training: docs binned to the smallest power-of-two
    * capacity ≥ their token count (16…8192, catch-all 16384), with
    * per-bucket doc counts, token mass, and PADDING WASTE (capacity −
    * tokens summed, plus its fraction of the bucket's slot capacity) —
    * the number a curriculum/batching strategy is tuned to minimize.
    *
    * The bucket ladder is explicit integer CASE logic, not
    * `2^ceil(log2 n)`: float log on an exact power of two is
    * libm-dependent in the last ulp, and a flipped ceil would silently
    * move a boundary doc one bucket up on one engine only.
    *
    * Plan shape: per-row map (codegen'd regexp token count + CASE) into
    * ONE partial-aggregated groupBy over ≤ 11 bucket keys — at 100 TB
    * the shuffle carries 11 rows per task. */
  def lengthBucketReport(docs: DataFrame,
                         textCol: String = "text"): DataFrame = {
    val ladder = Seq(16L, 32L, 64L, 128L, 256L, 512L,
      1024L, 2048L, 4096L, 8192L)
    val bucket = ladder.foldRight(lit(16384L): Column)((b, rest) =>
      when(col("n_tokens") <= b, lit(b)).otherwise(rest))
    docs
      .select(TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens"),
        sum(col("bucket") - col("n_tokens")).as("padding_waste"))
      .withColumn("waste_frac",
        col("padding_waste").cast("double") /
          (col("n_docs") * col("bucket")).cast("double"))
      .orderBy(col("bucket"))
  }

  /** Benchmark decontamination — the train/eval-overlap gate: flag every
    * candidate document sharing at least one `shingleN`-gram (word
    * shingle over the lowercased token stream) with the benchmark set,
    * so evaluation data can be removed from the training mix.
    *
    * Plan shape: both sides explode to distinct shingles (JIT-compiled
    * UDF, one call per row); the benchmark side — small by nature — is
    * broadcast, and the match is a LEFT SEMI join (no row
    * multiplication however many shingles collide), then distinct ids.
    * Returns the flagged candidate ids. */
  def decontaminate(candidates: DataFrame, benchmark: DataFrame,
                    textCol: String = "text", idCol: String = "doc_id",
                    shingleN: Int = 8): DataFrame = {
    val candSh = candidates.select(col(idCol).as("doc_id"),
      explode(Hashing.shinglesUdf(shingleN)(col(textCol))).as("sh"))
    val benchSh = benchmark
      .select(explode(Hashing.shinglesUdf(shingleN)(col(textCol))).as("sh"))
      .distinct()
    candSh.join(broadcast(benchSh), Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
  }

  /** FUZZY benchmark decontamination — [[decontaminate]]'s exact-shingle
    * gate misses lightly edited eval copies (reworded question stems,
    * re-wrapped whitespace); winnowing fingerprints
    * ([[Dedup.winnowingFingerprints]], SIGMOD'03) guarantee a shared
    * fingerprint for any shared canonical substring of w+k-1 chars, so
    * CONTAINMENT over them — |doc's fingerprints ∩ benchmark's| / |doc's
    * fingerprints| — scores how much of a candidate is benchmark
    * material regardless of where it was pasted. Emits every candidate's
    * score card (doc_id, n_fps, n_hits, containment, flagged), flagged =
    * rounded containment ≥ `tau`; callers anti-join `flagged` to clean.
    * Candidates whose CANONICAL text (lowercased, non-alphanumerics
    * collapsed) is shorter than w+k-1 chars yield no fingerprints and
    * emit NO row — same contract as the fingerprint generator itself.
    * A caller treating absence as "clean" must length-gate such docs
    * separately (they are below the guarantee window, so fingerprint
    * containment cannot say anything about them either way).
    *
    * Plan shape: fingerprints come from the per-row winnowing generator
    * (zero shuffle on the corpus side); the benchmark's distinct hash set
    * — small by nature — is broadcast; one doc-keyed distinct-count
    * aggregate computes both totals in a single shuffle. The corpus is
    * never joined to itself. */
  def decontaminateFuzzy(candidates: DataFrame, benchmark: DataFrame,
                         textCol: String = "text", idCol: String = "doc_id",
                         k: Int = 8, w: Int = 4,
                         tau: Double = 0.8): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    // dedup (doc, fp_hash) BEFORE the bench join (position duplicates
    // would re-count): the two former countDistinct aggregates (a
    // two-phase distinct expansion each) become plain combinable
    // counts over the deduped rows (guide §2.3)
    val candFp = Dedup.winnowingFingerprints(candidates, textCol, idCol, k, w)
      .select(col("doc_id"), col("fp_hash"))
      .dropDuplicates("doc_id", "fp_hash")
    val benchFp = Dedup.winnowingFingerprints(benchmark, textCol, idCol, k, w)
      .select(col("fp_hash")).distinct()
      .withColumn("hit", lit(true))
    candFp.join(broadcast(benchFp), Seq("fp_hash"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fps"),
        count(when(col("hit"), lit(1))).as("n_hits"))
      .withColumn("containment",
        round(col("n_hits").cast("double") / col("n_fps"), 6))
      .withColumn("flagged", col("containment") >= tau)
  }

  /** Contamination PROVENANCE — the report a decontamination run
    * attaches to its drop list: for every candidate sharing at least one
    * winnowing fingerprint with the benchmark set, the single benchmark
    * document explaining the largest share of the overlap
    * (doc_id, bench_id, n_shared distinct fingerprints; ties to the
    * smaller bench id). [[decontaminateFuzzy]] answers "how much of this
    * doc is benchmark material"; this answers "WHICH benchmark leaked".
    *
    * Plan shape: candidate fingerprints from the per-row generator (zero
    * corpus shuffle), deduped per (doc, hash); the benchmark's distinct
    * (fingerprint, bench_id) pairs — benchmark-sized — are broadcast;
    * matches aggregate per (doc, bench) pair (map-side combinable) and
    * a doc-keyed min_by aggregate takes the argmax (no window sort).
    * Inner-join fan-out per candidate fingerprint is bounded by the
    * benchmark docs sharing that hash — a benchmark-side constant,
    * never corpus × corpus. */
  def contaminationReport(candidates: DataFrame, benchmark: DataFrame,
                          textCol: String = "text", idCol: String = "doc_id",
                          k: Int = 8, w: Int = 4): DataFrame = {
    // dedup (doc, fp_hash) BEFORE the bench join: winnowing emits the
    // same hash at several positions, and every duplicate would be
    // multiplied by its bench matches in the join — deduping first
    // shrinks the join input AND turns the former countDistinct
    // (a two-phase distinct aggregate AFTER the multiplication) into a
    // plain combinable count (guide §2.3 aggregate before you shuffle)
    val candFp = Dedup.winnowingFingerprints(candidates, textCol, idCol, k, w)
      .select(col("doc_id"), col("fp_hash"))
      .dropDuplicates("doc_id", "fp_hash")
    val benchFp = Dedup.winnowingFingerprints(benchmark, textCol, idCol, k, w)
      .select(col("doc_id").as("bench_id"), col("fp_hash")).distinct()
    // argmax as ONE combinable aggregate instead of a window (no
    // doc-keyed sort): the ordering key (-n_shared, bench_id) is
    // unique within a doc, so min_by is deterministic and picks
    // exactly the old rn=1 row (n_shared DESC, bench_id ASC) — min_by
    // rather than max_by so bench_id orders naturally whatever its
    // type (n_shared, a count, is always safely negatable)
    candFp.join(broadcast(benchFp), Seq("fp_hash"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .groupBy(col("doc_id"))
      .agg(min_by(struct(col("bench_id"), col("n_shared")),
        struct(-col("n_shared"), col("bench_id"))).as("__best"))
      .select(col("doc_id"), col("__best.bench_id").as("bench_id"),
        col("__best.n_shared").as("n_shared"))
  }

  /** A probability as a 32-char-comparable md5 threshold: an md5 hex
    * string is < the encoding of `f` with probability f. The single
    * encoding every md5-threshold operator ([[stratifiedSample]],
    * [[epochMix]], [[hashSplit]]) shares, so the edge guards cannot
    * diverge per call site: f ≤ 0 → all-zeros (matches nothing),
    * f ≥ 1 → "g", which sorts after every hex digit (matches all) —
    * the 2^32 encoding of 1.0 would be "100000000", 9 chars, and
    * MISORDER against 32-char keys ('1' < '8'). */
  private def hexThreshold(f: Double): String =
    if (f >= 1.0) "g"
    else if (f <= 0.0) "0" * 32
    else f"${(f * (1L << 32)).toLong}%08x" + "0" * 24

  /** Deterministic stratified sampling — the data-mixing step: keep each
    * row with its stratum's probability, decided by comparing the
    * row-id's md5 (uniform over hex strings) against the fraction's
    * 32-bit hex threshold. No RNG state, no seed plumbing: the SAME rows
    * are kept on every run, engine, and partitioning — reproducible
    * training mixes and an exact SQL oracle. Strata absent from
    * `fractions` are dropped (mixing weights are an allowlist).
    * Per-row filter, zero shuffle. */
  /** EXACT-k per-stratum sample — the fixed-size eval-subset draw a
    * fraction-based sample ([[stratifiedSample]]) cannot give: for each
    * stratum keep exactly min(k, stratum size) rows, chosen by
    * md5(id)-order (deterministic across runs/engines/partitionings,
    * uniform for hash-random ids — the same engine-portable-randomness
    * convention as the fraction sampler). One stratum-keyed window
    * shuffle; per-stratum state is the window's top-k, never the
    * stratum. Ties on the (astronomically unlikely) equal digest break
    * on the id itself. */
  def sampleKPerStratum(docs: DataFrame, strataCol: String, idCol: String,
                        k: Int): DataFrame = {
    require(k >= 1, s"invalid k=$k")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** WEIGHTED sampling without replacement (Efraimidis–Spirakis A-ES,
    * IPL 2006): each row gets key = ln(u)/w — the monotone-equivalent
    * of the paper's u^(1/w) — and the k LARGEST keys win, so a row's
    * inclusion probability is proportional to its weight (the
    * quality-weighted or length-weighted subset draw uniform samplers
    * cannot give). Deterministic and engine-portable like the other
    * samplers: u is a 52-bit dyadic rational from md5(seed:id) —
    * (v+1)/2^52 ∈ (0,1], exact in an IEEE double on every engine; ln
    * may differ by an ulp across libms but key GAPS between real rows
    * dwarf that, and ties break on the id. Weights must be > 0 (a ≤0
    * weight raises — silently dropping it would skew the distribution).
    *
    * Scale: the key is one codegen'd expression; top-k plans as
    * TakeOrderedAndProject (per-partition heaps, k rows to the driver)
    * — never a global sort; the rank window runs on k rows only. */
  def weightedSample(docs: DataFrame, k: Int, weightCol: Column,
                     idCol: String = "doc_id",
                     seed: String = "0"): DataFrame = {
    require(k >= 1, s"invalid k=$k")
    val v = conv(substring(md5(
      concat(lit(seed + ":"), col(idCol).cast("string"))), 1, 13), 16, 10)
      .cast("long")
    val u = (v + lit(1L)).cast("double") / lit(4503599627370496.0) // 2^52
    val w = when(weightCol > 0, weightCol.cast("double"))
      .otherwise(raise_error(lit("weightedSample: weight must be > 0")))
    val top = docs
      .withColumn("__key", log(u) / w)
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
    // rank window over k rows only — the bounded-rollup convention
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("__key").desc, col(idCol))).cast("int"))
      .drop("__key")
  }

  def stratifiedSample(docs: DataFrame, strataCol: String, idCol: String,
                       fractions: Map[String, Double]): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1]: $fractions")
    val thr = fractions.foldLeft(lit("0" * 32)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(hexThreshold(f))).otherwise(acc)
    }
    docs.filter(md5(col(idCol).cast("string")) < thr)
  }

  /** Token-budget selection — the data-selection step a fixed training
    * budget forces: keep the highest-quality documents, in global
    * (quality desc, id asc) order, until the corpus' token budget
    * (`fraction` of its total tokens) is exhausted; a document is kept
    * iff the tokens BEFORE it fit the budget. Equivalent to one global
    * running-sum window, but computed in the two-phase shape that
    * survives 100 TB:
    *
    *  1. roll tokens up into quality buckets (quality rounded to 6
    *     decimals → at most ~10⁶ bucket rows at ANY corpus size) and run
    *     the cumulative window over THAT bounded table — the only
    *     single-partition step, on the rollup, never the corpus;
    *  2. broadcast the surviving buckets (cum-before < budget) back and
    *     resolve each doc with an in-bucket running sum partitioned by
    *     the bucket key — a hash-partitioned window, same shape as
    *     [[packSequences]].
    *
    * cum_before(doc) = bucket prefix + in-bucket prefix reproduces the
    * global window exactly (in-bucket order is the global order
    * restricted to the bucket), so the SQL oracle is the one-window
    * form. The corpus total (→ the budget) derives from the SAME
    * bucket rollup as a full-frame window — never a separate scan.
    *
    * `singleScan = true` scores the corpus once, not twice: the skinny
    * (id, q, n_tokens) projection is lazily persisted
    * (MEMORY_AND_DISK), so the rollup and resolve phases both read the
    * cached blocks instead of each re-running the quality/token regexes
    * (the dominant cost) over the raw text — measured 1.31 → 0.79 s at
    * sf0.1. Sharing the plan without a cache boundary would not help:
    * column pruning specializes each branch's subplan, so Catalyst
    * plans two scans. persist (not localCheckpoint) keeps the lineage,
    * so a lost executor recomputes from the source instead of failing
    * the job, and the call stays lazy. The cost is ~20 bytes/doc of
    * executor storage pinned while the result frame is referenced (the
    * ContextCleaner unpersists it after the frame is garbage-
    * collected); the default is off so plain calls stay storage-free.
    *
    * Skew caveat: the in-bucket window keys on the rounded quality, so
    * a corpus where a large share of documents collapses onto ONE
    * quality value (mass-identical boilerplate) serializes that bucket
    * through one task. Such corpora should exact-dedup first (the
    * gate order [[curate]] already imposes); failing that, the bucket
    * scheme nests — sub-bucket by id range and roll block totals up
    * the same way. */
  def tokenBudgetSelect(docs: DataFrame, fraction: Double,
                        textCol: String = "text",
                        idCol: String = "doc_id",
                        singleScan: Boolean = false): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"invalid fraction=$fraction")
    val w = org.apache.spark.sql.expressions.Window
    val scoredBase = docs.select(col(idCol).as("doc_id"),
      round(TextAnalysis.qualityScore(col(textCol)), 6).as("q"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val scored =
      if (singleScan)
        scoredBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else scoredBase
    val bw = w.orderBy(col("q").desc).rowsBetween(w.unboundedPreceding, -1)
    val tw = w.orderBy(col("q").desc)
      .rowsBetween(w.unboundedPreceding, w.unboundedFollowing)
    val buckets = scored.groupBy(col("q"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
      .withColumn("cum_bucket", coalesce(sum(col("bucket_tokens")).over(bw), lit(0L)))
      .withColumn("budget",
        floor(sum(col("bucket_tokens")).over(tw) * lit(fraction)).cast("long"))
      .filter(col("cum_bucket") < col("budget"))
      .select(col("q"), col("cum_bucket"), col("budget"))
    val dw = w.partitionBy(col("q")).orderBy(col("doc_id"))
      .rowsBetween(w.unboundedPreceding, -1)
    scored.join(broadcast(buckets), Seq("q"))
      .withColumn("cum_before",
        col("cum_bucket") + coalesce(sum(col("n_tokens")).over(dw), lit(0L)))
      .filter(col("cum_before") < col("budget"))
      .select(col("doc_id"), col("q").as("quality"), col("n_tokens"),
        col("cum_before"))
  }

  /** Snapshot diff — incremental-corpus reconciliation: classify every
    * document id across two corpus snapshots as added (new only),
    * removed (old only), changed (both, content hash differs), or
    * unchanged. The inventory report an incremental curation run
    * publishes before reprocessing only the added+changed slice
    * (the batch side [[graft.operators.Dedup.antiJoinWithBloomPrefilter]]
    * then screens).
    *
    * Plan shape: ONE co-partitioned full-outer join keyed by id — both
    * sides shuffle once on the join key (bucketing both snapshots by id
    * at write time deletes even that, see BucketingSpec); the content
    * comparison rides the join row, no second pass. */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // presence rides its own flag (not hash nullability) and the hash
    // compare is null-safe, so a NULL-text row still diffs correctly
    val o = oldDocs.select(col(idCol).as("doc_id"),
      md5(col(textCol)).as("old_h"), lit(true).as("in_old"))
    val n = newDocs.select(col(idCol).as("doc_id"),
      md5(col(textCol)).as("new_h"), lit(true).as("in_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(!(col("old_h") <=> col("new_h")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** CDC/MERGE apply — fold an ordered changelog into a base snapshot:
    * the incremental-corpus maintenance step (a crawler emits
    * upserts/deletes; the corpus re-materializes without reprocessing
    * unchanged rows). Per key the HIGHEST-`seqCol` change wins:
    * `delete` removes the row (even a base row), `upsert`
    * inserts-or-replaces, keys the changelog never mentions pass
    * through. A winning upsert overrides every payload column — a NULL
    * payload in it is an explicit null, not "keep the base value"; a
    * delete→upsert sequence resurrects the key.
    *
    * Plan shape: ONE key-window over the changelog (latest change per
    * key) + ONE co-partitioned full-outer join with the base — each
    * side shuffles once on the key, pinned in CurationSpec. At 100 TB
    * the changelog is typically ≪ base; the join cost is dominated by
    * the base's single shuffle (bucketing the base by key at write
    * time deletes even that, the snapshotDiff note). No driver
    * collect, no second base pass.
    *
    * `seqCol` must be unique per key (a CDC offset/LSN); ties would
    * make the winner nondeterministic, so equal seqs tie-break on
    * `opCol` descending (upsert over delete) to stay deterministic
    * rather than silently planner-ordered. */
  /** `op` passed through when it is upsert/delete (NULL allowed — the
    * join's "no change"), raise_error otherwise — shared by the batch
    * and versioned changelog appliers so the loud-failure contract
    * cannot drift. */
  private def validatedOp(op: Column, who: String): Column =
    when(op.isNull || op.isin("upsert", "delete"), op)
      .otherwise(raise_error(concat(lit(s"$who: unknown op "), op)))

  /** A NULL changelog seq must fail LOUDLY: seq drives stale rejection,
    * and a null would silently misorder the per-key window here and
    * misclassify the row as compacted-away in snapshotChangelog —
    * divergence with no error anywhere downstream. */
  private def validatedSeq(seq: Column, who: String): Column =
    when(seq.isNotNull, seq).otherwise(raise_error(
      lit(s"$who: changelog seq must not be NULL " +
        "(it drives per-key ordering and stale rejection)")))

  def applyChangelog(base: DataFrame, changelog: DataFrame,
                     idCol: String = "doc_id", seqCol: String = "seq",
                     opCol: String = "op",
                     payloadCols: Seq[String] = Seq("text")): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(seqCol).desc, col("__op").desc)
    val latest = changelog
      .select((Seq(col(idCol),
        validatedSeq(col(seqCol), "applyChangelog").as(seqCol),
        // validate EVERY changelog row's op, before the window picks
        // winners — a malformed op must fail loudly even when a
        // higher-seq change would outrank (and silently discard) it
        validatedOp(col(opCol), "applyChangelog").as("__op")) ++
        payloadCols.map(c => col(c).as(s"__chg_$c"))): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", seqCol)
    val merged = base
      .select((col(idCol) +: payloadCols.map(col)): _*)
      .join(latest, Seq(idCol), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "delete")
    merged.select((col(idCol) +: payloadCols.map(c =>
      when(col("__op") === "upsert", col(s"__chg_$c"))
        .otherwise(col(c)).as(c))): _*)
  }

  /** Seq-aware, tombstone-retaining form of [[applyChangelog]] for a
    * CONTINUOUSLY-maintained snapshot: base rows carry (`__seq`,
    * `__deleted`) metadata, and a changelog row wins only when its seq
    * EXCEEDS the key's stored `__seq` — so cross-batch redelivery or an
    * out-of-order CDC feed (a stale low-seq change arriving after a
    * newer one was already applied in an earlier batch) can neither
    * resurrect a deleted key nor revert a newer payload. Deletes are
    * RETAINED as tombstone rows (`__deleted = true`, payload nulled):
    * the tombstone is the memory that makes stale-rejection possible
    * after the row is gone; churny keyspaces prune them past the CDC
    * horizon with a compaction filter. [[applyChangelog]] stays the
    * one-shot batch MERGE (no metadata, deletes drop); this is the
    * streaming-sink form ([[graft.streaming.StreamingOps
    * .snapshotUpsertSink]]). Same plan shape: one changelog key-window
    * + one co-partitioned full-outer join, every row's op validated. */
  def applyChangelogVersioned(base: DataFrame, changelog: DataFrame,
                              idCol: String = "doc_id",
                              seqCol: String = "seq", opCol: String = "op",
                              payloadCols: Seq[String] = Seq("text"))
      : DataFrame = {
    require(base.columns.contains("__seq") &&
      base.columns.contains("__deleted"),
      "applyChangelogVersioned: base must carry __seq/__deleted " +
        "(snapshotUpsertSink's layout; build the empty base with them)")
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__chg_seq").desc, col("__op").desc)
    val latest = changelog
      .select((Seq(col(idCol),
        validatedSeq(col(seqCol), "applyChangelogVersioned")
          .as("__chg_seq"),
        validatedOp(col(opCol), "applyChangelogVersioned").as("__op")) ++
        payloadCols.map(c => col(c).as(s"__chg_$c"))): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val chgWins = col("__op").isNotNull &&
      (col("__seq").isNull || col("__chg_seq") > col("__seq"))
    base
      .select((Seq(col(idCol)) ++ payloadCols.map(col) ++
        Seq(col("__seq"), col("__deleted"))): _*)
      .join(latest, Seq(idCol), "full_outer")
      .select((Seq(col(idCol)) ++
        payloadCols.map(c =>
          when(chgWins && col("__op") === "upsert", col(s"__chg_$c"))
            .when(chgWins, lit(null)) // a winning delete nulls payload
            .otherwise(col(c)).as(c)) ++
        Seq(when(chgWins, col("__chg_seq")).otherwise(col("__seq"))
            .as("__seq"),
          when(chgWins, col("__op") === "delete")
            .otherwise(coalesce(col("__deleted"), lit(false)))
            .as("__deleted"))): _*)
  }

  /** Epoch-style domain reweighting — [[stratifiedSample]] generalized to
    * weights ABOVE 1: weight w emits floor(w) copies of every row plus
    * one more for the md5-selected frac(w) of rows, so a stratum with
    * w = 2.5 runs ~2.5 epochs in the mix (the standard recipe for
    * upweighting small high-quality domains against a web crawl).
    * Emits a `copy` index (0-based) so the output is a deterministic SET
    * and replays/oracles compare exactly. Strata absent from `weights`
    * are dropped (allowlist, as in stratifiedSample). Per-row explode of
    * at most ceil(w) — zero shuffle, no RNG state. */
  def epochMix(docs: DataFrame, strataCol: String, idCol: String,
               weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 100.0),
      s"weights must be in [0,100]: $weights")
    val floorW = weights.foldLeft(lit(0)) { case (acc, (k, w)) =>
      when(col(strataCol) === k, lit(w.toInt)).otherwise(acc)
    }
    val fracThr = weights.foldLeft(lit("0" * 32)) { case (acc, (k, w)) =>
      when(col(strataCol) === k, lit(hexThreshold(w - w.toInt))).otherwise(acc)
    }
    docs
      .withColumn("__n", floorW +
        when(md5(col(idCol).cast("string")) < fracThr, 1).otherwise(0))
      // guard BEFORE sequence: Spark's sequence(0, -1) yields a
      // DESCENDING [0, -1], not empty — an unfiltered zero-copy row
      // would emit two phantom copies
      .filter(col("__n") > 0)
      .withColumn("copy", explode(sequence(lit(0), col("__n") - 1)))
      .drop("__n")
  }

  /** Temperature-scaled stratum rebalancing — [[epochMix]] with the
    * weights DERIVED from corpus counts instead of hand-picked: the
    * multilingual-pretraining recipe (mT5 §3.1 / XLM-R) that flattens a
    * skewed language/domain distribution. Stratum i with share
    * p_i = n_i / N gets target share q_i = p_i^α / Σ_j p_j^α (α ∈ (0,1];
    * α = 1 is the identity mix, smaller α is flatter), hence per-row
    * weight w_i = N·q_i / n_i = N·n_i^α / (Σ_j n_j^α · n_i) — the N^α
    * normalization cancels, so the float math runs on exact integer
    * counts. Weights above `maxWeight` are capped (a tiny stratum in a
    * huge corpus would otherwise repeat unboundedly); the expected output
    * size is ≤ N. NULL-stratum rows are dropped (allowlist semantics,
    * as in [[epochMix]]/[[stratifiedSample]]).
    *
    * Reproducibility: the derivation is a documented-bounded collect of
    * the one-row-per-stratum rollup (the Lloyd-matrix class of driver
    * action), summed in stratum-ascending order — every op (sqrt for
    * α = 0.5, ordered sum, mul/div, cap, floor, ×2³²) is a deterministic
    * IEEE operation an oracle replays bit-for-bit, PROVIDED the oracle
    * also sums sequentially: a windowed cumulative sum is NOT that —
    * vectorized engines evaluate it with a segment tree above small
    * partition sizes (measured: DuckDB drifts in the last ulp beyond 16
    * strata), so the shipped oracle folds through an explicit recursive
    * CTE. α = 0.5 uses `math.sqrt` (correctly rounded by IEEE 754,
    * unlike `pow`'s libm-specific last ulp), so oracles should pin
    * α = 0.5.
    *
    * Plan at 100 TB: one column-pruned count-only scan for the rollup
    * (map-side combinable, #strata result rows), then a BROADCAST join
    * of the #strata (stratum, floor, threshold) table and the per-row
    * expansion — O(1) per row at any stratum cardinality. Deliberately
    * NOT [[epochMix]]'s literal when-chain: with data-derived strata
    * (a host/domain column can have 10⁵ values) that chain is O(#strata)
    * per row and a deep-CaseWhen stack overflow in Catalyst. */
  def temperatureMix(docs: DataFrame, strataCol: String, idCol: String,
                     alpha: Double = 0.5,
                     maxWeight: Double = 10.0): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(maxWeight > 0.0 && maxWeight <= 100.0,
      s"maxWeight must be in (0,100]: $maxWeight")
    def powA(x: Double): Double =
      if (alpha == 0.5) math.sqrt(x) else math.pow(x, alpha)
    // bounded collect: one row per stratum, stratum-ascending so the
    // weight floats are a reproducible left-to-right fold
    val rollup = docs.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("s"))
      .agg(count(lit(1)).as("n")).orderBy(col("s"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bigN = rollup.map(_._2).sum.toDouble
    var sumPa = 0.0
    rollup.foreach { case (_, n) => sumPa += powA(n.toDouble) }
    val sp = docs.sparkSession
    import sp.implicits._
    val thr = rollup.toSeq.map { case (k, n) =>
      val w = math.min((bigN * powA(n.toDouble)) / (sumPa * n.toDouble),
        maxWeight)
      (k, w.toInt, hexThreshold(w - w.toInt))
    }.toDF("__tm_s", "__tm_fl", "__tm_t")
    // inner broadcast join: drops NULL and (impossible here) unlisted
    // strata, O(1) per row — see the scaladoc on why not a when-chain
    docs.join(broadcast(thr), col(strataCol).cast("string") === col("__tm_s"))
      .withColumn("__n", col("__tm_fl") +
        when(md5(col(idCol).cast("string")) < col("__tm_t"), 1).otherwise(0))
      // same sequence(0, -1) guard as epochMix: zero-copy rows must be
      // filtered BEFORE the explode
      .filter(col("__n") > 0)
      .withColumn("copy", explode(sequence(lit(0), col("__n") - 1)))
      .drop("__n", "__tm_s", "__tm_fl", "__tm_t")
  }

  /** Deterministic train/validation/test split — every document lands in
    * EXACTLY ONE named split (disjoint + exhaustive, unlike
    * [[stratifiedSample]] which only thins). The assignment is a pure
    * per-row map on `md5(seed:id)` against cumulative [[hexThreshold]]
    * bounds: reproducible across runs, engines, and partitionings,
    * stable under corpus growth (a document keeps its split when others
    * are added — the property that keeps a held-out set clean across
    * snapshot refreshes), and re-drawable by changing `seed`. Zero
    * shuffle at any corpus size.
    *
    * `splits` are (name, fraction) in band order; fractions must sum to
    * 1 (±1e-9). The LAST split is the catch-all band, so neither hex
    * rounding nor a NULL id can orphan a row (a NULL id's key is NULL,
    * matches no band, and falls through to the last split — in the SQL
    * spelling the CASE's ELSE does the same). A fraction below 2⁻³²
    * rounds to an empty band — callers splitting that fine should
    * sample instead. */
  def hashSplit(docs: DataFrame, splits: Seq[(String, Double)],
                idCol: String = "doc_id", seed: String = "0"): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.map(_._1).distinct.length == splits.length,
      s"duplicate split names: ${splits.map(_._1)}")
    require(splits.forall(_._2 > 0.0), s"fractions must be positive: $splits")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"fractions must sum to 1, got $total: $splits")
    val key = md5(concat(lit(seed + ":"), col(idCol).cast("string")))
    // cumulative upper bounds; a bound that rounds UP to 1.0 (fraction
    // sums are float) hits hexThreshold's "g" sentinel, so the band
    // order survives — the raw 2^32 encoding would be 9 chars and
    // misorder against 32-char keys
    val bounds = splits.init.zip(
      splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail.init)
    val label = bounds.foldRight(lit(splits.last._1): Column) {
      case (((name, _), c), acc) =>
        when(key < lit(hexThreshold(c)), lit(name)).otherwise(acc)
    }
    docs.withColumn("split", label)
  }

  /** LEAKAGE-SAFE train/val/test split — the production composition of
    * [[hashSplit]] with near-dup clustering: the well-known eval hazard
    * is a near-duplicate pair straddling train and test (Lee et al.
    * 2022 §6 measure it inflating benchmark scores), which a per-doc
    * hash split cannot prevent. The split KEY is therefore the near-dup
    * CLUSTER label ([[graft.operators.Dedup.minhashLshPairs]] →
    * [[graft.operators.Dedup.connectedComponents]]; label = min member
    * id), so every member of a cluster lands in the same band by
    * construction; singletons key on themselves, preserving the plain
    * hashSplit distribution. Returns `docs` + (split_key, split).
    *
    * `maxBucketSize` is the LSH hot-bucket skew guard threaded through
    * this 100 TB-facing entry point (r13's scale probe measured the
    * uncapped band join at exponent 1.38 against boilerplate families;
    * within-frame buckets expand C(n,2) per hot bucket): 0 = uncapped
    * (oracle-exact recall), > 0 = drop hotter buckets before pair
    * expansion. Pairs the cap suppresses are boilerplate families —
    * their members then split independently, which is the documented
    * recall tradeoff (and is itself oracle-replayed by
    * curate_split_leakage_safe_capped). Callers with an expensive
    * `docs` lineage should persist it first: it feeds both the pair
    * pipeline and the label join. */
  def leakageSafeSplit(docs: DataFrame, splits: Seq[(String, Double)],
                       textCol: String = "text", idCol: String = "doc_id",
                       seed: String = "0", shingleN: Int = 3,
                       bands: Int = 4, rowsPerBand: Int = 3,
                       maxBucketSize: Int = 0): DataFrame = {
    val comp = Dedup.connectedComponents(
      Dedup.minhashLshPairs(docs, textCol, idCol, shingleN, bands,
        rowsPerBand, maxBucketSize))
    val keyed = docs
      .join(comp.withColumnRenamed("id", idCol).withColumnRenamed(
        "comp", "__comp"), Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("__comp"), col(idCol)))
      .drop("__comp")
    hashSplit(keyed, splits, idCol = "split_key", seed = seed)
  }

  /** Seeded global shuffle + fixed-size output shards — the write-out
    * step of a training pipeline: order the corpus by `md5(seed:id)`
    * (a deterministic permutation; re-shuffle by changing the seed) and
    * assign each document its 0-based shuffled position `pos` and
    * contiguous shard `pos / shardSize`, so `write.partitionBy("shard")`
    * emits fixed-row training shards in shuffled order.
    *
    * The global rank is computed in the [[tokenBudgetSelect]] two-phase
    * bucket-rollup shape, never as a corpus-wide single-partition
    * window: bucket = first `bucketPrefixLen` hex chars of the key
    * (16^len buckets — uniform by construction, md5 has no skew), roll
    * counts up, run the cumulative window over that bounded rollup,
    * broadcast it back, and resolve each document with an in-bucket
    * `row_number` partitioned by bucket. Bucket-then-key order equals
    * global key order (the bucket IS the key's prefix), so
    * pos = bucket prefix count + in-bucket rank − 1 reproduces the
    * one-window oracle exactly. At 100 TB the default 65 536 buckets
    * hold ~1.6 GB each — one hash exchange + in-bucket sort, and the
    * only single-partition step touches 16^len rows; the cap of 6
    * (16.7 M buckets) keeps the rollup inside broadcast limits. The
    * source is read twice (rollup + resolve), but column pruning means
    * each read touches ONLY the id column and a cheap md5 — unlike
    * [[tokenBudgetSelect]], nothing here is worth a materialization
    * barrier.
    *
    * Rows with a NULL id are KEPT, not dropped: they key on the bare
    * `md5("seed:")`, one shared key — their positions relative to EACH
    * OTHER are then tie-broken by the NULL id, i.e. undefined; give
    * documents real ids if that matters (it should). */
  def seededShuffleShard(docs: DataFrame, shardSize: Long,
                         seed: String = "0", idCol: String = "doc_id",
                         bucketPrefixLen: Int = 4,
                         keepCols: Seq[String] = Seq.empty): DataFrame = {
    require(shardSize > 0, s"invalid shardSize=$shardSize")
    require(bucketPrefixLen >= 1 && bucketPrefixLen <= 6,
      s"invalid bucketPrefixLen=$bucketPrefixLen (cap 6: 16^len buckets " +
        "must stay broadcastable)")
    val w = org.apache.spark.sql.expressions.Window
    // keepCols ride the shard assignment (no output-schema change when
    // empty) so callers like shardManifest never join back on the id —
    // a join-free passthrough is also immune to id-collision
    // cross-matching
    val keyed = docs.select((Seq(col(idCol).as("doc_id"),
        md5(concat(lit(seed + ":"),
          coalesce(col(idCol).cast("string"), lit("")))).as("skey")) ++
        keepCols.map(col)): _*)
      .withColumn("bucket", substring(col("skey"), 1, bucketPrefixLen))
    val bw = w.orderBy(col("bucket")).rowsBetween(w.unboundedPreceding, -1)
    val buckets = keyed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("cum_bucket", coalesce(sum(col("n")).over(bw), lit(0L)))
      .select(col("bucket"), col("cum_bucket"))
    val dw = w.partitionBy(col("bucket")).orderBy(col("skey"), col("doc_id"))
    keyed.join(broadcast(buckets), Seq("bucket"))
      .withColumn("pos",
        (col("cum_bucket") + row_number().over(dw) - 1).cast("long"))
      .withColumn("shard", floor(col("pos") / lit(shardSize)).cast("long"))
      .select((Seq(col("doc_id"), col("pos"), col("shard")) ++
        keepCols.map(col)): _*)
  }

  /** Single-pass COLUMN PROFILE — the ingest data-quality report every
    * pipeline runs before trusting a new drop: per column, row count,
    * null count, distinct count, and min/max (as strings — the
    * caller prepares portable casts; longs and strings stringify
    * identically everywhere, doubles/timestamps should be cast to
    * fixed-point/epoch first). ONE scan: all columns' aggregates ride
    * one aggregate node (the multi-distinct runs as Catalyst's Expand
    * — n_cols copies of each row map-side, the standard exact
    * single-pass shape); `exactDistinct = false` swaps in HLL
    * approx_count_distinct and drops the Expand — the 100 TB default,
    * exact is the oracle/audit form. */
  def profileColumns(df: DataFrame, cols: Seq[String],
                     exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profileColumns: no columns")
    val aggs = cols.flatMap { c =>
      // count(*)-count(col): yields 0 (not NULL) on an empty frame —
      // the oracle's own form
      Seq((count(lit(1)) - count(col(c))).as(s"__nn_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nulls"), col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_val"), col(s"__mx_$c").as("max_val"))): _*))
        .as("p"))
      .select(col("p.*"))
  }

  /** Shard MANIFEST — the reproducibility audit of a training run's
    * input: per output shard of [[seededShuffleShard]], the doc count,
    * token total, and a content digest (md5 over the shard's per-doc
    * md5s concatenated in position order). Re-run after any rebuild:
    * equal manifests ⇒ byte-equal training input, a differing shard row
    * pinpoints WHERE a "reproducible" pipeline drifted. Plan shape: the
    * shard assignment's bucket-rollup machinery + a shard-keyed
    * aggregate whose groups are bounded by shardSize — the digest
    * concat never exceeds 32·shardSize chars per group. The per-doc
    * hash and token count ride THROUGH the shard assignment (keepCols)
    * instead of joining back on the id, so duplicate or null ids can
    * never cross-match rows — each physical row carries its own
    * content into its shard's digest. (Duplicate ids still tie-break
    * arbitrarily in position order between themselves; keep ids unique
    * for a fully deterministic manifest.) */
  def shardManifest(docs: DataFrame, shardSize: Long, seed: String = "0",
                    idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    seededShuffleShard(
        docs.select(col(idCol).as("doc_id"), md5(col(textCol)).as("h"),
          graft.functions.TextAnalysis.tokenCount(col(textCol))
            .cast("long").as("n_tokens")),
        shardSize, seed, "doc_id", keepCols = Seq("h", "n_tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("h")))),
          x => x.getField("h")), "")).as("content_md5"))
  }

  /** Incremental curation — the daily-delta shape of [[annotate]]: a
    * 100 TB corpus is annotated ONCE, then each snapshot re-annotates
    * only the slice the delta can affect and carries every other
    * verdict forward. The subtlety is that exact dedup is
    * corpus-global: adds can demote an existing keeper's duplicate,
    * and REMOVALS can resurrect one (a kept doc vanishes ⇒ its
    * surviving duplicate becomes rank 1). Both reduce to content-hash
    * groups: a dedup verdict can only change for documents whose hash
    * group the delta touched, so
    *
    *   touched  = hashes of added/changed-new/changed-old/removed rows
    *   recompute = annotate( new rows whose hash ∈ touched )   — whole
    *               groups, so ranks equal the full-corpus ranks
    *   carry     = old verdicts whose hash ∉ touched
    *
    * Result ≡ annotate(newDocs) row-for-row (the correctness row's
    * oracle replays the FULL recompute while the engine runs this
    * path). Cost ∝ |delta| + its duplicate groups: the touched-hash
    * set is delta-sized and broadcasts; the carry is an anti-join.
    * NULL-text rows key on a sentinel so their group participates in
    * touch accounting like any other. */
  def incrementalAnnotate(oldDocs: DataFrame, newDocs: DataFrame,
                          oldAnnotated: DataFrame, cfg: Config = Config(),
                          textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    def key(c: Column): Column = coalesce(md5(c), lit("[null]"))
    // materialize the delta rows of the diff once: both arms of
    // `touched` filter this frame, so the full-outer snapshot diff —
    // a both-corpora-sized join — otherwise executed twice; the
    // non-unchanged slice is changed-rows-sized by construction
    val diff = snapshotDiff(oldDocs, newDocs, textCol, idCol)
      .filter(col("status") =!= "unchanged")
      .localCheckpoint(true)
    // materialize the touched-hash set once: its two broadcasts below
    // (the semi and the anti join) each re-ran the diff + both union
    // arms otherwise — also changed-rows-sized
    val touched = oldDocs.join(
        diff.filter(col("status").isin("removed", "changed")), Seq(idCol))
      .select(key(col(textCol)).as("h"))
      .union(newDocs.join(
          diff.filter(col("status").isin("added", "changed")), Seq(idCol))
        .select(key(col(textCol)).as("h")))
      .distinct()
      .localCheckpoint(true)
    val affected = newDocs.join(broadcast(touched),
      key(col(textCol)) === col("h"), "left_semi")
    val carried = oldAnnotated.join(broadcast(touched),
      key(col(textCol)) === col("h"), "left_anti")
    carried.unionByName(annotate(affected, cfg, textCol, idCol))
  }

  /** Hashed-feature logistic-regression quality classifier, trained IN
    * the engine — the fasttext-style learned filter (the GPT-3/LLaMA
    * "looks like curated text" gate) as a distributed op. Features are
    * the DSIR buckets (word unigrams → 256 md5-prefix buckets), valued
    * as term frequency x_b = count_b / n_words; the label is the
    * caller's target indicator. Full-batch gradient descent from w = 0:
    * each step is one broadcast join (the 256-weight table) + a
    * doc-keyed dot-product sum + a bucket-keyed gradient aggregate,
    * with exactly 256 doubles crossing the driver per step — the Lloyd
    * k-means transfer shape. `steps` small (the classifier separates
    * hashed profiles quickly; this is a gate, not a leaderboard).
    *
    * Returns (weights, scoredDocs): per-doc sigmoid(w·x) quality in
    * [0,1] under the trained weights — >0.5 ⇒ more target-like.
    * Wordless docs score sigmoid(0) = 0.5 (no evidence either way). */
  /** @param materializeAt eager-materialization gate on the returned
    *   scored frame: at or above this many docs the final pass is
    *   localCheckpoint'd WHILE the feature frame is still cached
    *   (replaying the explode + per-doc-window lineage at the caller's
    *   first action grows with the corpus — the r11 bench's avoidable
    *   cost); below it the lazy frame is returned as-is, because at
    *   small corpora the checkpoint write costs MORE than the replay
    *   it avoids (measured at sf0.1: 1.25 s lazy vs 1.67 s eager).
    *   0 forces the checkpoint, Long.MaxValue forces lazy. */
  def qualityLrTrain(docs: DataFrame, idCol: String, textCol: String,
                     isTarget: Column, steps: Int = 3,
                     learningRate: Double = 1.0,
                     materializeAt: Long = 1000000L)
      : (Map[String, Double], DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(col(idCol), isTarget.cast("double").as("y"),
        explode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z0-9]+"), lit(0))).as("w"))
      .withColumn("b", substring(md5(col("w")), 1, 2))
    val feats = words.groupBy(col(idCol), col("y"), col("b"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .withColumn("x", col("cnt") /
        sum(col("cnt")).over(Window.partitionBy(col(idCol))))
      .select(col(idCol), col("y"), col("b"), col("x"))
      .persist()
    val nDocs = feats.select(col(idCol)).distinct().count().toDouble
    var weights = Map.empty[String, Double]
    try {
      (1 to steps).foreach { _ =>
        val wDf = weights.toSeq.toDF("b", "wt")
        val dots = feats.join(broadcast(wDf), Seq("b"), "left")
          .groupBy(col(idCol), col("y"))
          .agg(sum(col("x") * coalesce(col("wt"), lit(0.0))).as("z"))
          .withColumn("sig", lit(1.0) / (lit(1.0) + exp(-col("z"))))
        val grads = feats.join(
            dots.select(col(idCol), (col("sig") - col("y")).as("err")),
            Seq(idCol))
          .groupBy(col("b"))
          .agg((sum(col("err") * col("x")) / nDocs).as("g"))
          .as[(String, Double)].collect() // bounded: ≤256 rows
        weights = weights ++ grads.map { case (b, g) =>
          b -> (weights.getOrElse(b, 0.0) - learningRate * g)
        }
      }
      val wDf = weights.toSeq.toDF("b", "wt")
      val scored0 = feats.join(broadcast(wDf), Seq("b"), "left")
        .groupBy(col(idCol))
        .agg(sum(col("x") * coalesce(col("wt"), lit(0.0))).as("z"))
        .withColumn("quality", lit(1.0) / (lit(1.0) + exp(-col("z"))))
        .select(col(idCol), col("quality"))
      val lazyScored = docs.select(col(idCol)).distinct()
        .join(scored0, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("quality"), lit(0.5)).as("quality"))
      // size-gated eager materialization (nDocs is already counted for
      // the gradient): EAGER localCheckpoint, not persist — a persisted
      // Dataset is pinned by the session's CacheManager until an
      // explicit unpersist (the ContextCleaner never reclaims it),
      // which would leak one cached relation per call in a long-lived
      // session; checkpoint blocks are RDD-level and ARE cleaned once
      // the frame goes unreferenced. Lineage truncation is fine for a
      // final result frame. See the materializeAt scaladoc for why the
      // gate exists at all.
      val scored =
        if (nDocs >= materializeAt) lazyScored.localCheckpoint(true)
        else lazyScored
      (weights, scored)
    } finally feats.unpersist()
  }

  /** DSIR-style importance scoring (Xie et al. 2023, arXiv:2302.03169):
    * rank raw documents by how target-domain-like their hashed-feature
    * profile is — the data-selection op that picks "looks like
    * Wikipedia" slices out of a web crawl. Features are word unigrams
    * hashed to 256 buckets (bucket key = the first two md5 hex chars,
    * the engine-portable hash convention the minhash family uses);
    * bucket distributions are estimated for the TARGET rows
    * (`isTarget`) and the RAW corpus with add-one smoothing, and a
    * document's score is the sum over its word occurrences of
    * log p_target(bucket) − log p_raw(bucket) — its hashed-ngram
    * log-likelihood ratio. Positive ⇒ more target-like than the
    * corpus average.
    *
    * Scale shape: two 256-row aggregates (one corpus shuffle over the
    * exploded words — partial-agg combinable), the log-ratio table
    * broadcasts (256 rows, always), and the per-doc score is one
    * doc-keyed partial-agg sum. No driver collect; wordless docs keep
    * a (0, 0) row. */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, buckets: Int = 256): DataFrame = {
    require(buckets == 256, "dsirScores: bucket key is 2 md5 hex chars (= 256)")
    val words = docs.select(col(idCol), isTarget.as("tgt"),
        explode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z0-9]+"), lit(0))).as("w"))
      .withColumn("b", substring(md5(col("w")), 1, 2))
    val counts = words.groupBy(col("b")).agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("t"),
      count(lit(1)).as("r"))
    val tot = counts.agg(sum(col("t")).as("tt"), sum(col("r")).as("rr"))
    val ratios = counts.crossJoin(broadcast(tot)) // 1-row totals frame
      .select(col("b"),
        (log((col("t") + 1.0) / (col("tt") + buckets)) -
          log((col("r") + 1.0) / (col("rr") + buckets))).as("lr"))
    val scored = words.join(broadcast(ratios), Seq("b"))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_feats"),
        sum(col("lr")).as("score"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score"), lit(0.0)).as("score"))
  }
}
