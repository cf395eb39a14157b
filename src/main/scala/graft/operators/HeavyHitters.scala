package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXACT frequent-item (heavy-hitter) mining with a bounded-memory
  * candidate pass — the two-phase shape sketch-based frequency mining
  * takes at corpus scale (Misra & Gries 1982; the per-partition summary
  * + merge argument is the standard mergeability result for MG
  * summaries, e.g. Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Phase 1 (one pass, NO shuffle of the token stream): each partition
  * runs a Misra–Gries summary of capacity `m` over its tokens via
  * `mapPartitions` — genuinely imperative per-partition state, the case
  * the RDD-adjacent API exists for. A token absent from partition i's
  * summary has partition count ≤ Nᵢ/(m+1), so summing over partitions:
  * any token with GLOBAL count > N/(m+1) appears in at least one
  * partition's summary. With `m+1` larger than the support denominator
  * the union of summaries is a guaranteed SUPERSET of the heavy hitters
  * — no false negatives, and ≤ m·partitions candidates total. The same
  * pass emits one marker row per partition carrying the partition's
  * token count, so the global total N (the threshold's denominator)
  * costs no extra scan.
  *
  * Phase 2 (exact): re-scan tokens, keep only candidate tokens (one
  * broadcast hash semi-join — fully codegen'd, no per-row UDF), exact
  * `groupBy(tok).count`, filter `cnt · denom ≥ N`. The shuffle carries
  * ONLY candidate-token rows — at 100 TB the groupBy that would
  * otherwise shuffle every token in the corpus shuffles a sliver whose
  * size is bounded by the true heavy-hitter mass plus MG's
  * false-positive allowance.
  *
  * Exactness contract: requires `m + 1 > denom` (checked) — below that
  * the superset guarantee fails and the result could silently miss
  * items, which is the difference between "approximate sketch" and
  * "exact answer computed cheaply".
  */
object HeavyHitters {

  /** Tokens with `count * denom >= total_count`, exactly, as
    * (tok, cnt) sorted by (cnt desc, tok asc).
    *
    * DETERMINISTIC-INPUT REQUIREMENT: `toks` is scanned TWICE (phase-1
    * MG summaries, phase-2 exact counts) and only the small summary is
    * persisted — the guarantees compose only if both scans see the same
    * multiset. A nondeterministic input (df.sample without a seed,
    * rand()-derived columns, a recomputed nondeterministic shuffle on a
    * spot loss) silently voids both the candidate-superset guarantee
    * and the total N. Persist (or write out and re-read) such an input
    * before calling; deterministic scans — files, fixed filters, seeded
    * sampling — need nothing.
    *
    * @param toks  single string-column frame of token occurrences
    * @param denom relative support denominator: keep tokens with
    *              frequency ≥ 1/denom of the stream
    * @param m     Misra–Gries capacity per partition (default 4·denom:
    *              comfortably above the `m+1 > denom` exactness bound,
    *              still bounded executor state: m counters per task)
    */
  def frequentTokens(toks: DataFrame, denom: Long, m: Int = -1): DataFrame = {
    val cap = if (m > 0) m else (4L * denom).min(1 << 20).toInt
    require(cap + 1 > denom,
      s"MG capacity m=$cap must exceed denom-1=${denom - 1} for the " +
        "no-false-negative guarantee (token with count > N/(m+1) always " +
        "surfaces in some partition summary)")
    val spark = toks.sparkSession
    import spark.implicits._
    val tokCol = toks.columns.head

    // Phase 1: per-partition MG summaries + partition-count markers.
    // Marker rows use cnt >= 0 with a null token; candidates carry -1.
    // Null tokens are not tokens: dropped up front, so they neither
    // count into the total N nor masquerade as the null marker row.
    // persist (NOT localCheckpoint) materializes the pass once for its
    // two consumers while KEEPING lineage: on a spot/decommissioning
    // cluster a lost cached partition recomputes from the token stream
    // instead of failing the job on a missing checkpoint block — and
    // persist is lazy, so building the plan costs nothing until an
    // action runs. Blocks release via Verify's clearCache / the
    // ContextCleaner when the frame goes unreferenced.
    val summary: Dataset[(String, Long)] =
      toks.select(col(tokCol).cast("string")).filter(col(tokCol).isNotNull)
        .as[String].mapPartitions { it =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        var n = 0L
        while (it.hasNext) {
          val t = it.next()
          n += 1
          counts.get(t) match {
            case Some(c) => counts.update(t, c + 1)
            case None if counts.size < cap => counts.update(t, 1L)
            case None =>
              // MG decrement step: every counter loses one; zeros drop.
              // The arriving token is consumed WITHOUT being inserted.
              val dead = new scala.collection.mutable.ArrayBuffer[String]
              counts.foreach { case (k, c) =>
                if (c == 1L) dead += k else counts.update(k, c - 1)
              }
              dead.foreach(counts.remove)
          }
        }
        Iterator((null: String, n)) ++
          counts.keysIterator.map(t => (t, -1L))
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // no distinct(): within a partition MG keys are unique, so dups occur
    // only across partitions (≤ parts copies of a key) — the semi-join's
    // broadcast hash relation absorbs them, and skipping the distinct
    // keeps the candidate set out of any shuffle entirely. Markers are
    // identified by their sentinel SIGN, not the null token, so the two
    // row kinds cannot be confused.
    val cands = summary.filter(_._2 == -1L).map(_._1).toDF(tokCol)
    val total = summary.filter(_._2 >= 0L).map(_._2).toDF("part_n")
      .agg(sum(col("part_n")).as("n"))

    // Phase 2: exact counts of the candidate sliver only.
    toks.join(broadcast(cands), Seq(tokCol), "left_semi")
      .groupBy(col(tokCol)).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(denom) >= col("n"))
      .select(col(tokCol), col("cnt"))
      .orderBy(col("cnt").desc, col(tokCol).asc)
  }
}
