package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keep a persisted IVF-Flat vector index FRESH from a CDC snapshot
  * store — the reference pipeline's outer loop re-expressed over this
  * library's own stores: the reference upserts embedded knowledge into
  * MongoDB Atlas through a continuously-running sink connector while
  * the coach queries the Atlas index
  * (`main.tf:594-635`, `generate_personalized_commands.sh:293-306`);
  * here the document store is [[StreamingOps.snapshotUpsertSink]]'s
  * bucketed CDC snapshot, the index is
  * [[graft.operators.SimilaritySearch]]'s persisted IVF-Flat layout,
  * and the glue is one cursor-committed changelog pull per sync.
  *
  * Scale story (the reason this is a changelog consumer and not a
  * rebuild): one sync reads ONLY the snapshot buckets whose manifest
  * version moved ([[StreamingOps.snapshotChangelog]]), embeds ONLY the
  * changed documents, and appends ONLY those rows + their version
  * tombstones to the index ([[graft.operators.SimilaritySearch.upsertIvfFlatBatch]]) —
  * a day of edits touching 0.1% of a 100 TB corpus costs 0.1% of an
  * embed pass and zero index rewrites. The index's weekly
  * `compactIvfFlatIndex` collapses the accumulated versions exactly
  * like the snapshot store's own compaction collapses tombstones.
  */
object IndexSync {

  /** One at-least-once sync pull: drain the snapshot store's changelog
    * since the cursor, apply it to the index, commit the cursor.
    * Returns the snapshot id synced to, or None when already caught up.
    *
    * `embed` maps a changed-documents frame (the changelog's upsert
    * rows: id, seq, payload columns) to the same frame plus `vecCol` —
    * the embedding stage ([[graft.operators.MlPredict.withEmbedding]]
    * in the reference shape; identity when the store already carries
    * vectors). It runs ONLY over this window's upserts.
    *
    * Crash safety mirrors the store's own consumer contract
    * ([[StreamingOps.nextChangelogBatch]]): the cursor commits AFTER
    * the index writes, so a crash replays the window; replayed upserts
    * re-append byte-identical rows (masked by `dedupReplays`, removed
    * by compaction) and re-appended tombstones are idempotent — the
    * served top-k converges. Deletes become VERSIONED index tombstones
    * at the delete's own seq, so a later re-insert of the key at a
    * higher seq resurrects it, exactly like the store.
    *
    * Single-consumer per cursor file, like every cursor in this
    * library — and since r15, ENFORCED, not just documented: each pull
    * holds an atomic claim on `<cursorPath>.lock` for its whole
    * apply+commit window. Two pumps sharing a cursor are not merely
    * wasteful replays: their index appends are concurrent Spark write
    * jobs into ONE parquet directory, which share the committer's
    * `_temporary` staging — one job's cleanup can delete the other's
    * in-flight task files, a SILENT torn append no `dedupReplays`
    * masking can heal (the rows never landed). The claim makes the
    * loser fail LOUDLY having written nothing. Semantics mirror the
    * snapshot store's publish guard: a foreign `writerId`'s lock
    * raises, naming the owner; a lock carrying THIS pump's writerId is
    * a crashed predecessor (the standing pump serializes its own
    * ticks) and is reclaimed, so checkpointed restarts self-heal; and
    * after the cursor commit the lock is read back — a same-writerId
    * twin that stole the claim mid-drain turns into a loud post-commit
    * error telling the operator to compact and verify (compaction
    * rebuilds cellstats and collapses versions; a torn append shows as
    * missing rows against the store — re-drain after clearing one
    * pump). Pumps that must coexist-crash-safely use distinct
    * writerIds, exactly like the store's sinks.
    *
    * The first pull bootstraps: the changelog emits the full
    * live state, so pointing a fresh cursor + empty index at a mature
    * store backfills it in one (large) sync.
    *
    * A bootstrap pull into a NON-empty index is validated first: the
    * bootstrap upserts skip old-version tombstones (see below), so any
    * pre-existing index row NOT re-covered by this pull — a key absent
    * from the store, or a version newer than the store's (a rebuilt
    * store restarts seqs LOWER, making the stale row the max-`__useq`
    * winner under `dedupReplays`) — would be served indefinitely with
    * no error. Rows that ARE covered (same key at `__useq` ≤ the
    * pull's seq) are exactly a crashed bootstrap's own appends, which
    * the replay must converge over — those pass. Anything else raises
    * with the fix: reset the index (recreate the shell, or compact the
    * emptied index) together with the cursor. The check is one
    * 2-column scan of the payload joined to the pull, paid on
    * bootstrap only. */
  def syncIndexFromSnapshot(spark: SparkSession, snapshotRoot: String,
                            cursorPath: String, indexPath: String,
                            embed: DataFrame => DataFrame,
                            vecCol: String = "embedding",
                            payloadCols: Seq[String] = Nil,
                            writerId: String = "default"): Option[Long] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val cPath = new org.apache.hadoop.fs.Path(cursorPath)
    val cfs = cPath.getFileSystem(hconf)
    val nonce = java.util.UUID.randomUUID().toString
    val lockPath = cfs.makeQualified(
      new org.apache.hadoop.fs.Path(s"$cursorPath.lock"))
    acquirePumpLock(cfs, lockPath, writerId, nonce)
    // bootstrap = no cursor yet: the pull is the FULL live state, all
    // of it new to the index, so upserting it must not write one
    // old-version tombstone per document (a corpus-sized sidecar every
    // later search would aggregate and broadcast for zero masking).
    // Resolved UNDER the lock: read before it, a twin's commit between
    // the probe and the claim would make this pull misread an
    // incremental window as a bootstrap (tombstone-less upserts over a
    // partial pull — unmasked stale versions).
    val bootstrap = !cfs.exists(cPath)
    var committed = false
    try {
      val out = StreamingOps.nextChangelogBatch(
          spark, snapshotRoot, cursorPath).map {
        case (live, frame, commit) =>
          val idCol = frame.columns.head // changelogShape: id leads
          // one pull feeds two consumers (upserts, deletes): persist,
          // and release before returning (the antiJoinFuzzy lifecycle
          // rule — this runs once per sync on a standing schedule)
          val f = frame.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            if (bootstrap) assertBootstrapSafe(spark, indexPath, f, idCol)
            val deletes = f.filter(col("op") === "delete")
              .select(col(idCol).cast("string").as("nid"),
                col("seq").cast("long").as("seq"))
            if (deletes.limit(1).count() > 0)
              graft.operators.SimilaritySearch.tombstoneIvfFlat(
                spark, indexPath, deletes)
            val upserts = f.filter(col("op") === "upsert")
            if (upserts.limit(1).count() > 0)
              graft.operators.SimilaritySearch.upsertIvfFlatBatch(
                embed(upserts), indexPath, cId = idCol, cVec = vecCol,
                cSeq = "seq", payloadCols = payloadCols,
                tombstoneOld = !bootstrap)
            commit()
            committed = true
            live
          } finally f.unpersist()
      }
      if (out.isEmpty) committed = true // nothing pulled, nothing torn
      out
    } finally releasePumpLock(cfs, lockPath, writerId, nonce, committed)
  }

  /** Claim `<cursor>.lock` atomically (create overwrite=false) before a
    * pull touches the index — see [[syncIndexFromSnapshot]]. A present
    * lock from a FOREIGN writerId raises; this pump's own writerId is a
    * crashed predecessor's leftover and is reclaimed — by QUARANTINE
    * (atomic rename to a nonce-suffixed name), never a blind delete:
    * the delete form had a TOCTOU where a same-writerId twin claiming
    * between the owner read and the delete had its LIVE lock removed,
    * both pumps drained, and the tear surfaced only post-commit. The
    * rename is verified against the bytes read before it — a fresh
    * twin lock that slipped into the window renames back and the
    * acquire fails BEFORE anything is written. (Coexisting pumps are
    * still directed to distinct writerIds; this narrows the
    * same-writerId misconfiguration from post-commit damage to a
    * pre-write error.) */
  private def acquirePumpLock(fs: org.apache.hadoop.fs.FileSystem,
                              lockPath: org.apache.hadoop.fs.Path,
                              writerId: String, nonce: String): Unit = {
    val body = s"writer $writerId $nonce\n"
    // the claim primitive and owner parse are the snapshot publish
    // guard's own (StreamingOps.atomicClaimFile/claimOwner) — one
    // implementation of the lost-race/IO-error/vanished-file
    // disambiguation, two policies on top of it
    def tryLock(): Boolean =
      StreamingOps.atomicClaimFile(fs, lockPath, body)
    def readText(p: org.apache.hadoop.fs.Path): Option[String] =
      try {
        val in = fs.open(p)
        try Some(new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
        finally in.close()
      } catch {
        // vanished = the holder released (claimOwner's contract). Any
        // OTHER IO error must PROPAGATE: an unreadable LIVE claim must
        // not be stolen — a transient read failure on a FOREIGN lock
        // would otherwise parse as ownerless, pass the same-writer
        // gate, and quarantine a live twin's lock (and a matching
        // failure on the verification read would None==None its way
        // past the restore check and delete it).
        case _: java.io.FileNotFoundException => None
      }
    if (!tryLock()) {
      val staleText = readText(lockPath)
      if (staleText.isEmpty) {
        // the holder released between the failed claim and the read:
        // take the freed slot, or lose the re-claim race loudly
        if (!tryLock()) throw new IllegalStateException(
          s"syncIndexFromSnapshot: the cursor lock $lockPath was " +
            "released and immediately re-claimed by another pump. The " +
            "cursor is single-consumer; this pull wrote nothing — run " +
            "one pump per cursor.")
        return
      }
      val owner = staleText.flatMap(
        _.split('\n').map(_.trim).find(_.startsWith("writer "))
          .flatMap(_.split("\\s+").lift(1))) // claimOwner's parse
      if (!owner.forall(_ == writerId)) throw new IllegalStateException(
        s"syncIndexFromSnapshot: the cursor lock $lockPath is held by " +
          s"pump '${owner.getOrElse("<unknown>")}' (this pump is " +
          s"'$writerId'). The cursor is single-consumer — two pumps " +
          "draining one cursor append into one index CONCURRENTLY, " +
          "which can tear an in-flight write (shared committer " +
          "staging). This pull wrote nothing; stop one pump, or if " +
          s"the owner crashed, delete $lockPath and retry.")
      // our own crashed predecessor (the standing pump serializes its
      // ticks, so a live self cannot hold it): quarantine-reclaim
      val stealPath = new org.apache.hadoop.fs.Path(
        lockPath.getParent, s"${lockPath.getName}.steal.$nonce")
      val renamed =
        scala.util.Try(fs.rename(lockPath, stealPath)).getOrElse(false)
      if (!renamed) throw new IllegalStateException(
        s"syncIndexFromSnapshot: the cursor lock $lockPath changed " +
          "during this pump's crash-leftover reclaim (rename failed — " +
          "another pump released or re-claimed it). The cursor is " +
          "single-consumer; this pull wrote nothing — run one pump per " +
          "cursor (distinct writerIds make the race fail before any " +
          "write).")
      if (readText(stealPath) != staleText) {
        // the window caught a LIVE twin's fresh lock: put it back and
        // fail pre-write (if the rename-back loses yet another race,
        // the twin's post-commit nonce check remains the backstop)
        scala.util.Try(fs.rename(stealPath, lockPath)): Unit
        throw new IllegalStateException(
          s"syncIndexFromSnapshot: the cursor lock $lockPath was " +
            s"re-claimed by a live '$writerId' twin during this pump's " +
            "crash-leftover reclaim (quarantined bytes differ from the " +
            "owner read; the twin's lock was restored). The cursor is " +
            "single-consumer; this pull wrote nothing — run one pump " +
            "per cursor with distinct writerIds.")
      }
      fs.delete(stealPath, false)
      if (!tryLock()) throw new IllegalStateException(
        s"syncIndexFromSnapshot: the cursor lock $lockPath was " +
          "re-claimed by another pump during this pump's crash-leftover " +
          "reclaim. The cursor is single-consumer; this pull wrote " +
          "nothing — run one pump per cursor (distinct writerIds make " +
          "the race fail before any write).")
    }
  }

  /** Release the pump lock; on a COMMITTED pull first read it back —
    * a same-writerId twin that stole the claim mid-drain (it cannot
    * tell a live twin from a crash) surfaces here as a loud
    * post-commit error instead of a silently torn index. */
  private def releasePumpLock(fs: org.apache.hadoop.fs.FileSystem,
                              lockPath: org.apache.hadoop.fs.Path,
                              writerId: String, nonce: String,
                              committed: Boolean): Unit = {
    // a missing/unreadable lock reads as "not ours": on a committed
    // pull that is the same steal evidence as a foreign nonce (someone
    // cleared a LIVE pump's lock); on a failed pull it must not throw
    // from this finally and mask the pull's own error
    val mine = scala.util.Try {
      val in = fs.open(lockPath)
      val text = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      text.contains(nonce)
    }.getOrElse(false)
    if (mine) fs.delete(lockPath, false)
    if (!mine && committed) throw new IllegalStateException(
      s"syncIndexFromSnapshot: the cursor lock $lockPath was rewritten " +
        s"by another '$writerId' pump DURING this pull (nonce mismatch " +
        "after the cursor commit). Two pumps applied concurrently — " +
        "the index may hold a torn append. Stop one pump, compact the " +
        "index, and verify it against the store (re-drain heals missing " +
        "rows); distinct writerIds make this race fail before any " +
        "write.")
  }


  /** The bootstrap-over-non-empty-index guard of
    * [[syncIndexFromSnapshot]] (see its Scaladoc). Operates on the
    * SERVED rows — the payload after the tombstone mask — because an
    * uncompacted deleted key's masked rows are not stale state, and
    * refusing a legitimate same-store replay over them would force a
    * needless index rebuild. Three outcomes per served row:
    *
    *  - key absent from the pull, or version NEWER than the store's
    *    (a rebuilt store restarts seqs lower) → REFUSE loudly before
    *    writing anything: the tombstone-less bootstrap could never
    *    mask it, so it would be served stale forever.
    *  - version EQUAL to the pull's seq → a crashed bootstrap's own
    *    byte-identical append: converges under `dedupReplays`/
    *    compaction, pass.
    *  - version OLDER than the pull's seq (incl. batch-built -1 rows)
    *    → covered but LIVE: the bootstrap's re-append would otherwise
    *    sit NEXT TO it (no tombstone written), serving both versions
    *    to any `dedupReplays=false` search until compaction — so the
    *    guard BACKFILLS one tombstone per such key at pull-seq−1,
    *    restoring the invariant that superseded versions are always
    *    tombstone-masked. Cost: rows ∝ covered-differing keys, paid on
    *    bootstrap only. */
  private def assertBootstrapSafe(spark: SparkSession, indexPath: String,
                                  pull: DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.types._
    // explicit schema: tolerates an empty shell (no payload files) and
    // legacy pre-__useq files (missing column reads null → -1); a
    // payload dir not created yet at all is the emptiest shell of all
    val idx =
      try spark.read.schema(StructType(Seq(
          StructField("nid", StringType), StructField("__useq", LongType))))
        .parquet(s"$indexPath/payload")
      catch { case _: org.apache.spark.sql.AnalysisException => return }
    val served = graft.operators.SimilaritySearch.maskTombstones(
      spark, indexPath, graft.operators.SimilaritySearch.withUseq(idx))
    val cov = pull.select(col(idCol).cast("string").as("nid"),
      col("seq").cast("long").as("__pseq"))
    // one 2-column scan feeds both the refusal probe and the backfill:
    // persist, release before returning (bootstrap-only lifecycle)
    val joined = served.select(col("nid"), col("__useq"))
      .join(cov, Seq("nid"), "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stale = joined.filter(col("__pseq").isNull ||
        col("__useq") > col("__pseq"))
      if (stale.limit(1).count() > 0) throw new IllegalStateException(
        s"syncIndexFromSnapshot: bootstrap pull (no cursor yet) into the " +
          s"NON-empty index at $indexPath found rows this store's live " +
          "state does not cover (keys absent from the store, or index " +
          "versions newer than the store's seqs — typical after the " +
          "store was rebuilt, which restarts seqs lower). A bootstrap " +
          "writes no old-version tombstones, so those rows would be " +
          "served STALE forever. Reset the index together with the " +
          "cursor: recreate the index shell (or tombstone+compact it " +
          "empty), then re-run the bootstrap.")
      val backfill = joined.filter(col("__useq") < col("__pseq"))
        .select(col("nid"), (col("__pseq") - 1L).as("seq")).distinct()
      if (backfill.limit(1).count() > 0)
        graft.operators.SimilaritySearch.tombstoneIvfFlat(
          spark, indexPath, backfill)
    } finally joined.unpersist()
  }

  /** Drain the store to its live snapshot: loop single pulls until
    * caught up (each pull is one committed sync — a crash resumes at
    * the last commit). Returns the final synced snapshot id, None if
    * there was nothing at all to sync. */
  def drainIndexFromSnapshot(spark: SparkSession, snapshotRoot: String,
                             cursorPath: String, indexPath: String,
                             embed: DataFrame => DataFrame,
                             vecCol: String = "embedding",
                             payloadCols: Seq[String] = Nil,
                             writerId: String = "default"): Option[Long] = {
    var last: Option[Long] = None
    var more = true
    while (more) {
      val got = syncIndexFromSnapshot(spark, snapshotRoot, cursorPath,
        indexPath, embed, vecCol, payloadCols, writerId)
      if (got.isEmpty) more = false else last = got
    }
    last
  }

  /** Identity embed for stores whose snapshot already carries vectors. */
  val identityEmbed: DataFrame => DataFrame = (df: DataFrame) => df

  /** The STANDING form of the pump — what a deployment actually runs:
    * a rate-source-clocked streaming query whose every trigger drains
    * the store to its live snapshot ([[drainIndexFromSnapshot]]).
    * Spark's own scheduler provides the cadence, checkpointed restart,
    * and lifecycle (stop/awaitTermination) — no hand-rolled timer
    * thread — and the cursor (not the rate checkpoint) carries the
    * delivery state. A drain that THROWS is caught and logged rather
    * than propagated: an uncaught foreachBatch exception terminates
    * the streaming query permanently (micro-batches are not retried),
    * which would silently freeze index freshness on the first
    * transient read error — caught, the next tick retries the same
    * cursor window and the at-least-once story is exactly the manual
    * pump's. A PERSISTENT failure (misconfiguration, a cursor lagging
    * past retention) therefore shows as a warning every tick, not a
    * dead query — monitor the log line. Ticks that find the cursor
    * already at live are one manifest-pointer read — cheap enough for
    * seconds-cadence freshness. Caller sets checkpointLocation and
    * starts, like every sink here. */
  def standingIndexSync(spark: SparkSession, snapshotRoot: String,
                        cursorPath: String, indexPath: String,
                        embed: DataFrame => DataFrame,
                        vecCol: String = "embedding",
                        payloadCols: Seq[String] = Nil,
                        tickSeconds: Int = 5,
                        writerId: String = "default")
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    require(tickSeconds >= 1, s"tickSeconds must be >= 1: $tickSeconds")
    spark.readStream.format("rate")
      .option("rowsPerSecond", 1L).load()
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(s"$tickSeconds seconds"))
      .foreachBatch { (_: DataFrame, _: Long) =>
        try drainIndexFromSnapshot(spark, snapshotRoot, cursorPath,
          indexPath, embed, vecCol, payloadCols, writerId): Unit
        catch {
          case scala.util.control.NonFatal(e) =>
            // stderr by design: this library adds no logging framework,
            // and Spark's own driver log captures stderr
            System.err.println(
              s"standingIndexSync: drain of $snapshotRoot -> $indexPath " +
                s"failed (will retry next tick): $e")
        }
      }
  }
}
