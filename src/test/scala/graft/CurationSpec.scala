package graft

import graft.pipeline.CurationPipeline

/** The composed corpus-curation flow: dedup + gates + verdict audit. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val goodEnglish =
    "the quick brown fox is one of the animals and it jumps over " +
      "a lazy dog in the field to make this a long enough document"

  test("curate keeps good docs, drops each gate's failures with the right verdict") {
    val docs = Seq(
      (1L, goodEnglish),
      (2L, goodEnglish),                                   // exact dup of 1
      (3L, "le chat et la porte et le chien et les autres mots et le fin"), // wrong lang
      (4L, "the of and is to in a"),                       // too few tokens (but stopword-rich)
      (5L, "!!! ??? ;;; ,,, ... the and of is a to in xx yy zz ww vv uu")) // punct-heavy
      .toDF("doc_id", "text")

    val verdicts = CurationPipeline.annotate(docs)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap

    verdicts.keySet should not contain 2L                  // lost to dedup
    verdicts(1L) shouldBe "keep"
    verdicts(3L) shouldBe "lang"
    verdicts(4L) shouldBe "tokens"
    verdicts(5L) shouldBe "quality"

    CurationPipeline.curate(docs).select("doc_id").as[Long].collect().toSeq shouldBe
      Seq(1L)
  }

  test("stratifiedSample: deterministic, allowlisted, proportional") {
    val docs = (1 to 2000).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("doc_id", "source")
    val fr = Map("a" -> 1.0, "b" -> 0.25)
    val once = CurationPipeline.stratifiedSample(docs, "source", "doc_id", fr)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // identical on re-execution (no RNG state)
    CurationPipeline.stratifiedSample(docs, "source", "doc_id", fr)
      .select("doc_id").as[Long].collect().sorted.toSeq shouldBe once
    // fraction 1.0 keeps every row of its stratum
    once.count(_ % 2 == 0) shouldBe 1000
    // fraction 0.25 keeps roughly a quarter (md5 is uniform)
    val bKept = once.count(_ % 2 == 1)
    bKept.toDouble / 1000 shouldBe 0.25 +- 0.06
    // absent stratum is dropped entirely
    val mixed = docs.union(Seq((9999L, "c")).toDF("doc_id", "source"))
    CurationPipeline.stratifiedSample(mixed, "source", "doc_id", fr)
      .filter($"source" === "c").count() shouldBe 0L
  }

  test("sampleKPerStratum: exactly min(k, stratum size) rows, deterministic, uniform-ish") {
    val docs = (1 to 2000).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("doc_id", "source")
    val once = CurationPipeline.sampleKPerStratum(docs, "source", "doc_id", 7)
      .select("doc_id", "source").as[(Long, String)].collect().sorted.toSeq
    // exactly k per stratum
    once.count(_._2 == "a") shouldBe 7
    once.count(_._2 == "b") shouldBe 7
    // identical on re-execution (hash order, no RNG state)
    CurationPipeline.sampleKPerStratum(docs, "source", "doc_id", 7)
      .select("doc_id", "source").as[(Long, String)].collect()
      .sorted.toSeq shouldBe once
    // a stratum smaller than k keeps all its rows — never pads
    val tiny = docs.union(Seq((9001L, "c"), (9002L, "c")).toDF("doc_id", "source"))
    CurationPipeline.sampleKPerStratum(tiny, "source", "doc_id", 7)
      .filter($"source" === "c").count() shouldBe 2L
    // hash order ≠ id order: the draw is not "first k ids" (uniformity
    // proxy — md5 scrambles; astronomically unlikely to match by chance)
    once.filter(_._2 == "a").map(_._1).sorted should not be
      Seq(2L, 4L, 6L, 8L, 10L, 12L, 14L)
  }

  test("epochMix upsamples by weight with deterministic copy indices") {
    val docs = (1 to 2000).map(i =>
      (i.toLong, if (i % 2 == 0) "big" else "rare")).toDF("doc_id", "lang")
    val w = Map("big" -> 1.0, "rare" -> 2.5)
    val got = CurationPipeline.epochMix(docs, "lang", "doc_id", w)
      .select("doc_id", "lang", "copy").as[(Long, String, Int)].collect()
    // weight 1.0: exactly one copy of every row
    got.filter(_._2 == "big").map(_._1).sorted.toSeq shouldBe
      (2 to 2000 by 2).map(_.toLong)
    // weight 2.5: every rare row 2 or 3 times, mean ~2.5 epochs
    val byRare = got.filter(_._2 == "rare").groupBy(_._1).view.mapValues(_.length)
    byRare.values.foreach(n => n should (be(2) or be(3)))
    (byRare.values.sum.toDouble / 1000) shouldBe 2.5 +- 0.15
    // copy indices are contiguous from 0 (a deterministic SET, not bags)
    got.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      rows.map(_._3).sorted.toSeq shouldBe (0 until rows.length)
    }
    // re-execution identical; absent stratum dropped
    CurationPipeline.epochMix(docs, "lang", "doc_id", w)
      .count() shouldBe got.length.toLong
    CurationPipeline.epochMix(
        docs.union(Seq((9L, "other")).toDF("doc_id", "lang")),
        "lang", "doc_id", w)
      .filter($"lang" === "other").count() shouldBe 0L
  }

  test("temperatureMix derives the α-weights epochMix then applies") {
    // strata {a: 16, b: 4}: α=0.5 → s=(4,2), S=6, N=20 →
    // w_a = 20·4/(6·16) = 5/6, w_b = 20·2/(6·4) = 5/3
    val docs = (1 to 20).map(i =>
      (i.toLong, if (i <= 16) "a" else "b")).toDF("doc_id", "lang")
    val got = CurationPipeline.temperatureMix(docs, "lang", "doc_id", alpha = 0.5)
      .select("doc_id", "lang", "copy").as[(Long, String, Int)].collect()
    val wA = 20.0 * 4 / (6.0 * 16)
    val wB = 20.0 * 2 / (6.0 * 4)
    val viaEpoch = CurationPipeline.epochMix(docs, "lang", "doc_id",
        Map("a" -> wA, "b" -> wB))
      .select("doc_id", "lang", "copy").as[(Long, String, Int)].collect()
    got.sorted.toSeq shouldBe viaEpoch.sorted.toSeq
    // downsampled majority: ≤1 copy each; upsampled minority: 1 or 2
    got.filter(_._2 == "a").groupBy(_._1).foreach(_._2.length shouldBe 1)
    got.filter(_._2 == "b").groupBy(_._1).foreach(
      _._2.length should (be(1) or be(2)))
  }

  test("temperatureMix: α=1 is the identity mix; caps, nulls, bad args") {
    val docs = ((1 to 90).map(i => (i.toLong, "big")) ++
        Seq((91L, "tiny"), (92L, null.asInstanceOf[String])))
      .toDF("doc_id", "lang")
    // α=1 → every stratum weight exactly 1 → each non-null doc once
    CurationPipeline.temperatureMix(docs, "lang", "doc_id", alpha = 1.0)
      .select("doc_id", "copy").as[(Long, Int)].collect().sorted.toSeq shouldBe
      (1 to 91).map(i => (i.toLong, 0))
    // α=0.5, strata {90, 1}: uncapped w_tiny = 91/(√90+1) ≈ 8.7 < 10 but
    // maxWeight=2 must clamp it; null-stratum row dropped in both
    val capped = CurationPipeline.temperatureMix(docs, "lang", "doc_id",
        alpha = 0.5, maxWeight = 2.0)
      .select("doc_id", "lang", "copy").as[(Long, String, Int)].collect()
    capped.filter(_._2 == "tiny").length shouldBe 2
    capped.map(_._1) should not contain 92L
    an[IllegalArgumentException] should be thrownBy
      CurationPipeline.temperatureMix(docs, "lang", "doc_id", alpha = 0.0)
    an[IllegalArgumentException] should be thrownBy
      CurationPipeline.temperatureMix(docs, "lang", "doc_id", maxWeight = 101.0)
  }

  test("temperatureMix survives data-derived high-cardinality strata") {
    // strata come from the DATA (e.g. a host/domain column) — thousands
    // of distinct values must not become a per-row when-chain (O(#strata)
    // per row, deep-CaseWhen stack overflow in Catalyst); the expansion
    // is a broadcast join of the rollup. α=1 makes the result exact.
    val docs = (1 to 3000).map(i => (i.toLong, s"host-$i"))
      .toDF("doc_id", "domain")
    CurationPipeline.temperatureMix(docs, "domain", "doc_id", alpha = 1.0)
      .select("doc_id", "copy").as[(Long, Int)].collect()
      .sorted.toSeq shouldBe (1 to 3000).map(i => (i.toLong, 0))
  }

  test("packSequences lays docs head-to-tail into capacity bins per stratum") {
    val docs = Seq(
      (1L, "a", "w w w w"),           // 4 tokens → bin 0, offset 0
      (2L, "a", "w w w w w"),         // 5 → bin 0, offset 4
      (3L, "a", "w w w"),             // 3 → starts at 9 → bin 0, offset 9
      (4L, "a", "w w w w w w w w w"), // 9 → starts at 12 → bin 1, offset 2
      (5L, "b", "w w"))               // separate stratum restarts at 0
      .toDF("doc_id", "source", "text")
    val got = CurationPipeline.packSequences(docs, capacity = 10)
      .select("doc_id", "bin", "offset").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    got.toSeq shouldBe Seq(
      (1L, 0L, 0L), (2L, 0L, 4L), (3L, 0L, 9L), (4L, 1L, 2L), (5L, 0L, 0L))
  }

  test("decontaminate flags exactly the candidates overlapping the benchmark") {
    val bench = Seq((100L, "the capital of france is paris and it is large"))
      .toDF("doc_id", "text")
    val cands = Seq(
      (1L, "quiz answer the capital of france is paris obviously"), // overlaps
      (2L, "a completely unrelated candidate document with fresh words"),
      (3L, "too short"))                                            // < n tokens
      .toDF("doc_id", "text")
    val flagged = CurationPipeline.decontaminate(cands, bench,
        shingleN = 5)
      .as[Long].collect().sorted
    flagged.toSeq shouldBe Seq(1L)
  }

  test("decontaminateFuzzy: verbatim copy scores 1.0, light edit flags, fresh text doesn't") {
    val benchText = "what is the capital of france paris is the capital city"
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val cands = Seq(
      (1L, benchText),                                         // verbatim
      (2L, benchText.replace("city", "town")),                 // light edit
      (3L, "unrelated musings regarding seventeen zebras dancing quietly"))
      .toDF("doc_id", "text")
    val got = CurationPipeline.decontaminateFuzzy(cands, bench, tau = 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    got(1L)._4 shouldBe 1.0
    got(1L)._5 shouldBe true
    got(2L)._5 shouldBe true        // shared substrings dominate
    got(2L)._4 should be < 1.0      // but the edit lowers containment
    got(3L)._4 shouldBe 0.0
    got(3L)._5 shouldBe false
    // containment is a well-formed ratio everywhere
    got.values.foreach { r =>
      r._4 should (be >= 0.0 and be <= 1.0)
      r._3 should be <= r._2
    }
  }

  test("decontaminateFuzzy: sub-fingerprint-length candidates emit no row") {
    val bench = Seq((100L, "benchmark text that is long enough")).toDF("doc_id", "text")
    val cands = Seq((1L, "hi")).toDF("doc_id", "text") // canonical < k chars
    CurationPipeline.decontaminateFuzzy(cands, bench).count() shouldBe 0L
  }

  test("contaminationReport attributes each overlapping candidate to the right benchmark doc") {
    val qa = "what is the capital of france paris is the capital city"
    val zb = "seventeen zebras danced quietly across the savannah at midnight"
    val bench = Seq((100L, qa), (101L, zb)).toDF("doc_id", "text")
    val cands = Seq(
      (1L, qa.replace("city", "town")),  // edited copy of 100
      (2L, "breaking news " + zb),       // zb pasted into fresh text
      (3L, "completely unrelated filler about gardening tools and mulch"))
      .toDF("doc_id", "text")
    val got = CurationPipeline.contaminationReport(cands, bench)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    got(1L)._1 shouldBe 100L
    got(2L)._1 shouldBe 101L
    got.contains(3L) shouldBe false // zero shared fingerprints -> no row
    got(2L)._2 should be >= 1L
  }

  test("contaminationReport breaks equal-overlap ties toward the smaller bench id") {
    val text = "an exactly duplicated benchmark document used twice over"
    val bench = Seq((101L, text), (100L, text)).toDF("doc_id", "text")
    val cands = Seq((1L, text)).toDF("doc_id", "text")
    val got = CurationPipeline.contaminationReport(cands, bench)
      .as[(Long, Long, Long)].collect()
    got.length shouldBe 1
    got.head._2 shouldBe 100L
  }

  /** Reference semantics for tokenBudgetSelect: ONE global running-sum
    * window — the form the two-phase bucket rollup must reproduce. */
  private def budgetReference(docs: org.apache.spark.sql.DataFrame,
                              fraction: Double): (Map[Long, Long], Long) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.functions.TextAnalysis
    val scored = docs.select(col("doc_id"),
      round(TextAnalysis.qualityScore(col("text")), 6).as("q"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val w = Window.orderBy(col("q").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = scored.agg(sum("n_tokens")).as[Long].head()
    val budget = math.floor(total * fraction).toLong
    val ref = scored
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("cum_before") < budget)
      .select("doc_id", "cum_before").as[(Long, Long)].collect().toMap
    (ref, budget)
  }

  test("tokenBudgetSelect equals the one-window global reference on the real corpus") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = CurationPipeline.tokenBudgetSelect(docs, fraction = 0.5)
      .select("doc_id", "cum_before").as[(Long, Long)].collect().toMap
    val (ref, budget) = budgetReference(docs, 0.5)
    got shouldBe ref
    // the single-scan (persisted-projection) form is the same operator
    CurationPipeline.tokenBudgetSelect(docs, fraction = 0.5, singleScan = true)
      .select("doc_id", "cum_before").as[(Long, Long)]
      .collect().toMap shouldBe ref
    // the kept slice spends (just) the budget: every kept doc starts
    // inside it, and the spend including the boundary doc reaches it
    got.values.foreach(_ should be < budget)
    val scored = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val spent = scored.filter(col("doc_id").isin(got.keys.toSeq: _*))
      .agg(sum("n_tokens")).as[Long].head()
    spent should be >= budget
  }

  test("tokenBudgetSelect handles massive quality ties and zero-token docs") {
    // only 4 distinct texts across 300 ids → every bucket holds ~75 tied
    // docs (the in-bucket doc_id tie-break carries the whole cut), and
    // one variant is empty (zero tokens at the boundary)
    val docs = (1 to 300).map { i =>
      val t = i % 4 match {
        case 0 => "the quick brown fox is here and it is fine to be in a field"
        case 1 => "some words without stop terms xyzzy qwerty asdf ghjk"
        case 2 => ""
        case _ => "the and of is a to in the and of is a to in words more"
      }
      (i.toLong, t)
    }.toDF("doc_id", "text")
    for (frac <- Seq(0.3, 0.5, 1.0)) {
      val got = CurationPipeline.tokenBudgetSelect(docs, frac)
        .select("doc_id", "cum_before").as[(Long, Long)].collect().toMap
      val (ref, _) = budgetReference(docs, frac)
      withClue(s"fraction=$frac: ") { got shouldBe ref }
    }
  }

  test("hashSplit is disjoint, exhaustive, proportional, and growth-stable") {
    val docs = (1 to 4000).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = CurationPipeline.hashSplit(docs, splits, seed = "v1")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    got.size shouldBe 4000                       // exhaustive: one label per doc
    val byLabel = got.values.groupBy(identity).view.mapValues(_.size).toMap
    byLabel.keySet shouldBe Set("train", "val", "test") // disjoint bands all hit
    byLabel("train").toDouble / 4000 shouldBe 0.8 +- 0.03
    byLabel("val").toDouble / 4000 shouldBe 0.1 +- 0.03
    byLabel("test").toDouble / 4000 shouldBe 0.1 +- 0.03
    // growth-stable: a doc keeps its split when the corpus doubles
    val grown = (1 to 8000).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    CurationPipeline.hashSplit(grown, splits, seed = "v1")
      .filter($"doc_id" <= 4000).select("doc_id", "split")
      .as[(Long, String)].collect().toMap shouldBe got
    // a different seed re-draws the assignment
    CurationPipeline.hashSplit(docs, splits, seed = "v2")
      .select("doc_id", "split").as[(Long, String)].collect()
      .toMap should not equal got
    // misconfigured splits are an error, not a silent band
    an[IllegalArgumentException] should be thrownBy
      CurationPipeline.hashSplit(docs, Seq("a" -> 0.5, "b" -> 0.4))
    an[IllegalArgumentException] should be thrownBy
      CurationPipeline.hashSplit(docs, Seq("a" -> 0.5, "a" -> 0.5))
    // a cumulative bound that rounds to 1.0 (float sums) must hit the
    // "g" sentinel: the raw 2^32 encoding is 9 hex chars and would
    // misorder, silently dumping band b's upper half into c
    val over = CurationPipeline
      .hashSplit(docs, Seq("a" -> 0.5, "b" -> 0.5, "c" -> 1e-12), seed = "v1")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    over("a").toDouble / 4000 shouldBe 0.5 +- 0.03
    over("b").toDouble / 4000 shouldBe 0.5 +- 0.03
    over.getOrElse("c", 0L) shouldBe 0L
  }

  test("hashSplit stays disjoint and exhaustive for random split vectors") {
    // seeded-random property (repo convention): any normalized fraction
    // vector — including float sums that round the last cumulative bound
    // to 1.0 — must label every row with exactly one declared split
    val rnd = new scala.util.Random(20260813L)
    val docs = (1 to 500).map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    (1 to 6).foreach { it =>
      val raw = Array.fill(2 + rnd.nextInt(5))(rnd.nextDouble() + 1e-3)
      val splits = raw.map(_ / raw.sum).zipWithIndex
        .map { case (f, i) => s"s$i" -> f }.toSeq
      val got = CurationPipeline.hashSplit(docs, splits, seed = s"seed$it")
        .select("doc_id", "split").as[(Long, String)].collect()
      withClue(s"iteration $it splits=$splits: ") {
        got.length shouldBe 500
        got.map(_._2).toSet.subsetOf(splits.map(_._1).toSet) shouldBe true
      }
    }
  }

  test("seededShuffleShard emits a permutation even with duplicate and null ids") {
    // duplicate ids share a shuffle key (tie-broken arbitrarily between
    // the copies) and a null id keys on the bare seed — both must still
    // occupy exactly one position each
    val ids: Seq[java.lang.Long] =
      Seq(1L, 1L, 2L, 3L, 3L, 3L, null, 7L, 8L, 8L)
    val docs = ids.map(Tuple1(_)).toDF("doc_id")
    val got = CurationPipeline.seededShuffleShard(docs, shardSize = 3)
    got.count() shouldBe 10
    got.select("pos").as[Long].collect().sorted.toSeq shouldBe (0L until 10L)
  }

  test("null ids: hashSplit routes to the catch-all, seededShuffleShard keeps the row") {
    val withNull = Seq[(java.lang.Long, String)]((1L, "x"), (2L, "y"), (null, "z"))
      .toDF("doc_id", "text")
    CurationPipeline.hashSplit(withNull, Seq("train" -> 0.5, "test" -> 0.5))
      .filter($"doc_id".isNull).select("split").as[String].collect()
      .toSeq shouldBe Seq("test")
    // a null id must not vanish through the bucket equi-join
    val shards = CurationPipeline.seededShuffleShard(withNull, shardSize = 2)
    shards.count() shouldBe 3
    shards.select("pos").as[Long].collect().sorted.toSeq shouldBe Seq(0L, 1L, 2L)
  }

  test("seededShuffleShard equals the one-window reference and fills fixed shards") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    val got = CurationPipeline
      .seededShuffleShard(docs, shardSize = 64, seed = "42")
      .as[(Long, Long, Long)].collect()
    got.length shouldBe n.toInt
    // pos is a permutation of 0..n-1
    got.map(_._2).sorted.toSeq shouldBe (0L until n)
    // reference semantics: ONE global row_number window over the key
    val ref = docs.select(col("doc_id"),
        md5(concat(lit("42:"), col("doc_id").cast("string"))).as("skey"))
      .withColumn("pos", (row_number().over(
        Window.orderBy(col("skey"), col("doc_id"))) - 1).cast("long"))
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    got.map(t => t._1 -> t._2).toMap shouldBe ref
    // shards are contiguous fixed-size blocks of the shuffled order
    val sizes = got.groupBy(_._3).view.mapValues(_.length).toMap
    (0L until n / 64).foreach(s => sizes(s) shouldBe 64)
    if (n % 64 != 0) sizes(n / 64) shouldBe (n % 64).toInt
    // the bucket width is an execution knob, never a semantics knob
    CurationPipeline.seededShuffleShard(docs, 64, "42", bucketPrefixLen = 1)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
      .toSeq shouldBe got.sortBy(_._1).toSeq
  }

  test("snapshotDiff classifies added/removed/changed/unchanged, NULL-text-safe") {
    val nul = null.asInstanceOf[String]
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, nul), (6L, nul))
      .toDF("doc_id", "text")
    val nw = Seq((2L, "b"), (3L, "c2"), (4L, "d"), (5L, nul), (6L, "x"))
      .toDF("doc_id", "text")
    CurationPipeline.snapshotDiff(old, nw)
      .as[(Long, String)].collect().sortBy(_._1).toSeq shouldBe Seq(
      (1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added"),
      (5L, "unchanged"), (6L, "changed"))
  }

  test("applyChangelog: latest change wins, deletes drop, resurrection and explicit-null upserts apply, untouched keys pass through") {
    val nul = null.asInstanceOf[String]
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "text")
    val chg = Seq(
      (1L, 1L, "upsert", "a2"), (1L, 2L, "delete", nul), // later delete wins
      (2L, 1L, "delete", nul), (2L, 2L, "upsert", "b-back"), // resurrection
      (3L, 1L, "upsert", nul), // explicit-null upsert, NOT "keep base"
      (5L, 1L, "delete", nul), (5L, 1L, "upsert", "tie"), // equal seq: upsert
      (9L, 1L, "upsert", "new")) // insert of an unseen key
      .toDF("doc_id", "seq", "op", "text")
    CurationPipeline.applyChangelog(base, chg)
      .as[(Long, Option[String])].collect().sortBy(_._1).toSeq shouldBe Seq(
      (2L, Some("b-back")), (3L, None), (4L, Some("d")),
      (5L, Some("tie")), (9L, Some("new")))
  }

  test("applyChangelog: unknown ops raise; plan is at most one shuffle per side") {
    val base = Seq((1L, "a")).toDF("doc_id", "text")
    an[Exception] should be thrownBy
      CurationPipeline.applyChangelog(base,
        Seq((1L, 1L, "UPSERT", "x")).toDF("doc_id", "seq", "op", "text"))
        .collect()
    // validation happens on EVERY row, before winners are picked — a
    // malformed op outranked by a higher seq must still fail loudly
    an[Exception] should be thrownBy
      CurationPipeline.applyChangelog(base,
        Seq((1L, 2L, "upsert", "x"), (1L, 1L, "UPSERT", "y"))
          .toDF("doc_id", "seq", "op", "text"))
        .collect()
    // a NULL seq must raise too: seq drives the per-key window and
    // stale rejection — a null would silently misorder winners here
    // and misclassify the row as compacted-away in snapshotChangelog
    an[Exception] should be thrownBy
      CurationPipeline.applyChangelog(base,
        Seq((1L, Option.empty[Long], "upsert", "x"))
          .toDF("doc_id", "seq", "op", "text"))
        .collect()
    an[Exception] should be thrownBy
      CurationPipeline.applyChangelogVersioned(
        base.withColumn("__seq",
            org.apache.spark.sql.functions.lit(1L))
          .withColumn("__deleted",
            org.apache.spark.sql.functions.lit(false)),
        Seq((1L, Option.empty[Long], "upsert", "x"))
          .toDF("doc_id", "seq", "op", "text"))
        .collect()
    val df = CurationPipeline.applyChangelog(base,
      Seq((1L, 1L, "upsert", "x"), (2L, 1L, "upsert", "y"))
        .toDF("doc_id", "seq", "op", "text"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    withClue(plan) { exchanges should be <= 2 }
  }

  test("weightedSample prefers heavy weights, is exhaustive at k>=n, partitioning-invariant, raises on w<=0") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 40L).map(i => (i, if (i <= 2) 1000000 else 1))
      .toDF("doc_id", "wt")
    val ids = CurationPipeline.weightedSample(docs, 5, col("wt"))
      .select("doc_id").as[Long].collect().toSet
    ids should contain allOf (1L, 2L)
    val all = CurationPipeline.weightedSample(docs, 100, col("wt"))
    all.count() shouldBe 40
    all.select("rank").as[Int].collect().sorted shouldBe (1 to 40).toArray
    val a = CurationPipeline.weightedSample(docs, 5, col("wt"))
      .select("rank", "doc_id").as[(Int, Long)].collect().toSeq.sorted
    val b = CurationPipeline.weightedSample(docs.repartition(7), 5,
        col("wt"))
      .select("rank", "doc_id").as[(Int, Long)].collect().toSeq.sorted
    a shouldBe b
    an[Exception] should be thrownBy CurationPipeline.weightedSample(
      Seq((1L, 0)).toDF("doc_id", "wt"), 1, col("wt")).collect()
  }

  test("weightedSample plans as TakeOrderedAndProject, never a global sort") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 100L).map(i => (i, 1)).toDF("doc_id", "wt")
    val df = CurationPipeline.weightedSample(docs, 5, col("wt"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    withClue(plan) { plan should include("TakeOrderedAndProject") }
  }

  test("cardinality sketch lands inside the 5-sigma band of exact distinct") {
    import org.apache.spark.sql.functions._
    val verdicts = SparkEntry.queries("curate_cardinality_sketch")(
        spark, "/root/testdata/sf0.001")
      .select("est_in_band").as[Boolean].collect()
    verdicts.length should be > 0
    all(verdicts) shouldBe true
    // the sketch-only production form emits an estimate per source
    spark.conf.set("graft.hll.sketchOnly", "true")
    try {
      val est = SparkEntry.queries("curate_cardinality_sketch")(
          spark, "/root/testdata/sf0.001")
        .select("source", "distinct_est").as[(String, Long)].collect()
      est.map(_._1).distinct.length shouldBe est.length
      est.foreach(_._2 should be > 0L)
    } finally spark.conf.unset("graft.hll.sketchOnly")
  }

  test("redactPii replaces each PII class with its typed token, in order") {
    import graft.functions.TextAnalysis
    val rows = Seq(
      "mail me at jane.doe+x@corp.example.org thanks",
      "docs at https://docs.example.com/a?b=c#d here",
      "host 192.168.0.1 is up",
      "call +1 (555) 010-7788 now",
      "no pii here at all")
      .toDF("t").select(TextAnalysis.redactPii($"t").as("r"))
      .as[String].collect()
    rows(0) shouldBe "mail me at <EMAIL> thanks"
    rows(1) shouldBe "docs at <URL> here"
    rows(2) shouldBe "host <IP> is up"
    rows(3) shouldBe "call <PHONE> now"
    rows(4) shouldBe "no pii here at all"
  }

  test("dsirScores ranks target-like docs above corpus-average ones") {
    import org.apache.spark.sql.functions.col
    // target rows are all about "wiki science physics"; raw rows about
    // "spam casino deal". A scored doc made of target words must land
    // positive, one made of raw-only words negative, mixed in between,
    // and a wordless doc keeps a (0, 0) row.
    // distributions must dominate the +1/256-bucket smoothing, as they
    // do on any real corpus — hence the ×30 replication
    val docs = Seq(
      (1L, Array.fill(30)("wiki science physics wiki science").mkString(" "), true),
      (2L, Array.fill(30)("wiki physics science wiki").mkString(" "), true),
      (3L, Array.fill(30)("spam casino deal spam casino").mkString(" "), false),
      (4L, Array.fill(30)("deal casino spam deal").mkString(" "), false),
      (5L, "wiki science physics", false),   // target-like raw doc
      (6L, "spam casino deal", false),       // corpus-only raw doc
      (7L, "wiki spam", false),              // mixed
      (8L, "!!!", false))                    // wordless
      .toDF("doc_id", "text", "is_tgt")
    val got = CurationPipeline.dsirScores(docs, "doc_id", "text", col("is_tgt"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    got(5L)._2 should be > 0.0
    got(6L)._2 should be < 0.0
    got(5L)._2 should be > got(7L)._2
    got(7L)._2 should be > got(6L)._2
    got(8L) shouldBe ((0L, 0.0))
    got(5L)._1 shouldBe 3L // every word occurrence is a feature
  }

  test("incrementalAnnotate equals the full recompute, including dup resurrection") {
    import org.apache.spark.sql.functions.col
    // old: 1 and 2 share content (2 dropped as dup), 3 unique, 4 unique
    val old = Seq(
      (1L, goodEnglish), (2L, goodEnglish),
      (3L, goodEnglish + " three"), (4L, goodEnglish + " four"))
      .toDF("doc_id", "text")
    // new: 1 REMOVED (its dup 2 must resurrect), 3 changed, 5 added as
    // a dup of 4 (must be dropped), 6 added unique
    val nw = Seq(
      (2L, goodEnglish),
      (3L, goodEnglish + " three changed"), (4L, goodEnglish + " four"),
      (5L, goodEnglish + " four"), (6L, goodEnglish + " six"))
      .toDF("doc_id", "text")
    val oldAnn = CurationPipeline.annotate(old)
    // the old snapshot really did drop doc 2 as a duplicate
    oldAnn.select("doc_id").as[Long].collect().toSet should not contain 2L
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("verdict"))
        .as[(Long, String)].collect().sortBy(_._1).toSeq
    val inc = CurationPipeline.incrementalAnnotate(old, nw, oldAnn)
    canon(inc) shouldBe canon(CurationPipeline.annotate(nw))
    // and the interesting rows came out right: 2 resurrected, 5 gone
    val ids = inc.select("doc_id").as[Long].collect().toSet
    ids should contain(2L)
    ids should not contain 5L
    ids should contain allOf (3L, 4L, 6L)
  }

  test("qualityLrTrain separates target-like from corpus-only docs") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, Array.fill(20)("wiki science physics").mkString(" "), true),
      (2L, Array.fill(20)("physics wiki science wiki").mkString(" "), true),
      (3L, Array.fill(20)("spam casino deal").mkString(" "), false),
      (4L, Array.fill(20)("deal casino spam casino").mkString(" "), false),
      (5L, "wiki science physics", false),  // target-like holdout
      (6L, "spam casino deal", false),      // spam holdout
      (7L, "???", false))                   // wordless
      .toDF("doc_id", "text", "is_tgt")
    val (weights, scored) = CurationPipeline.qualityLrTrain(
      docs, "doc_id", "text", col("is_tgt"), steps = 3)
    weights.size should be <= 256
    val q = scored.as[(Long, Double)].collect().toMap
    // the trained gate orders the holdouts correctly and is calibrated
    // around 0.5: target-like above, spam below, no-evidence exactly at
    q(5L) should be > 0.5
    q(6L) should be < 0.5
    q(5L) should be > q(6L)
    q(7L) shouldBe 0.5
    // training docs land on their own labels' sides
    q(1L) should be > 0.5
    q(3L) should be < 0.5
  }

  test("qualityLrTrain materializeAt gate: large-corpus path truncates lineage, small path stays lazy, results identical") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, Array.fill(20)("wiki science physics").mkString(" "), true),
      (2L, Array.fill(20)("spam casino deal").mkString(" "), false),
      (3L, "wiki science physics", false))
      .toDF("doc_id", "text", "is_tgt")
    def leaves(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collectLeaves().map(_.getClass.getSimpleName)
    // past the gate (0 ⇒ always): the returned frame is a checkpointed
    // LogicalRDD — the caller's first action cannot replay the
    // explode + per-doc-window feature lineage
    val (wE, eager) = CurationPipeline.qualityLrTrain(
      docs, "doc_id", "text", col("is_tgt"), steps = 2, materializeAt = 0L)
    leaves(eager) should contain ("LogicalRDD")
    // below the gate: lazy lineage (no checkpoint write at small scale)
    val (wL, lazyDf) = CurationPipeline.qualityLrTrain(
      docs, "doc_id", "text", col("is_tgt"), steps = 2,
      materializeAt = Long.MaxValue)
    leaves(lazyDf) should not contain "LogicalRDD"
    // the gate changes WHEN work happens, never the answer
    wE shouldBe wL
    eager.as[(Long, Double)].collect().toMap shouldBe
      lazyDf.as[(Long, Double)].collect().toMap
  }
}

/** Length-bucket report: boundary assignment is integer-exact and waste
  * arithmetic reconciles with the raw token counts. */
class LengthBucketSpec extends SparkSpec {
  import spark.implicits._

  test("docs land in the smallest power-of-two bucket that fits; waste reconciles") {
    // token counts 16 (exact boundary), 17 (first over), 100, 9000 (catch-all)
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq((1L, words(16)), (2L, words(17)), (3L, words(100)),
      (4L, words(9000))).toDF("doc_id", "text")
    val rows = graft.pipeline.CurationPipeline.lengthBucketReport(docs)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    rows.map(_._1) shouldBe Seq(16L, 32L, 128L, 16384L)
    val byBucket = rows.map(r => r._1 -> r).toMap
    byBucket(16L) shouldBe ((16L, 1L, 16L, 0L, 0.0))        // exact fit: zero waste
    byBucket(32L) shouldBe ((32L, 1L, 17L, 15L, 15.0 / 32))
    byBucket(128L) shouldBe ((128L, 1L, 100L, 28L, 28.0 / 128))
    byBucket(16384L)._4 shouldBe (16384L - 9000L)
    // global reconciliation: tokens + waste == slot capacity
    rows.map(r => r._3 + r._4).sum shouldBe rows.map(r => r._2 * r._1).sum
  }

  test("report aggregates to at most the ladder's bucket count regardless of input size") {
    val docs = (0 until 500).map(i => (i.toLong, Seq.fill(i % 97 + 1)("x").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = graft.pipeline.CurationPipeline.lengthBucketReport(docs).collect()
    rows.length should be <= 11
    rows.map(_.getLong(0)).toSeq shouldBe rows.map(_.getLong(0)).toSeq.sorted
  }

  test("profileColumns: exact stats with planted nulls, one scan, approx mode close") {
    import graft.pipeline.CurationPipeline
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("a")), (5L, None)).toDF("id", "s")
    val byCol = CurationPipeline.profileColumns(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    byCol("id").getLong(1) shouldBe 5L
    byCol("id").getLong(2) shouldBe 0L
    byCol("id").getLong(3) shouldBe 5L
    (byCol("id").getString(4), byCol("id").getString(5)) shouldBe ("1", "5")
    byCol("s").getLong(2) shouldBe 2L  // nulls
    byCol("s").getLong(3) shouldBe 2L  // distinct non-null
    (byCol("s").getString(4), byCol("s").getString(5)) shouldBe ("a", "b")
    // single pass: one aggregate subtree, no join, no union of rescans
    val plan = CurationPipeline.profileColumns(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    plan should not include "Union"
    plan should not include "Join"
    // approx mode still lands near the exact counts on tiny data
    val approx = CurationPipeline.profileColumns(df, Seq("id"),
        exactDistinct = false)
      .collect().head.getLong(3)
    approx shouldBe 5L +- 1L
  }

  test("shard manifest: equal across rebuilds, a one-doc drift flags exactly its shard") {
    import graft.pipeline.CurationPipeline
    import org.apache.spark.sql.functions.{concat, lit, when}
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "documents").select($"doc_id", $"text")
    def manifest(d: org.apache.spark.sql.DataFrame) =
      CurationPipeline.shardManifest(d, shardSize = 32, seed = "7")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val m1 = manifest(docs)
    manifest(docs) shouldBe m1 // deterministic across independent runs
    m1.map(_._2).sum shouldBe docs.count()
    // drift one doc's text: shard assignment (id-keyed) is unchanged,
    // so EXACTLY one shard's digest (and token total) moves
    val drifted = docs.withColumn("text",
      when($"doc_id" === 17L, concat($"text", lit(" drifted")))
        .otherwise($"text"))
    val m2 = manifest(drifted)
    m2.map(_._1) shouldBe m1.map(_._1)
    m1.zip(m2).count { case (a, b) => a._4 != b._4 } shouldBe 1
  }

  test("shard manifest keeps a null-id doc in its shard's count and digest") {
    import graft.pipeline.CurationPipeline
    val docs = Seq((Some(1L), "alpha"), (Some(2L), "beta"),
      (None, "the null-id doc"), (Some(3L), "gamma"))
      .toDF("doc_id", "text")
    def mf(d: org.apache.spark.sql.DataFrame) =
      CurationPipeline.shardManifest(d, shardSize = 100, seed = "3")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val m = mf(docs)
    // all four docs — including the null-id one — are accounted for
    m.map(_._2).sum shouldBe 4L
    // TWO null-id docs: the keepCols passthrough carries each row's own
    // content — no id-keyed join to cross-match, so counts stay exact
    val twoNulls = docs.unionByName(
      Seq((Option.empty[Long], "a second null-id doc"))
        .toDF("doc_id", "text"))
    mf(twoNulls).map(_._2).sum shouldBe 5L
    // a drift in ONLY the null-id doc's text must change the manifest
    val drifted = Seq((Some(1L), "alpha"), (Some(2L), "beta"),
      (None, "the null-id doc DRIFTED"), (Some(3L), "gamma"))
      .toDF("doc_id", "text")
    mf(drifted) should not be m
  }

  test("profileColumns on an empty frame reports zero nulls, not NULL") {
    import graft.pipeline.CurationPipeline
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val rows = CurationPipeline.profileColumns(empty, Seq("id", "s"))
      .collect()
    rows.length shouldBe 2
    rows.foreach { r =>
      r.getLong(1) shouldBe 0L          // n_rows
      r.isNullAt(2) shouldBe false
      r.getLong(2) shouldBe 0L          // n_nulls: 0, never NULL
      r.getLong(3) shouldBe 0L          // n_distinct
    }
  }

  test("leakage-safe split keeps every near-dup cluster in one band; naive split would not") {
    val rows = graft.SparkEntry.queries("curate_split_leakage_safe")(
        spark, "/root/testdata/sf0.001")
      .select("doc_id", "split_key", "split")
      .as[(Long, Long, String)].collect().toSeq
    // structural guarantee: one split per split_key
    rows.groupBy(_._2).values.foreach(g =>
      g.map(_._3).distinct.length shouldBe 1)
    // the guard is load-bearing: real clusters exist (key ≠ own id
    // somewhere), and the per-doc hash split WOULD have separated at
    // least one of those clusters' members
    val clustered = rows.filter(r => r._1 != r._2)
    clustered should not be empty
    def naiveBand(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"v1:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (h < "cccccccc000000000000000000000000") "train"
      else if (h < "e6666666000000000000000000000000") "val" else "test"
    }
    val naiveSplitsPerCluster = rows.groupBy(_._2).values
      .map(g => g.map(r => naiveBand(r._1)).distinct.length)
    naiveSplitsPerCluster.max should be > 1
  }
}
