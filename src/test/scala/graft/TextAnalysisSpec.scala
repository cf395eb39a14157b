package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Encoding-damage (mojibake) detection: each signature counted exactly,
  * clean prose untouched, whitespace controls exempt. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def damage(rows: (Long, String)*): Map[Long, (Int, Int, Int, Double)] =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.replacementCharCount(col("text")).as("r"),
        TextAnalysis.mojibakePairCount(col("text")).as("m"),
        TextAnalysis.controlCharCount(col("text")).as("c"),
        TextAnalysis.encodingDamageRatio(col("text")).as("ratio"))
      .as[(Long, Int, Int, Int, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap

  test("clean prose, including tabs/newlines/CR, scores zero everywhere") {
    val got = damage(
      1L -> "the quick brown fox\tjumps over\r\nthe lazy dog.",
      2L -> "")
    got(1L) shouldBe ((0, 0, 0, 0.0))
    got(2L) shouldBe ((0, 0, 0, 0.0)) // empty text: greatest(len,1) guards /0
  }

  test("each damage signature is counted exactly once per occurrence") {
    val got = damage(
      // two replacement chars
      1L -> "bad \uFFFD bytes \uFFFD here",
      // mojibake e-acute (C3 A9) + i-diaeresis (C3 AF) as decoded pairs
      2L -> "caf\u00C3\u00A9 na\u00C3\u00AFve",
      // two C0 controls (BEL, ESC)
      3L -> "bell \u0007 and esc \u001B chars",
      // 0xC2-lead + NBSP pair
      4L -> "\u00C2\u00A0 nbsp-mojibake")
    got(1L)._1 shouldBe 2
    got(2L)._2 shouldBe 2
    got(3L)._3 shouldBe 2
    got(4L)._2 shouldBe 1
  }

  test("NUL (truncated binary spill) is counted as a control character") {
    val got = damage(1L -> "foo\u0000bar")
    got(1L)._3 shouldBe 1
    got(1L)._4 should be > 0.0
  }

  test("damage ratio is matches over length and bounded by 1") {
    val got = damage(1L -> "ab\uFFFD") // 1 match, 3 chars
    got(1L)._4 shouldBe (1.0 / 3.0) +- 1e-12
    // a pathological all-damage string stays within [0,1]
    val worst = damage(2L -> "\uFFFD\uFFFD\uFFFD")
    worst(2L)._4 should be <= 1.0
  }

  test("Gopher rule ingredients: word length, symbol ratio, alpha fraction") {
    val rows = Seq(
      (1L, "the cat sat"),                 // 3 words, 9 chars, all alpha
      (2L, "ab ## ... cd"),                // 1 hash-pair + 1 ellipsis, 4 words
      (3L, "12 34 ok"))                    // 1 of 3 words alphabetic
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.meanWordLength(col("text")).as("mwl"),
        TextAnalysis.symbolToWordRatio(col("text")).as("sym"),
        TextAnalysis.alphaWordFraction(col("text")).as("alpha"))
      .as[(Long, Double, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    rows(1L)._1 shouldBe 3.0 +- 1e-12          // 9 chars / 3 words
    rows(1L)._2 shouldBe 0.0
    rows(1L)._3 shouldBe 1.0 +- 1e-12
    rows(2L)._2 shouldBe (3.0 / 4.0) +- 1e-12  // (2 hashes + 1 ellipsis) / 4
    rows(3L)._3 shouldBe (1.0 / 3.0) +- 1e-12
  }

  test("ngramRepetition: hand-computed top and duplicated 2-gram fractions") {
    val rows = Seq(
      (1L, "a b a b a"),     // grams: ab ba ab ba -> top 2/4, dup 4/4
      (2L, "x y z"),         // grams: xy yz       -> top 1/2, dup 0
      (3L, "w w w w"),       // grams: ww ww ww    -> top 3/3, dup 3/3
      (4L, "p q"))           // one gram           -> top 1/1, dup 0
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.ngramRepetition(col("text"), 2).as("card"))
      .select(col("doc_id"), col("card.n_grams"), col("card.top_frac"),
        col("card.dup_frac"))
      .as[(Long, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    rows(1L) shouldBe ((4L, 0.5, 1.0))
    rows(2L) shouldBe ((2L, 0.5, 0.0))
    rows(3L) shouldBe ((3L, 1.0, 1.0))
    rows(4L) shouldBe ((1L, 1.0, 0.0))
  }

  test("ngramRepetition is total: sub-n-token and empty docs get the zero card") {
    val rows = Seq((1L, "solo"), (2L, ""), (3L, "!!!"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.ngramRepetition(col("text"), 2).as("card"))
      .select(col("doc_id"), col("card.n_grams"), col("card.top_frac"),
        col("card.dup_frac"))
      .as[(Long, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    rows(1L) shouldBe ((0L, 0.0, 0.0))
    rows(2L) shouldBe ((0L, 0.0, 0.0))
    rows(3L) shouldBe ((0L, 0.0, 0.0)) // no [a-z0-9] tokens at all
  }

  test("ngramRepetition matches a brute-force multiset reference on random streams") {
    // tiny alphabet -> dense gram collisions; lengths straddle the
    // zero-, one- and many-gram edges (the CodecPropertySpec convention)
    val rnd = new scala.util.Random(20260815L)
    val docs = (1 to 200).map { i =>
      val toks = Array.fill(rnd.nextInt(12))(('a' + rnd.nextInt(3)).toChar.toString)
      (i.toLong, toks.mkString(" "))
    }
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.ngramRepetition(col("text"), 2).as("card"))
      .select(col("doc_id"), col("card.n_grams"), col("card.top_frac"),
        col("card.dup_frac"))
      .as[(Long, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.foreach { case (id, text) =>
      val ts = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
      val grams = ts.sliding(2).filter(_.lengthIs == 2).map(_.mkString(" ")).toSeq
      val expected =
        if (grams.isEmpty) (0L, 0.0, 0.0)
        else {
          val counts = grams.groupBy(identity).map(_._2.size)
          (grams.size.toLong,
            r6(counts.max.toDouble / grams.size),
            r6(counts.filter(_ > 1).sum.toDouble / grams.size))
        }
      withClue(s"doc $id '$text': ") { got(id) shouldBe expected }
    }
  }

  test("stray spaces do not mint words: fractions use non-empty tokens") {
    val rows = Seq((1L, "the cat sat mat "), (2L, "  "), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.strictWordCount(col("text")).as("nw"),
        TextAnalysis.meanWordLength(col("text")).as("mwl"),
        TextAnalysis.alphaWordFraction(col("text")).as("alpha"))
      .as[(Long, Int, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    rows(1L) shouldBe ((4, 3.0, 1.0)) // trailing space: still 4 words, alpha 1.0
    rows(2L) shouldBe ((0, 0.0, 0.0)) // all-space: zero words, guarded ratios
    rows(3L) shouldBe ((0, 0.0, 0.0))
  }

  test("legitimate accented Latin-1 text without a lead byte is NOT flagged") {
    // properly decoded e-acute (U+00E9) has no 0xC3/0xC2 lead - must not count
    val got = damage(1L -> "caf\u00E9 r\u00E9sum\u00E9")
    got(1L) shouldBe ((0, 0, 0, 0.0))
  }

  test("normalizeText: NFC composes, controls strip, whitespace collapses, null passes") {
    import graft.functions.TextAnalysis
    val rows = Seq(
      (1L, "cafe\u0301 and caf\u00e9"),      // decomposed vs composed
      (2L, " a\u0007b\u0000c  d\te \u000Bf "), // BEL/NUL/VT controls + runs
      (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select($"id", TextAnalysis.normalizeText($"t").as("n"))
      .as[(Long, Option[String])].collect().sortBy(_._1)
    rows(0)._2.get shouldBe "caf\u00e9 and caf\u00e9" // both sides compose to one form
    rows(1)._2.get shouldBe "abc d e f"
    rows(2)._2 shouldBe None
  }

  test("langIdNb: trained on a labeled split, the model separates held-out docs perfectly; priors decide empty texts; ties break deterministically") {
    import graft.functions.TextAnalysis.{langIdNbTrain, langIdNbClassify}
    val en = Seq("the", "house", "with", "garden", "stands", "here")
    val de = Seq("das", "haus", "mit", "garten", "steht", "hier")
    def doc(ws: Seq[String], seed: Int): String =
      (1 to 10).map(j => ws((seed * j) % ws.length)).mkString(" ")
    // 40 labeled training docs (24 en / 16 de \u2014 asymmetric priors)
    val train = ((1 to 24).map(i => ("en", doc(en, i))) ++
      (1 to 16).map(i => ("de", doc(de, i)))).toDF("lang", "text")
    val model = langIdNbTrain(train)
    // the model frame is broadcast-sized: \u2264 langs \u00d7 257 rows
    model.count() should be <= (2L * 257L)
    // held-out docs built with a DIFFERENT seed law classify 100%
    val hold = ((101 to 110).map(i => (i.toLong, "en", doc(en, i * 7))) ++
      (201 to 210).map(i => (i.toLong, "de", doc(de, i * 7))))
      .toDF("doc_id", "lang_true", "text")
    val got = langIdNbClassify(hold, model)
      .join(hold.select(col("doc_id"), col("lang_true")), Seq("doc_id"))
      .select(col("lang_true"), col("lang_pred"))
      .as[(String, String)].collect()
    got.length shouldBe 20
    got.count { case (t, p) => t == p } shouldBe 20 // holdout separation
    // an EMPTY text has no trigrams: the argmax is the prior alone \u2014
    // 'en' trained on more docs, so it wins
    langIdNbClassify(Seq((1L, "")).toDF("doc_id", "text"), model)
      .select(col("lang_pred")).as[String].head() shouldBe "en"
    // deterministic tie-break: symmetric priors + an empty text score
    // identically for both langs \u2192 lang asc wins
    val sym = langIdNbTrain(Seq(("bb", "xyz"), ("aa", "qrs"))
      .toDF("lang", "text"))
    langIdNbClassify(Seq((1L, "")).toDF("doc_id", "text"), sym)
      .select(col("lang_pred")).as[String].head() shouldBe "aa"
  }

  test("langIdNbUpdate: folding a new labeled batch in equals retraining on the union, row for row — including a brand-new language") {
    import graft.functions.TextAnalysis.{langIdNbTrain, langIdNbUpdate}
    val w1 = Seq(("en", "the house stands here"), ("de", "das haus hier"))
      .toDF("lang", "text")
    // wave 2 extends a seen language AND introduces an unseen one
    val w2 = Seq(("en", "garden with the house"),
      ("fr", "la maison avec jardin")).toDF("lang", "text")
    val incremental = langIdNbUpdate(langIdNbTrain(w1), w2)
      .collect().map(_.toString).sorted.toSeq
    val retrained = langIdNbTrain(w1.unionByName(w2))
      .collect().map(_.toString).sorted.toSeq
    incremental shouldBe retrained
    // classify merges duplicate model rows on entry, so a raw UNION
    // of model frames scores identically to the proper update — a
    // duplicated (lang, bucket) key must never fan the join out
    import graft.functions.TextAnalysis.langIdNbClassify
    val docs = Seq((1L, "the garden house"), (2L, "la maison ici"))
      .toDF("doc_id", "text")
    val viaUnion = langIdNbClassify(docs,
      langIdNbTrain(w1).unionByName(langIdNbTrain(w2)))
      .collect().map(_.toString).sorted.toSeq
    val viaUpdate = langIdNbClassify(docs,
      langIdNbUpdate(langIdNbTrain(w1), w2))
      .collect().map(_.toString).sorted.toSeq
    viaUnion shouldBe viaUpdate
  }

  test("standing langIdNb: a stream of labeled batches maintains the model read-modify-write; the result equals a batch retrain") {
    // the Scaladoc's claim made true by test: the incremental model
    // runs as the same foreachBatch read-modify-write loop the trap
    // stats use — counts are a sufficient statistic, so the standing
    // face converges to the retrain exactly, wave for wave
    import graft.functions.TextAnalysis.{langIdNbTrain, langIdNbUpdate}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-nb-standing").toString
    val modelDir = s"$dir/model"
    val input = MemoryStream[(String, String)]
    val q = input.toDF().toDF("lang", "text").writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val merged =
          if (new java.io.File(modelDir).exists())
            langIdNbUpdate(spark.read.parquet(modelDir), b)
          else langIdNbTrain(b)
        val tmp = s"$modelDir.next"
        merged.write.mode("overwrite").parquet(tmp)
        val old = new java.io.File(modelDir)
        if (old.exists()) {
          val bak = new java.io.File(s"$modelDir.old")
          old.renameTo(bak)
          new java.io.File(tmp).renameTo(old)
          org.apache.commons.io.FileUtils.deleteDirectory(bak)
        } else new java.io.File(tmp).renameTo(old)
        (): Unit
      }
      .option("checkpointLocation", s"$dir/ckpt").start()
    val w1 = Seq(("en", "the house stands here"), ("de", "das haus hier"))
    val w2 = Seq(("en", "garden with the house"),
      ("fr", "la maison avec jardin"))
    val w3 = Seq(("de", "der garten am haus"))
    try {
      Seq(w1, w2, w3).zipWithIndex.foreach { case (w, i) =>
        input.addData(w: _*); q.processAllAvailable()
        // wave-for-wave: the maintained frame equals a retrain on
        // everything seen so far
        val seen = (w1 ++ w2 ++ w3).take(w1.size + (if (i >= 1) w2.size
          else 0) + (if (i >= 2) w3.size else 0))
        spark.read.parquet(modelDir).collect().map(_.toString)
          .sorted.toSeq shouldBe
          langIdNbTrain(seen.toDF("lang", "text"))
            .collect().map(_.toString).sorted.toSeq
      }
    } finally q.stop()
  }
}
