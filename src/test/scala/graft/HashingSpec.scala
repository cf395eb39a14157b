package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Shingle / MinHash / band-key / SimHash primitives under the dedup
  * family. The md5-hex reference values below are computed independently
  * (MessageDigest) so the fast path is checked against first principles. */
class HashingSpec extends AnyFunSuite with Matchers {

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("shingles: 3-gram word shingles, lowercased, distinct, in order") {
    Hashing.shinglesScala("The quick brown Fox jumps", 3).toSeq shouldBe
      Seq("the quick brown", "quick brown fox", "brown fox jumps")
    // duplicates collapse, first occurrence order kept
    Hashing.shinglesScala("a b a b a b", 2).toSeq shouldBe Seq("a b", "b a")
  }

  test("shingles: tokenization is alphanumeric runs") {
    Hashing.shinglesScala("one,two;three!", 2).toSeq shouldBe
      Seq("one two", "two three")
  }

  test("shingles: fewer tokens than n yields none") {
    Hashing.shinglesScala("only two", 3) shouldBe empty
    Hashing.shinglesScala("", 3) shouldBe empty
    Hashing.shinglesScala(null, 3) shouldBe empty
  }

  test("minhashes match a first-principles min over md5(seed:shingle)") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val got = Hashing.minhashesScala(text, 3, 4)
    val sh = Hashing.shinglesScala(text, 3)
    val want = (0 until 4).map(seed => sh.map(s => md5(s"$seed:$s")).min)
    got.toSeq shouldBe want
  }

  test("minhashes of an empty document are all-sentinel") {
    Hashing.minhashesScala("", 3, 6).toSeq shouldBe
      Seq.fill(6)(Hashing.MinhashSentinel)
  }

  test("band keys: bands × rowsPerBand layout, empty doc yields no keys") {
    val keys = Hashing.bandKeysScala("a b c d e f g", 3, 2, 2)
    keys.length shouldBe 2
    keys(0) should startWith("0:")
    keys(1) should startWith("1:")
    // each key carries rowsPerBand 32-hex minhashes joined by '|'
    keys.foreach { k =>
      val parts = k.drop(2).split('|')
      parts.length shouldBe 2
      parts.foreach(_ should fullyMatch regex "[0-9a-f]{32}")
    }
    Hashing.bandKeysScala("", 3, 2, 2) shouldBe empty
    Hashing.bandKeysScala("one two", 3, 2, 2) shouldBe empty // < n tokens
  }

  test("identical texts collide on every band key; disjoint texts on none") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val k1 = Hashing.bandKeysScala(t1, 3, 4, 3)
    val k2 = Hashing.bandKeysScala(t1, 3, 4, 3)
    k1.toSeq shouldBe k2.toSeq
    val k3 = Hashing.bandKeysScala("uno dos tres cuatro cinco seis siete", 3, 4, 3)
    k1.toSet.intersect(k3.toSet) shouldBe empty
  }

  test("gram hashes: element i = md5 of space-joined tokens [i, i+k)") {
    val toks = Seq("a", "b", "c", "d", "e")
    Hashing.gramHashesScala(toks, 3).toSeq shouldBe
      Seq(md5("a b c"), md5("b c d"), md5("c d e"))
    Hashing.gramHashesScala(toks, 5).toSeq shouldBe
      Seq(md5("a b c d e"))
    Hashing.gramHashesScala(toks, 6) shouldBe empty
    Hashing.gramHashesScala(null, 2) shouldBe empty
    // non-ASCII tokens hash their UTF-8 bytes, same as Catalyst md5
    Hashing.gramHashesScala(Seq("héllo", "wörld"), 2).toSeq shouldBe
      Seq(md5("héllo wörld"))
  }

  test("simhash token-mask cache is semantics-free: repeated texts, many tokens") {
    // >1 distinct token path exercises cache hits AND misses in one call
    val t = (0 until 300).map(i => s"tok${i % 37}").mkString(" ")
    val a = Hashing.simhashScala(t, 20)
    val b = Hashing.simhashScala(t, 20) // fully cached second pass
    a shouldBe b
    a should fullyMatch regex "[01]{20}"
  }
}

class SimhashSpec extends SparkSpec {
  import spark.implicits._

  test("simhash is a deterministic bits-wide 0/1 string; dups collide") {
    val df = Seq(
      "the quick brown fox", "the quick brown fox", "totally different words here")
      .toDF("text")
    val sigs = df.select(Hashing.simhash(col("text"), 12)).as[String].collect()
    sigs.foreach(_ should fullyMatch regex "[01]{12}")
    sigs(0) shouldBe sigs(1)
    sigs(0) should not be sigs(2)
  }

  test("Scala fast path equals the column-expression reference semantics") {
    val texts = Seq("the quick brown fox", "a", "", "Mixed CASE tokens 42!",
      "repeated repeated repeated words words")
    val viaColumn = texts.toDF("text")
      .select(Hashing.simhash(col("text"), 16)).as[String].collect()
    texts.map(Hashing.simhashScala(_, 16)) shouldBe viaColumn.toSeq
  }
}

class SplitTextGeneratorSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.graft.TextExpressions

  test("generator output equals explode(posexplode(udf)) semantics") {
    val texts = Seq("alpha###beta", "x" * 450, "", "short one")
    val viaGen = texts.toDF("text")
      .select(col("text"), TextExpressions.splitTextGen(col("text")))
      .select("text", "chunk_idx", "chunk")
      .as[(String, Int, String)].collect().toSeq.sorted
    val expected = texts.flatMap { t =>
      graft.functions.TextSplit.splitText(t).zipWithIndex
        .map { case (c, i) => (t, i, c) }
    }.sorted
    viaGen shouldBe expected
  }

  test("generator rejects non-string input at analysis time") {
    an[org.apache.spark.sql.AnalysisException] should be thrownBy
      Seq(1, 2).toDF("n")
        .select(TextExpressions.splitTextGen(col("n"))).collect()
  }
}

/** TF-IDF top-terms golden semantics (the text_tfidf driver query's
  * operator level). */
class TfIdfSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("tf-idf ranks distinguishing terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "apple apple banana common common"),
      (2L, "banana cherry common common"),
      (3L, "cherry cherry durian common")).toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", 2)
      .as[(Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // 'common' is in every doc → idf ln(1) = 0 → never a top term
    got.values.flatten.toSet should not contain "common"
    got(1L).head shouldBe "apple"          // tf=2, df=1 dominates
    got(2L) shouldBe Seq("banana", "cherry") // equal scores → term-asc tie
    got(3L).head shouldBe "durian"         // ln(3) beats 2·ln(3/2)
  }

  test("unigram surprisal: rare-token docs score higher than stock prose") {
    val docs = Seq(
      (1L, "the the the the"),             // most common token only
      (2L, "the zyx qwv jkl")).toDF("doc_id", "text") // 3 hapaxes
    val got = graft.functions.TextAnalysis.unigramSurprisal(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    got(1L)._1 shouldBe 4 // n_tokens
    got(2L)._1 shouldBe 4
    // doc 1: every token has c=5, N=8 → −ln(5/8); doc 2 mixes one 5/8
    // token with three 1/8 hapaxes → strictly higher mean surprisal
    got(1L)._2 shouldBe BigDecimal(-math.log(5.0 / 8))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got(2L)._2 should be > got(1L)._2
  }

  test("bigram surprisal matches first-principles conditional MLE") {
    // corpus pairs: doc 1 → (a,b)(b,a)(a,b)(b,a), doc 2 → (a,b)(b,c)
    // c(a,b)=3 c(b,a)=2 c(b,c)=1; left counts c(a,·)=3 c(b,·)=3
    val docs = Seq(
      (1L, "a b a b a"),
      (2L, "a b c"),
      (3L, "solo"),               // one token → no bigrams → no row
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis.bigramSurprisal(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    got.keySet shouldBe Set(1L, 2L)
    got(1L)._1 shouldBe 4
    got(2L)._1 shouldBe 2
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: (−ln(3/3) − ln(2/3) − ln(3/3) − ln(2/3)) / 4
    got(1L)._2 shouldBe r6((-math.log(3.0 / 3) - math.log(2.0 / 3)) * 2 / 4)
    // doc 2: (−ln(3/3) − ln(1/3)) / 2
    got(2L)._2 shouldBe r6((-math.log(3.0 / 3) - math.log(1.0 / 3)) / 2)
  }

  test("bigram surprisal: deterministic transitions score zero, not -0.0") {
    // every left context has exactly one continuation → every p̂ = 1
    val docs = Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis.bigramSurprisal(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect()
    got.length shouldBe 2
    got.foreach { r =>
      r._3 shouldBe 0.0
      // the driver's oracle hashes the CSV rendering — IEEE −0.0 would
      // print "-0.0" and mismatch DuckDB's "+ 0.0"-normalized zero
      (1.0 / r._3) should be > 0.0
    }
  }

  test("bigram surprisal separates templated from shuffled text where unigram cannot") {
    // same bag of words per doc; doc 1 repeats one transition pattern,
    // doc 2 permutes it → identical unigram stats, different bigram stats
    val docs = Seq(
      (1L, "a b c a b c a b c a b c"),
      (2L, "a c b b a c c b a c a b")).toDF("doc_id", "text")
    val uni = graft.functions.TextAnalysis.unigramSurprisal(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    uni(1L) shouldBe uni(2L) // blind to order
    val bi = graft.functions.TextAnalysis.bigramSurprisal(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    bi(1L) should be < bi(2L) // template transitions are high-probability
  }

  test("char entropy: zero for single-symbol runs, ln(k) for uniform") {
    val docs = Seq(
      (1L, "aaaa aa"),      // one symbol → entropy 0
      (2L, "abcd"),         // uniform over 4 → ln 4
      (3L, "!!! ???"),      // no [a-z0-9] → no row
      (4L, "aA éé 11")).toDF("doc_id", "text") // case-folds; é not counted
    val got = graft.functions.TextAnalysis.charEntropy(docs, "text", "doc_id")
      .as[(Long, Double)].collect().toMap
    got(1L) shouldBe 0.0
    got(2L) shouldBe BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 4: bins {a:2, 1:2} of t=4 → uniform over 2 symbols → ln 2
    got(4L) shouldBe BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.keySet shouldBe Set(1L, 2L, 4L)
  }

  test("char entropy expression matches the relational formulation on real docs") {
    // the zero-shuffle expression replaced an explode → count → join →
    // agg pipeline (r7 verdict finding); pin value-equality against that
    // formulation on the real test corpus so the rewrite stays honest
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chars = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]"), lit(0)))
        .as("ch"))
    val counts = chars.groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("doc_id")).agg(sum(col("c")).as("t"))
    val old = counts.join(totals, "doc_id").groupBy(col("doc_id"))
      .agg(round(-sum((col("c") / col("t")) * log(col("c") / col("t"))), 6)
        .as("entropy"))
      .as[(Long, Double)].collect().toMap
    val neu = graft.functions.TextAnalysis.charEntropy(docs, "text", "doc_id")
      .as[(Long, Double)].collect().toMap
    neu shouldBe old
  }
}
