package graft

import org.apache.spark.sql.functions._

import graft.operators.Lexical

/** BM25 + RRF hybrid fusion: hand-computed scores, rank semantics,
  * and the inverted-index plan shape (no pairwise document scan). */
class LexicalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (10L, "spark shuffles data across the cluster"),
    (11L, "spark spark spark tuning guide"),
    (12L, "a completely unrelated cooking recipe"),
    (13L, "cluster management and shuffle tuning")).toDF("doc_id", "text")

  test("bm25 matches the hand-computed Okapi formula") {
    val q = Seq((1L, "spark shuffle")).toDF("doc_id", "text")
    val rows = Lexical.bm25TopK(q, corpus, k = 4)
      .select("nid", "score").as[(Long, Double)].collect().toMap

    // hand computation (k1=1.2, b=0.75, N=4, Lucene idf):
    def idf(df: Int): Double = math.log(1.0 + (4 - df + 0.5) / (df + 0.5))
    val dls = Map(10L -> 6.0, 11L -> 5.0, 12L -> 5.0, 13L -> 5.0)
    val avgdl = 21.0 / 4.0
    def w(tf: Int, dl: Double): Double =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // "spark" df=2; "shuffle" appears in 13 only (10 has "shuffles") df=1
    rows(11L) shouldBe r6(idf(2) * w(3, dls(11L))) +- 1e-9
    rows(13L) shouldBe r6(idf(1) * w(1, dls(13L))) +- 1e-9
    rows(10L) shouldBe r6(idf(2) * w(1, dls(10L))) +- 1e-9
    rows should not contain key(12L) // no shared term → never scored
  }

  test("bm25 plan: inverted-index equi-join, no pairwise document scan") {
    val q = Seq((1L, "spark shuffle")).toDF("doc_id", "text")
    val plan = Lexical.bm25TopK(q, corpus, k = 3)
      .queryExecution.executedPlan.toString
    // the query-term match must be an equi-join on term — a nested-loop
    // cartesian over (queries × corpus docs) is the anti-pattern this
    // operator exists to avoid. The ONE nested-loop join allowed is the
    // documented 1-row corpus-stats broadcast.
    plan should not include "CartesianProduct"
    "BroadcastNestedLoopJoin".r.findAllIn(plan).size shouldBe 1
    // postings and query terms meet keyed on term
    plan should include("hashpartitioning(term")
  }

  test("duplicate corpus rows with one id do not inflate tf/dl/N") {
    val q = Seq((1L, "spark shuffle")).toDF("doc_id", "text")
    val clean = Lexical.bm25TopK(q, corpus, k = 4)
      .select("nid", "score").as[(Long, Double)].collect().toMap
    // a replayed append: every corpus row appears twice
    val doubled = Lexical.bm25TopK(q, corpus.union(corpus), k = 4)
      .select("nid", "score").as[(Long, Double)].collect().toMap
    doubled shouldBe clean
  }

  test("rrf fusion: both-lists docs beat single-list docs at equal ranks; ties break on nid") {
    val dense = Seq((1L, 100L, 1), (1L, 101L, 2), (1L, 102L, 3))
      .toDF("qid", "nid", "rank")
    val sparse = Seq((1L, 101L, 1), (1L, 103L, 3))
      .toDF("qid", "nid", "rank")
    val fused = Lexical.rrfFuseTopK(dense, sparse, k = 4)
      .orderBy("rank").as[(Long, Long, Int, Double)].collect().toSeq
    // 101 is in both lists (1/62 + 1/61) — must outrank every
    // single-list doc including dense rank 1
    fused.head._2 shouldBe 101L
    fused.head._4 shouldBe
      BigDecimal(1.0 / 62 + 1.0 / 61).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    // dense-only rank 1 (1/61) next; dense rank 3 and sparse rank 3 tie
    // at 1/63 → smaller nid (102) first
    fused.map(_._2) shouldBe Seq(101L, 100L, 102L, 103L)
  }

  test("rrf is rank-based: score scales never matter") {
    // same ranks, wildly different hypothetical scores — fusion ignores
    // them by construction (only rank columns are read)
    val dense = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("qid", "nid", "rank")
    val sparse = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("qid", "nid", "rank")
    val fused = Lexical.rrfFuseTopK(dense, sparse, k = 3)
      .orderBy("rank").select("nid").as[Long].collect().toSeq
    fused shouldBe Seq(11L, 10L, 12L) // both-lists doc first; then rank-1s
  }
}
