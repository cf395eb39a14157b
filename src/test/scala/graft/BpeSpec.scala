package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** The distributed BPE trainer: hand-computed merges on a tiny corpus,
  * the overlap case the marker-prefix representation exists for, and
  * the apply-path invariants. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns the hand-computed merges of a tiny corpus") {
    // freqs: "low" ×5, "lower" ×2, "newest" ×6, "widest" ×3  (the
    // Sennrich-style toy). Round 1 pair counts: (e,s)=9, (s,t)=9,
    // (w,e)=8, (l,o)=7, (o,w)=7, ... → argmax ties (e,s)/(s,t) break
    // lexicographically to (e,s). Round 2: (es,t)=9 wins.
    val docs = Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" ")))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", steps = 2)
    merges shouldBe Seq(("e", "s"), ("es", "t"))
  }

  test("a merge pass merges ALL non-overlapping pairs left to right") {
    // 'aaaa' under merge (a,a) must become TWO 'aa' symbols in one
    // pass — the case where a space-separated representation with
    // plain replace merges only alternate pairs (shared boundary
    // separator). This is the law that makes the SQL oracle's
    // `replace` identical to the engine's merge.
    val df = Seq((1L, "aaaa aaa a")).toDF("doc_id", "text")
    val counts = Bpe.withTokenCounts(df, "doc_id", "text",
        Seq(("a", "a")))
      .as[(Long, Long)].collect().toMap
    // aaaa → aa,aa (2); aaa → aa,a (2); a → a (1)
    counts(1L) shouldBe 5L
  }

  test("zero merges counts characters; wordless docs keep a 0 row") {
    val df = Seq((1L, "hello spark"), (2L, "!!! ???"), (3L, null: String))
      .toDF("doc_id", "text")
    val got = Bpe.withTokenCounts(df, "doc_id", "text", Nil)
      .as[(Long, Long)].collect().toMap
    got shouldBe Map(1L -> 10L, 2L -> 0L, 3L -> 0L)
  }

  test("token counts are monotone non-increasing in the merge count") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 50)
    val merges = Bpe.train(docs, "text", steps = 4)
    merges should have length 4
    val byStep = (0 to 4).map { k =>
      Bpe.withTokenCounts(docs, "doc_id", "text", merges.take(k))
        .agg(sum(col("n_bpe"))).as[Long].collect().head
    }
    byStep.sliding(2).foreach { case Seq(a, b) => b should be <= a }
    // every learned merge actually fired somewhere: strict decrease
    byStep.last should be < byStep.head
  }
}
