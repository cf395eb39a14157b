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
}
