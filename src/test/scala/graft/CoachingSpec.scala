package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.Coaching

/** E1/E2-E5/E11/E12/E13/F6 scalar surfaces (reference script.js:952-961
  * repair chain, data_utils.py:20-54 trigger cascade, prompt assembly
  * generate_personalized_commands.sh:420-431). */
class CoachingSpec extends SparkSpec {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): Row = df.collect().head

  test("repairJson strips code fences and trailing commas") {
    val cases = Seq(
      "```json\n{\"a\": 1,}\n```"        -> "{\"a\": 1}",
      "{\"xs\": [1, 2,], \"b\": \"c\",}" -> "{\"xs\": [1, 2], \"b\": \"c\"}",
      "  {\"clean\": true}  "            -> "{\"clean\": true}",
      "```json{\"k\":\"v\"}```"          -> "{\"k\":\"v\"}")
    val got = cases.map(_._1).toDF("raw")
      .select(Coaching.repairJson(col("raw"))).as[String].collect()
    got.toSeq shouldBe cases.map(_._2)
  }

  test("parseCoaching parses the contract and nulls out garbage") {
    val contract =
      """```json
        |{"suggested_response": "Say X", "sources": [{"document_index": 1,
        |"document_id": "a/b.md", "title": "b.md", "path": "a/",
        |"full_text": "t", "used_excerpt": "e"}], "reasoning": "because",}
        |```""".stripMargin
    val df = Seq(contract, "not json at all").toDF("raw")
      .select(Coaching.parseCoaching(col("raw")).as("p"))
    val rows = df.select(col("p.suggested_response"), col("p.reasoning"),
      element_at(col("p.sources"), 1)("document_id")).collect()
    rows(0).toSeq shouldBe Seq("Say X", "because", "a/b.md")
    // unparseable payload -> null struct, a first-class row state
    rows(1).toSeq shouldBe Seq(null, null, null)
  }

  test("docTitle/docPath split a document path like the reference prompt rule") {
    val cases = Seq(
      ("objection_response_playbooks/pricing_objection_playbook.md",
        "pricing_objection_playbook.md", "objection_response_playbooks/"),
      ("a/b/c.md", "c.md", "a/b/"),
      ("nofolder.md", "nofolder.md", ""))
    val got = cases.map(_._1).toDF("id")
      .select(Coaching.docTitle(col("id")), Coaching.docPath(col("id")))
      .as[(String, String)].collect()
    got.toSeq shouldBe cases.map(c => (c._2, c._3))
  }

  test("trigger cascade: pricing > competitor > implementation > generic > null") {
    val cases = Seq(
      "The price is too high"                  -> "pricing",
      "how do you compare to CompetEx"         -> "competitor",
      "worried about the integration timeline" -> "implementation",
      "we have a problem with this"            -> "generic",
      // pricing wins even when competitor words co-occur (if/elif order)
      "competitor pricing is expensive"        -> "pricing",
      "hello there"                            -> null)
    val got = cases.map(_._1).toDF("msg")
      .select(Coaching.triggerAdviceType(col("msg"))).collect().map(_.getString(0))
    got.toSeq shouldBe cases.map(_._2)
  }

  test("hasTrigger matches any of the 15 keywords, case-insensitive") {
    val got = Seq("BUDGET cuts", "roi question", "nothing here")
      .toDF("msg").select(Coaching.hasTrigger(col("msg"))).as[Boolean].collect()
    got.toSeq shouldBe Seq(true, true, false)
  }

  test("usedExcerpts joins non-empty excerpts with blank lines") {
    val df = spark.sql(
      """SELECT array(
        |  named_struct('used_excerpt', 'first'),
        |  named_struct('used_excerpt', ''),
        |  named_struct('used_excerpt', cast(null as string)),
        |  named_struct('used_excerpt', 'second')) AS sources""".stripMargin)
    one(df.select(Coaching.usedExcerpts(col("sources")))).getString(0) shouldBe
      "first\n\nsecond"
  }

  test("buildCoachingPrompt assembles the reference CONCAT layout") {
    val df = spark.sql(
      """SELECT 'msg' AS m, array(
        |  named_struct('document_id', 'd1.md', 'chunks', 'c1'),
        |  named_struct('document_id', 'd2.md', 'chunks', 'c2'),
        |  named_struct('document_id', 'd3.md', 'chunks', 'c3')) AS rag""".stripMargin)
    one(df.select(Coaching.buildCoachingPrompt(col("m"), col("rag")))).getString(0) shouldBe
      "## PROSPECT MESSAGE: msg\n\n## RAG DOCUMENTS:\n" +
        "Document 1: d1.md\nc1\n\nDocument 2: d2.md\nc2\n\nDocument 3: d3.md\nc3"
  }

  test("buildCoachingPrompt with <3 hits is NULL (Flink out-of-bounds semantics)") {
    // SURVEY.md §7.4 #5: element_at past the end yields NULL, and NULL
    // poisons the concat — same as Flink's 1-based subscript behavior.
    val df = spark.sql(
      "SELECT 'msg' AS m, array(named_struct('document_id', 'only.md', 'chunks', 'c')) AS rag")
    one(df.select(Coaching.buildCoachingPrompt(col("m"), col("rag")))).isNullAt(0) shouldBe true
  }

  test("groundingScore: fully grounded = 1, fabricated tokens lower it, tokenless response is NULL") {
    import spark.implicits._
    val df = Seq(
      ("pricing discount applies", "the pricing discount applies here"),
      ("pricing zzfake discount", "the pricing discount applies here"),
      ("entirely made up words", "unrelated excerpt text"),
      ("???", "anything")) // tokenless response
      .toDF("resp", "exc")
      .select(Coaching.groundingScore(col("resp"), col("exc")).as("g"))
    val g = df.as[Option[Double]].collect().toSeq
    g(0) shouldBe Some(1.0)
    g(1) shouldBe Some(2.0 / 3.0)
    g(2) shouldBe Some(0.0)
    g(3) shouldBe None
  }

  test("groundingScore counts DISTINCT tokens: repetition cannot inflate the score") {
    import spark.implicits._
    val df = Seq(("yes yes yes yes no", "yes")).toDF("resp", "exc")
      .select(Coaching.groundingScore(col("resp"), col("exc")).as("g"))
    df.as[Double].collect().head shouldBe 0.5 // {yes, no} ∩ {yes} = 1 of 2
  }
}
