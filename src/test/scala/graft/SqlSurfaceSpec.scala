package graft

import graft.providers.{ConnectionRegistry, ConnectionSpec, ModelRegistry, ModelSpec}

/** The SQL-facing surface: injected native functions (GraftExtensions),
  * registered UDFs, and the model/connection catalogs (M5/M6). */
class SqlSurfaceSpec extends SparkSpec {

  test("vector_cosine and vector_dot are callable from SQL, codegen'd") {
    val row = spark.sql(
      """SELECT vector_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c,
        |       vector_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d,
        |       vector_cosine(array(0.0f, 0.0f), array(1.0f, 0.0f)) AS z
        |""".stripMargin).collect().head
    row.getDouble(0) shouldBe 1.0 +- 1e-12
    row.getDouble(1) shouldBe 11.0
    row.isNullAt(2) shouldBe true // zero norm → NULL, not an ANSI error
  }

  test("split_text is callable from SQL with the full 8-arg reference call") {
    // the exact reference invocation shape
    // (generate_personalized_commands.sh:322-326)
    val chunks = spark.sql(
      "SELECT split_text('alpha###beta', 200, 20, '###', false, false, true, 'START') AS c")
      .collect().head.getSeq[String](0)
    chunks shouldBe Seq("alpha beta")
    // keep_separator + END attaches each separator to the preceding piece
    val kept = spark.sql(
      "SELECT split_text('alpha###beta', 6, 0, '###', false, true, true, 'END') AS c")
      .collect().head.getSeq[String](0)
    kept shouldBe Seq("alpha#", "##", "beta")
  }

  test("split_text_gen is a native SQL table function (LATERAL VIEW)") {
    // same chunks as the array UDF, emitted as generator rows — the SQL
    // spelling of the reference's CROSS JOIN UNNEST(ML_CHARACTER_TEXT_
    // SPLITTER(...)) without materializing the array
    val viaUdf = spark.sql(
      "SELECT split_text('alpha###beta', 6, 0, '###', false, false, true, 'START') AS c")
      .collect().head.getSeq[String](0)
    val viaGen = spark.sql(
      """SELECT chunk_idx, chunk
        |FROM (SELECT 'alpha###beta' AS text)
        |LATERAL VIEW split_text_gen(text, 6, 0, '###') s AS chunk_idx, chunk
        |""".stripMargin).collect()
    viaGen.map(_.getString(1)).toSeq shouldBe viaUdf
    viaGen.map(_.getInt(0)).toSeq shouldBe viaUdf.indices
    // defaulted trailing args work too
    spark.sql(
      """SELECT chunk FROM (SELECT 'one two' AS text)
        |LATERAL VIEW split_text_gen(text) s AS chunk_idx, chunk
        |""".stripMargin).collect().map(_.getString(0)).toSeq shouldBe Seq("one two")
    // non-literal config args are rejected loudly, not silently misread
    val e = intercept[Exception] {
      spark.sql(
        """SELECT chunk FROM (SELECT 'x' AS text, 5 AS n)
          |LATERAL VIEW split_text_gen(text, n) s AS chunk_idx, chunk
          |""".stripMargin).collect()
    }
    e.getMessage should include("literal")
  }

  test("minhash_band_keys is callable from SQL") {
    val keys = spark.sql(
      "SELECT minhash_band_keys('a b c d e f', 3, 4, 3) AS k")
      .collect().head.getSeq[String](0)
    keys should have length 4
  }

  test("model and connection registries resolve by name (M5/M6)") {
    ModelRegistry.registerReferenceModels()
    ModelRegistry.get("openaiembed").task shouldBe "embedding"
    ModelRegistry.get("coaching_response_generator").systemPrompt should
      include("sales coach")
    an[RuntimeException] should be thrownBy ModelRegistry.get("nope")

    ConnectionRegistry.register(ConnectionSpec("c1", "azureopenai", "https://x"))
    ConnectionRegistry.get("c1").endpoint shouldBe "https://x"
    an[RuntimeException] should be thrownBy ConnectionRegistry.get("missing")
  }
}
