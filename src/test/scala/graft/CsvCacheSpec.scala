package graft

import org.apache.spark.sql.functions._

import graft.io.CsvCache

/** S10 cache CRUD + F7 sanitize + W5 seeded-shuffle determinism. */
class CsvCacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-cache-spec").toString + "/cached"

  private def rows(items: (String, String)*) =
    items.toSeq.toDF("Message", "Response")
      .withColumn("Reasoning", lit("why"))
      .withColumn("Used Excerpts", lit(""))
      .withColumn("RAG sources", lit("src"))

  test("append + read round-trips, delete removes by case-insensitive key") {
    val path = freshPath()
    CsvCache.append(rows("Q one" -> "A1", "Q two" -> "A2"), path)
    CsvCache.append(rows("Q three" -> "A3"), path)
    CsvCache.read(spark, path).count() shouldBe 3

    CsvCache.delete(spark, path, "  q TWO ") // trimmed, case-insensitive
    val left = CsvCache.read(spark, path)
      .select("Message").as[String].collect().sorted
    left.toSeq shouldBe Seq("Q one", "Q three")
  }

  test("sanitize fills nulls and drops rows without Message/Response") {
    val dirty = Seq(
      ("keep", "resp", null: String),
      (null: String, "resp", "x"),     // no Message → dropped
      ("msg", "", "y"))                // blank Response → dropped
      .toDF("Message", "Response", "Reasoning")
      .withColumn("Used Excerpts", lit(null: String))
      .withColumn("RAG sources", lit(null: String))
    val clean = CsvCache.sanitize(dirty).collect()
    clean should have length 1
    clean.head.toSeq shouldBe Seq("keep", "resp", "", "", "")
  }

  test("read rejects a cache file with the wrong header") {
    val path = freshPath()
    Seq(("a", "b")).toDF("Wrong", "Header")
      .write.option("header", true).csv(path)
    an[IllegalArgumentException] should be thrownBy CsvCache.read(spark, path)
  }

  test("questions endpoint sorts alphabetically; suggestions are seeded-stable (W4/W5)") {
    val cache = rows("zeta" -> "r1", "alpha" -> "r2", "mid" -> "r3", "beta" -> "r4")
    CsvCache.questions(cache).as[String].collect().toSeq shouldBe
      Seq("alpha", "beta", "mid", "zeta")
    val s1 = CsvCache.suggestQuestions(cache, 3).as[String].collect().toSeq
    val s2 = CsvCache.suggestQuestions(cache, 3).as[String].collect().toSeq
    s1 should have length 3
    s1 shouldBe s2
  }

  test("seeded shuffle-pick-3 is deterministic across executions (W5)") {
    val a = Queries.shufflePick3(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(0)).toSeq
    val b = Queries.shufflePick3(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(0)).toSeq
    a should have length 3
    a shouldBe b
    // and the driver-checked verdict over the pick holds
    val verdict = SparkEntry.queries("rag_shuffle_pick3")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getBoolean(1))).toSeq
    verdict shouldBe Seq((1, true), (2, true), (3, true))
  }
}
