package graft

import graft.operators.AsOfJoin

/** As-of join semantics on hand-built fixtures. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches the latest right row at-or-before each left row, per key") {
    val left = Seq(
      ("u1", 100L, "p1"),   // after r@50 and r@100 → ties match (<=) → r@100
      ("u1", 60L, "p2"),    // between r@50 and r@100 → r@50
      ("u1", 10L, "p3"),    // before any right row → null
      ("u2", 500L, "p4"))   // different key: only u2's rights considered
      .toDF("k", "ts", "left_id")
    val right = Seq(
      ("u1", 50L, "r50"), ("u1", 100L, "r100"),
      ("u2", 499L, "r499"), ("u1", 499L, "rOtherKey"))
      .toDF("k", "ts", "rval")

    val got = AsOfJoin.asOf(left, right, "k", "ts", Seq("rval"))
      .select("left_id", "rval").as[(String, String)].collect().toMap
    got shouldBe Map(
      "p1" -> "r100",  // exact-tie matches (<= semantics)
      "p2" -> "r50",
      "p3" -> null,
      "p4" -> "r499")  // u1's rval@499 invisible across keys
  }

  test("NULL in one payload column never mixes values across right rows") {
    // r@50 has (a=A1, b=NULL); r@80 has (a=NULL, b=B2). A per-column
    // ignoreNulls carry would hand the left row the chimera (A1, B2);
    // row semantics require both payload values from the matched row r@80.
    val left = Seq(("k", 100L, "probe")).toDF("k", "ts", "left_id")
    val right = Seq(
      ("k", 50L, Some("A1"), Option.empty[String]),
      ("k", 80L, Option.empty[String], Some("B2")))
      .toDF("k", "ts", "a", "b")
    val got = AsOfJoin.asOf(left, right, "k", "ts", Seq("a", "b"))
      .select("a", "b").as[(Option[String], Option[String])].collect().head
    got shouldBe ((None, Some("B2")))
  }

  test("left row set and columns are preserved exactly (no multiplication)") {
    val left = Seq(("k", 10L, "a", 1.5), ("k", 20L, "b", 2.5))
      .toDF("k", "ts", "name", "score")
    val right = Seq(("k", 5L, "x"), ("k", 6L, "y"), ("k", 7L, "z"))
      .toDF("k", "ts", "rv")
    val out = AsOfJoin.asOf(left, right, "k", "ts", Seq("rv"))
    out.count() shouldBe 2 // three candidate rights never multiply rows
    out.columns.toSeq shouldBe Seq("k", "ts", "name", "score", "rv")
    out.filter($"name" === "a").select("rv").as[String].head() shouldBe "z"
  }
}
