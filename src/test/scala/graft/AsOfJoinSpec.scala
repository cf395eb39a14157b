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
