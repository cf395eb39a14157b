package graft

import org.apache.spark.sql.functions._

import graft.operators.Scd

/** SCD type-2 history: run collapsing, interval contiguity, the
  * colliding-timestamp tie-break, and the plan-shape claim (one hash
  * shuffle on the key reused by both window passes and the aggregate —
  * the property that makes the operator row-parallel at scale). */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def history(rows: Seq[(Long, Long, Long, String)]) =
    Scd.scd2History(rows.toDF("user_id", "event_id", "ts_us", "status"),
      "user_id", "status", "ts_us", "event_id")
      .orderBy(col("user_id"), col("version"))
      .as[(Long, Int, String, Long, Option[Long], Long, Boolean)]
      .collect().toSeq

  test("consecutive same-attr runs collapse; intervals are contiguous; last is current") {
    // user 1: A A B A  — the second A run must NOT merge with the first
    val h = history(Seq(
      (1L, 10L, 100L, "A"), (1L, 11L, 200L, "A"),
      (1L, 12L, 300L, "B"), (1L, 13L, 400L, "A"),
      (2L, 20L, 150L, "X")))
    h.filter(_._1 == 1L) shouldBe Seq(
      (1L, 1, "A", 100L, Some(300L), 2L, false),
      (1L, 2, "B", 300L, Some(400L), 1L, false),
      (1L, 3, "A", 400L, None, 1L, true))
    h.filter(_._1 == 2L) shouldBe Seq((2L, 1, "X", 150L, None, 1L, true))
    // contiguity: each valid_to equals the next version's valid_from
    h.groupBy(_._1).values.foreach { vs =>
      vs.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => a._5 shouldBe Some(b._4)
        case _         =>
      }
    }
  }

  test("colliding timestamps break ties by the ord column deterministically") {
    // same ts_us: event order 30 (A) then 31 (B) — A's run precedes B's
    val h = history(Seq((5L, 30L, 500L, "A"), (5L, 31L, 500L, "B")))
    h shouldBe Seq(
      (5L, 1, "A", 500L, Some(500L), 1L, false),
      (5L, 2, "B", 500L, None, 1L, true))
  }

  test("plan shape: exactly one hash exchange on the key across windows and aggregate") {
    val df = Scd.scd2History(
      (0 until 64).map(i => (i.toLong % 4, i.toLong, i.toLong * 10, s"s${i % 3}"))
        .toDF("user_id", "event_id", "ts_us", "status"),
      "user_id", "status", "ts_us", "event_id")
    df.collect() // materialize so the executed plan is final (AQE)
    // the AQE toString prints the Final AND Initial plans — count only
    // the final one
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    withClue(plan) { exchanges shouldBe 1 }
  }
}
