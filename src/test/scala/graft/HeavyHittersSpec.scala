package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Exact heavy hitters via per-partition Misra–Gries candidates: the
  * result must equal the brute-force frequency query on ANY input — the
  * sketch only bounds the candidate set, never the answer. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: plain groupBy + relative-threshold filter. */
  private def bruteForce(toks: Seq[String], denom: Long): Seq[(String, Long)] =
    toks.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .filter { case (_, c) => c * denom >= toks.length }
      .sortBy { case (t, c) => (-c, t) }

  private def run(toks: Seq[String], denom: Long, m: Int,
                  parts: Int): Seq[(String, Long)] =
    HeavyHitters.frequentTokens(
        toks.toDF("tok").repartition(parts), denom, m)
      .as[(String, Long)].collect().toSeq

  test("equals the brute-force frequency query on skewed data") {
    // zipf-ish: token i appears ~1000/i times; long tail of singletons
    val toks = (1 to 40).flatMap(i => Seq.fill(1000 / i)(s"t$i")) ++
      (0 until 3000).map(i => s"rare$i")
    val got = run(toks, denom = 100, m = 512, parts = 7)
    got shouldBe bruteForce(toks, 100)
    got.nonEmpty shouldBe true
  }

  test("tight capacity (m just above denom) still misses nothing — the decrement path runs") {
    // cap = denom forces constant MG evictions from the 5000-token tail
    val toks = Seq.fill(400)("hot") ++ Seq.fill(120)("warm") ++
      (0 until 5000).map(i => s"cold$i")
    val got = run(toks, denom = 20, m = 20, parts = 5)
    got shouldBe bruteForce(toks, 20)
    got.map(_._1) should contain("hot")
  }

  test("capacity at or below denom-1 is rejected — silent false negatives are not a mode") {
    val e = intercept[IllegalArgumentException] {
      run(Seq("a", "b"), denom = 100, m = 50, parts = 1)
    }
    e.getMessage should include("no-false-negative")
  }

  test("ties in count order deterministically by token") {
    // total 14: a,b at 5 (tie → token order), z at 4 (4·4 = 16 ≥ 14)
    val toks = Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(4)("z")
    run(toks, denom = 4, m = 16, parts = 3) shouldBe
      Seq(("a", 5L), ("b", 5L), ("z", 4L))
  }

  test("phase-2 plan: candidate filter is a broadcast semi-join; the token stream itself is never hash-shuffled") {
    val toks = (0 until 1000).map(i => s"t${i % 7}").toDF("tok")
    val plan = HeavyHitters.frequentTokens(toks, denom = 100, m = 512)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should include("LeftSemi")
    // the only tok-keyed hash exchange is the post-semi-join exact
    // aggregate over the bounded candidate sliver — the raw token
    // stream reaches the join partition-local
    "Exchange hashpartitioning\\(tok".r.findAllIn(plan).size should be <= 1
  }
}

/** Regression coverage for review findings: null tokens and the
  * single-materialization contract. */
class HeavyHittersEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("null tokens neither count into the total nor corrupt the marker rows") {
    // 10 'hot' + 5 nulls: with nulls wrongly counted (or their -1
    // candidate sentinel summed into N) the threshold denominator
    // shifts; correct N is 12 (nulls are not tokens)
    val toks = (Seq.fill(10)(Some("hot")) ++ Seq.fill(5)(Option.empty[String]) ++
      Seq(Some("a"), Some("b"))).toDF("tok").repartition(3)
    val got = graft.operators.HeavyHitters.frequentTokens(toks, denom = 2, m = 8)
      .as[(String, Long)].collect().toSeq
    // threshold: cnt*2 >= 12 → only 'hot' (10)
    got shouldBe Seq(("hot", 10L))
  }
}
