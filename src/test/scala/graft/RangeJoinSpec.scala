package graft

import graft.operators.RangeJoin

/** Interval-join semantics: boundary inclusion, bucket-crossing pairs,
  * no duplicate emission, key isolation. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("emits exactly the in-window pairs, across bucket boundaries, once each") {
    val left = Seq(("k1", 100L, "L1"), ("k1", 1000L, "L2"), ("k2", 100L, "L3"))
      .toDF("k", "ts", "lid")
    val right = Seq(
      ("k1", 150L, "R-in"),        // within 100±100? |100-150|=50 ✓ for L1
      ("k1", 199L, "R-edge"),      // |100-199|=99 ✓
      ("k1", 200L, "R-boundary"),  // exactly window=100 → inclusive ✓
      ("k1", 201L, "R-out"),       // 101 → excluded
      ("k1", 950L, "R-prevbucket"),// pairs with L2 across a bucket edge
      ("k2", 120L, "R-otherkey"))
      .toDF("k", "ts", "rid")

    val got = RangeJoin.within(left, right, "k", "ts", window = 100L)
      .select("lid", "r_rid").as[(String, String)].collect()
    got.length shouldBe got.distinct.length // 3-probe never double-emits
    got.toSet shouldBe Set(
      ("L1", "R-in"), ("L1", "R-edge"), ("L1", "R-boundary"),
      ("L2", "R-prevbucket"),
      ("L3", "R-otherkey"))
  }

  test("timestamps beyond 2^53 bucket exactly (no double rounding)") {
    // raw long-nanos magnitudes: double division rounds above 2^53 and
    // can misplace rows by one bucket, silently dropping qualifying
    // pairs; integral floor-div buckets must keep them.
    val base = (1L << 60) + 12345L // ≈ 1.15e18, far past 2^53
    val left = Seq(("k", base)).toDF("k", "ts")
    val right = Seq(
      ("k", base + 999L),   // inside the window
      ("k", base - 1000L),  // exactly on the boundary (|Δ| = window)
      ("k", base + 1001L))  // just outside
      .toDF("k", "ts")
    val got = RangeJoin.within(left, right, "k", "ts", window = 1000L)
      .select("r_ts").as[Long].collect().sorted
    got.toSeq shouldBe Seq(base - 1000L, base + 999L)
  }

  test("rejects a non-positive window") {
    val df = Seq(("k", 1L)).toDF("k", "ts")
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.within(df, df, "k", "ts", 0L)
  }
}
