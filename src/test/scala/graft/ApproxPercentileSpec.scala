package graft

import org.apache.spark.sql.functions._

/** q16's production twin (q16_percentiles_approx): sketch outputs are
  * engine-specific so the query emits a BOUNDED-ERROR VERDICT — each
  * approx percentile must land inside the exact p49–p51 / p89–p91 band,
  * hashed by the DuckDB oracle as booleans next to the exact band edges.
  * This spec pins the same property independently of the oracle: the
  * verdict columns are true, and the emitted band edges agree with a
  * freshly computed exact percentile (so the query cannot satisfy its
  * oracle by emitting a constant-true column over wrong edges). */
class ApproxPercentileSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("approx percentiles sit inside the exact p49–p51 / p89–p91 bands") {
    val got = SparkEntry.queries("q16_percentiles_approx")(spark, dir)
      .select("o_orderpriority", "p49", "p51", "p89", "p91",
        "median_in_band", "p90_in_band")
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
    val bounds = graft.core.Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.49)"), 2).as("m_lo"),
        round(expr("percentile(o_totalprice, 0.51)"), 2).as("m_hi"),
        round(expr("percentile(o_totalprice, 0.89)"), 2).as("p_lo"),
        round(expr("percentile(o_totalprice, 0.91)"), 2).as("p_hi"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    got.keySet shouldBe bounds.keySet
    bounds.foreach { case (k, (mLo, mHi, pLo, pHi)) =>
      val (p49, p51, p89, p91, medianOk, p90Ok) = got(k)
      withClue(s"group $k emitted band edges: ") {
        (p49, p51, p89, p91) shouldBe ((mLo, mHi, pLo, pHi))
      }
      withClue(s"group $k median verdict: ") { medianOk shouldBe true }
      withClue(s"group $k p90 verdict: ") { p90Ok shouldBe true }
    }
  }
}
