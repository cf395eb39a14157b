package graft

import org.apache.spark.sql.functions._

/** q16's production twin (q16_percentiles_approx): sketch outputs are
  * engine-specific so the query emits a BOUNDED-ERROR VERDICT — each
  * approx percentile must land inside the exact p49–p51 / p89–p91 band.
  * The DuckDB oracle hashes the verdict booleans (edge values are
  * rounding-boundary-prone across engines — see the query comment); this
  * spec therefore pins the BAND itself independently: it recomputes
  * approx and exact percentiles from the raw table and asserts band
  * membership, then checks the query's verdict columns agree. */
class ApproxPercentileSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("approx percentiles sit inside the exact p49–p51 / p89–p91 bands") {
    val stats = graft.core.Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("am"),
        expr("approx_percentile(o_totalprice, 0.9, 10000)").as("a9"),
        expr("percentile(o_totalprice, 0.49)").as("m_lo"),
        expr("percentile(o_totalprice, 0.51)").as("m_hi"),
        expr("percentile(o_totalprice, 0.89)").as("p_lo"),
        expr("percentile(o_totalprice, 0.91)").as("p_hi"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    stats should not be empty
    stats.foreach { case (k, (am, a9, mLo, mHi, pLo, pHi)) =>
      withClue(s"group $k median=$am band=[$mLo,$mHi]: ") {
        am should (be >= mLo and be <= mHi)
      }
      withClue(s"group $k p90=$a9 band=[$pLo,$pHi]: ") {
        a9 should (be >= pLo and be <= pHi)
      }
    }
    // and the query-level verdict columns state exactly that
    val got = SparkEntry.queries("q16_percentiles_approx")(spark, dir)
      .select("o_orderpriority", "median_in_band", "p90_in_band")
      .collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    got.keySet shouldBe stats.keySet
    got.values.foreach(_ shouldBe ((true, true)))
  }
}
