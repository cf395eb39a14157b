package graft

import org.apache.spark.sql.functions._

/** q16's production twin (q16_percentiles_approx): sketch outputs are
  * engine-specific so no DuckDB hash oracle is possible — instead pin the
  * accuracy property itself: each approx percentile must land inside a
  * tight band of exact percentiles around its target rank. */
class ApproxPercentileSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("approx percentiles sit inside the exact p49–p51 / p89–p91 bands") {
    val approx = SparkEntry.queries("q16_percentiles_approx")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val bounds = graft.core.Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.49)").as("m_lo"),
        expr("percentile(o_totalprice, 0.51)").as("m_hi"),
        expr("percentile(o_totalprice, 0.89)").as("p_lo"),
        expr("percentile(o_totalprice, 0.91)").as("p_hi"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    approx.keySet shouldBe bounds.keySet
    bounds.foreach { case (k, (mLo, mHi, pLo, pHi)) =>
      val (m, p) = approx(k)
      withClue(s"group $k median=$m band=[$mLo,$mHi]: ") {
        m should (be >= mLo - 0.01 and be <= mHi + 0.01)
      }
      withClue(s"group $k p90=$p band=[$pLo,$pHi]: ") {
        p should (be >= pLo - 0.01 and be <= pHi + 0.01)
      }
    }
  }
}
