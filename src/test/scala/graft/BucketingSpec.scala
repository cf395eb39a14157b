package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioning both sides of a recurring join on the
  * join key so the join runs co-located — zero shuffles at query time,
  * the storage-level answer to repeated 100 TB fact⋈fact joins. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join with no exchange at all") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))

      // the join itself reads co-located buckets: no shuffle on either
      // side (only the small post-join aggregation exchanges)
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.substring(plan.indexOf("Join"))
      joinSection should not include "Exchange"

      // and it computes the same thing as the unbucketed join
      val expected = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(_.toSeq).toSet
      joined.collect().map(_.toSeq).toSet shouldBe expected
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
