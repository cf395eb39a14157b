package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for every left row, the most recent right row with
  * `rightTs <= leftTs`, matched within a key — the time-series join Spark
  * has no built-in for (DuckDB: ASOF JOIN, which is the oracle).
  *
  * Implementation is the union-and-carry composition, preference (a) of
  * the custom-operator ladder — no custom physical node needed:
  * tag both sides, union them, and within each key carry the latest
  * right-side payload forward over a (ts, side) ordering; left rows then
  * read the carried payload. ONE shuffle (the per-key window sort), no
  * join node at all, no row multiplication — compare the naive
  * theta-join formulation (left ⋈ right on key AND rightTs <= leftTs,
  * then a max-per-left-row reduction), which explodes quadratically per
  * key before reducing.
  *
  * Right rows sort before left rows on ts ties (side tag 0 < 1), so a
  * right row at exactly leftTs matches — ASOF JOIN's <= semantics.
  *
  * At 100 TB: hash-partitioned by key, per-key sorted once; skewed keys
  * are the risk, and the standard mitigation (range-bucket the time axis
  * per key upstream) composes with this same shape.
  */
object AsOfJoin {

  /** @param left    rows to annotate; columns preserved
    * @param right   lookup side: (key, ts, payload columns)
    * @param keyCol  equi-key on both sides
    * @param tsCol   event-time column name on both sides
    * @param payloadCols right-side columns carried onto matching left rows
    *                    (null when no right row precedes the left row) */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Payload rides as ONE struct column so every carried value comes from
    // the same matched right row — per-column last(ignoreNulls) would mix
    // rows whenever a right row holds a NULL in one payload column.
    val payloadType = StructType(payloadCols.map(c => right.schema(c)))
    val l = left.select(
      Seq(col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(payloadType).as("__p"): _*)
    val r = right.select(
      Seq(col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payloadCols.map(col): _*).as("__p"): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }
}
