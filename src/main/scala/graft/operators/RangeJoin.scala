package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: all pairs with equal key and
  * |leftTs - rightTs| <= window — another join Spark only offers as a
  * theta join, which degenerates to a per-key cartesian before filtering.
  *
  * Composition: bucket the time axis by `window`. A qualifying pair is
  * never more than one bucket apart, so the left side probes its own and
  * both adjacent buckets (constant 3× blowup of the skinny projection)
  * and the join becomes an EQUI-join on (key, bucket) with an exact
  * range filter after — the standard sub-quadratic interval-join plan.
  * Each right row lives in exactly one bucket and the three probes are
  * distinct, so no pair is emitted twice.
  *
  * At 100 TB: one shuffle on (key, bucket); bucket-level skew mirrors
  * data skew on the hot key/time region and salts the same way.
  */
object RangeJoin {

  /** @param left    (key, ts, ...) — columns preserved with `l_` prefix dropped
    * @param right   (key, ts, ...)
    * @param window  max |leftTs - rightTs| in the ts column's unit
    * @return left columns + right columns (right's renamed with `rightPrefix`) */
  def within(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
             window: Long, rightPrefix: String = "r_"): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    // Integral FLOOR division for the bucket id: double division rounds for
    // ts magnitudes beyond 2^53 (raw long-nanos timestamps get there) and
    // rows would land in the wrong bucket, silently dropping pairs.
    // pmod is non-negative, so (ts - pmod) is an exact multiple of window
    // and `div` (exact long division) yields floor semantics for negatives.
    def bucket(tsName: String): Column =
      expr(s"(`$tsName` - pmod(`$tsName`, ${window}L)) div ${window}L")
    val probes = left
      .withColumn("__b", explode(array(
        bucket(tsCol) - 1, bucket(tsCol), bucket(tsCol) + 1)))
    val bucketed = right
      .select(right.columns.map(c => col(c).as(s"$rightPrefix$c")).toSeq: _*)
      .withColumn("__b", bucket(s"$rightPrefix$tsCol"))
    probes
      .join(bucketed,
        probes("__b") === bucketed("__b") &&
          col(keyCol) === col(s"$rightPrefix$keyCol"))
      .filter(abs(col(tsCol) - col(s"$rightPrefix$tsCol")) <= window)
      .drop("__b")
  }
}
