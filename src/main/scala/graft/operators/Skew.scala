package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys at scale.
  *
  * AQE's skew-join splitting covers joins; aggregations over pathological
  * key distributions (a handful of keys holding most rows — event types,
  * boilerplate band keys) still funnel each hot key through one reducer.
  * Salting splits a hot key into `saltFactor` sub-keys for a partial
  * aggregate, then combines the partials — two shuffles, but each is
  * balanced; the classic two-phase plan.
  *
  * Only algebraic aggregates (sum/count/min/max) compose across the two
  * phases; avg is carried as (sum, count).
  */
object Skew {

  /** Deterministic salt in [0, saltFactor): hashes a uniqueness column
    * (row id) rather than rand() so retries/replays land identically. */
  def salt(uniqueCol: Column, saltFactor: Int): Column =
    pmod(hash(uniqueCol), lit(saltFactor))

  /** Two-phase salted count+sum per key: phase 1 groups by (key, salt) —
    * hot keys spread over `saltFactor` reducers — phase 2 combines the
    * at-most-`saltFactor` partials per key. */
  def saltedCountSum(df: DataFrame, keyCol: String, uniqueCol: String,
                     valCol: String, saltFactor: Int = 16): DataFrame =
    df.groupBy(col(keyCol), salt(col(uniqueCol), saltFactor).as("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_val"))
}
