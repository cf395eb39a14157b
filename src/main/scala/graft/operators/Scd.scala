package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history from an event log: per
  * key, collapse consecutive runs of the same attribute value into
  * validity intervals [valid_from, valid_to) with a version number and
  * an is_current flag — the classic Kimball warehouse shape, and what
  * a training-data pipeline needs to snapshot "what was this entity's
  * state at crawl time" without storing per-event copies.
  *
  * Algorithm: gaps-and-islands — rn(key) − rn(key, attr) is constant
  * exactly within a run of equal attr values, so grouping on it
  * collapses runs; lead(valid_from) closes each interval.
  *
  * Distributed shape: every window and the aggregate are keyed by
  * `keyCol` — ONE hash shuffle on the key that Catalyst reuses across
  * both window passes and the groupBy (pinned in Scd2Spec); per-key
  * state is bounded by that key's event count, and keys are
  * independent, so the plan is row-parallel at 100 TB. No global
  * window, no cross join, no driver collect. */
object Scd {

  /** @param ordCol tie-break within equal `tsCol` values (e.g. an event
    *   id) — REQUIRED for a deterministic history when timestamps
    *   collide; ties broken by ascending `ordCol`.
    * @return one row per (key, run): keyCol, version (1-based by
    *   valid_from), the attr value, valid_from/valid_to (same type as
    *   tsCol; valid_to null on the current row), n_events in the run,
    *   is_current. */
  def scd2History(df: DataFrame, keyCol: String, attrCol: String,
                  tsCol: String, ordCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(ordCol))
    val byKeyAttr = Window.partitionBy(col(keyCol), col(attrCol))
      .orderBy(col(tsCol), col(ordCol))
    val runs = df
      // byKey FIRST (inner Window): its hash(key) exchange satisfies the
      // (key, attr) window's clustering (subset rule) and the downstream
      // aggregate + version window — ONE shuffle total (Scd2Spec pin).
      // A combined two-window projection leaves the order — and with it
      // a second exchange — to planner whim.
      .withColumn("__rn_key", row_number().over(byKey))
      .withColumn("__rn_run", row_number().over(byKeyAttr))
      .withColumn("__grp", col("__rn_key") - col("__rn_run"))
      .drop("__rn_key", "__rn_run")
      .groupBy(col(keyCol), col(attrCol), col("__grp"))
      .agg(min(col(tsCol)).as("valid_from"),
        // two runs of one key CAN share a valid_from (colliding raw
        // timestamps) — the run's min ordCol keeps version/lead
        // deterministic in that tie
        min(col(ordCol)).as("__o"),
        count(lit(1)).as("n_events"))
      .drop("__grp")
    val byFrom = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from"), col("__o"))
    runs
      .withColumn("version", row_number().over(byFrom))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("version"), col(attrCol),
        col("valid_from"), col("valid_to"), col("n_events"),
        col("is_current"))
  }
}
