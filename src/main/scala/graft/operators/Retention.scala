package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort-retention analysis: users grouped by the period of their first
  * event (the cohort), counted in each later period they were active —
  * the triangle behind every retention curve.
  *
  * Periods are fixed-width epoch buckets (`periodNs`), not calendar
  * weeks: epoch division is origin-free and engine-portable (calendar
  * weeks differ on week-start conventions), and at 100 TB the bucketing
  * is a pure projection. The cohort assignment is a min-over-user window
  * — the same single-shuffle discipline as Funnel/ev_sessions: events
  * shuffle once on user_id; the (cohort, offset) rollup then aggregates
  * distinct users, which is already bounded by |users|·|periods|.
  *
  * State bound (same contract as [[Funnel]], RetentionSpec pins the
  * plan): the cohort window computes ONE column (min period) per user —
  * no per-user event history. `WindowExec`'s per-partition buffer is
  * spillable, so user skew degrades to disk spill in one task; the
  * downstream `distinct` dedups to ≤ |periods| rows per user before the
  * rollup, so nothing after the window sees raw event volume.
  */
object Retention {

  /** One row per (cohort period, offset): how many of the cohort's users
    * were active `offset` periods after their first event. Offset 0 is
    * the cohort size itself.
    */
  def cohortRetention(
      events: DataFrame,
      periodNs: Long,
      tsCol: String = "ts_ns",
      userCol: String = "user_id",
  ): DataFrame = {
    require(periodNs >= 1, s"periodNs must be >= 1, got $periodNs")
    val w = Window.partitionBy(col(userCol))
    events
      // integral FLOOR division, not `/` and not bare `div`: epoch-nanos
      // exceed double's 53-bit mantissa (float division would misbucket
      // boundary events), and Spark's `div` truncates toward zero while
      // SQL floor-division (`//` in the DuckDB oracle) floors — the two
      // diverge exactly on negative inputs (pre-1970 timestamps). The
      // remainder correction is free for ts >= 0 and makes the bucketing
      // origin-correct for all inputs. periodNs >= 1, so `%`'s sign
      // follows the dividend: correction fires iff ts < 0 off-boundary.
      .select(col(userCol),
        expr(s"($tsCol div $periodNs) - cast(($tsCol % $periodNs) < 0 as bigint)")
          .as("period"))
      .withColumn("cohort", min(col("period")).over(w))
      .select(col(userCol), col("cohort"), (col("period") - col("cohort")).as("offset"))
      .distinct()
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"), col("offset"))
  }
}
