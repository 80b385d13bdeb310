package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-resistant sessionization.
  *
  * The one-shot form (queries/EventQueries `ev_sessions`) is a single
  * shuffle on user_id — the right plan until one power user's event
  * history exceeds a task. This two-phase form bounds per-task skew:
  *
  *  - phase 1 sessionizes within (user_id, time bucket): a heavy hitter's
  *    events split across buckets, so no task sees more than one bucket
  *    of one user; the output is local SESSIONS (orders of magnitude
  *    smaller than events for any realistic gap);
  *  - phase 2 merges local sessions whose boundary gap is within the
  *    session gap — a user_id window over sessions, not events.
  *
  * Exactness: a true session spanning buckets is split into per-bucket
  * pieces whose adjacent boundary gaps are inter-event gaps <= gap, so
  * phase 2 re-joins exactly the pieces of true sessions and nothing else
  * (holds for ANY bucketNs; bucketNs only tunes the skew bound).
  * Output schema and numbering are identical to `ev_sessions`
  * (verified in SessionizeTwoPhaseSpec and by sharing its oracle SQL).
  */
object Sessionize {

  /** Events must carry user_id, ts_ns (long), event_id, value. Returns
    * (user_id, session_id, n_events, start_s, sess_value) — the
    * ev_sessions contract (sess_value via exact cents, see
    * graft.queries.Fx).
    */
  def twoPhase(
      events: DataFrame,
      gapNs: Long,
      bucketNs: Long,
  ): DataFrame = {
    require(bucketNs > 0 && gapNs > 0, "gapNs and bucketNs must be positive")
    val byUserBucket = Window.partitionBy(col("user_id"), col("bucket"))
      .orderBy(col("ts_ns"), col("event_id"))
    val runs = Window.unboundedPreceding
    val local = events
      .withColumn("bucket", expr(s"ts_ns div ${bucketNs}L"))
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(byUserBucket))
      .withColumn(
        "new_local",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > gapNs, 1L).otherwise(0L))
      .withColumn("lsid",
        sum(col("new_local")).over(byUserBucket.rowsBetween(runs, Window.currentRow)))
      .groupBy(col("user_id"), col("bucket"), col("lsid"))
      .agg(
        count(lit(1)).as("n"),
        min(col("ts_ns")).as("start_ns"),
        max(col("ts_ns")).as("end_ns"),
        sum(round(col("value") * 100).cast("bigint")).as("value_c"),
      )
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("start_ns"))
    local
      .withColumn("prev_end", lag(col("end_ns"), 1).over(byUser))
      .withColumn(
        "new_sess",
        when(col("prev_end").isNull || col("start_ns") - col("prev_end") > gapNs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(byUser.rowsBetween(runs, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        sum(col("n")).as("n_events"),
        expr("min(start_ns) div 1000000000").as("start_s"),
        (sum(col("value_c")) / 100.0).as("sess_value"),
      )
      .orderBy(col("user_id"), col("session_id"))
  }
}
