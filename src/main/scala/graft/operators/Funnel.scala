package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: per user, the earliest time each step was
  * completed STRICTLY AFTER the previous step (a click before the first
  * view does not advance the funnel; the classic product-analytics
  * semantics).
  *
  * Shape at scale: all steps evaluate as min-over-user window expressions
  * on ONE `partitionBy(user)` — a single shuffle of the events regardless
  * of step count or event volume, with the final per-user rollup reusing
  * the same partitioning (no second exchange; FunnelSpec pins the plan).
  *
  * State bound: the COMPUTED state is O(steps) columns per row — the
  * windows are unordered full-partition mins, never a per-user event
  * history the funnel logic itself retains. Physically, Spark's
  * `WindowExec` streams each user's rows through a spillable buffer
  * (`ExternalAppendOnlyUnsafeRowArray`), so a pathological mega-user
  * degrades to disk spill inside one task, not an OOM; if one user owns
  * a double-digit share of ALL events, the two-phase bucketed rewrite
  * (the [[Sessionize.twoPhase]] pattern: per-(user, time-bucket) step
  * mins, then a tiny per-user merge) applies unchanged, because min is
  * associative.
  */
object Funnel {

  /** One row per user: `t_1 … t_n` (epoch time of each step's first
    * qualifying completion, null when the funnel stalled before it) and
    * `reached_stage` (number of consecutive steps completed).
    *
    * `tsCol` must be a totally-ordered numeric/timestamp column; step
    * comparisons are strict (`>`), so simultaneous events cannot satisfy
    * two consecutive steps.
    */
  def userStages(
      events: DataFrame,
      steps: Seq[String],
      tsCol: String = "ts_ns",
      userCol: String = "user_id",
      typeCol: String = "event_type",
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(userCol))
    var df = events.select(col(userCol), col(typeCol), col(tsCol).as("t"))
    steps.zipWithIndex.foreach { case (step, i) =>
      val qualifies =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col("t") > col(s"t_$i")
      df = df.withColumn(s"t_${i + 1}", min(when(qualifies, col("t"))).over(w))
    }
    val stageCols = steps.indices.map(i => col(s"t_${i + 1}"))
    // step i can only qualify after step i-1 did, so the non-null step
    // times are a prefix — reached_stage is just their count
    val reached = stageCols
      .map(c => when(c.isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    df.groupBy(col(userCol))
      .agg(min(stageCols.head).as("t_1"), stageCols.tail.zipWithIndex.map {
        case (c, i) => min(c).as(s"t_${i + 2}")
      }: _*)
      .withColumn("reached_stage", reached)
  }
}
