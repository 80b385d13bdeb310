package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events schema. The reference's
  * "streaming" is bounded out-of-core chunk pipelining (SURVEY.md §2.9);
  * true event-time streaming is the north-star extension: the same
  * transforms run on `readStream` sources with watermarks. Each function
  * takes the (possibly streaming) DataFrame so tests can inject
  * MemoryStream and production can use file/kafka sources.
  */
object EventStreams {

  /** Tumbling 1-hour event-time windows per event type, 2h watermark for
    * late data. Works identically on batch and streaming frames.
    */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"),
        approx_count_distinct(col("user_id")).as("approx_users"),
      )

  /** Sliding windows: 1-hour window every 15 minutes. */
  def slidingValue(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

  case class Event(user_id: Long, ts_us: Long, event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, total: Double)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long, total_value: Double)

  /** Custom stateful sessionization via mapGroupsWithState: a session closes
    * after 30 min of inactivity (processing-time timeout on the stream).
    * Emits closed sessions.
    */
  def sessionize(events: Dataset[Event], gapUs: Long = 30L * 60 * 1000 * 1000): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout,
      ) { (user: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
        // sort this micro-batch's events; fold into the open session
        val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_type))
        var open: Option[SessionState] = state.getOption.flatMap(_.headOption)
        val closed = Seq.newBuilder[Session]
        sorted.foreach { e =>
          open match {
            case Some(s) if e.ts_us - s.last > gapUs =>
              closed += Session(user, s.start, s.last, s.n, s.total)
              open = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
            case Some(s) =>
              open = Some(SessionState(s.start, e.ts_us, s.n + 1, s.total + e.value))
            case None =>
              open = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
          }
        }
        state.update(open.toList)
        closed.result().iterator
      }
  }
}
