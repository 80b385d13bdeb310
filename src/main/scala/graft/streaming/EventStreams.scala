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
        // exact cents twin of total_value: order-independent int64 sum so
        // batch replays hash-match the oracle (graft.queries.Fx rationale);
        // streaming-legal (plain sum over a per-row projection).
        sum(round(col("value") * 100).cast("bigint")).as("value_c"),
        approx_count_distinct(col("user_id")).as("approx_users"),
      )

  /** Sliding windows: 1-hour window every 15 minutes. `value_c` is the
    * exact cents twin of total_value (see hourlyByType).
    */
  def slidingValue(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"),
        sum(round(col("value") * 100).cast("bigint")).as("value_c"),
      )

  /** STREAM-STATIC enrichment — the dimension-join shape: each event
    * enriched with its user's segment from a static (batch) dimension
    * table, then rolled up per (hour window, segment). The static side
    * is broadcast and STATELESS in streaming execution — no join state
    * accumulates however long the stream runs, and Spark re-plans the
    * static side per micro-batch, so a refreshed dimension snapshot is
    * picked up without restarting the query. `value_c` is the exact
    * cents twin (see [[hourlyByType]]). Works identically on batch
    * frames for oracle parity.
    */
  def enrichedHourlyBySegment(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .join(broadcast(dim), Seq("user_id"))
      .groupBy(window(col("ts"), "1 hour"), col("segment"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("bigint")).as("value_c"),
      )

  /** Stream-stream INTERVAL join — the attribution shape: each purchase
    * matched to the same user's views within the preceding
    * `attribution` interval. Both sides carry watermarks and the join
    * condition bounds event-time distance, so Spark can expire join
    * state (views older than watermark + interval are dropped) — the
    * state-bounded formulation required for an unbounded 100 TB/day
    * stream. Inner matches emit as soon as both sides arrive; no
    * watermark wait. Works identically on batch frames (where it is a
    * plain interval join — see the `ev_view_attribution` gate query).
    */
  def attributedPurchases(events: DataFrame, attribution: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
      .withWatermark("v_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(
      views,
      col("user_id") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") > col("p_ts") - expr(s"INTERVAL $attribution"),
      "inner")
      .select(col("user_id"), col("p_id"), col("p_ts"), col("view_id"), col("v_ts"))
  }

  /** Exactly-once view of an at-least-once stream: events re-delivered
    * with the same `event_id` within the watermark horizon are dropped.
    * `dropDuplicatesWithinWatermark` is the state-bounded form — each key
    * is remembered only until the watermark passes its event time, so
    * state stays proportional to the horizon, not the stream's lifetime
    * (plain `dropDuplicates` on a stream retains every key forever —
    * unusable on an unbounded 100 TB/day feed). Spark rejects the
    * within-watermark form on batch frames, so the bounded face runs the
    * exact key dedup instead — on bounded input with ids never reused
    * beyond the horizon the two agree, which is what the
    * `ev_stream_dedup` gate query and the spec's stream-vs-batch test
    * pin down.
    */
  def dedupWithinWatermark(events: DataFrame, horizon: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", horizon).dropDuplicatesWithinWatermark("event_id")
    else
      events.dropDuplicates("event_id")

  /** Classic Misra-Gries fold: exact while the bucket's distinct-key count
    * stays within `capacity`; beyond it counts become LOWER bounds with
    * error ≤ n/capacity (any key with true count above that survives —
    * the heavy-hitter guarantee). Shared by the streaming and batch faces.
    */
  private def mgAdd(m: scala.collection.mutable.Map[Long, Long], k: Long, capacity: Int): Unit =
    m.get(k) match {
      case Some(c) => m.update(k, c + 1)
      case None if m.size < capacity => m.update(k, 1L)
      case None =>
        val dead = List.newBuilder[Long]
        m.foreach { case (kk, c) => if (c == 1) dead += kk else m.update(kk, c - 1) }
        dead.result().foreach(m.remove)
    }

  /** Streaming heavy hitters: per-user event counts as a Misra-Gries
    * sketch maintained in `flatMapGroupsWithState` — the stateful-stream
    * twin of the batch `doc_freq_terms_sketch` aggregate. Keys hash into
    * `nBuckets` state groups (bounding any one task's state) and each
    * group's sketch is O(capacity) FOREVER — the state never grows with
    * stream length or key cardinality, so the query runs indefinitely at
    * any feed rate (no watermark needed; nothing is ever evicted by
    * time). Every trigger re-emits the group's current counters (Update
    * mode); a key lives in exactly one bucket, so the global top-k is a
    * union + sort away. Batch face: the identical fold per bucket group —
    * bit-identical to streaming-to-completion because MG is
    * order-insensitive in the exact regime (capacity ≥ bucket's distinct
    * keys, the gate fixture's regime; over capacity both faces give
    * lower bounds with the same guarantee).
    */
  def heavyHitters(events: DataFrame, nBuckets: Int = 32, capacity: Int = 256): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = events.select(
      (col("user_id") % nBuckets).as("bucket"), col("user_id")).as[(Long, Long)]
    if (events.isStreaming)
      keyed.groupByKey(_._1)
        .flatMapGroupsWithState[Map[Long, Long], (Long, Long, Long)](
          OutputMode.Update(), GroupStateTimeout.NoTimeout,
        ) { (bucket: Long, it: Iterator[(Long, Long)], state: GroupState[Map[Long, Long]]) =>
          val m = scala.collection.mutable.Map.empty[Long, Long]
          state.getOption.foreach(m ++= _)
          it.foreach(e => mgAdd(m, e._2, capacity))
          state.update(m.toMap)
          m.iterator.map { case (u, c) => (bucket, u, c) }
        }
        .toDF("bucket", "user_id", "n_events")
    else
      keyed.groupByKey(_._1)
        .flatMapGroups { (bucket: Long, it: Iterator[(Long, Long)]) =>
          val m = scala.collection.mutable.Map.empty[Long, Long]
          it.foreach(e => mgAdd(m, e._2, capacity))
          m.iterator.map { case (u, c) => (bucket, u, c) }
        }
        .toDF("bucket", "user_id", "n_events")
  }

  case class Event(user_id: Long, ts_us: Long, event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, total: Double)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long, total_value: Double)

  /** Custom stateful sessionization via flatMapGroupsWithState: a session
    * closes after `gapUs` of event-time inactivity. Uses EventTimeTimeout
    * against the stream's watermark so an idle user's final session IS
    * emitted (when the watermark passes last-event + gap) and state never
    * grows unboundedly. Input must carry an event-time `ts` timestamp
    * column (micros of ts_us) for the watermark.
    */
  def sessionize(events: Dataset[Event], gapUs: Long = 30L * 60 * 1000 * 1000): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapUs / 1000
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "10 seconds")
      .as[(Long, Long, String, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout,
      ) { (user: Long, it: Iterator[(Long, Long, String, Double, java.sql.Timestamp)], state: GroupState[List[SessionState]]) =>
        if (state.hasTimedOut) {
          // watermark passed last-event + gap: flush and clear the open session
          val flushed = state.getOption.flatMap(_.headOption)
            .map(s => Session(user, s.start, s.last, s.n, s.total))
          state.remove()
          flushed.iterator
        } else {
          // sort this micro-batch's events; fold into the open session
          val sorted = it.toSeq.sortBy(e => (e._2, e._3))
          var open: Option[SessionState] = state.getOption.flatMap(_.headOption)
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            open match {
              case Some(s) if e._2 - s.last > gapUs =>
                closed += Session(user, s.start, s.last, s.n, s.total)
                open = Some(SessionState(e._2, e._2, 1, e._4))
              case Some(s) =>
                open = Some(SessionState(s.start, e._2, s.n + 1, s.total + e._4))
              case None =>
                open = Some(SessionState(e._2, e._2, 1, e._4))
            }
          }
          state.update(open.toList)
          open.foreach(s => state.setTimeoutTimestamp(s.last / 1000 + gapMs))
          closed.result().iterator
        }
      }
  }
}
