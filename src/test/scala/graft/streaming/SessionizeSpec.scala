package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The round-1 verdict bug: with NoTimeout an idle user's final session was
  * never emitted. This proves the EventTimeTimeout path flushes it once the
  * watermark passes last-event + gap.
  */
class SessionizeSpec extends AnyFunSuite with SparkSpec {

  test("stream sessionization agrees with the oracle-checked batch query on real data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // ground truth: the DuckDB-verified batch sessionization at sf0.001
    val batch = graft.SparkEntry.queries("ev_sessions")(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"n_events", col("sess_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, math.round(t._3 * 100))).toSet).toMap

    val events = graft.T.events(spark, "/root/testdata/sf0.001")
      .select($"user_id", expr("ts_ns div 1000").as("ts_us"), $"event_type", $"value")
      .as[EventStreams.Event].collect()
    val input = MemoryStream[EventStreams.Event]
    val query = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("parity_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events.toSeq)
      query.processAllAvailable()
      // flush every open session: advance the watermark far past the data
      val far = events.map(_.ts_us).max + 100L * 3600 * 1000 * 1000
      input.addData(EventStreams.Event(-1L, far, "tick", 0.0))
      query.processAllAvailable()
      input.addData(EventStreams.Event(-1L, far + 1_000_000L, "tick", 0.0))
      query.processAllAvailable()

      val streamed = spark.table("parity_out").as[EventStreams.Session].collect()
        .filter(_.user_id >= 0)
        .groupBy(_.user_id).view
        .mapValues(_.map(s => (s.n_events, math.round(s.total_value * 100))).toSet).toMap
      assert(streamed.keySet === batch.keySet)
      for ((u, sessions) <- batch) {
        assert(streamed(u) === sessions, s"user $u")
      }
    } finally query.stop()
  }

  test("idle session is emitted via event-time timeout; gap splits sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val gapUs = 30L * 60 * 1000 * 1000 // 30 min
    val sessions = EventStreams.sessionize(input.toDS(), gapUs)

    val query = sessions.writeStream
      .format("memory")
      .queryName("sessions_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val t0 = 1_600_000_000_000_000L // µs
      // user 1: two events 1 min apart — one open session
      input.addData(
        EventStreams.Event(1L, t0, "click", 1.0),
        EventStreams.Event(1L, t0 + 60_000_000L, "click", 2.0))
      query.processAllAvailable()
      assert(spark.table("sessions_out").count() === 0) // still open

      // user 1 again after a >gap pause: closes session 1 in-batch
      input.addData(EventStreams.Event(1L, t0 + gapUs + 120_000_000L, "buy", 5.0))
      query.processAllAvailable()
      val afterGap = spark.table("sessions_out").as[EventStreams.Session].collect()
      assert(afterGap.length === 1)
      assert(afterGap.head === EventStreams.Session(1L, t0, t0 + 60_000_000L, 2, 3.0))

      // user 2 far in the future advances the watermark past user 1's
      // last event + gap → user 1's IDLE session must flush via timeout.
      input.addData(EventStreams.Event(2L, t0 + 10L * gapUs, "click", 1.0))
      query.processAllAvailable()
      // one more batch so the new watermark triggers the timeout
      input.addData(EventStreams.Event(2L, t0 + 10L * gapUs + 1_000_000L, "click", 1.0))
      query.processAllAvailable()

      val all = spark.table("sessions_out").as[EventStreams.Session].collect()
      val u1 = all.filter(_.user_id == 1L)
      assert(u1.length === 2, s"idle session not flushed: ${all.mkString(", ")}")
      assert(u1.map(_.n_events).sorted.toSeq === Seq(1L, 2L))
    } finally {
      query.stop()
    }
  }
}
