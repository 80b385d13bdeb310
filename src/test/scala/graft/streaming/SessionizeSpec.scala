package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The round-1 verdict bug: with NoTimeout an idle user's final session was
  * never emitted. This proves the EventTimeTimeout path flushes it once the
  * watermark passes last-event + gap.
  */
class SessionizeSpec extends AnyFunSuite with SparkSpec {

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
