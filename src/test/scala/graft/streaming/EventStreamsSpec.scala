package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Top-level so Spark's encoder can instantiate it without an outer
  * scope (MemoryStream deserialization).
  */
case class EvId(event_id: Long, ts: Timestamp, event_type: String, user_id: Long, value: Double)

/** Windowed streaming aggregations under a real streaming query with a
  * watermark: finalized hourly windows emit once the watermark passes; a
  * late event beyond the watermark is dropped.
  */
class EventStreamsSpec extends AnyFunSuite with SparkSpec {

  case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)

  // hour-aligned base so (h, m) lands inside tumbling window h
  private val Base = 1_600_002_000L // = 444445 * 3600
  private def us(h: Int, m: Int): Timestamp = new Timestamp(
    (Base + h * 3600L + m * 60L) * 1000L)

  test("hourlyByType: append-mode windows finalize via watermark; late data dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = EventStreams.hourlyByType(input.toDF())
      .select(col("window.start").as("w"), col("event_type"), col("n_events"), col("total_value"))
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Ev(us(0, 10), "click", 1, 1.0),
        Ev(us(0, 50), "click", 2, 2.0),
        Ev(us(0, 20), "buy", 1, 10.0))
      query.processAllAvailable()
      // watermark is 2h: nothing finalized yet
      assert(spark.table("hourly_out").count() === 0)

      // an event 4 hours later pushes the watermark past hour 0
      input.addData(Ev(us(4, 0), "click", 3, 1.0))
      query.processAllAvailable()
      input.addData(Ev(us(4, 1), "click", 3, 1.0))
      query.processAllAvailable()
      val rows = spark.table("hourly_out")
        .select("event_type", "n_events", "total_value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows === Set(("click", 2L, 3.0), ("buy", 1L, 10.0)))

      // a straggler for hour 0 is now beyond the watermark → dropped
      input.addData(Ev(us(0, 30), "click", 9, 99.0))
      query.processAllAvailable()
      val after = spark.table("hourly_out").count()
      assert(after === 2)
    } finally query.stop()
  }

  test("enrichedHourlyBySegment: stream-static join is stateless and matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "A"), (2L, "B"), (3L, "A")).toDF("user_id", "segment")
    // EvId (top-level) so the batch face's toDF() can encode it too
    val input = MemoryStream[EvId]
    val query = EventStreams.enrichedHourlyBySegment(input.toDF(), dim)
      .select(col("window.start").as("w"), col("segment"), col("n_events"), col("value_c"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val batch = Seq(
        EvId(1L, us(0, 10), "click", 1, 1.5),
        EvId(2L, us(0, 20), "click", 2, 2.0),
        EvId(3L, us(0, 30), "buy", 3, 4.0),
        EvId(4L, us(0, 40), "click", 9, 9.0)) // user 9 not in dim -> dropped (inner)
      input.addData(batch: _*)
      input.addData(EvId(5L, us(4, 0), "click", 1, 0.0)) // advance watermark past hour 0
      query.processAllAvailable()
      input.addData(EvId(6L, us(4, 1), "click", 1, 0.0))
      query.processAllAvailable()
      val streamed = spark.table("enrich_out")
        .select("segment", "n_events", "value_c")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // segment A: users 1+3 -> 2 events, 150+400 cents; B: user 2 -> 200
      assert(streamed === Set(("A", 2L, 550L), ("B", 1L, 200L)))
      // batch face: identical code path, identical numbers
      val batchRows = EventStreams.enrichedHourlyBySegment(batch.toDF(), dim)
        .select("segment", "n_events", "value_c")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(batchRows === streamed)
      // stateless join: only the window aggregation holds state
      assert(query.lastProgress.stateOperators.size === 1)
    } finally query.stop()
  }

  test("dedupWithinWatermark: redelivered event_ids are dropped across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EvId]
    val query = EventStreams.dedupWithinWatermark(input.toDF(), horizon = "2 hours")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two distinct events, one delivered twice in-batch
      input.addData(
        EvId(1, us(0, 10), "view", 1, 1.0),
        EvId(1, us(0, 10), "view", 1, 1.0),
        EvId(2, us(0, 20), "buy", 1, 5.0))
      query.processAllAvailable()
      // batch 2: event 1 redelivered AGAIN (within horizon) + a new event
      input.addData(
        EvId(1, us(0, 10), "view", 1, 1.0),
        EvId(3, us(0, 30), "view", 2, 2.0))
      query.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L), "each event_id must emit exactly once")

      // batch face over the same redelivered rows converges to the stream
      val batch = EventStreams.dedupWithinWatermark(Seq(
        EvId(1, us(0, 10), "view", 1, 1.0),
        EvId(1, us(0, 10), "view", 1, 1.0),
        EvId(2, us(0, 20), "buy", 1, 5.0),
        EvId(1, us(0, 10), "view", 1, 1.0),
        EvId(3, us(0, 30), "view", 2, 2.0)).toDF())
        .select("event_id").collect().map(_.getLong(0)).sorted
      assert(batch.toSeq === ids.toSeq)

      // boundary semantics once the watermark moves far ahead (hour 8):
      // a beyond-horizon REDELIVERY still carries its old event time, so
      // the watermark discards it as late data — never double-counted...
      input.addData(EvId(9, us(10, 0), "view", 5, 0.0)) // watermark -> hour 8
      query.processAllAvailable()
      input.addData(EvId(1, us(0, 10), "view", 1, 1.0)) // stale redelivery
      query.processAllAvailable()
      assert(spark.table("dedup_out").filter(col("event_id") === 1L).count() === 1,
        "a stale redelivery beyond the horizon is dropped as late data")
      // ...whereas REUSING an id with a fresh event time (beyond the
      // horizon of the original) emits again — expired state is the
      // price of not keeping every key forever
      input.addData(EvId(1, us(10, 5), "view", 1, 1.0))
      query.processAllAvailable()
      assert(spark.table("dedup_out").filter(col("event_id") === 1L).count() === 2,
        "id reuse after state expiry emits a second row")
    } finally query.stop()
  }

  test("attributedPurchases: stream-stream interval join matches the batch join; window excludes old views") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      EvId(1, us(0, 10), "view", 1, 0.0),
      EvId(2, us(0, 50), "view", 1, 0.0),
      EvId(3, us(1, 20), "purchase", 1, 9.99), // views 1 (70m ago: OUT) and 2 (30m ago: IN)
      EvId(4, us(0, 55), "view", 2, 0.0),
      EvId(5, us(3, 0), "purchase", 2, 5.0), // view 4 is 125m old: OUT
      EvId(6, us(1, 20), "view", 3, 0.0), // view with no purchase
      EvId(7, us(1, 0), "purchase", 4, 1.0)) // purchase with no view
    val input = MemoryStream[EvId]
    val query = EventStreams.attributedPurchases(input.toDF())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(data: _*)
      query.processAllAvailable()
      val streamed = spark.table("attr_out")
        .select("p_id", "view_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === Set((3L, 2L)), "only the in-window (purchase, view) pair matches")
      // convergence: the identical function on a BATCH frame of the same rows
      val batch = EventStreams.attributedPurchases(data.toDF())
        .select("p_id", "view_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === streamed, "stream and batch joins agree")
    } finally query.stop()
  }

  test("slidingValue: 1h window every 15m assigns events to 4 overlapping windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = EventStreams.slidingValue(input.toDF())
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Ev(us(1, 7), "click", 1, 4.0))
      input.addData(Ev(us(9, 0), "click", 2, 1.0)) // advance watermark far
      query.processAllAvailable()
      input.addData(Ev(us(9, 1), "click", 2, 1.0))
      query.processAllAvailable()
      val windows = spark.table("sliding_out").filter(col("total_value") === 4.0).count()
      assert(windows === 4) // 60/15 overlapping windows contain the event
    } finally query.stop()
  }
}
