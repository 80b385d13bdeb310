package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Top-level for MemoryStream's encoder. */
case class HhEv(user_id: Long)

/** Streaming heavy hitters: real streaming execution over a two-batch
  * MemoryStream feed in the exact regime equals the batch face and the
  * true counts; the over-capacity regime yields lower bounds that keep
  * the heavy hitter; state stays O(capacity) per bucket.
  */
class StreamingTopKSpec extends AnyFunSuite with SparkSpec {

  test("streaming MG counts across two batches == exact counts (exact regime)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[HhEv]
    val query = EventStreams.heavyHitters(input.toDF(), nBuckets = 4, capacity = 16)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((1L to 10L).map(HhEv(_)) ++ Seq(HhEv(7), HhEv(7), HhEv(3)): _*)
      query.processAllAvailable()
      input.addData(Seq(HhEv(7), HhEv(3), HhEv(3), HhEv(11)).map(identity): _*)
      query.processAllAvailable()
      // Update mode re-emits the bucket's counters each trigger; in the
      // exact regime counts only grow, so the final state per user is the
      // MAX emitted count
      val counts = spark.table("topk_out")
        .groupBy("user_id").agg(max("n_events").as("n_events"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // batch 1: 1..10 once + (7,7,3); batch 2: (7,3,3,11) → 7:4, 3:4
      val expected = ((1L to 10L).map(_ -> 1L).toMap
        ++ Map(7L -> 4L, 3L -> 4L, 11L -> 1L))
      assert(counts === expected)
    } finally query.stop()
  }

  test("batch face equals streaming-to-completion in the exact regime") {
    import spark.implicits._
    val df = ((1L to 10L) ++ Seq(7L, 7L, 3L, 7L, 3L, 3L, 11L)).toDF("user_id")
    val batch = EventStreams.heavyHitters(df, nBuckets = 4, capacity = 16)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val expected = ((1L to 10L).map(_ -> 1L).toMap ++ Map(7L -> 4L, 3L -> 4L, 11L -> 1L))
    assert(batch === expected)
  }

  test("over capacity: counts are lower bounds and the heavy hitter survives") {
    import spark.implicits._
    // one bucket, capacity 2, heavy key 42 with 60% mass
    val keys = Seq.fill(30)(42L) ++ (1L to 20L)
    val df = keys.toDF("user_id").withColumn("user_id", col("user_id") * 4) // same bucket mod 4... keep bucket count 1
    val out = EventStreams.heavyHitters(df, nBuckets = 1, capacity = 2)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val exact = keys.map(_ * 4).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.size <= 2)
    out.foreach { case (k, c) => assert(c <= exact(k)) } // lower bounds
    assert(out.contains(42L * 4)) // n/capacity = 25 error bound < 30 true count
    assert(out(42L * 4) >= 30L - 25L)
  }

  test("state is bounded: capacity caps the counter map under adversarial churn") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("user_id")
    val out = EventStreams.heavyHitters(df, nBuckets = 2, capacity = 8).collect()
    // each bucket's emitted counter set is at most `capacity` entries
    val perBucket = out.groupBy(_.getLong(0)).view.mapValues(_.length)
    perBucket.foreach { case (_, n) => assert(n <= 8) }
  }
}
