package graft.streaming

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Top-level for MemoryStream encoder instantiation. */
case class MediaDoc(id: Long, payload: Array[Byte])

/** Streaming image near-dup gate: real decode + dHash on the stream,
  * hamming-verified bucket ownership across micro-batches, stream ==
  * batch face on finalized windows.
  */
class MediaStreamsSpec extends AnyFunSuite with SparkSpec {

  test("imageNearDupGate: re-encode + tweak flagged across batches; stream == batch; 2 stateful ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def png(id: Long, variant: Int) =
      Multimodal.encodeImageWith(16, 16, "png")(Multimodal.nearDupPixel(id, variant, _, _, 16))
    def bmp(id: Long) =
      Multimodal.encodeImageWith(16, 16, "bmp")(Multimodal.nearDupPixel(id, 0, _, _, 16))
    // wave 1: bases 0..9; wave 2: the BMP re-encode of 5 (raster-identical,
    // hamming 0), the tweaked twin of 7 (hamming <= 1), a fresh unrelated
    // base, and a far-future unrelated payload to advance the watermark
    val wave1 = (0L to 9L).map(i => MediaDoc(i, png(i, 0)))
    val wave2 = Seq(
      MediaDoc(1005, bmp(5L)),
      MediaDoc(2007, png(7L, 1)),
      MediaDoc(30, png(30L, 0)),
      MediaDoc(5000, png(33L, 0)))

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[MediaDoc]
    val query = MediaStreams.imageNearDupGate(input.toDF())
      .select(col("window.start").cast("long").as("window_s"), col("doc_id"), col("is_dup"))
      .writeStream.format("memory").queryName("media_neardup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(wave1: _*)
      query.processAllAvailable()
      input.addData(wave2: _*)
      query.processAllAvailable()
      val streamed = spark.table("media_neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch face over the same feed; compare only windows the stream
      // finalized (watermark = 5000 - 120 min -> everything below 4880 min)
      val feed = (wave1 ++ wave2).map(m => (m.id, m.payload)).toDF("id", "payload")
      val batch = MediaStreams.imageNearDupGate(feed)
        .select(col("window.start").cast("long").as("window_s"), col("doc_id"), col("is_dup"))
        .filter(col("window_s") < (4880L - 60L) * 60L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
      val verdict = streamed.map(t => t._2 -> t._3).toMap
      assert(verdict(1005L) === 1L, "raster-identical BMP re-encode flagged across batches")
      assert(verdict(2007L) === 1L, "tweaked twin (hamming <= 1) hamming-verified as dup")
      assert(verdict(5L) === 0L && verdict(7L) === 0L, "originals survive")
      assert(verdict(30L) === 0L, "fresh unrelated base survives the verify")
      assert(query.lastProgress.stateOperators.size === 2)
    } finally {
      query.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
