package graft.streaming

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Top-level for MemoryStream encoder instantiation. */
case class MediaDoc(id: Long, payload: Array[Byte])

/** Mixed-modality feed row for MemoryStream encoder instantiation. */
case class MixedDoc(id: Long, modality: String, payload: Array[Byte])

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

  private def img(id: Long, base: Long, variant: Int, fmt: String = "png") = MixedDoc(id, "image",
    Multimodal.encodeImageWith(16, 16, fmt)(Multimodal.nearDupPixel(base, variant, _, _, 16)))
  private def wav(id: Long, base: Long, gain: Int) = MixedDoc(id, "audio",
    Multimodal.encodeWavPcm16(
      Array.tabulate(576)(i => Multimodal.audioTone(base, i) * gain), 8000))
  private def avi(id: Long, base: Long, variant: Int) = MixedDoc(id, "video",
    Multimodal.encodeAviRgb24((0 until 2).map(f =>
      Array.tabulate(16 * 16 * 3)(i =>
        Multimodal.videoNearDupByte(base, variant, f, i).toByte)), 16, 16, fps = 10))

  test("mixedNearDupGate: image/audio/video dups verified in one stream; modality-disjoint bands; stream == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // wave 1: three bases per modality (video 20005 shares the IMAGE
    // fingerprint bit pattern of image 5 — the 3x luma scaling is
    // sign-preserving — so modality-disjoint banding is load-bearing);
    // wave 2: one dup per modality + a fresh image + a far-future
    // watermark pusher that finalizes every content window
    val wave1 = Seq(
      img(0, 0, 0), img(5, 5, 0), img(7, 7, 0),
      wav(10000, 0, 1), wav(10005, 5, 1), wav(10007, 7, 1),
      avi(20000, 0, 0), avi(20005, 5, 0), avi(20007, 7, 0))
    val wave2 = Seq(
      img(1005, 5, 0, fmt = "bmp"),   // raster-identical re-encode, hamming 0
      wav(11005, 5, 2),               // amplitude-doubled re-master, hamming 0
      avi(22007, 7, 1),               // tweaked twin, hamming <= 1
      img(30, 30, 0),                 // fresh unrelated base
      img(61000, 61000, 0))           // watermark pusher

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[MixedDoc]
    val query = MediaStreams.mixedNearDupGate(input.toDF())
      .select(col("window.start").cast("long").as("window_s"), col("doc_id"), col("is_dup"))
      .writeStream.format("memory").queryName("mixed_neardup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(wave1: _*)
      query.processAllAvailable()
      input.addData(wave2: _*)
      query.processAllAvailable()
      // final watermark = 61000 min - 30000 min horizon; every content
      // window (<= id 22007 -> window 1317600) is far below it
      val cutoff = 1400000L
      val streamed = spark.table("mixed_neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(_._1 < cutoff).toSet
      val feed = (wave1 ++ wave2).map(m => (m.id, m.modality, m.payload))
        .toDF("id", "modality", "payload")
      val batch = MediaStreams.mixedNearDupGate(feed)
        .select(col("window.start").cast("long").as("window_s"), col("doc_id"), col("is_dup"))
        .filter(col("window_s") < cutoff)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
      val verdict = streamed.map(t => t._2 -> t._3).toMap
      assert(verdict(1005L) === 1L, "image re-encode flagged")
      assert(verdict(11005L) === 1L, "audio re-master flagged")
      assert(verdict(22007L) === 1L, "video tweak hamming-verified as dup")
      assert(verdict(5L) === 0L && verdict(10005L) === 0L && verdict(20007L) === 0L,
        "originals survive")
      assert(verdict(20005L) === 0L,
        "video sharing image 5's bit pattern is NOT cross-modality flagged")
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

  test("mixedNearDupGate: modality-partitioned claim state survives a RESTART from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the dups arrive only AFTER the restart, so every dup verdict below
    // can come only from RECOVERED RocksDB state — one per modality, the
    // newest (modality-partitioned band) state layout exercised whole
    val wave1 = Seq(
      img(0, 0, 0), img(5, 5, 0), img(7, 7, 0),
      wav(10000, 0, 1), wav(10005, 5, 1), wav(10007, 7, 1),
      avi(20000, 0, 0), avi(20005, 5, 0), avi(20007, 7, 0))
    val wave2 = Seq(
      img(1005, 5, 0, fmt = "bmp"), // image re-encode of pre-restart 5
      wav(11005, 5, 2),             // audio re-master of pre-restart 10005
      avi(22007, 7, 1),             // video tweak of pre-restart 20007
      img(30, 30, 0),               // fresh unrelated base
      img(61000, 61000, 0))         // watermark pusher: finalizes content windows

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("mixed_neardup_ckpt").toString
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val input = MemoryStream[MixedDoc]
    def start() = MediaStreams.mixedNearDupGate(input.toDF())
      .select(col("window.start").cast("long").as("window_s"), col("doc_id"), col("is_dup"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => out.add((r.getLong(0), r.getLong(1), r.getLong(2))))
        ()
      }
      .start()
    val q1 = start()
    try {
      input.addData(wave1: _*)
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = start()
    try {
      input.addData(wave2: _*)
      q2.processAllAvailable()
      val cutoff = 1400000L
      val streamed = scala.jdk.CollectionConverters.IteratorHasAsScala(out.iterator())
        .asScala.toSet.filter((t: (Long, Long, Long)) => t._1 < cutoff)
      // verdicts must be IDENTICAL to the uninterrupted run — the batch
      // face, which the previous test pins equal to the one-query stream
      val feed = (wave1 ++ wave2).map(m => (m.id, m.modality, m.payload))
        .toDF("id", "modality", "payload")
      val batch = MediaStreams.mixedNearDupGate(feed)
        .select(col("window.start").cast("long").as("window_s"), col("doc_id"), col("is_dup"))
        .filter(col("window_s") < cutoff)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch, "restarted run diverged from the uninterrupted semantics")
      val verdict = streamed.map(t => t._2 -> t._3).toMap
      assert(verdict(1005L) === 1L, "image dup flagged from recovered state")
      assert(verdict(11005L) === 1L, "audio dup flagged from recovered state")
      assert(verdict(22007L) === 1L, "video dup flagged from recovered state")
      assert(verdict(5L) === 0L && verdict(10005L) === 0L && verdict(20007L) === 0L)
      assert(verdict(30L) === 0L)
    } finally {
      q2.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
