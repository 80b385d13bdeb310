package graft.streaming

import graft.SparkSpec
import graft.volume.{ChunkStore, ChunkVolume}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Incremental volume ingest: chunk files landing over time stream through
  * the upscale kernel; the final store must equal the one-shot batch
  * upscale of the whole volume.
  */
class VolumeStreamsSpec extends AnyFunSuite with SparkSpec {

  test("streamed upscale ingest converges to the batch result") {
    val dir = Files.createTempDirectory("vstream")
    val inDir = dir.resolve("in").toString
    val outDir = dir.resolve("out").toString
    val (dz, dy, dx) = (8L, 6L, 6L)
    val vox = spark.range(dz * dy * dx).select(
      expr(s"id div ${dy * dx}").as("z"),
      expr(s"(id div $dx) % $dy").as("y"),
      expr(s"id % $dx").as("x"),
      expr(s"id % 97").as("label"),
    )
    val vol = ChunkVolume.fromVoxels(vox, dz, dy, dx, 4, 3, 3)

    // batch 1: the lower half of the volume lands first
    vol.chunks.filter(col("cz") === 0).write.mode("append").parquet(inDir)
    val query = VolumeStreams.upscaleIngest(spark, inDir, outDir, vol.meta, s = 2)
    try {
      query.processAllAvailable()
      val mid = ChunkStore.read(spark, outDir)
      assert(mid.chunks.count() === vol.chunks.filter(col("cz") === 0).count() * 8)

      // batch 2: the rest lands
      vol.chunks.filter(col("cz") === 1).write.mode("append").parquet(inDir)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = ChunkStore.read(spark, outDir).toVoxels.collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    val batch = vol.upscale(2).toVoxels.collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    assert(streamed === batch)
    assert(streamed.size === dz * dy * dx * 8)
  }

  test("streamed ingest into a REAL zarr v2 array converges to the batch result") {
    import graft.volume.ZarrStore
    val dir = Files.createTempDirectory("vstream_z")
    val inDir = dir.resolve("in").toString
    val outDir = dir.resolve("out.zarr").toString
    val (dz, dy, dx) = (6L, 5L, 4L)
    val vox = spark.range(dz * dy * dx).select(
      expr(s"id div ${dy * dx}").as("z"),
      expr(s"(id div $dx) % $dy").as("y"),
      expr(s"id % $dx").as("x"),
      expr(s"id % 53").as("label"),
    )
    val vol = ChunkVolume.fromVoxels(vox, dz, dy, dx, 3, 5, 4)
    vol.chunks.filter(col("cz") === 0).write.mode("append").parquet(inDir)
    val query = VolumeStreams.upscaleIngest(spark, inDir, outDir, vol.meta, s = 2, format = "zarr")
    try {
      query.processAllAvailable()
      vol.chunks.filter(col("cz") === 1).write.mode("append").parquet(inDir)
      query.processAllAvailable()
    } finally query.stop()
    // the result is a spec-compliant zarr array equal to the batch upscale
    val za = ZarrStore.parseZarray(
      Files.readString(java.nio.file.Paths.get(outDir, ".zarray")))
    assert(za.shape === Seq(dz * 2, dy * 2, dx * 2))
    val streamed = ZarrStore.read(spark, outDir).toVoxels.collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    val batch = vol.upscale(2).toVoxels.collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    assert(streamed === batch)
  }
}
