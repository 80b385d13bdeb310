package graft.volume

import org.apache.spark.sql.SparkSession

/** One-off codec A/B for the ×15 encode stage (scan+kernel+compress, no
  * file I/O): quantifies the blosc-zstd clevel knob and the lz4 escape
  * hatch against the headline codec (r18: zstd-3 adopted after this
  * A/B plus full-sink reps — PLANS.md "×15 zarr codec"; zstd-5 remains
  * the reference-parity level for the `--compressor zstd-bit`/`lz4`
  * CLI flags).
  * Variants are interleaved per rep so an ambient window hits all four
  * equally. Results land in PLANS.md; this main is scratch tooling.
  */
object EncodeAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mhd = VolumeBench.ensureFixture("/tmp/graft_volbench")
    VolumeBench.stageTimes(spark, mhd, 15) // untimed JIT warmup
    if (args.contains("sharded")) {
      // SINK A/B for the zarr3 sharded writer vs the plain v2 sink
      // (r19 verdict item: shave the 102.9 vs 94.3 s sharded gap) —
      // full ×15 sinks, interleaved per rep, same codec
      val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "2").toInt
      for (rep <- 1 to reps) {
        AtomicDir.awaitQuiescent()
        val tz = VolumeBench.upscaleZarr(spark, mhd, 15, "/tmp/graft_volbench/ab_zarr")
        println(s"SINK_AB variant=zarr rep=$rep sec=$tz")
        AtomicDir.awaitQuiescent()
        val ts = VolumeBench.upscaleZarr3s(spark, mhd, 15, "/tmp/graft_volbench/ab_zarr3s")
        println(s"SINK_AB variant=zarr3s rep=$rep sec=$ts")
      }
      spark.stop()
      return
    }
    val variants = Seq(
      "zstd5" -> ZarrStore.BloscCodec("zstd", 5, shuffle = 1),
      "zstd3" -> ZarrStore.BloscCodec("zstd", 3, shuffle = 1),
      "zstd1" -> ZarrStore.BloscCodec("zstd", 1, shuffle = 1),
      "lz4_5" -> ZarrStore.BloscCodec("lz4", 5, shuffle = 1),
    )
    for (rep <- 1 to 3; (name, codec) <- variants) {
      val t = VolumeBench.encodeStageTime(spark, mhd, 15, codec)
      println(s"ENCODE_AB variant=$name rep=$rep sec=$t")
    }
    spark.stop()
  }
}
