package graft.volume

import java.nio.file.{Files, Paths}

/** Multiscale pyramid sink (K3) + OME-style `multiscales` metadata.
  *
  * Mirrors write_ome_zarr_pyramid (upscale_streaming_enhance.py:190–255):
  * level i is written under `level=i/`, and the group attrs carry one
  * coordinateTransformations scale per level:
  *   scale_zyx(i) = (spacing_xyz reversed) · 2^i / upscaleFactor
  * — ElementSpacing is (x,y,z) in the header but OME axes here are
  * (z,y,x), hence the reversal (…:229–241); upscaling by `s` divides the
  * voxel pitch by s; each pyramid level doubles it.
  */
object PyramidWriter {

  import ChunkVolume.jsonStr

  def multiscalesJson(meta: VolumeMeta, upscaleFactor: Int, levels: Int, name: String = "labels"): String = {
    val datasets = (0 until levels).map { i =>
      val f = (1 << i).toDouble / upscaleFactor
      s"""    {
         |      "path": "$i",
         |      "coordinateTransformations": [{
         |        "type": "scale",
         |        "scale": [${meta.spacingZ * f}, ${meta.spacingY * f}, ${meta.spacingX * f}]
         |      }]
         |    }""".stripMargin
    }.mkString(",\n")
    s"""{
       |  "multiscales": [{
       |    "version": "0.4",
       |    "name": ${jsonStr(name)},
       |    "axes": [
       |      {"name": "z", "type": "space", "unit": "micrometer"},
       |      {"name": "y", "type": "space", "unit": "micrometer"},
       |      {"name": "x", "type": "space", "unit": "micrometer"}
       |    ],
       |    "datasets": [
       |$datasets
       |    ]
       |  }],
       |  "image-label": true
       |}
       |""".stripMargin
  }

  /** Write `levels` pyramid levels of `vol` as a REAL OME-Zarr v2 group:
    * `.zgroup` + `multiscales` group attrs (`.zattrs`), levels as
    * spec-compliant zarr arrays under `path/0`, `path/1`, … — the layout
    * `zarr.open_group` / napari / dask read directly
    * (upscale_streaming_enhance.py:190–255). Levels execute sequentially,
    * each a chunk-local decimation of the previous — same lifecycle as the
    * reference's per-level `da.store` loop.
    */
  def write(vol: ChunkVolume, levels: Int, path: String, upscaleFactor: Int = 1,
      codec: ZarrStore.Codec = ZarrStore.ZstdCodec()): Unit = {
    val pyr = vol.pyramid(levels)
    // overwrite semantics like the reference's rmtree, but atomic and
    // without an O(files) driver delete: stage the whole group in a temp
    // sibling, publish with O(1) renames at the end (see AtomicDir)
    val dest = Paths.get(path).toAbsolutePath.normalize
    AtomicDir.sweepLeftovers(dest)
    val dir = AtomicDir.tempSibling(dest)
    val stage = dir.toString
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(".zgroup"), "{\n    \"zarr_format\": 2\n}")
    // one chunk tuple for every level (reference: create_dataset(...,
    // chunks=chunks) per level): decimation halves per-chunk extents on
    // the global lattice (non-uniform grid), so re-block each level to the
    // base chunk shape clamped to its dims — zarr requires uniform chunks.
    val (bz, by, bx) = (vol.meta.chunkZ, vol.meta.chunkY, vol.meta.chunkX)
    try {
      pyr.zipWithIndex.foreach { case (level, i) =>
        val uniform =
          if (i == 0) level
          else level.rechunk(
            math.min(bz.toLong, level.meta.dimZ).toInt,
            math.min(by.toLong, level.meta.dimY).toInt,
            math.min(bx.toLong, level.meta.dimX).toInt)
        ZarrStore.write(uniform, s"$stage/$i", codec)
      }
      Files.writeString(Paths.get(stage, ".zattrs"), multiscalesJson(vol.meta, upscaleFactor, levels))
      writeConsolidatedMetadata(stage, levels)
      ChunkVolume.writeSidecar(stage, vol.meta, Map(
        "pyramid_levels" -> levels.toString,
        "upscale_factor" -> upscaleFactor.toString))
    } catch { case e: Throwable => AtomicDir.deleteInBackground(dir); throw e }
    AtomicDir.publish(dir, dest)
  }

  /** Zarr v2 CONSOLIDATED metadata (`.zmetadata`,
    * zarr_consolidated_format 1): every metadata document of the group
    * gathered into one file, exactly what `zarr.consolidate_metadata`
    * emits and `zarr.open_consolidated` reads. On object storage this is
    * the difference between 2 + 2·levels metadata GETs (with listing) and
    * ONE — the standard convention for cloud-hosted OME-Zarr.
    */
  private def writeConsolidatedMetadata(path: String, levels: Int): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val dir = Paths.get(path)
    val docs = scala.collection.mutable.LinkedHashMap[String, JValue]()
    def add(key: String, file: java.nio.file.Path): Unit =
      if (Files.exists(file)) docs(key) = JsonMethods.parse(Files.readString(file))
    add(".zgroup", dir.resolve(".zgroup"))
    add(".zattrs", dir.resolve(".zattrs"))
    for (i <- 0 until levels) {
      add(s"$i/.zarray", Paths.get(path, i.toString, ".zarray"))
      add(s"$i/.zattrs", Paths.get(path, i.toString, ".zattrs"))
    }
    val consolidated = JObject(
      "metadata" -> JObject(docs.toList: _*),
      "zarr_consolidated_format" -> JInt(1))
    Files.writeString(dir.resolve(".zmetadata"),
      JsonMethods.pretty(JsonMethods.render(consolidated)))
  }

  /** Read back one pyramid level written by [[write]]. */
  def readLevel(spark: org.apache.spark.sql.SparkSession, path: String, level: Int): ChunkVolume =
    ZarrStore.read(spark, s"$path/$level")
}
