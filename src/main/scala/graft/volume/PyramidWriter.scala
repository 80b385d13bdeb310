package graft.volume

import graft.io.{Fio, FioConf}

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
    implicit val fc: FioConf = FioConf.of(vol.chunks.sparkSession)
    // overwrite semantics like the reference's rmtree, but atomic and
    // without an O(files) driver delete: stage the whole group in a temp
    // sibling, publish with O(1) renames at the end (see AtomicDir)
    val dest = Fio.qualify(path)
    AtomicDir.sweepLeftovers(dest)
    val dir = AtomicDir.tempSibling(dest)
    val stage = dir
    Fio.mkdirs(dir)
    Fio.writeString(Fio.child(dir, ".zgroup"), "{\n    \"zarr_format\": 2\n}")
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
      Fio.writeString(Fio.child(stage, ".zattrs"), multiscalesJson(vol.meta, upscaleFactor, levels))
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
  private def writeConsolidatedMetadata(path: String, levels: Int)(implicit fc: FioConf): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val docs = scala.collection.mutable.LinkedHashMap[String, JValue]()
    def add(key: String, file: String): Unit =
      Fio.readStringIfExists(file).foreach(body => docs(key) = JsonMethods.parse(body))
    add(".zgroup", Fio.child(path, ".zgroup"))
    add(".zattrs", Fio.child(path, ".zattrs"))
    for (i <- 0 until levels) {
      add(s"$i/.zarray", Fio.child(path, s"$i/.zarray"))
      add(s"$i/.zattrs", Fio.child(path, s"$i/.zattrs"))
    }
    val consolidated = JObject(
      "metadata" -> JObject(docs.toList: _*),
      "zarr_consolidated_format" -> JInt(1))
    Fio.writeString(Fio.child(path, ".zmetadata"),
      JsonMethods.pretty(JsonMethods.render(consolidated)))
  }

  /** A parsed OME-Zarr multiscales group: level paths in dataset order
    * and each level's (z,y,x) scale transform — what `zarr.open_group` +
    * `attrs["multiscales"]` gives the reference's viewer
    * (view_upscaled.py:11) before it picks a level.
    */
  final case class PyramidGroup(path: String, name: String,
      levelPaths: Seq[String], scalesZyx: Seq[Seq[Double]]) {
    def levels: Int = levelPaths.length
  }

  /** Open a pyramid group by its METADATA, the way a zarr client does:
    * consolidated `.zmetadata` when present (the one-GET cloud path,
    * `zarr.open_consolidated`), else `.zgroup` + `.zattrs`
    * (`zarr.open_group`). Returns the parsed `multiscales` entry; fails
    * loudly on a missing group, a non-v2 group, or attrs without
    * multiscales — never guesses level directories from listings.
    */
  def openGroup(path: String)(implicit fc: FioConf): PyramidGroup = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    require(Fio.isDirectory(path), s"$path: not a directory (no zarr group here)")
    val zmeta = Fio.readStringIfExists(Fio.child(path, ".zmetadata"))
    val (groupDoc, attrsDoc): (JValue, JValue) =
      zmeta match {
        case Some(body) =>
          val c = JsonMethods.parse(body)
          require((c \ "zarr_consolidated_format") == JInt(1),
            s"$path/.zmetadata: unsupported zarr_consolidated_format (want 1)")
          val docs = c \ "metadata"
          (docs \ ".zgroup", docs \ ".zattrs")
        case None =>
          val zgroup = Fio.readStringIfExists(Fio.child(path, ".zgroup"))
          val zattrs = Fio.readStringIfExists(Fio.child(path, ".zattrs"))
          require(zgroup.nonEmpty, s"$path: no .zmetadata and no .zgroup — not a zarr group")
          require(zattrs.nonEmpty, s"$path: group has no .zattrs (no multiscales metadata)")
          (JsonMethods.parse(zgroup.get), JsonMethods.parse(zattrs.get))
      }
    require((groupDoc \ "zarr_format") == JInt(2),
      s"$path: zarr_format ${JsonMethods.compact(JsonMethods.render(groupDoc \ "zarr_format"))} (want 2)")
    val multiscales = (attrsDoc \ "multiscales") match {
      case JArray(ms :: _) => ms
      case _ => throw new IllegalArgumentException(
        s"$path: .zattrs carries no multiscales entry — a zarr group, but not a pyramid")
    }
    val name = (multiscales \ "name") match {
      case JString(n) => n
      case _ => ""
    }
    val datasets = (multiscales \ "datasets") match {
      case JArray(ds) if ds.nonEmpty => ds
      case _ => throw new IllegalArgumentException(s"$path: multiscales has no datasets")
    }
    val levelPaths = datasets.map { d =>
      (d \ "path") match {
        case JString(p) => p
        case _ => throw new IllegalArgumentException(s"$path: multiscales dataset missing path")
      }
    }
    val scales = datasets.map { d =>
      (d \ "coordinateTransformations") match {
        case JArray(ts) =>
          ts.collectFirst { case t if (t \ "type") == JString("scale") =>
            (t \ "scale") match {
              case JArray(vs) => vs.map {
                case JDouble(v) => v
                case JInt(v) => v.toDouble
                case other => throw new IllegalArgumentException(
                  s"$path: non-numeric scale component $other")
              }
              case _ => throw new IllegalArgumentException(s"$path: scale transform without scale array")
            }
          }.getOrElse(Seq.empty)
        case _ => Seq.empty
      }
    }
    PyramidGroup(path, name, levelPaths, scales)
  }

  /** Read back one pyramid level THROUGH the group metadata (the read
    * half of view_upscaled.py:11): resolve `multiscales.datasets[level]
    * .path` via [[openGroup]], then open that zarr array. A level that
    * is not declared in the metadata is an error even if a directory of
    * that name exists.
    */
  def readLevel(spark: org.apache.spark.sql.SparkSession, path: String, level: Int): ChunkVolume = {
    val g = openGroup(path)
    require(level >= 0 && level < g.levels,
      s"$path: level $level out of range — multiscales declares ${g.levels} levels")
    ZarrStore.read(spark, Fio.child(path, g.levelPaths(level)))
  }

  // ------------------------------------------------------ NGFF 0.5 (v3)

  /** OME-NGFF 0.5 group document: a zarr v3 GROUP whose multiscales live
    * under `attributes.ome` with the version at the `ome` level — the
    * layout ome-zarr-py ≥ 0.5 / zarr-python 3 read.
    */
  def ngff05GroupJson(meta: VolumeMeta, upscaleFactor: Int, levels: Int, name: String = "labels"): String = {
    val datasets = (0 until levels).map { i =>
      val f = (1 << i).toDouble / upscaleFactor
      s"""        {
         |          "path": "$i",
         |          "coordinateTransformations": [{
         |            "type": "scale",
         |            "scale": [${meta.spacingZ * f}, ${meta.spacingY * f}, ${meta.spacingX * f}]
         |          }]
         |        }""".stripMargin
    }.mkString(",\n")
    s"""{
       |  "zarr_format": 3,
       |  "node_type": "group",
       |  "attributes": {
       |    "ome": {
       |      "version": "0.5",
       |      "multiscales": [{
       |        "name": ${jsonStr(name)},
       |        "axes": [
       |          {"name": "z", "type": "space", "unit": "micrometer"},
       |          {"name": "y", "type": "space", "unit": "micrometer"},
       |          {"name": "x", "type": "space", "unit": "micrometer"}
       |        ],
       |        "datasets": [
       |$datasets
       |        ]
       |      }]
       |    }
       |  }
       |}
       |""".stripMargin
  }

  /** Write the pyramid as an OME-NGFF 0.5 group: zarr v3 group document
    * + levels as zarr v3 arrays under `0/`, `1/`, … — the same level
    * lifecycle/rechunk discipline as the v2 [[write]], atomic-published
    * as one group.
    */
  def writeV3(vol: ChunkVolume, levels: Int, path: String, upscaleFactor: Int = 1,
      codec: ZarrStore.Codec = ZarrStore.ZstdCodec(),
      shardInner: Option[(Int, Int, Int)] = None): Unit = {
    val pyr = vol.pyramid(levels)
    implicit val fc: FioConf = FioConf.of(vol.chunks.sparkSession)
    val dest = Fio.qualify(path)
    AtomicDir.sweepLeftovers(dest)
    val dir = AtomicDir.tempSibling(dest)
    Fio.mkdirs(dir)
    Fio.writeString(Fio.child(dir, "zarr.json"),
      ngff05GroupJson(vol.meta, upscaleFactor, levels))
    val (bz, by, bx) = (vol.meta.chunkZ, vol.meta.chunkY, vol.meta.chunkX)
    try {
      pyr.zipWithIndex.foreach { case (level, i) =>
        val uniform =
          if (i == 0) level
          else level.rechunk(
            math.min(bz.toLong, level.meta.dimZ).toInt,
            math.min(by.toLong, level.meta.dimY).toInt,
            math.min(bx.toLong, level.meta.dimX).toInt)
        shardInner match {
          // sharded levels: the at-scale NGFF layout — object count per
          // level scales with SHARDS (the level's chunk grid), reads
          // stay one inner chunk; the level's uniform chunk shape must
          // be a multiple of the inner shape (writeSharded fails loud)
          case Some(inner) =>
            Zarr3Store.writeSharded(uniform, Fio.child(dir, i.toString), inner, codec)
          case None =>
            Zarr3Store.write(uniform, Fio.child(dir, i.toString), codec)
        }
      }
    } catch { case e: Throwable => AtomicDir.deleteInBackground(dir); throw e }
    AtomicDir.publish(dir, dest)
  }

  /** Open an NGFF 0.5 group by its `zarr.json`: v3 group node,
    * `attributes.ome.version == 0.5`, multiscales under `attributes.ome`.
    * Fails loudly on v2 groups (use [[openGroup]]) or missing ome attrs.
    */
  def openGroupV3(path: String)(implicit fc: FioConf): PyramidGroup = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val doc = Fio.readStringIfExists(Fio.child(path, "zarr.json"))
    require(doc.nonEmpty, s"$path: no zarr.json — not a zarr v3 group")
    val v = JsonMethods.parse(doc.get)
    require((v \ "zarr_format") == JInt(3), s"$path: not a zarr v3 document")
    require((v \ "node_type") == JString("group"), s"$path: not a group node")
    val ome = v \ "attributes" \ "ome"
    require(ome != JNothing, s"$path: group carries no attributes.ome (not NGFF >= 0.5)")
    val multiscales = (ome \ "multiscales") match {
      case JArray(ms :: _) => ms
      case _ => throw new IllegalArgumentException(
        s"$path: attributes.ome has no multiscales — an NGFF group, but not a pyramid")
    }
    val name = (multiscales \ "name") match { case JString(n) => n; case _ => "" }
    val datasets = (multiscales \ "datasets") match {
      case JArray(ds) if ds.nonEmpty => ds
      case _ => throw new IllegalArgumentException(s"$path: multiscales has no datasets")
    }
    val levelPaths = datasets.map { d =>
      (d \ "path") match {
        case JString(p) => p
        case _ => throw new IllegalArgumentException(s"$path: multiscales dataset missing path")
      }
    }
    val scales = datasets.map { d =>
      (d \ "coordinateTransformations") match {
        case JArray(ts) =>
          ts.collectFirst { case t if (t \ "type") == JString("scale") =>
            (t \ "scale") match {
              case JArray(vs) => vs.map {
                case JDouble(dd) => dd
                case JInt(n) => n.toDouble
                case other => throw new IllegalArgumentException(
                  s"$path: non-numeric scale component $other")
              }
              case _ => throw new IllegalArgumentException(s"$path: scale transform without scale array")
            }
          }.getOrElse(Seq.empty)
        case _ => Seq.empty
      }
    }
    PyramidGroup(path, name, levelPaths, scales)
  }

  /** Read one level of an NGFF 0.5 group through its metadata. */
  def readLevelV3(spark: org.apache.spark.sql.SparkSession, path: String, level: Int): ChunkVolume = {
    val g = openGroupV3(path)
    require(level >= 0 && level < g.levels,
      s"$path: level $level out of range — multiscales declares ${g.levels} levels")
    Zarr3Store.read(spark, Fio.child(path, g.levelPaths(level)))
  }
}
