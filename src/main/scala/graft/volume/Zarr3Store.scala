package graft.volume

import graft.volume.ZarrStore.{BloscCodec, Codec, GzipCodec, Raw, ZarrMeta, ZstdCodec}
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods
import java.nio.file.{Files, Paths}

/** Zarr v3 scan/write (zarr-specs v3.0 — the current spec, the one
  * OME-NGFF 0.5 targets): `zarr.json` metadata document, named
  * `data_type`s, a codec PIPELINE (`bytes` endianness codec + optional
  * compressor), and `c/`-prefixed slash-separated chunk keys. Everything
  * below the metadata layer — blosc container incl. bitshuffle, zstd,
  * chunk encode/decode, fill-value semantics, AtomicDir publish — is the
  * SAME battle-tested machinery as the v2 store; v3 is a metadata and
  * layout dialect over it, which is exactly how zarr-python implemented
  * it too. Supported codecs: `bytes` (both endians) alone, or followed by
  * ONE of `blosc` (all reference cnames/shuffles), `zstd`, `gzip`
  * (RFC-1952 — distinct from v2's RFC-1950 `zlib`). `sharding_indexed`
  * fails loud with a named error: sharding changes the addressing model
  * and silently mis-reading shards as chunks would corrupt volumes.
  */
object Zarr3Store {

  /** v3 data_type name ↔ the engine's internal v2-style dtype tag. */
  private val NameOfDtype: Map[String, String] = Map(
    "u1" -> "uint8", "i1" -> "int8", "u2" -> "uint16", "i2" -> "int16",
    "u4" -> "uint32", "i4" -> "int32", "f4" -> "float32", "f8" -> "float64")
  private val DtypeOfName: Map[String, String] = NameOfDtype.map(_.swap)

  private def shuffleName(s: Int): String = s match {
    case 0 => "noshuffle"
    case 1 => "shuffle"
    case 2 => "bitshuffle"
    case other => throw new IllegalArgumentException(s"bad blosc shuffle $other")
  }

  private def shuffleOf(name: String): Int = name match {
    case "noshuffle" => 0
    case "shuffle" => 1
    case "bitshuffle" => 2
    case other => throw new IllegalArgumentException(s"bad blosc shuffle '$other'")
  }

  /** The `zarr.json` document for an array (spec key order). `attrs`
    * lands under the spec's user-metadata `attributes` member — the v3
    * home for the write provenance the v2 sink records in `.zattrs`.
    */
  def zarrJson(m: ZarrMeta, attrs: Map[String, String] = Map.empty): String = {
    val compressor = m.codec match {
      case Raw => ""
      case b: BloscCodec =>
        s""",
           |        {"name": "blosc", "configuration": {"cname": "${b.cname}", "clevel": ${b.clevel}, "shuffle": "${shuffleName(b.shuffle)}", "typesize": ${m.bpp}, "blocksize": 0}}""".stripMargin
      case ZstdCodec(l) =>
        s""",
           |        {"name": "zstd", "configuration": {"level": $l, "checksum": false}}""".stripMargin
      case GzipCodec(l) =>
        s""",
           |        {"name": "gzip", "configuration": {"level": $l}}""".stripMargin
      case other => throw new IllegalArgumentException(
        s"codec ${other.id.getOrElse("?")} has no zarr v3 form here (use blosc/zstd/gzip/raw)")
    }
    val endian = if (m.bigEndian) "big" else "little"
    s"""{
       |    "zarr_format": 3,
       |    "node_type": "array",
       |    "shape": [${m.shape.mkString(", ")}],
       |    "data_type": "${NameOfDtype(m.dtype.substring(1))}",
       |    "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [${m.chunks.mkString(", ")}]}},
       |    "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
       |    "fill_value": ${m.fillValue},
       |    "codecs": [
       |        {"name": "bytes", "configuration": {"endian": "$endian"}}$compressor
       |    ],
       |    "attributes": {${
      attrs.toSeq.sortBy(_._1)
        .map { case (k, v) => ChunkVolume.jsonStr(k) + ": " + ChunkVolume.jsonStr(v) }
        .mkString(", ")
    }}
       |}""".stripMargin
  }

  def parseZarrJson(json: String): ZarrMeta = {
    val v = JsonMethods.parse(json)
    def num(j: JValue): Long = j match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case JDouble(d) => d.toLong
      case JDecimal(d) => d.toLong
      case JNull => 0L
      case other => throw new IllegalArgumentException(s"expected number, got $other")
    }
    require(num(v \ "zarr_format") == 3, s"not a zarr v3 document")
    // the v3 spec REQUIRES readers to refuse documents carrying unknown
    // extension members marked "must_understand": true — silently
    // ignoring one could change how the data must be interpreted
    val knownMembers = Set(
      "zarr_format", "node_type", "shape", "data_type", "chunk_grid",
      "chunk_key_encoding", "fill_value", "codecs", "attributes",
      "dimension_names", "storage_transformers")
    v match {
      case JObject(members) =>
        members.foreach { case (key, value) =>
          if (!knownMembers.contains(key)) {
            val mu = value \ "must_understand"
            require(mu == JBool(false),
              s"zarr v3 document carries unknown extension member '$key' without " +
                "\"must_understand\": false — the spec requires refusing it")
          }
        }
      case other => throw new IllegalArgumentException(s"zarr.json is not an object: $other")
    }
    val JString(nodeType) = v \ "node_type"
    require(nodeType == "array", s"only array nodes supported, got '$nodeType'")
    val JArray(shape) = v \ "shape"
    val JString(dataType) = v \ "data_type"
    val tag = DtypeOfName.getOrElse(dataType,
      throw new IllegalArgumentException(s"unsupported zarr v3 data_type '$dataType'"))
    val grid = v \ "chunk_grid"
    val JString(gridName) = grid \ "name"
    require(gridName == "regular", s"only regular chunk grids supported, got '$gridName'")
    val JArray(chunkShape) = grid \ "configuration" \ "chunk_shape"
    val sep = v \ "chunk_key_encoding" match {
      case JNothing => "/"
      case cke =>
        (cke \ "name") match {
          case JString("default") => ()
          case JString(other) => throw new IllegalArgumentException(
            s"unsupported chunk_key_encoding '$other'")
          case _ => ()
        }
        cke \ "configuration" \ "separator" match {
          case JString(s) => s
          case _ => "/"
        }
    }
    require(sep == "/" || sep == ".", s"bad chunk key separator '$sep'")
    val JArray(codecs) = v \ "codecs"
    require(codecs.nonEmpty, "empty codec pipeline")
    // pipeline: bytes first (endianness), then at most one compressor
    val JString(c0name) = codecs.head \ "name"
    require(c0name == "bytes",
      s"first codec must be 'bytes', got '$c0name' (sharding_indexed and " +
        "array->array codecs are not supported)")
    val bigEndian = codecs.head \ "configuration" \ "endian" match {
      case JString("big") => true
      case JString("little") | JNothing => false
      case other => throw new IllegalArgumentException(s"bad endian $other")
    }
    val codec: Codec = codecs.tail match {
      case Nil => Raw
      case c :: Nil =>
        val JString(name) = c \ "name"
        val conf = c \ "configuration"
        name match {
          case "blosc" =>
            val JString(cname) = conf \ "cname"
            val clevel = num(conf \ "clevel").toInt
            val JString(sh) = conf \ "shuffle"
            BloscCodec(cname, clevel, shuffleOf(sh))
          case "zstd" => ZstdCodec(num(conf \ "level").toInt)
          case "gzip" => GzipCodec(num(conf \ "level").toInt)
          case other => throw new IllegalArgumentException(
            s"unsupported zarr v3 codec '$other' (sharding_indexed is deliberately rejected)")
        }
      case more => throw new IllegalArgumentException(
        s"codec pipelines with ${more.length} compressors are not supported")
    }
    val endianTag = (if (tag.endsWith("1")) "|" else if (bigEndian) ">" else "<") + tag
    // integer data_types demand an integral fill_value: truncating 3.7 → 3
    // would silently rewrite what absent chunks decode to
    val fillValue = v \ "fill_value" match {
      case JDouble(d) if tag != "f4" && tag != "f8" =>
        require(d.isWhole,
          s"non-integral fill_value $d for integer data_type '$dataType'")
        d.toLong
      case other => num(other)
    }
    val shapeN = shape.map(num)
    val chunkN = chunkShape.map(num(_).toInt)
    require(shapeN.forall(_ > 0) && chunkN.forall(_ > 0),
      s"non-positive shape/chunk dims: shape=${shapeN.mkString(",")} chunks=${chunkN.mkString(",")}")
    ZarrMeta(shapeN, chunkN, endianTag, codec, fillValue, sep)
  }

  private def metaOf(vol: VolumeMeta, codec: Codec): ZarrMeta = ZarrMeta(
    shape = Seq(vol.dimZ, vol.dimY, vol.dimX),
    chunks = Seq(vol.chunkZ, vol.chunkY, vol.chunkX),
    dtype = ZarrStore.DtypeOf(vol.elementType),
    codec = codec match {
      case b: BloscCodec => b.withTypesize(vol.bytesPerVoxel)
      case c => c
    },
    fillValue = 0L,
    dimSeparator = "/")

  /** Write a ChunkVolume as a zarr v3 array: driver writes `zarr.json`,
    * executors land `c/z/y/x` chunk files (same AtomicDir all-or-nothing
    * publish and executor-parallel scaling as the v2 writer).
    */
  def write(
      vol: ChunkVolume,
      path: String,
      codec: Codec = ZstdCodec(),
      extraAttrs: Map[String, String] = Map.empty): Unit = {
    val dest = Paths.get(path).toAbsolutePath.normalize
    AtomicDir.sweepLeftovers(dest)
    val dir = AtomicDir.tempSibling(dest)
    Files.createDirectories(dir)
    val zm = metaOf(vol.meta, codec)
    Files.writeString(dir.resolve("zarr.json"), zarrJson(zm, extraAttrs))
    val pathStr = dir.toString
    val meta = vol.meta
    val effCodec = zm.codec
    try {
      vol.chunks.foreachPartition { (it: Iterator[Chunk]) =>
        it.foreach { c =>
          val f = Paths.get(pathStr, "c", c.cz.toString, c.cy.toString, c.cx.toString)
          Files.createDirectories(f.getParent)
          Files.write(f, ZarrStore.encodeChunkBytes(c, meta, effCodec))
        }
      }
    } catch { case e: Throwable => AtomicDir.deleteInBackground(dir); throw e }
    AtomicDir.publish(dir, dest)
  }

  /** Append chunk files into an existing zarr v3 array — the
    * incremental-ingest building block (v3 chunks are independent files,
    * so micro-batches append idempotently; a re-landed coordinate
    * overwrites its own file). Writes `zarr.json` on first call.
    */
  def appendChunks(
      chunks: org.apache.spark.sql.Dataset[Chunk],
      path: String,
      meta: VolumeMeta,
      codec: Codec = ZstdCodec()): Unit = {
    val dir = Paths.get(path).toAbsolutePath
    Files.createDirectories(dir)
    val zm = metaOf(meta, codec)
    val doc = dir.resolve("zarr.json")
    if (!Files.exists(doc)) Files.writeString(doc, zarrJson(zm))
    val pathStr = dir.toString
    val effCodec = zm.codec
    chunks.foreachPartition { (it: Iterator[Chunk]) =>
      it.foreach { c =>
        val f = Paths.get(pathStr, "c", c.cz.toString, c.cy.toString, c.cx.toString)
        Files.createDirectories(f.getParent)
        Files.write(f, ZarrStore.encodeChunkBytes(c, meta, effCodec))
      }
    }
  }

  /** Read a zarr v3 array directory as a ChunkVolume: grid planned from
    * `zarr.json` alone, absent chunk files decode as fill_value, chunk
    * keys resolved through the `default` encoding (`c/` prefix + the
    * configured separator).
    */
  def read(spark: SparkSession, path: String): ChunkVolume = {
    val dir = Paths.get(path).toAbsolutePath
    val zm = parseZarrJson(Files.readString(dir.resolve("zarr.json")))
    val Seq(dz, dy, dx) = zm.shape
    val Seq(cz, cy, cx) = zm.chunks
    val Seq(ncz0, ncy0, ncx0) = zm.gridShape
    val vm = VolumeMeta(dz, dy, dx, cz, cy, cx, ncz0, ncy0, ncx0, zm.elementType,
      spacingX = 1.0, spacingY = 1.0, spacingZ = 1.0)
    val pathStr = dir.toString
    val sep = zm.dimSeparator
    val (ncy, ncx) = (vm.ncy, vm.ncx)
    import spark.implicits._
    val nChunks = vm.ncz.toLong * ncy * ncx
    val chunks = spark.range(nChunks)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .map { idx =>
        val icz = (idx / (ncy.toLong * ncx)).toInt
        val icy = ((idx / ncx) % ncy).toInt
        val icx = (idx % ncx).toInt
        // default chunk key encoding: "c" <sep> z <sep> y <sep> x
        val f = Paths.get(pathStr, (Seq("c", icz, icy, icx).mkString(sep)).split('/').toSeq: _*)
        val bytes = if (Files.exists(f)) Some(Files.readAllBytes(f)) else None
        ZarrStore.decodeChunk(bytes, zm, vm, icz, icy, icx)
      }
    ChunkVolume(chunks, vm)
  }
}
