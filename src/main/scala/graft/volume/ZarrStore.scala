package graft.volume

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{Deflater, Inflater}

/** Spec-compliant Zarr v2 DirectoryStore — the reference's actual on-disk
  * world (`zarr.DirectoryStore` writes in upscale_streaming.py:103–127,
  * `da.from_zarr` reads in verify_labels.py:15 / view_upscaled.py:11):
  *
  *  - `.zarray` JSON metadata (zarr_format 2, C order, dot separator);
  *  - one file per chunk named `z.y.x` in chunk-grid coordinates;
  *  - every chunk file holds the FULL chunk shape in C order — edge chunks
  *    are padded with `fill_value` on write and trimmed on read;
  *  - a chunk file may be absent, meaning "entirely fill_value";
  *  - codecs: raw (`compressor: null`), numcodecs `zlib` (RFC-1950 via
  *    java.util.zip) and numcodecs `zstd` (plain zstd frames) — both
  *    readable by python-zarr without C-blosc. The reference's default
  *    Blosc *container* (16-byte block header + bitshuffle) is not
  *    emitted; `--compressor zstd` in the reference maps to the same zstd
  *    frames we write.
  *  - dtype tags with explicit endianness (`<u4`, `>u4`, `|u1`, …): the
  *    writer emits little-endian (chunk payloads are LE in memory), the
  *    reader byte-swaps big-endian arrays on decode.
  *
  * This store is interop-first; the sibling [[ChunkStore]] (GCS2 headers
  * with per-chunk label stats) remains the value-indexed internal format.
  */
object ZarrStore {

  /** MET element type -> little-endian zarr dtype tag. */
  val DtypeOf: Map[String, String] = Map(
    "MET_UCHAR" -> "|u1", "MET_CHAR" -> "|i1",
    "MET_USHORT" -> "<u2", "MET_SHORT" -> "<i2",
    "MET_UINT" -> "<u4", "MET_INT" -> "<i4",
    "MET_FLOAT" -> "<f4", "MET_DOUBLE" -> "<f8",
  )
  private val MetOf: Map[String, String] = DtypeOf.map { case (k, v) => v.substring(1) -> k }

  sealed trait Codec {
    def id: Option[String]
    def compress(src: Array[Byte]): Array[Byte]
    def decompress(src: Array[Byte], rawLen: Int): Array[Byte]
  }

  case object Raw extends Codec {
    val id: Option[String] = None
    def compress(src: Array[Byte]): Array[Byte] = src
    def decompress(src: Array[Byte], rawLen: Int): Array[Byte] = src
  }

  /** numcodecs `zlib`: RFC-1950 stream, exactly python zlib.compress. */
  final case class Zlib(level: Int = 5) extends Codec {
    val id: Option[String] = Some("zlib")
    def compress(src: Array[Byte]): Array[Byte] = {
      val d = new Deflater(level)
      try {
        d.setInput(src); d.finish()
        val out = new ByteArrayOutputStream(math.max(64, src.length / 4))
        val buf = new Array[Byte](64 * 1024)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        out.toByteArray
      } finally d.end()
    }
    def decompress(src: Array[Byte], rawLen: Int): Array[Byte] = {
      val inf = new Inflater()
      try {
        inf.setInput(src)
        val out = new Array[Byte](rawLen)
        var off = 0
        while (off < rawLen && !inf.finished()) off += inf.inflate(out, off, rawLen - off)
        require(off == rawLen, s"zlib chunk shorter than expected: $off/$rawLen")
        out
      } finally inf.end()
    }
  }

  /** numcodecs `zstd`: plain zstd frames (zstd-jni, already on Spark's
    * classpath for shuffle compression).
    */
  final case class ZstdCodec(level: Int = 3) extends Codec {
    val id: Option[String] = Some("zstd")
    def compress(src: Array[Byte]): Array[Byte] =
      com.github.luben.zstd.Zstd.compress(src, level)
    def decompress(src: Array[Byte], rawLen: Int): Array[Byte] = {
      val out = new Array[Byte](rawLen)
      com.github.luben.zstd.Zstd.decompressByteArray(out, 0, rawLen, src, 0, src.length)
      out
    }
  }

  /** Parsed `.zarray` metadata (shape/chunks in zarr's (z,y,x) row-major
    * order, matching the reference's array axis convention).
    */
  final case class ZarrMeta(
      shape: Seq[Long],
      chunks: Seq[Int],
      dtype: String,
      codec: Codec,
      fillValue: Long,
      dimSeparator: String = ".",
  ) {
    require(shape.length == 3 && chunks.length == 3, "ZarrStore handles 3-D arrays")
    def bigEndian: Boolean = dtype.startsWith(">")
    def bpp: Int = dtype.substring(2).toInt
    def elementType: String = MetOf.getOrElse(
      dtype.substring(1),
      throw new IllegalArgumentException(s"unsupported zarr dtype: $dtype"))
    def gridShape: Seq[Int] =
      shape.zip(chunks).map { case (d, c) => ((d + c - 1) / c).toInt }
    def chunkElems: Int = chunks.product
  }

  /** The exact `.zarray` document. Key order and formatting follow the
    * zarr v2 spec examples (python-zarr accepts any valid JSON; goldens in
    * ZarrStoreSpec pin this form).
    */
  def zarrayJson(m: ZarrMeta): String = {
    val comp = m.codec match {
      case Raw => "null"
      case Zlib(l) => s"""{"id": "zlib", "level": $l}"""
      case ZstdCodec(l) => s"""{"id": "zstd", "level": $l}"""
    }
    s"""{
       |    "zarr_format": 2,
       |    "shape": [${m.shape.mkString(", ")}],
       |    "chunks": [${m.chunks.mkString(", ")}],
       |    "dtype": "${m.dtype}",
       |    "compressor": $comp,
       |    "fill_value": ${m.fillValue},
       |    "order": "C",
       |    "filters": null,
       |    "dimension_separator": "${m.dimSeparator}"
       |}""".stripMargin
  }

  def parseZarray(json: String): ZarrMeta = {
    val v = JsonMethods.parse(json)
    def num(j: JValue): Long = j match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case JDouble(d) => d.toLong
      case JDecimal(d) => d.toLong
      case JNull => 0L // fill_value null -> 0
      case other => throw new IllegalArgumentException(s"expected number, got $other")
    }
    val JInt(fmt) = v \ "zarr_format"
    require(fmt == 2, s"only zarr v2 supported, got $fmt")
    val JArray(shape) = v \ "shape"
    val JArray(chunks) = v \ "chunks"
    val JString(dtype) = v \ "dtype"
    val JString(order) = v \ "order"
    require(order == "C", s"only C-order arrays supported, got $order")
    v \ "filters" match {
      case JNull | JNothing | JArray(Nil) => ()
      case f => throw new IllegalArgumentException(s"zarr filters unsupported: $f")
    }
    val codec = v \ "compressor" match {
      case JNull | JNothing => Raw
      case comp =>
        val JString(id) = comp \ "id"
        val level = comp \ "level" match { case JNothing => 5 case l => num(l).toInt }
        id match {
          case "zlib" => Zlib(level)
          case "zstd" => ZstdCodec(level)
          case "blosc" => throw new IllegalArgumentException(
            "blosc-container chunks unsupported (write with zlib/zstd/raw codecs)")
          case other => throw new IllegalArgumentException(s"unsupported zarr codec: $other")
        }
    }
    val sep = v \ "dimension_separator" match { case JString(s) => s case _ => "." }
    ZarrMeta(shape.map(num), chunks.map(num(_).toInt), dtype, codec, num(v \ "fill_value"), sep)
  }

  /** In-place little<->big endian element swap (no-op for bpp == 1). */
  private[volume] def byteSwap(data: Array[Byte], bpp: Int): Unit = {
    if (bpp <= 1) return
    var i = 0
    while (i < data.length) {
      var a = 0; var b = bpp - 1
      while (a < b) {
        val t = data(i + a); data(i + a) = data(i + b); data(i + b) = t
        a += 1; b -= 1
      }
      i += bpp
    }
  }

  private def metaOf(vol: VolumeMeta, codec: Codec): ZarrMeta = ZarrMeta(
    shape = Seq(vol.dimZ, vol.dimY, vol.dimX),
    chunks = Seq(vol.chunkZ, vol.chunkY, vol.chunkX),
    dtype = DtypeOf(vol.elementType),
    codec = codec,
    fillValue = 0L)

  /** Write a ChunkVolume as a zarr v2 array directory. Chunk files are
    * written straight from executor tasks (the driver only writes the two
    * metadata documents), so the write parallelizes like the reference's
    * dask `to_zarr` and scales with the cluster, not the driver.
    */
  def write(vol: ChunkVolume, path: String, codec: Codec = ZstdCodec(),
      extraAttrs: Map[String, String] = Map.empty): Unit = {
    val dir = Paths.get(path).toAbsolutePath
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(dir)
    val zm = metaOf(vol.meta, codec)
    Files.writeString(dir.resolve(".zarray"), zarrayJson(zm))
    // .zattrs: spacing + provenance (user attrs per the spec; zarr/dask
    // readers ignore unknown keys). Spacing is stored (x,y,z) like MHD's
    // ElementSpacing so round-trips preserve the header convention.
    val attrs = Map(
      "graft:spacing" -> s"[${vol.meta.spacingX}, ${vol.meta.spacingY}, ${vol.meta.spacingZ}]",
      "graft:elementType" -> ChunkVolume.jsonStr(vol.meta.elementType),
    ) ++ extraAttrs.map { case (k, v) => k -> ChunkVolume.jsonStr(v) }
    Files.writeString(dir.resolve(".zattrs"),
      attrs.toSeq.sortBy(_._1)
        .map { case (k, v) => s"    ${ChunkVolume.jsonStr(k)}: $v" }
        .mkString("{\n", ",\n", "\n}"))
    val pathStr = dir.toString
    val (ckZ, ckY, ckX) = (vol.meta.chunkZ, vol.meta.chunkY, vol.meta.chunkX)
    val (dimZ, dimY, dimX) = (vol.meta.dimZ, vol.meta.dimY, vol.meta.dimX)
    val bpp = vol.meta.bytesPerVoxel
    vol.chunks.foreachPartition { (it: Iterator[Chunk]) =>
      it.foreach { c =>
        // zarr requires a UNIFORM grid (edge chunks trail); reject inputs
        // whose grid drifted (e.g. raw decimate output) instead of
        // silently misplacing voxels — callers rechunk first.
        require(
          c.z0 == c.cz.toLong * ckZ && c.y0 == c.cy.toLong * ckY && c.x0 == c.cx.toLong * ckX
            && c.nz == math.min(ckZ.toLong, dimZ - c.z0).toInt
            && c.ny == math.min(ckY.toLong, dimY - c.y0).toInt
            && c.nx == math.min(ckX.toLong, dimX - c.x0).toInt,
          s"chunk (${c.cz},${c.cy},${c.cx}) at (${c.z0},${c.y0},${c.x0}) size " +
            s"(${c.nz},${c.ny},${c.nx}) is not on the uniform ($ckZ,$ckY,$ckX) grid — " +
            "rechunk before ZarrStore.write")
        val full = c.nz == ckZ && c.ny == ckY && c.nx == ckX
        val payload =
          if (full) c.data
          else { // pad edge chunks to the full chunk shape with fill 0
            val padded = new Array[Byte](ckZ * ckY * ckX * bpp)
            ChunkKernels.placeBox(padded, ckY, ckX, bpp, 0, 0, 0, c.nz, c.ny, c.nx, c.data)
            padded
          }
        val bytes = codec.compress(payload)
        Files.write(Paths.get(pathStr, s"${c.cz}.${c.cy}.${c.cx}"), bytes)
      }
    }
  }

  /** Read `.zarray` (+ spacing attr if present) into engine metadata. */
  def readMeta(path: String): (ZarrMeta, VolumeMeta) = {
    val dir = Paths.get(path).toAbsolutePath
    val zm = parseZarray(Files.readString(dir.resolve(".zarray")))
    val spacing = {
      val attrsPath = dir.resolve(".zattrs")
      val re = """"graft:spacing"\s*:\s*\[([^\]]*)\]""".r
      if (Files.exists(attrsPath))
        re.findFirstMatchIn(Files.readString(attrsPath))
          .map(_.group(1).split(",").map(_.trim.toDouble))
          .filter(_.length == 3)
          .map(a => (a(0), a(1), a(2)))
          .getOrElse((1.0, 1.0, 1.0))
      else (1.0, 1.0, 1.0)
    }
    val Seq(dz, dy, dx) = zm.shape
    val Seq(cz, cy, cx) = zm.chunks
    val Seq(ncz, ncy, ncx) = zm.gridShape
    val vm = VolumeMeta(dz, dy, dx, cz, cy, cx, ncz, ncy, ncx, zm.elementType,
      spacingX = spacing._1, spacingY = spacing._2, spacingZ = spacing._3)
    (zm, vm)
  }

  /** Decode one chunk file's bytes to the engine's trimmed little-endian
    * payload for grid cell (cz,cy,cx); `None` bytes = absent file =
    * all-fill chunk.
    */
  private[graft] def decodeChunk(
      bytes: Option[Array[Byte]], zm: ZarrMeta, vm: VolumeMeta,
      cz: Int, cy: Int, cx: Int): Chunk = {
    val bpp = zm.bpp
    val z0 = cz.toLong * vm.chunkZ; val y0 = cy.toLong * vm.chunkY; val x0 = cx.toLong * vm.chunkX
    val nz = math.min(vm.chunkZ.toLong, vm.dimZ - z0).toInt
    val ny = math.min(vm.chunkY.toLong, vm.dimY - y0).toInt
    val nx = math.min(vm.chunkX.toLong, vm.dimX - x0).toInt
    val data = bytes match {
      case None =>
        val fill = new Array[Byte](nz * ny * nx * bpp)
        if (zm.fillValue != 0L) {
          var i = 0
          while (i < nz * ny * nx) { ChunkKernels.encodeLong(zm.fillValue, fill, i, bpp); i += 1 }
        }
        fill
      case Some(raw) =>
        val full = zm.codec.decompress(raw, zm.chunkElems * bpp)
        if (zm.bigEndian) byteSwap(full, bpp)
        if (nz == vm.chunkZ && ny == vm.chunkY && nx == vm.chunkX) full
        else ChunkKernels.extractBox(full, vm.chunkY, vm.chunkX, bpp, 0, 0, 0, nz, ny, nx)
    }
    Chunk(cz, cy, cx, z0, y0, x0, nz, ny, nx, data)
  }

  /** Read a zarr v2 array directory as a ChunkVolume. The full chunk grid
    * is planned from `.zarray` alone (no directory listing); absent chunk
    * files decode as fill_value per the spec.
    */
  def read(spark: SparkSession, path: String): ChunkVolume = {
    val (zm, vm) = readMeta(path)
    val pathStr = Paths.get(path).toAbsolutePath.toString
    val sep = zm.dimSeparator
    val (ncy, ncx) = (vm.ncy, vm.ncx)
    import spark.implicits._
    val nChunks = vm.ncz.toLong * ncy * ncx
    val chunks = spark.range(nChunks)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .map { idx =>
        val cz = (idx / (ncy.toLong * ncx)).toInt
        val cy = ((idx / ncx) % ncy).toInt
        val cx = (idx % ncx).toInt
        val f = Paths.get(pathStr, s"$cz$sep$cy$sep$cx")
        val bytes = if (Files.exists(f)) Some(Files.readAllBytes(f)) else None
        decodeChunk(bytes, zm, vm, cz, cy, cx)
      }
    ChunkVolume(chunks, vm)
  }
}
