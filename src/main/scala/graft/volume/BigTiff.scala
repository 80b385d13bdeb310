package graft.volume

import org.apache.spark.sql.SparkSession
import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** BigTIFF multi-page slice export/import (K5 sink + S5 scan, reference
  * anno_upsampling.py:112–118 `TiffWriter(..., bigtiff=True)` writing one
  * photometric-minisblack page per z slice).
  *
  * Self-contained little-endian BigTIFF (magic 43, 8-byte offsets), one
  * uncompressed single-strip page per z. Every byte's file position is a
  * pure function of (dims, bpp): slice z lives at 16 + z·sliceBytes and
  * the IFD chain follows the last slice. The driver therefore writes only
  * the header + IFD table (a few hundred KB for thousands of pages) and
  * EXECUTOR tasks fill their chunks' bytes with positioned writes over
  * disjoint ranges — no slab collect, no driver serialization point, I/O
  * parallelism = task parallelism. (Requires the output path on a shared
  * POSIX mount in multi-node deployments, like any side-file sink.)
  * The reader mirrors the pattern: driver parses the tiny IFD chain,
  * executors read their slices positionally.
  */
object BigTiff {

  // (bits per sample, TIFF SampleFormat) per MHD element type
  private val Formats: Map[String, (Int, Int)] = Map(
    "MET_UCHAR" -> (8, 1), "MET_CHAR" -> (8, 2),
    "MET_USHORT" -> (16, 1), "MET_SHORT" -> (16, 2),
    "MET_UINT" -> (32, 1), "MET_INT" -> (32, 2),
    "MET_FLOAT" -> (32, 3), "MET_DOUBLE" -> (64, 3),
  )
  private val ByType: Map[(Int, Int), String] = Formats.map(_.swap)

  private val TagWidth = 256; private val TagLength = 257; private val TagBits = 258
  private val TagCompression = 259; private val TagPhotometric = 262
  private val TagStripOffsets = 273; private val TagSamplesPerPixel = 277
  private val TagRowsPerStrip = 278; private val TagStripByteCounts = 279
  private val TagSampleFormat = 339
  private val TypeShort = 3; private val TypeLong = 4; private val TypeLong8 = 16

  /** Export a volume as a multi-page BigTIFF, one page per z slice.
    * The driver writes header + IFD chain (offsets precomputed); executor
    * tasks write their chunks' voxels directly at their final positions.
    */
  def write(vol: ChunkVolume, path: String): Unit = {
    val m = vol.meta
    val bpp = m.bytesPerVoxel
    val (bits, sampleFormat) = Formats(m.elementType)
    val (dimY, dimX) = (m.dimY.toInt, m.dimX.toInt)
    val sliceBytes = dimY.toLong * dimX * bpp
    val dataStart = 16L
    val firstIfd = dataStart + m.dimZ * sliceBytes
    val nTags = 10
    val ifdSize = 8 + nTags * 20 + 8

    Files.deleteIfExists(Paths.get(path))
    val f = new RandomAccessFile(path, "rw")
    try {
      // full size up front: unwritten gaps read as zeros (background)
      f.setLength(firstIfd + m.dimZ * ifdSize)
      val header = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      header.put('I'.toByte).put('I'.toByte).putShort(43).putShort(8).putShort(0).putLong(firstIfd)
      f.write(header.array())

      // IFD chain, one per page — every strip offset is computable
      val buf = ByteBuffer.allocate(ifdSize).order(ByteOrder.LITTLE_ENDIAN)
      def entry(b: ByteBuffer, tag: Int, tpe: Int, value: Long): Unit = {
        b.putShort(tag.toShort).putShort(tpe.toShort).putLong(1L).putLong(value)
      }
      f.seek(firstIfd)
      for (z <- 0 until m.dimZ.toInt) {
        buf.clear()
        buf.putLong(nTags.toLong)
        entry(buf, TagWidth, TypeLong, dimX.toLong)
        entry(buf, TagLength, TypeLong, dimY.toLong)
        entry(buf, TagBits, TypeShort, bits.toLong)
        entry(buf, TagCompression, TypeShort, 1L)
        entry(buf, TagPhotometric, TypeShort, 1L)
        entry(buf, TagStripOffsets, TypeLong8, dataStart + z * sliceBytes)
        entry(buf, TagSamplesPerPixel, TypeShort, 1L)
        entry(buf, TagRowsPerStrip, TypeLong, dimY.toLong)
        entry(buf, TagStripByteCounts, TypeLong8, sliceBytes)
        entry(buf, TagSampleFormat, TypeShort, sampleFormat.toLong)
        val next = if (z == m.dimZ - 1) 0L else firstIfd + (z + 1).toLong * ifdSize
        buf.putLong(next)
        f.write(buf.array())
      }
    } finally f.close()

    // executor fill: each chunk's bytes land at positions disjoint from
    // every other chunk's, so tasks write concurrently with no
    // coordination. Full-width chunks (x0=0, nx=dimX) write one
    // contiguous run per chunk-slice; others write per row.
    val pathStr = Paths.get(path).toAbsolutePath.toString
    vol.chunks.foreachPartition { (it: Iterator[Chunk]) =>
      val ch = java.nio.channels.FileChannel.open(
        Paths.get(pathStr), java.nio.file.StandardOpenOption.WRITE)
      try {
        it.foreach { c =>
          var zl = 0
          while (zl < c.nz) {
            val slicePos = dataStart + (c.z0 + zl) * sliceBytes
            if (c.x0 == 0 && c.nx == dimX) {
              val run = ByteBuffer.wrap(c.data, zl * c.ny * c.nx * bpp, c.ny * c.nx * bpp)
              var p = slicePos + c.y0 * dimX * bpp
              while (run.hasRemaining) p += ch.write(run, p)
            } else {
              var y = 0
              while (y < c.ny) {
                val row = ByteBuffer.wrap(c.data, ((zl * c.ny + y) * c.nx) * bpp, c.nx * bpp)
                var p = slicePos + ((c.y0 + y) * dimX + c.x0) * bpp
                while (row.hasRemaining) p += ch.write(row, p)
                y += 1
              }
            }
            zl += 1
          }
        }
      } finally ch.close()
    }
  }

  private final case class Page(width: Int, height: Int, bits: Int, sampleFormat: Int, stripOffset: Long, stripBytes: Long)

  private def parsePages(path: String): Seq[Page] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(b.get() == 'I' && b.get() == 'I', "not a little-endian TIFF")
    require(b.getShort() == 43, "not a BigTIFF (magic 43)")
    require(b.getShort() == 8, "BigTIFF offset size must be 8")
    b.getShort()
    var ifd = b.getLong(8)
    val pages = Seq.newBuilder[Page]
    while (ifd != 0L) {
      val n = b.getLong(ifd.toInt).toInt
      var width = 0; var height = 0; var bits = 0; var sf = 1
      var stripOff = 0L; var stripBytes = 0L
      for (i <- 0 until n) {
        val e = ifd.toInt + 8 + i * 20
        val tag = b.getShort(e) & 0xffff
        val value = b.getLong(e + 12)
        tag match {
          case TagWidth => width = value.toInt
          case TagLength => height = value.toInt
          case TagBits => bits = (value & 0xffff).toInt
          case TagStripOffsets => stripOff = value
          case TagStripByteCounts => stripBytes = value
          case TagSampleFormat => sf = (value & 0xffff).toInt
          case _ => ()
        }
      }
      pages += Page(width, height, bits, sf, stripOff, stripBytes)
      ifd = b.getLong(ifd.toInt + 8 + n * 20)
    }
    pages.result()
  }

  /** Scan a BigTIFF written by [[write]] back into a ChunkVolume (one
    * (1, dimY, dimX) chunk per page; rechunk for other layouts). IFDs
    * parse on the driver; executors read their slices positionally.
    */
  def read(spark: SparkSession, path: String, spacing: (Double, Double, Double) = (1.0, 1.0, 1.0)): ChunkVolume = {
    val pages = parsePages(path)
    require(pages.nonEmpty, s"no pages in $path")
    val p0 = pages.head
    require(pages.forall(p => p.width == p0.width && p.height == p0.height && p.bits == p0.bits),
      "pages disagree on shape/dtype")
    val elementType = ByType((p0.bits, p0.sampleFormat))
    val meta = VolumeMeta(
      dimZ = pages.length.toLong, dimY = p0.height.toLong, dimX = p0.width.toLong,
      chunkZ = 1, chunkY = p0.height, chunkX = p0.width,
      ncz = pages.length, ncy = 1, ncx = 1,
      elementType = elementType,
      spacingX = spacing._1, spacingY = spacing._2, spacingZ = spacing._3)
    val offsets = pages.map(_.stripOffset).toArray
    val sliceBytes = p0.stripBytes.toInt
    val (h, w) = (p0.height, p0.width)
    import spark.implicits._
    val chunks = spark.range(pages.length.toLong).mapPartitions { ids =>
      var raf: RandomAccessFile = null
      val it = ids.map { z =>
        if (raf == null) raf = new RandomAccessFile(path, "r")
        val data = new Array[Byte](sliceBytes)
        raf.seek(offsets(z.toInt))
        raf.readFully(data)
        Chunk(z.toInt, 0, 0, z, 0L, 0L, 1, h, w, data)
      }
      new Iterator[Chunk] {
        def hasNext: Boolean = { val hn = it.hasNext; if (!hn && raf != null) { raf.close(); raf = null }; hn }
        def next(): Chunk = it.next()
      }
    }
    ChunkVolume(chunks, meta)
  }
}
