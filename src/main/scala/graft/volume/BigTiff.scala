package graft.volume

import graft.io.{Fio, FioConf}
import org.apache.spark.sql.SparkSession
import java.nio.{ByteBuffer, ByteOrder}

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

    implicit val fc: FioConf = FioConf.of(vol.chunks.sparkSession)
    Fio.delete(path)
    // full size up front: unwritten gaps read as zeros (background)
    val f = Fio.openRandomWrite(path, preallocate = firstIfd + m.dimZ * ifdSize)
    try {
      val header = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      header.put('I'.toByte).put('I'.toByte).putShort(43).putShort(8).putShort(0).putLong(firstIfd)
      f.writeFully(0L, header.array())

      // IFD chain, one per page — every strip offset is computable
      val buf = ByteBuffer.allocate(ifdSize).order(ByteOrder.LITTLE_ENDIAN)
      def entry(b: ByteBuffer, tag: Int, tpe: Int, value: Long): Unit = {
        b.putShort(tag.toShort).putShort(tpe.toShort).putLong(1L).putLong(value)
      }
      var ifdPos = firstIfd
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
        f.writeFully(ifdPos, buf.array())
        ifdPos += ifdSize
      }
    } finally f.close()

    // executor fill: each chunk's bytes land at positions disjoint from
    // every other chunk's, so tasks write concurrently with no
    // coordination. Full-width chunks (x0=0, nx=dimX) write one
    // contiguous run per chunk-slice; others write per row.
    val pathStr = Fio.qualify(path)
    vol.chunks.foreachPartition { (it: Iterator[Chunk]) =>
      val ch = Fio.openRandomRewrite(pathStr)
      try {
        it.foreach { c =>
          var zl = 0
          while (zl < c.nz) {
            val slicePos = dataStart + (c.z0 + zl) * sliceBytes
            if (c.x0 == 0 && c.nx == dimX) {
              ch.writeFully(slicePos + c.y0 * dimX * bpp,
                c.data, zl * c.ny * c.nx * bpp, c.ny * c.nx * bpp)
            } else {
              var y = 0
              while (y < c.ny) {
                ch.writeFully(slicePos + ((c.y0 + y) * dimX + c.x0) * bpp,
                  c.data, ((zl * c.ny + y) * c.nx) * bpp, c.nx * bpp)
                y += 1
              }
            }
            zl += 1
          }
        }
      } finally ch.close()
    }
  }

  /** Scan a BigTIFF written by [[write]] back into a ChunkVolume (one
    * (1, dimY, dimX) chunk per page; rechunk for other layouts).
    * Delegates to the general [[Tiff.read]] scan (TiffForeignSpec pins
    * bit-identical output on this format). The former own-format parser
    * `readAllBytes`'d the WHOLE file on the driver just to reach the IFD
    * chain — a multi-TB export would have OOM'd the driver before the
    * first task launched; Tiff.parseMeta touches only the IFD structures
    * with positioned reads.
    */
  def read(spark: SparkSession, path: String, spacing: (Double, Double, Double) = (1.0, 1.0, 1.0)): ChunkVolume =
    Tiff.read(spark, path, spacing)
}
