package graft.volume

import graft.io.{Fio, FioConf, FioRandom}
import org.apache.spark.sql.SparkSession

/** Chunked, out-of-core MHD+RAW reader (S1/S2/S3).
  *
  * The driver parses the header and plans the chunk grid (ChunkPlanner,
  * reference choose_chunks — upscale_streaming.py:59–74); executors then
  * read their chunks with positioned FileChannel reads — a chunk is nz·ny
  * row-runs of nx·bpp bytes, never the whole file (the Spark analog of
  * `np.memmap` + `da.from_array`, upscale_streaming.py:42–57). Big-endian
  * raws (ByteOrderMSB=True) are normalized to little-endian at read, like
  * the reference's `newbyteorder` (upscale_streaming.py:51–53, :82).
  *
  * Chunk indices are generated from `spark.range` — the grid is never
  * collected on the driver, so a 100 TB volume with ~1M chunks plans in
  * O(1) driver memory.
  */
object MhdReader {

  def read(spark: SparkSession, mhdPath: String, targetChunkMb: Int = 128): ChunkVolume = {
    val mhd = MhdMeta.parse(mhdPath)(FioConf.of(spark))
    val (cz, cy, cx) = ChunkPlanner.chooseChunks(mhd.shapeZyx, mhd.bytesPerVoxel, targetChunkMb)
    read(spark, mhd, cz, cy, cx)
  }

  def read(spark: SparkSession, mhd: MhdMeta, chunkZ: Int, chunkY: Int, chunkX: Int): ChunkVolume = {
    val meta = VolumeMeta(
      dimZ = mhd.dimZ, dimY = mhd.dimY, dimX = mhd.dimX,
      chunkZ = chunkZ, chunkY = chunkY, chunkX = chunkX,
      ncz = ((mhd.dimZ + chunkZ - 1) / chunkZ).toInt,
      ncy = ((mhd.dimY + chunkY - 1) / chunkY).toInt,
      ncx = ((mhd.dimX + chunkX - 1) / chunkX).toInt,
      elementType = mhd.elementType,
      spacingX = mhd.spacingXyz._1, spacingY = mhd.spacingXyz._2, spacingZ = mhd.spacingXyz._3)

    implicit val fc: FioConf = FioConf.of(spark)
    val rawPath = mhd.rawPath
    val msb = mhd.byteOrderMsb
    val bpp = meta.bytesPerVoxel
    val (dimZ, dimY, dimX) = (meta.dimZ, meta.dimY, meta.dimX)
    val (ncz, ncy, ncx) = (meta.ncz, meta.ncy, meta.ncx)
    val nChunks = ncz.toLong * ncy * ncx

    import spark.implicits._
    val chunks = spark.range(nChunks).mapPartitions { ids =>
      // one open stream per task, positioned reads per chunk row-run
      var raf: FioRandom = null
      def handle() = {
        if (raf == null) raf = Fio.openRandom(rawPath)
        raf
      }
      val it = ids.map { id =>
        val cz = (id / (ncy.toLong * ncx)).toInt
        val cy = ((id / ncx) % ncy).toInt
        val cx = (id % ncx).toInt
        val z0 = cz.toLong * chunkZ; val y0 = cy.toLong * chunkY; val x0 = cx.toLong * chunkX
        val nz = math.min(chunkZ.toLong, dimZ - z0).toInt
        val ny = math.min(chunkY.toLong, dimY - y0).toInt
        val nx = math.min(chunkX.toLong, dimX - x0).toInt
        val data = new Array[Byte](nz * ny * nx * bpp)
        val ch = handle()
        val rowBytes = nx * bpp
        var z = 0
        while (z < nz) {
          var y = 0
          while (y < ny) {
            val srcOff = (((z0 + z) * dimY + (y0 + y)) * dimX + x0) * bpp
            ch.readFully(srcOff, data, (z * ny + y) * rowBytes, rowBytes)
            y += 1
          }
          z += 1
        }
        if (msb) ChunkKernels.swapEndianInPlace(data, bpp)
        Chunk(cz, cy, cx, z0, y0, x0, nz, ny, nx, data)
      }
      // close the channel when the iterator is exhausted
      new Iterator[Chunk] {
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && raf != null) { raf.close(); raf = null }
          h
        }
        def next(): Chunk = it.next()
      }
    }
    ChunkVolume(chunks, meta)
  }
}
