package graft.volume

import org.apache.spark.sql.SparkSession
import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

/** General TIFF scan (S5): classic TIFF (magic 42, 4-byte offsets) and
  * BigTIFF (magic 43), both byte orders, multi-strip pages, uncompressed
  * or deflate-compressed, grayscale integer and float sample types — the
  * input surface `tifffile.imread` gives the reference's legacy path
  * (anno_upsampling.py:33, 43), rebuilt from the TIFF 6.0 / BigTIFF
  * specs. [[BigTiff]] remains the engine's own page-per-slice export
  * format; this reader accepts FOREIGN files the engine never wrote.
  *
  * Scale shape mirrors [[BigTiff.read]]: the driver parses only the IFD
  * chain and strip tables with positioned reads — O(pages + strips)
  * metadata, never the pixel data, never `readAllBytes` of a multi-TB
  * file — and executor tasks then read/inflate exactly their pages'
  * strips. One (1, height, width) chunk per page; rechunk downstream for
  * other layouts.
  *
  * Fail-loud boundaries (better a clear error than a silently wrong
  * volume): tiled layout, planar configuration 2, predictors, palette /
  * multi-sample color, and compressions other than none/deflate are
  * rejected by name.
  */
object Tiff {

  // TIFF SampleFormat: 1 unsigned, 2 signed, 3 IEEE float
  private val ByType: Map[(Int, Int), String] = Map(
    (8, 1) -> "MET_UCHAR", (8, 2) -> "MET_CHAR",
    (16, 1) -> "MET_USHORT", (16, 2) -> "MET_SHORT",
    (32, 1) -> "MET_UINT", (32, 2) -> "MET_INT",
    (32, 3) -> "MET_FLOAT", (64, 3) -> "MET_DOUBLE",
  )

  private val TypeSizes = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 6 -> 1, 8 -> 2, 9 -> 4, 16 -> 8, 17 -> 8)

  final case class Page(
      width: Int, height: Int, bits: Int, sampleFormat: Int,
      compression: Int, rowsPerStrip: Int,
      stripOffsets: Array[Long], stripBytes: Array[Long])

  final case class TiffMeta(bigEndian: Boolean, bigTiff: Boolean, pages: Seq[Page])

  /** Parse the IFD chain with positioned reads — strip DATA is never
    * touched on the driver.
    */
  def parseMeta(path: String): TiffMeta = {
    val f = new RandomAccessFile(path, "r")
    try {
      def readAt(pos: Long, n: Int): ByteBuffer = {
        val a = new Array[Byte](n)
        f.seek(pos); f.readFully(a)
        ByteBuffer.wrap(a) // order set after we know the header
      }
      val head = new Array[Byte](16)
      f.seek(0); f.readFully(head)
      val bigEndian = (head(0), head(1)) match {
        case ('I', 'I') => false
        case ('M', 'M') => true
        case _ => throw new IllegalArgumentException(s"$path: not a TIFF (no II/MM byte-order mark)")
      }
      val ord = if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
      val hb = ByteBuffer.wrap(head).order(ord)
      val magic = hb.getShort(2) & 0xffff
      val bigTiff = magic match {
        case 42 => false
        case 43 =>
          require((hb.getShort(4) & 0xffff) == 8, s"$path: BigTIFF offset size must be 8")
          true
        case m => throw new IllegalArgumentException(s"$path: bad TIFF magic $m (want 42 or 43)")
      }
      var ifd = if (bigTiff) hb.getLong(8) else (hb.getInt(4) & 0xffffffffL)
      val entrySize = if (bigTiff) 20 else 12
      val countSize = if (bigTiff) 8 else 2
      val inlineMax = if (bigTiff) 8 else 4

      // entry value array, inline or via offset — SHORT/LONG/LONG8 widths.
      // Only called for tags the reader HANDLES: ancillary tags
      // (resolution RATIONALs, ASCII software strings, …) are skipped
      // before value parsing, so their field types never need decoding.
      def values(b: ByteBuffer, off: Int): (Int, Array[Long]) = {
        val tag = b.getShort(off) & 0xffff
        val tpe = b.getShort(off + 2) & 0xffff
        val count = (if (bigTiff) b.getLong(off + 4) else (b.getInt(off + 4) & 0xffffffffL)).toInt
        val elemSize = TypeSizes.getOrElse(tpe,
          throw new IllegalArgumentException(s"$path: unsupported TIFF field type $tpe for tag $tag"))
        val total = elemSize * count
        val valOff = off + entrySize - inlineMax
        val data: ByteBuffer =
          if (total <= inlineMax) { val s = b.duplicate().order(ord); s.position(valOff); s }
          else {
            val ptr = if (bigTiff) b.getLong(valOff) else (b.getInt(valOff) & 0xffffffffL)
            readAt(ptr, total).order(ord)
          }
        val base = data.position()
        val out = new Array[Long](count)
        var i = 0
        while (i < count) {
          out(i) = elemSize match {
            case 1 => data.get(base + i) & 0xffL
            case 2 => data.getShort(base + i * 2) & 0xffffL
            case 4 => data.getInt(base + i * 4) & 0xffffffffL
            case 8 => data.getLong(base + i * 8)
          }
          i += 1
        }
        (tag, out)
      }

      val pages = Seq.newBuilder[Page]
      while (ifd != 0L) {
        val nEntries = (if (bigTiff) readAt(ifd, 8).order(ord).getLong(0)
                        else (readAt(ifd, 2).order(ord).getShort(0) & 0xffffL)).toInt
        val block = readAt(ifd + countSize, nEntries * entrySize + inlineMax).order(ord)
        var width = 0; var height = 0; var bits = 8; var sf = 1
        var compression = 1; var rps = -1; var spp = 1; var planar = 1; var predictor = 1
        var photometric = 1; var tiled = false
        var offsets = Array.empty[Long]; var counts = Array.empty[Long]
        val handled = Set(256, 257, 258, 259, 262, 273, 277, 278, 279, 284, 317, 339)
        var i = 0
        while (i < nEntries) {
          val tagOnly = block.getShort(i * entrySize) & 0xffff
          if (tagOnly == 322 || tagOnly == 323 || tagOnly == 324 || tagOnly == 325) tiled = true
          else if (handled(tagOnly)) {
            // value parsing only for handled tags — ancillary entries
            // (RATIONAL resolutions, ASCII strings, …) are skipped whole,
            // whatever their field type
            val (tag, vs) = values(block, i * entrySize)
            tag match {
              case 256 => width = vs(0).toInt
              case 257 => height = vs(0).toInt
              case 258 =>
                require(vs.distinct.length == 1, s"$path: per-sample BitsPerSample differ")
                bits = vs(0).toInt
              case 259 => compression = vs(0).toInt
              case 262 => photometric = vs(0).toInt
              case 273 => offsets = vs
              case 277 => spp = vs(0).toInt
              case 278 => rps = vs(0).toInt
              case 279 => counts = vs
              case 284 => planar = vs(0).toInt
              case 317 => predictor = vs(0).toInt
              case 339 => sf = vs(0).toInt
            }
          }
          i += 1
        }
        require(!tiled, s"$path: tiled TIFF layout is not supported (strip layout only)")
        require(spp == 1, s"$path: SamplesPerPixel=$spp — only single-sample grayscale is supported")
        require(planar == 1, s"$path: PlanarConfiguration=$planar is not supported")
        require(predictor == 1, s"$path: Predictor=$predictor is not supported")
        require(photometric == 0 || photometric == 1,
          s"$path: PhotometricInterpretation=$photometric — only grayscale (0/1) is supported")
        require(compression == 1 || compression == 8 || compression == 32946,
          s"$path: Compression=$compression — only none (1) and deflate (8/32946) are supported")
        require(width > 0 && height > 0, s"$path: page missing ImageWidth/ImageLength")
        require(offsets.nonEmpty && offsets.length == counts.length,
          s"$path: StripOffsets/StripByteCounts missing or mismatched (${offsets.length} vs ${counts.length})")
        val rowsPerStrip = if (rps <= 0 || rps > height) height else rps
        require(offsets.length == (height + rowsPerStrip - 1) / rowsPerStrip,
          s"$path: strip count ${offsets.length} disagrees with height $height / RowsPerStrip $rowsPerStrip")
        pages += Page(width, height, bits, sf, compression, rowsPerStrip, offsets, counts)
        val nextOff = ifd + countSize + nEntries.toLong * entrySize
        ifd = if (bigTiff) readAt(nextOff, 8).order(ord).getLong(0)
              else (readAt(nextOff, 4).order(ord).getInt(0) & 0xffffffffL)
      }
      TiffMeta(bigEndian, bigTiff, pages.result())
    } finally f.close()
  }

  /** MHD element type for a TIFF (BitsPerSample, SampleFormat) pair. */
  def elementTypeOf(bits: Int, sampleFormat: Int): String =
    ByType.getOrElse((bits, sampleFormat),
      throw new IllegalArgumentException(
        s"unsupported TIFF sample type (bits=$bits, format=$sampleFormat)"))

  /** The volume header of a TIFF stack as a synthetic [[MhdMeta]] — what
    * lets the CLI lifecycle (chunk planning, size estimate, admission
    * control, plan report) treat `--input vol.tif` exactly like an MHD,
    * the way the reference's legacy path feeds `tifffile.imread` output
    * into the same pipeline (anno_upsampling.py:33).
    */
  def mhdMeta(path: String): MhdMeta = {
    val tm = parseMeta(path)
    require(tm.pages.nonEmpty, s"no pages in $path")
    val p0 = tm.pages.head
    require(tm.pages.forall(p => p.width == p0.width && p.height == p0.height &&
        p.bits == p0.bits && p.sampleFormat == p0.sampleFormat),
      s"$path: pages disagree on shape/dtype")
    val abs = java.nio.file.Paths.get(path).toAbsolutePath
    MhdMeta(
      dimX = p0.width.toLong, dimY = p0.height.toLong, dimZ = tm.pages.length.toLong,
      elementType = elementTypeOf(p0.bits, p0.sampleFormat),
      spacingXyz = (1.0, 1.0, 1.0),
      byteOrderMsb = tm.bigEndian,
      dataFile = abs.getFileName.toString,
      mhdDir = Option(abs.getParent).map(_.toString).getOrElse("."))
  }

  /** Decompress one strip to exactly `expected` bytes. */
  private def inflateStrip(raw: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(raw)
      val out = new Array[Byte](expected)
      var done = 0
      while (done < expected && !inf.finished()) {
        val n = inf.inflate(out, done, expected - done)
        require(n > 0 || !inf.needsInput(), "truncated deflate strip")
        done += n
      }
      require(done == expected, s"deflate strip inflated to $done bytes, expected $expected")
      out
    } finally inf.end()
  }

  /** Scan any supported TIFF into a ChunkVolume: one (1, height, width)
    * chunk per page. Big-endian sample data is normalized to the engine's
    * little-endian chunk layout at read, same as [[MhdReader]] does for
    * ByteOrderMSB raws.
    */
  def read(spark: SparkSession, path: String,
      spacing: (Double, Double, Double) = (1.0, 1.0, 1.0)): ChunkVolume = {
    val tm = parseMeta(path)
    require(tm.pages.nonEmpty, s"no pages in $path")
    val p0 = tm.pages.head
    require(tm.pages.forall(p => p.width == p0.width && p.height == p0.height &&
        p.bits == p0.bits && p.sampleFormat == p0.sampleFormat),
      s"$path: pages disagree on shape/dtype")
    val elementType = elementTypeOf(p0.bits, p0.sampleFormat)
    val bpp = p0.bits / 8
    val meta = VolumeMeta(
      dimZ = tm.pages.length.toLong, dimY = p0.height.toLong, dimX = p0.width.toLong,
      chunkZ = 1, chunkY = p0.height, chunkX = p0.width,
      ncz = tm.pages.length, ncy = 1, ncx = 1,
      elementType = elementType,
      spacingX = spacing._1, spacingY = spacing._2, spacingZ = spacing._3)
    // per-page strip tables ship in the task closure: O(pages·strips)
    // longs — IFD metadata, not pixel data
    val pages = tm.pages.toArray
    val bigEndian = tm.bigEndian
    val (h, w) = (p0.height, p0.width)
    val sliceBytes = h * w * bpp
    import spark.implicits._
    val chunks = spark.range(pages.length.toLong).mapPartitions { ids =>
      var raf: RandomAccessFile = null
      val it = ids.map { z =>
        if (raf == null) raf = new RandomAccessFile(path, "r")
        val pg = pages(z.toInt)
        val data = new Array[Byte](sliceBytes)
        var strip = 0
        var rowsDone = 0
        while (strip < pg.stripOffsets.length) {
          val stripRows = math.min(pg.rowsPerStrip, pg.height - rowsDone)
          val expect = stripRows * pg.width * bpp
          val raw = new Array[Byte](pg.stripBytes(strip).toInt)
          raf.seek(pg.stripOffsets(strip))
          raf.readFully(raw)
          val decoded =
            if (pg.compression == 1) {
              require(raw.length == expect,
                s"uncompressed strip $strip has ${raw.length} bytes, expected $expect")
              raw
            } else inflateStrip(raw, expect)
          System.arraycopy(decoded, 0, data, rowsDone * pg.width * bpp, expect)
          rowsDone += stripRows
          strip += 1
        }
        if (bigEndian) ZarrStore.byteSwap(data, bpp)
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
