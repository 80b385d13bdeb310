package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `BinaryType`
  * payloads with typed metadata, plus distributed feature extraction.
  *
  * ALL THREE modalities decode for REAL, no external dependency:
  * IMAGE via the JDK's `javax.imageio` readers (PNG/BMP/GIF/JPEG —
  * [[decodeGray]] / [[imageFeatures]]), AUDIO via the pure-JDK
  * chunk-walking RIFF/WAVE PCM16 parser ([[decodeWavPcm16]] /
  * [[audioFeatures]]), VIDEO via the pure-JDK AVI container parser
  * over uncompressed 24-bit DIB frames ([[decodeAviRgb24]] /
  * [[videoFrameFeatures]]). Each is foreign-interop-tested against an
  * independent encoder (JDK writers / python stdlib `wave` /
  * tools/gen_avi_fixture.py). [[decodeStub]] remains only as the
  * no-codec fallback for payloads no parser recognizes (text standing
  * in for media, or compressed codecs the JRE lacks, e.g. H.264/MP3 —
  * undecodable media is FILTERED, not faked).
  */
object Multimodal {

  /** Canonical multimodal schema: id, modality tag, opaque payload, meta. */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true),
  ))

  /** Wrap a text corpus as multimodal rows (payload = UTF-8 bytes) — the
    * in-container stand-in for a directory of media files. A real ingest
    * would be `spark.read.format("binaryFile")` over object storage.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      lit("text").as("modality"),
      col("text").cast("binary").as("payload"),
      map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"),
    )

  /** No-codec FALLBACK decoder, used only when [[decodeGray]] finds no
    * JDK image reader for the payload (text stand-ins, or containers the
    * JRE lacks, e.g. audio/video): a deterministic byte-derived "frame"
    * keeps the pipeline shape (bytes in → float tensor out) intact.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val n = math.min(payload.length, 8)
    Array.tabulate(n)(i => (payload(i) & 0xff) / 255.0f)
  }

  /** One-time JVM config for the kernel path: ImageIO's default
    * disk-backed ImageInputStream cache costs a temp-file create/delete
    * per decode — pure overhead for byte-array inputs. Referenced (and
    * thus applied) before any ImageIO.read below.
    */
  private lazy val imageIoConfigured: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Cheap magic-byte sniff for the container formats the JRE's bundled
    * readers handle: PNG, JPEG (SOI), GIF, BMP, TIFF (both byte orders).
    * Used as a fast-path filter ONLY — when it matches, `ImageIO.read`
    * remains the authority (it may still return null on a corrupt
    * header). Without this, every non-image payload (the text rows that
    * dominate mixed corpora) pays a full reader-registry probe through a
    * fresh ImageInputStream just to get null back — ~7 ms/row of codec
    * overhead in an otherwise narrow kernel. Formats without a reliable
    * signature (WBMP) are deliberately not sniffed and thus not decoded.
    */
  def looksLikeImage(p: Array[Byte]): Boolean = {
    if (p.length < 4) return false
    val b0 = p(0) & 0xff; val b1 = p(1) & 0xff; val b2 = p(2) & 0xff; val b3 = p(3) & 0xff
    (b0 == 0x89 && b1 == 'P' && b2 == 'N' && b3 == 'G') || // PNG
    (b0 == 0xff && b1 == 0xd8 && b2 == 0xff) ||            // JPEG SOI
    (b0 == 'G' && b1 == 'I' && b2 == 'F' && b3 == '8') ||  // GIF87a/89a
    (b0 == 'B' && b1 == 'M') ||                            // BMP
    (b0 == 'I' && b1 == 'I' && b2 == 0x2a && b3 == 0x00) || // TIFF LE
    (b0 == 'M' && b1 == 'M' && b2 == 0x00 && b3 == 0x2a)   // TIFF BE
  }

  /** REAL image decode via the JDK's `javax.imageio` (PNG/BMP/GIF/JPEG —
    * whatever readers the JRE registers; no external dependency):
    * payload bytes → (width, height, row-major gray samples from raster
    * band 0). None when no installed reader recognizes the payload —
    * callers fall back to [[decodeStub]] or drop the row. Non-image
    * payloads short-circuit on [[looksLikeImage]] before touching the
    * ImageIO registry.
    */
  def decodeGray(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (!looksLikeImage(payload)) return None
    imageIoConfigured
    // a reader that matches the magic can still THROW on a truncated or
    // corrupt body (the JDK BMP reader raises EOFException instead of
    // returning null) — in a distributed kernel that's a job-killer, so
    // undecodable is undecodable: None, and the caller's drop/fallback
    // contract applies
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      Some((w, h, out))
    }
  }

  /** Decode head for feature rows: real [[decodeGray]] when a JDK reader
    * matches (first 8 gray samples, normalized), [[decodeStub]] otherwise.
    */
  def decode(payload: Array[Byte]): Array[Float] =
    decodeGray(payload) match {
      case Some((w, h, px)) =>
        Array.tabulate(math.min(w * h, 8))(i => px(i) / 255.0f)
      case None => decodeStub(payload)
    }

  /** Deterministic gray fixture image: pixel(y·w+x) = (id·31 + y·w + x)
    * mod 256, encoded with the JDK's REAL PNG/BMP writers — what
    * `mm_decode_roundtrip` decodes back and checks analytically.
    */
  def encodeImage(id: Long, w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((id * 31 + y.toLong * w + x) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos), s"no JDK image writer for '$format'")
    bos.toByteArray
  }

  /** Uniform-gray fixture image: every pixel = `value`, encoded with the
    * named JDK writer. The JPEG-gate fixture shape: a LOSSY codec can't
    * be round-tripped against the sawtooth pattern (quantization scrambles
    * high-frequency AC terms), but a uniform image is all-DC — every 8×8
    * block quantizes to the same reconstruction, MCU edge-padding
    * replicates the same value, and the decode comes back uniform within
    * ±2 gray of the input (DC quant step ≤8 at the JDK writer's default
    * 0.75 quality → ≤0.5 gray, plus IDCT/level-shift rounding).
    */
  def encodeUniformImage(value: Int, w: Int, h: Int, format: String): Array[Byte] = {
    require(value >= 0 && value <= 255, s"gray value out of range: $value")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, value); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos), s"no JDK image writer for '$format'")
    bos.toByteArray
  }

  /** Doc-id-keyed fixture corpus of REAL JPEGs (single-component gray
    * JFIF from the JDK's bundled JPEG writer), uniform value
    * (id·37) mod 256 per image — what `mm_decode_jpeg` decodes back.
    */
  def syntheticJpegImages(docs: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, "image", encodeUniformImage(((id * 37) % 256).toInt, w, h, "jpg"),
          Map("format" -> "jpeg", "width" -> w.toString, "height" -> h.toString))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** dHash: 64-bit perceptual fingerprint of a decoded raster — the
    * standard multimodal-corpus near-dup signature (row-wise luma
    * gradient of an 8×8 grid sampled from a 9-column downsample; bit
    * gy·8+gx is set iff grid(gy,gx) < grid(gy,gx+1)). Survives
    * re-encoding (PNG↔BMP), resizing (the grid is sampled, not pixel
    * positions), and small local edits (≤ a few flipped gradient bits),
    * while unrelated images land ~32 bits apart. Null when no JDK reader
    * decodes the payload — undecodable media can't be fingerprinted,
    * the same drop contract as [[imageFeatures]]. Nearest-neighbor grid
    * sampling (sx = gx·w/9, sy = gy·h/8) keeps the hash exactly
    * reproducible from the raster algebra, which is what lets the gate
    * oracle recompute it in SQL.
    */
  /** The 8×8 luma-gradient dHash over an already-decoded gray raster —
    * shared by the image fingerprint (JDK-decoded luma) and the video
    * fingerprint (frame-0 BGR sum luma).
    */
  def dhashOfGray(w: Int, h: Int, px: Array[Int]): Long = {
    var hash = 0L
    var gy = 0
    while (gy < 8) {
      val sy = gy * h / 8
      var gx = 0
      while (gx < 8) {
        val a = px(sy * w + gx * w / 9)
        val b = px(sy * w + (gx + 1) * w / 9)
        if (a < b) hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  def dhash64(payload: Array[Byte]): java.lang.Long =
    decodeGray(payload) match {
      case None => null
      case Some((w, h, px)) => java.lang.Long.valueOf(dhashOfGray(w, h, px))
    }

  /** 64-bit video perceptual fingerprint: REAL AVI decode, then the
    * dHash grid over frame 0's integer luma (b+g+r per pixel — the
    * exact-integer luma an oracle can replay; weighted lumas would be
    * float). Null for undecodable or frameless payloads.
    */
  def videoFp64(payload: Array[Byte]): java.lang.Long =
    decodeAviRgb24(payload) match {
      case None => null
      case Some((w, h, _, frames)) =>
        if (frames.isEmpty || w < 9 || h < 8) null
        else {
          val f0 = frames.head
          val px = Array.tabulate(w * h)(p => f0(3 * p) + f0(3 * p + 1) + f0(3 * p + 2))
          java.lang.Long.valueOf(dhashOfGray(w, h, px))
        }
    }

  /** Pixel-byte formula of the video near-dup fixture (the
    * [[nearDupPixel]] discipline on BGR bytes): an id-dependent
    * MULTIPLIER varies the gradient wrap pattern per id, so unrelated
    * clips separate on the dhash grid; `variant 1` rewrites only the
    * bottom-right block of frame 0 (≤1 bit).
    */
  def videoNearDupByte(base: Long, variant: Int, frame: Int, i: Int): Int = {
    val p = i / 3 // pixel index; all three BGR bytes share the formula
    val x = p % 16
    val y = p / 16
    if (variant == 1 && frame == 0 && y >= 14 && x >= 12) ((base * 31) % 256).toInt
    else ((p.toLong * (97 + 2 * base) + base * 53 + frame * 17) % 256).toInt
  }

  /** Near-dup AVI fixture: per doc a base 2-frame 16×16 clip of
    * [[videoNearDupByte]], plus a CONTAINER re-encode at a different
    * fps for every 5th id (identical rasters → hamming 0) and a
    * frame-0 bottom-right tweak for every 7th id (hamming ≤ 1).
    */
  def syntheticNearDupAvis(docs: DataFrame): DataFrame = {
    val (w, h, nFrames) = (16, 16, 2)
    val spark = docs.sparkSession
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        def frames(variant: Int): Seq[Array[Byte]] =
          (0 until nFrames).map(f =>
            Array.tabulate(w * h * 3)(i => videoNearDupByte(id, variant, f, i).toByte))
        val meta = Map("format" -> "avi")
        val out = scala.collection.mutable.ArrayBuffer(
          Row(id, "video", encodeAviRgb24(frames(0), w, h, fps = 10), meta))
        if (id % 5 == 0)
          out += Row(id + 1000L, "video", encodeAviRgb24(frames(0), w, h, fps = 25), meta)
        if (id % 7 == 0)
          out += Row(id + 2000L, "video", encodeAviRgb24(frames(1), w, h, fps = 10), meta)
        out
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Pixel formula of the near-dup fixture corpus: an id-dependent
    * multiplicative sawtooth — the per-id MULTIPLIER (not just an offset)
    * varies, so gradient wrap patterns differ per id and unrelated
    * images sit ≥5 hamming bits apart on the 16×16 shape (probed over
    * all pairs), while the `variant 1` tweak touches only the
    * bottom-right sample of the dhash grid (≤1 bit). The oracle states
    * this algebra verbatim in SQL.
    */
  def nearDupPixel(base: Long, variant: Int, x: Int, y: Int, w: Int): Int = {
    if (variant == 1 && y >= 14 && x >= 12) ((base * 31) % 256).toInt
    else (((y.toLong * w + x) * (97 + 2 * base) + base * 53) % 256).toInt
  }

  /** Encode a raster given by `f(x, y)` with the named JDK writer. */
  def encodeImageWith(w: Int, h: Int, format: String)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, f(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos), s"no JDK image writer for '$format'")
    bos.toByteArray
  }

  /** Near-dup image fixture corpus: per doc_id a base PNG of
    * [[nearDupPixel]], plus a BYTE-IDENTICAL-raster BMP twin at
    * id+1000 for every 5th id (re-encoding near-dup, hamming 0) and a
    * locally-tweaked PNG twin at id+2000 for every 7th id (small-edit
    * near-dup, hamming ≤1). Encoding runs per-partition on executors.
    */
  def syntheticNearDupImages(docs: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val base = Row(id, "image",
          encodeImageWith(w, h, "png")(nearDupPixel(id, 0, _, _, w)),
          Map("format" -> "png", "variant" -> "base"))
        val reenc = if (id % 5 == 0) Seq(Row(id + 1000L, "image",
          encodeImageWith(w, h, "bmp")(nearDupPixel(id, 0, _, _, w)),
          Map("format" -> "bmp", "variant" -> "reencoded"))) else Nil
        val tweak = if (id % 7 == 0) Seq(Row(id + 2000L, "image",
          encodeImageWith(w, h, "png")(nearDupPixel(id, 1, _, _, w)),
          Map("format" -> "png", "variant" -> "tweaked"))) else Nil
        Iterator(base) ++ reenc ++ tweak
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Doc-id-keyed fixture corpus of REAL encoded images (PNG for even
    * ids, BMP for odd — both JDK writers), in the canonical multimodal
    * schema. Encoding runs per-partition on executors, like a production
    * ingest that transcodes as it loads.
    */
  def syntheticImages(docs: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val fmt = if (id % 2 == 0) "png" else "bmp"
        Row(id, "image", encodeImage(id, w, h, fmt),
          Map("format" -> fmt, "width" -> w.toString, "height" -> h.toString))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** REAL image feature extraction: decode each payload with the JDK
    * readers and emit per-image raster stats. Per-partition kernel, no
    * shuffle; rows no installed reader matches are dropped (the curation
    * contract: undecodable media is filtered, not faked).
    */
  def imageFeatures(mm: DataFrame): DataFrame = {
    val spark = mm.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("fmt", StringType, nullable = true),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("sum_px", LongType, nullable = false),
      StructField("min_px", LongType, nullable = false),
      StructField("max_px", LongType, nullable = false),
    ))
    val rdd = mm.select(col("id"), col("payload"), expr("meta['format']")).rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          decodeGray(bytes).map { case (w, h, px) =>
            var sum = 0L
            var mn = Long.MaxValue
            var mx = Long.MinValue
            var i = 0
            while (i < px.length) {
              val v = px(i).toLong
              sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              i += 1
            }
            Row(id, if (r.isNullAt(2)) null else r.getString(2),
              w, h, w.toLong * h, sum, mn, mx)
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling: split each payload into fixed-size frames and emit
    * per-frame features — the audio/video batch shape (decode → frame →
    * feature) with the codec stubbed out and all Spark plumbing real:
    * one row per (payload, frame), computed per-partition, no shuffle.
    */
  def frameFeatures(mm: DataFrame, frameBytes: Int = 64): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    val spark = mm.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("mean_byte", DoubleType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
    ))
    val rdd = mm.select(col("id"), col("payload")).rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames).map { f =>
          val start = f * frameBytes
          val end = math.min(start + frameBytes, bytes.length)
          var sum = 0L
          var sumSq = 0L
          var i = start
          while (i < end) {
            val v = bytes(i) & 0xff
            sum += v
            sumSq += v.toLong * v
            i += 1
          }
          val n = (end - start).toDouble
          Row(id, f.toLong, (end - start).toLong, sum / n, math.sqrt(sumSq / n))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Nearest-neighbor raster resize over raw payload bytes — the resize
    * stage of an image pipeline, REAL (resampling needs no codec: it
    * operates on the byte raster a decoder would hand over; here the
    * payload itself stands in as a (h, srcW) gray raster). Per-partition
    * kernel, one output row per payload, no shuffle. Ragged tails (len %
    * srcW != 0) read as 0, like a zero-padded decode buffer.
    */
  def resizeNearest(mm: DataFrame, srcW: Int, tgtH: Int, tgtW: Int): DataFrame = {
    require(srcW > 0 && tgtH > 0 && tgtW > 0, "dimensions must be positive")
    val spark = mm.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("h", IntegerType, nullable = false),
      StructField("w", IntegerType, nullable = false),
      StructField("resized", BinaryType, nullable = false),
    ))
    val rdd = mm.select(col("id"), col("payload")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        val srcH = math.max(1, (bytes.length + srcW - 1) / srcW)
        val out = new Array[Byte](tgtH * tgtW)
        var ty = 0
        while (ty < tgtH) {
          val sy = ty * srcH / tgtH
          var tx = 0
          while (tx < tgtW) {
            val sx = tx * srcW / tgtW
            val idx = sy * srcW + sx
            out(ty * tgtW + tx) = if (idx < bytes.length) bytes(idx) else 0
            tx += 1
          }
          ty += 1
        }
        Row(id, tgtH, tgtW, out)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Distributed feature extraction: byte histogram moments per payload —
    * a real (non-stub) per-partition kernel demonstrating the batch shape:
    * binary in, fixed-width numeric features out, embarrassingly parallel
    * (mapPartitions, no shuffle, no driver collect).
    */
  def byteFeatures(mm: DataFrame): DataFrame = {
    val spark = mm.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("mean_byte", DoubleType, nullable = false),
      StructField("stddev_byte", DoubleType, nullable = false),
      StructField("entropy", DoubleType, nullable = false),
      StructField("decoded_head", ArrayType(FloatType), nullable = true),
    ))
    val rdd = mm.select(col("id"), col("payload")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        // payload is nullable in the canonical schema — treat null as empty
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        val hist = new Array[Long](256)
        var i = 0
        var sum = 0.0
        var sumSq = 0.0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          hist(b) += 1
          sum += b
          sumSq += b.toLong * b
          i += 1
        }
        val n = bytes.length.toDouble
        val mean = if (n > 0) sum / n else 0.0
        val variance = if (n > 0) sumSq / n - mean * mean else 0.0
        var entropy = 0.0
        var j = 0
        while (j < 256) {
          if (hist(j) > 0) {
            val p = hist(j) / n
            entropy -= p * math.log(p) / math.log(2)
          }
          j += 1
        }
        Row(id, bytes.length.toLong, mean, math.sqrt(math.max(variance, 0.0)), entropy,
          decode(bytes))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ------------------------------------------------ audio: RIFF/WAVE PCM16

  /** Deterministic synthetic PCM16 sample: full-wave [-2048, 2047] sweep,
    * a pure function of (id, index) that the analytic SQL oracle derives
    * independently.
    */
  def wavSample(id: Long, i: Int): Int = ((id * 31 + i.toLong * 7) % 4096 - 2048).toInt

  /** Canonical-form RIFF/WAVE writer (PCM, 16-bit LE): the self-encoded
    * fixture face of [[decodeWavPcm16]]. Interop with FOREIGN writers is
    * proven in MultimodalSpec against python's stdlib `wave` module.
    */
  def encodeWavPcm16(samples: Array[Int], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    require(samples.length % channels == 0, "sample count must divide by channels")
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  /** REAL RIFF/WAVE PCM16 parser (pure JDK, no javax.sound): validates
    * the RIFF/WAVE container, WALKS the chunk list (skipping LIST/fact/
    * any other chunk a foreign writer may emit, honoring the spec's even
    * padding), requires fmt's audioFormat=1 (PCM) and 16 bits/sample,
    * and decodes the data chunk's little-endian samples (interleaved if
    * multi-channel). Anything else → None: undecodable media is
    * FILTERED, not faked (the same curation contract as [[decodeGray]]).
    * Returns (sampleRate, channels, samples).
    */
  def decodeWavPcm16(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (payload.length < 44) return None
    def ascii(off: Int): String = new String(payload, off, 4, "US-ASCII")
    def le32(off: Int): Int =
      (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8) |
        ((payload(off + 2) & 0xff) << 16) | ((payload(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8)
    if (ascii(0) != "RIFF" || ascii(8) != "WAVE") return None
    var off = 12
    var sampleRate = -1
    var channels = -1
    var samples: Array[Int] = null
    while (off + 8 <= payload.length) {
      val cid = ascii(off)
      val csize = le32(off + 4)
      val body = off + 8
      if (csize < 0 || body + csize > payload.length) return None
      cid match {
        case "fmt " =>
          if (csize < 16) return None
          val audioFormat = le16(body)
          val bits = le16(body + 14)
          if (audioFormat != 1 || bits != 16) return None
          channels = le16(body + 2)
          sampleRate = le32(body + 4)
        case "data" =>
          if (csize % 2 != 0) return None
          samples = Array.tabulate(csize / 2) { i =>
            (le16(body + 2 * i) << 16) >> 16 // sign-extend
          }
        case _ => // LIST, fact, cue, bext, ... — skip per spec
      }
      off = body + csize + (csize & 1) // chunks pad to even length
    }
    if (sampleRate <= 0 || channels <= 0 || samples == null) None
    else Some((sampleRate, channels, samples))
  }

  /** Synthetic WAV corpus: one canonical mono PCM16 file per doc, samples
    * from [[wavSample]] — decodable stats are analytic in (id, i).
    */
  def syntheticWavs(docs: DataFrame, nSamples: Int, sampleRate: Int = 8000): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val samples = Array.tabulate(nSamples)(i => wavSample(id, i))
        Row(id, "audio", encodeWavPcm16(samples, sampleRate),
          Map("format" -> "wav", "sample_rate" -> sampleRate.toString))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  // ----------------------- audio perceptual fingerprint (WHT band hash)

  /** Analytic noise-like waveform for the audio-dedup fixture: a
    * quadratic-residue scramble of (id, i), integer-exact on both
    * engines (all intermediates < 2⁶³; DuckDB BIGINT errors on
    * overflow, so no wraparound is relied on). Unlike a periodic tone,
    * every id gets an essentially independent spectrum — unrelated
    * clips land ≥18 bits apart on the 64-bit fingerprint (probed over
    * all pairs in MultimodalSpec).
    */
  def audioTone(id: Long, i: Int): Int = {
    val t = i.toLong * (id * 64 + 17) + 29
    ((t * t % 816929L) % 4096L - 2048L).toInt
  }

  /** 64-bit audio perceptual fingerprint — the Haitsma–Kalker
    * band-energy-difference construction over an integer-exact
    * spectrum: 9 frames × 64 samples, per-frame Walsh–Hadamard
    * transform (the ±1 sequency basis — H(k) = Σᵢ (−1)^popcount(i∧k)·xᵢ,
    * exact in int64 where an FFT would be float), 9 band energies of 7
    * |coefficients| each (k = 1..63, DC excluded so the fingerprint is
    * offset-independent), then bit(f,b) = sign of the time-and-band
    * difference (E(f,b)−E(f,b+1)) − (E(f−1,b)−E(f−1,b+1)) — invariant
    * under amplitude scaling (all energies scale together) and robust
    * to small dithers (a bit flips only where the double difference is
    * near zero). Returns null for undecodable / non-mono / too-short
    * payloads (filtered, not faked — the decodeGray contract).
    */
  def audioFp64(payload: Array[Byte]): java.lang.Long = {
    decodeWavPcm16(payload) match {
      case None => null
      case Some((_, channels, samples)) =>
        if (channels != 1 || samples.length < 9 * 64) null
        else {
          val e = Array.ofDim[Long](9, 9)
          var f = 0
          while (f < 9) {
            val base = f * 64
            var b = 0
            while (b < 9) {
              var energy = 0L
              var k = b * 7 + 1
              while (k <= b * 7 + 7) {
                var h = 0L
                var i = 0
                while (i < 64) {
                  val v = samples(base + i)
                  h += (if (java.lang.Integer.bitCount(i & k) % 2 == 0) v else -v)
                  i += 1
                }
                energy += math.abs(h)
                k += 1
              }
              e(f)(b) = energy
              b += 1
            }
            f += 1
          }
          var fp = 0L
          f = 1
          while (f < 9) {
            var b = 0
            while (b < 8) {
              val d = (e(f)(b) - e(f)(b + 1)) - (e(f - 1)(b) - e(f - 1)(b + 1))
              if (d > 0) fp |= (1L << ((f - 1) * 8 + b))
              b += 1
            }
            f += 1
          }
          java.lang.Long.valueOf(fp)
        }
    }
  }

  /** Near-dup audio fixture: per doc a base clip of [[audioTone]] noise,
    * plus an amplitude-doubled re-master (id+1000, every 5th doc —
    * fingerprint-identical: the band-difference signs are scale
    * invariant) and a dithered twin (id+2000, every 7th doc — frame 2
    * perturbed by a ±200 sweep, hamming ≤ 1). 576 mono PCM16 samples
    * per clip through the real WAV encoder.
    */
  def syntheticNearDupWavs(docs: DataFrame, sampleRate: Int = 8000): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val base = Array.tabulate(576)(i => audioTone(id, i))
        val meta = Map("format" -> "wav", "sample_rate" -> sampleRate.toString)
        val out = scala.collection.mutable.ArrayBuffer(
          Row(id, "audio", encodeWavPcm16(base, sampleRate), meta))
        if (id % 5 == 0)
          out += Row(id + 1000L, "audio",
            encodeWavPcm16(base.map(_ * 2), sampleRate), meta)
        if (id % 7 == 0) {
          val dithered = base.clone()
          var i = 128
          while (i < 192) { dithered(i) += (i * 7) % 401 - 200; i += 1 }
          out += Row(id + 2000L, "audio", encodeWavPcm16(dithered, sampleRate), meta)
        }
        out
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  // --------------------------------------- video: AVI (RIFF) + raw DIB

  /** Deterministic synthetic video byte: a pure function of
    * (id, frame, byte index) the analytic SQL oracle derives
    * independently — one value per BGR byte of the frame.
    */
  def aviByte(id: Long, frame: Int, i: Int): Int =
    ((id * 31 + frame.toLong * 17 + i.toLong * 7) % 256).toInt

  /** Canonical-form AVI writer: RIFF('AVI ') → LIST('hdrl'){avih,
    * LIST('strl'){strh,strf=BITMAPINFOHEADER}} → LIST('movi') with one
    * '00db' chunk per uncompressed 24-bit DIB frame (bottom-up rows,
    * BGR, rows padded to 4 bytes — the actual DIB layout, so the parser
    * must really handle it). The self-encoded fixture face of
    * [[decodeAviRgb24]]; foreign interop is MultimodalSpec-pinned
    * against tools/gen_avi_fixture.py, an independent pure-struct
    * python writer.
    */
  def encodeAviRgb24(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int): Array[Byte] = {
    val rowBytes = w * 3
    val stride = (rowBytes + 3) & ~3
    require(frames.forall(_.length == rowBytes * h),
      s"each frame must be $rowBytes*$h top-down BGR bytes")
    val frameDib = frames.map { f =>
      // top-down logical rows → bottom-up padded DIB rows
      val out = new Array[Byte](stride * h)
      for (y <- 0 until h)
        System.arraycopy(f, y * rowBytes, out, (h - 1 - y) * stride, rowBytes)
      out
    }
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(id.getBytes("US-ASCII")); b.write(le32(body.length)); b.write(body)
      if (body.length % 2 == 1) b.write(0)
      b.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val frameBytes = stride * h
    val avih = le32(1000000 / fps) ++ le32(frameBytes * fps) ++ le32(0) ++ le32(0x10) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(frameBytes) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = "vids".getBytes("US-ASCII") ++ "DIB ".getBytes("US-ASCII") ++
      le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(fps) ++
      le32(0) ++ le32(frames.length) ++ le32(frameBytes) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(frameBytes) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frameDib.map(chunk("00db", _)).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bos.write("RIFF".getBytes("US-ASCII")); bos.write(le32(body.length)); bos.write(body)
    bos.toByteArray
  }

  /** REAL AVI/RIFF video parser (pure JDK): validates RIFF('AVI '),
    * walks LIST('hdrl') for avih (dims, rate) and strf (24-bit
    * uncompressed DIB required), then LIST('movi') for '00db'/'00dc'
    * frame chunks — each decoded from bottom-up padded DIB rows back to
    * top-down BGR bytes. JUNK and unknown chunks skip per spec (even
    * padding); anything non-raw-DIB → None: undecodable media is
    * filtered, not faked. Returns (w, h, microSecPerFrame, frames).
    */
  def decodeAviRgb24(payload: Array[Byte]): Option[(Int, Int, Int, Seq[Array[Int]])] = {
    if (payload.length < 24) return None
    def ascii(off: Int): String = new String(payload, off, 4, "US-ASCII")
    def le32(off: Int): Int =
      (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8) |
        ((payload(off + 2) & 0xff) << 16) | ((payload(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8)
    if (ascii(0) != "RIFF" || ascii(8) != "AVI ") return None
    var w = -1; var h = -1; var usPerFrame = -1
    var dibOk = false
    val frames = scala.collection.mutable.ArrayBuffer[Array[Int]]()
    // walk chunks, descending into LISTs (hdrl, strl, movi)
    def walk(from: Int, to: Int): Boolean = {
      var off = from
      while (off + 8 <= to) {
        val cid = ascii(off)
        val csize = le32(off + 4)
        val body = off + 8
        if (csize < 0 || body + csize > to) return false
        cid match {
          case "LIST" =>
            if (csize < 4) return false
            if (!walk(body + 4, body + csize)) return false
          case "avih" =>
            if (csize < 40) return false
            usPerFrame = le32(body)
            w = le32(body + 32); h = le32(body + 36)
          case "strf" =>
            // BITMAPINFOHEADER: biBitCount at +14, biCompression at +16
            if (csize >= 20 && le16(body + 14) == 24 && le32(body + 16) == 0) dibOk = true
          case "00db" | "00dc" =>
            if (w <= 0 || h <= 0 || !dibOk) return false
            val stride = (w * 3 + 3) & ~3
            if (csize != stride * h) return false
            val f = new Array[Int](w * 3 * h)
            for (y <- 0 until h; i <- 0 until w * 3)
              f(y * w * 3 + i) = payload(body + (h - 1 - y) * stride + i) & 0xff
            frames += f
          case _ => // JUNK, idx1, strh, vprp, ... — skip
        }
        off = body + csize + (csize & 1)
      }
      true
    }
    if (!walk(12, payload.length)) return None
    if (w <= 0 || h <= 0 || usPerFrame <= 0 || !dibOk || frames.isEmpty) None
    else Some((w, h, usPerFrame, frames.toSeq))
  }

  /** Synthetic AVI corpus: one canonical raw-DIB video per doc, every
    * frame byte from [[aviByte]] — stats are analytic in (id, f, i).
    */
  def syntheticAvis(docs: DataFrame, nFrames: Int, w: Int, h: Int, fps: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val frames = (0 until nFrames).map(f =>
          Array.tabulate(w * 3 * h)(i => aviByte(id, f, i).toByte))
        Row(id, "video", encodeAviRgb24(frames, w, h, fps),
          Map("format" -> "avi", "fps" -> fps.toString))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** REAL video feature extraction: parse each payload with
    * [[decodeAviRgb24]] and emit exact-integer per-FRAME pixel stats —
    * the decode → frame → feature batch shape with nothing stubbed.
    * Narrow per-partition kernel, no shuffle; undecodable rows dropped.
    */
  def videoFrameFeatures(mm: DataFrame): DataFrame = {
    val spark = mm.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false),
      StructField("min_b", LongType, nullable = false),
      StructField("max_b", LongType, nullable = false),
    ))
    val rdd = mm.select(col("id"), col("payload")).rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        decodeAviRgb24(bytes).toSeq.flatMap { case (w, h, _, frames) =>
          frames.zipWithIndex.map { case (f, idx) =>
            var sum = 0L
            var mn = Long.MaxValue
            var mx = Long.MinValue
            var i = 0
            while (i < f.length) {
              sum += f(i)
              if (f(i) < mn) mn = f(i)
              if (f(i) > mx) mx = f(i)
              i += 1
            }
            if (f.isEmpty) { mn = 0L; mx = 0L }
            Row(id, idx, w, h, f.length.toLong, sum, mn, mx)
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL audio feature extraction: parse each payload with
    * [[decodeWavPcm16]] and emit exact-integer sample stats. Narrow
    * per-partition kernel, no shuffle; undecodable rows are dropped.
    */
  def audioFeatures(mm: DataFrame): DataFrame = {
    val spark = mm.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sum_s", LongType, nullable = false),
      StructField("min_s", LongType, nullable = false),
      StructField("max_s", LongType, nullable = false),
    ))
    val rdd = mm.select(col("id"), col("payload")).rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        decodeWavPcm16(bytes).map { case (rate, ch, s) =>
          var sum = 0L
          var mn = Long.MaxValue
          var mx = Long.MinValue
          var i = 0
          while (i < s.length) {
            sum += s(i)
            if (s(i) < mn) mn = s(i)
            if (s(i) > mx) mx = s(i)
            i += 1
          }
          if (s.isEmpty) { mn = 0L; mx = 0L } // zero-sample data chunk
          Row(id, rate, ch, s.length.toLong, sum, mn, mx)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
