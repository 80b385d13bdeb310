package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "abab", "en", "s1"),
      (2L, "zzzz", "en", "s1"),
      (3L, "", "en", "s2"),
    ).toDF("doc_id", "text", "lang", "source")
  }

  test("fromDocuments produces the canonical multimodal schema") {
    val mm = Multimodal.fromDocuments(docs)
    assert(mm.columns.toSeq === Seq("id", "modality", "payload", "meta"))
    val r = mm.filter(col("id") === 1L).collect().head
    assert(r.getAs[String]("modality") === "text")
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") === "abab")
    assert(r.getAs[Map[String, String]]("meta") === Map("source" -> "s1", "lang" -> "en"))
  }

  test("byteFeatures: exact moments and entropy; empty and null payloads survive") {
    val mm = Multimodal.fromDocuments(docs)
    val f = Multimodal.byteFeatures(mm).collect().map(r => r.getLong(0) -> r).toMap
    // "abab": bytes {97,98} equally likely → entropy 1 bit, mean 97.5
    assert(f(1L).getLong(1) === 4L)
    assert(math.abs(f(1L).getDouble(2) - 97.5) < 1e-9)
    assert(math.abs(f(1L).getDouble(4) - 1.0) < 1e-9)
    // "zzzz": single symbol → entropy 0, stddev 0
    assert(f(2L).getDouble(3) === 0.0 && f(2L).getDouble(4) === 0.0)
    // empty payload → zeros, no NaN/exception
    assert(f(3L).getLong(1) === 0L && f(3L).getDouble(2) === 0.0)

    // a null payload row (nullable in the schema) must not NPE
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9L, "image", null, null))),
      Multimodal.schema)
    val g = Multimodal.byteFeatures(withNull).collect().head
    assert(g.getLong(1) === 0L)
  }

  test("frameFeatures: fixed-size frames with a partial tail; exact moments") {
    val mm = Multimodal.fromDocuments(docs) // "abab" = 4 bytes
    val f = Multimodal.frameFeatures(mm, frameBytes = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // "abab": frame 0 = "aba" (97,98,97), frame 1 = "b" (98)
    assert(f((1L, 0L))._1 === 3L)
    assert(math.abs(f((1L, 0L))._2 - (97 + 98 + 97) / 3.0) < 1e-12)
    assert(f((1L, 1L)) === ((1L, 98.0)))
    // empty payload → no frames
    assert(!f.keys.exists(_._1 == 3L))
  }

  test("resizeNearest: identity at equal dims, exact nearest indexing, ragged-tail zeros") {
    import spark.implicits._
    // an 2x4 raster (8 bytes), srcW=4
    val payload = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)
    val mm = Seq((1L, "img", payload)).toDF("id", "modality", "payload")
    // identity: 2x4 -> 2x4 returns the same bytes
    val same = Multimodal.resizeNearest(mm, srcW = 4, tgtH = 2, tgtW = 4)
      .select("resized").collect().head.getAs[Array[Byte]](0)
    assert(same.toSeq === payload.toSeq)
    // downscale 2x4 -> 1x2: rows 0, cols {0, 2} -> bytes 10, 30
    val down = Multimodal.resizeNearest(mm, srcW = 4, tgtH = 1, tgtW = 2)
      .select("resized").collect().head.getAs[Array[Byte]](0)
    assert(down.toSeq === Seq[Byte](10, 30))
    // upscale 2x4 -> 4x8: each source pixel appears 2x2
    val up = Multimodal.resizeNearest(mm, srcW = 4, tgtH = 4, tgtW = 8)
      .select("resized").collect().head.getAs[Array[Byte]](0)
    assert(up.length === 32)
    assert(up.take(8).toSeq === Seq[Byte](10, 10, 20, 20, 30, 30, 40, 40))
    assert(up.slice(16, 24).toSeq === Seq[Byte](50, 50, 60, 60, 70, 70, 80, 80))
    // ragged tail: 6 bytes as srcW=4 -> srcH=2, missing (1,2),(1,3) read 0
    val ragged = Seq((2L, "img", Array[Byte](1, 2, 3, 4, 5, 6))).toDF("id", "modality", "payload")
    val r = Multimodal.resizeNearest(ragged, srcW = 4, tgtH = 2, tgtW = 4)
      .select("resized").collect().head.getAs[Array[Byte]](0)
    assert(r.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6, 0, 0))
  }

  test("decodeStub is deterministic and bounded to [0,1]") {
    val a = Multimodal.decodeStub(Array[Byte](0, 127, -1))
    assert(a.toSeq === Multimodal.decodeStub(Array[Byte](0, 127, -1)).toSeq)
    assert(a.length === 3 && a.forall(v => v >= 0f && v <= 1f))
  }

  test("decodeGray round-trips the JDK PNG and BMP writers bit-exactly") {
    for (fmt <- Seq("png", "bmp")) {
      val bytes = Multimodal.encodeImage(id = 7L, w = 13, h = 9, fmt)
      val Some((w, h, px)) = Multimodal.decodeGray(bytes)
      assert((w, h) === (13, 9))
      for (i <- px.indices) assert(px(i) === ((7L * 31 + i) % 256).toInt, s"$fmt pixel $i")
    }
    // no reader matches text / empty → fallback path
    assert(Multimodal.decodeGray("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeGray(Array.emptyByteArray).isEmpty)
  }

  test("looksLikeImage: magic sniff gates the registry; ImageIO stays the authority") {
    // real encoder output passes the sniff
    assert(Multimodal.looksLikeImage(Multimodal.encodeImage(1L, 4, 4, "png")))
    assert(Multimodal.looksLikeImage(Multimodal.encodeImage(1L, 4, 4, "bmp")))
    // bare signatures of the other sniffed containers
    assert(Multimodal.looksLikeImage(Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)))
    assert(Multimodal.looksLikeImage("GIF89a".getBytes))
    assert(Multimodal.looksLikeImage(Array[Byte]('I', 'I', 0x2a, 0x00)))
    assert(Multimodal.looksLikeImage(Array[Byte]('M', 'M', 0x00, 0x2a)))
    // text, short, and empty payloads short-circuit
    assert(!Multimodal.looksLikeImage("plain text".getBytes))
    assert(!Multimodal.looksLikeImage(Array[Byte]('B', 'M')))
    assert(!Multimodal.looksLikeImage(Array.emptyByteArray))
    // sniff-passing but corrupt payload: ImageIO still decides → None
    assert(Multimodal.decodeGray("BMnot really a bitmap".getBytes).isEmpty)
    assert(Multimodal.decodeGray(Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3)).isEmpty)
  }

  test("decode uses the real reader for images, the stub for text") {
    val img = Multimodal.encodeImage(id = 2L, w = 4, h = 4, "png")
    // first 8 gray samples of pixel(i) = (62 + i) % 256, normalized
    assert(Multimodal.decode(img).toSeq ===
      (0 until 8).map(i => ((2L * 31 + i) % 256) / 255.0f))
    val text = "plain text".getBytes
    assert(Multimodal.decode(text).toSeq === Multimodal.decodeStub(text).toSeq)
  }

  test("imageFeatures decodes a mixed png/bmp corpus distributedly") {
    import spark.implicits._
    val docs = spark.range(6).select(col("id").as("doc_id"))
    val feats = Multimodal.imageFeatures(Multimodal.syntheticImages(docs, w = 13, h = 9))
      .orderBy("id").collect()
    assert(feats.length === 6)
    for (r <- feats) {
      val id = r.getLong(0)
      assert(r.getString(1) === (if (id % 2 == 0) "png" else "bmp"))
      assert((r.getInt(2), r.getInt(3)) === (13, 9))
      val expected = (0 until 117).map(i => (id * 31 + i) % 256)
      assert(r.getLong(5) === expected.sum)
      assert(r.getLong(6) === expected.min && r.getLong(7) === expected.max)
    }
    // undecodable rows are dropped, not faked
    val mixed = Seq((99L, "text", "not an image".getBytes, Map.empty[String, String]))
      .toDF("id", "modality", "payload", "meta")
    assert(Multimodal.imageFeatures(mixed).count() === 0)
  }

  test("JPEG: real lossy round-trip — uniform images survive within DC-quant tolerance") {
    // the fixture really is a JPEG (JFIF SOI marker), the sniff admits it,
    // and the JDK JPEG reader decodes it
    val bytes = Multimodal.encodeUniformImage(180, w = 13, h = 9, "jpg")
    assert((bytes(0) & 0xff) === 0xff && (bytes(1) & 0xff) === 0xd8, "not a JPEG SOI")
    assert(Multimodal.looksLikeImage(bytes))
    val Some((w, h, px)) = Multimodal.decodeGray(bytes)
    assert((w, h) === (13, 9)) // MCU padding (16×16 gray MCU) must not leak
    // all-DC content: decode is uniform and within ±2 gray of the input
    assert(px.max - px.min <= 2, s"non-uniform decode: ${px.min}..${px.max}")
    assert(math.abs(px(0) - 180) <= 2, s"value drift: ${px(0)}")
  }

  test("imageFeatures decodes a JPEG corpus distributedly (the mm_decode_jpeg shape)") {
    import spark.implicits._
    val docs = spark.range(8).select(col("id").as("doc_id"))
    val feats = Multimodal.imageFeatures(Multimodal.syntheticJpegImages(docs, w = 13, h = 9))
      .orderBy("id").collect()
    assert(feats.length === 8) // every JPEG decoded — none fell to the drop path
    for (r <- feats) {
      val id = r.getLong(0)
      val v = (id * 37) % 256
      assert(r.getString(1) === "jpeg")
      assert((r.getInt(2), r.getInt(3)) === (13, 9))
      assert(r.getLong(7) - r.getLong(6) <= 2, s"id=$id not uniform")
      assert(math.abs(r.getLong(5) - v * 117L) <= 2 * 117L, s"id=$id value drift")
    }
  }

  test("dhash64: format-invariant, resize-robust, local-edit-sensitive, null on undecodable") {
    def enc(fmt: String, w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
      Multimodal.encodeImageWith(w, h, fmt)(f)
    val pxf = (x: Int, y: Int) => Multimodal.nearDupPixel(3L, 0, x, y, 16)
    val png = Multimodal.dhash64(enc("png", 16, 16)(pxf))
    val bmp = Multimodal.dhash64(enc("bmp", 16, 16)(pxf))
    val gif = Multimodal.dhash64(enc("gif", 16, 16)(pxf))
    assert(png != null && png === bmp, "same raster, different container must hash equal")
    assert(png === gif, "gray GIF preserves an 8-bit gray raster")
    // direct recompute from the raster algebra == the decode path
    var expect = 0L
    for (gy <- 0 until 8; gx <- 0 until 8) {
      val sy = gy * 16 / 8
      if (pxf(gx * 16 / 9, sy) < pxf((gx + 1) * 16 / 9, sy)) expect |= 1L << (gy * 8 + gx)
    }
    assert(png.longValue === expect)
    // 2x nearest-neighbor upscale: grid sampling keeps the hash close
    val up = Multimodal.dhash64(enc("png", 32, 32)((x, y) => pxf(x / 2, y / 2)))
    assert(java.lang.Long.bitCount(png.longValue ^ up.longValue) <= 3,
      "NN 2x resize must stay within the near-dup band")
    // the tweak variant flips at most the bottom-right sample's bits
    val tweak = Multimodal.dhash64(
      enc("png", 16, 16)((x, y) => Multimodal.nearDupPixel(3L, 1, x, y, 16)))
    assert(java.lang.Long.bitCount(png.longValue ^ tweak.longValue) <= 2)
    // a DIFFERENT image is far away
    val other = Multimodal.dhash64(
      enc("png", 16, 16)((x, y) => Multimodal.nearDupPixel(4L, 0, x, y, 16)))
    assert(java.lang.Long.bitCount(png.longValue ^ other.longValue) > 3)
    // undecodable payloads fingerprint to null, never a fake hash
    assert(Multimodal.dhash64("not an image".getBytes) == null)
    assert(Multimodal.dhash64(Array.emptyByteArray) == null)
  }

  test("graft_dhash64 expression runs codegen'd over a DataFrame, null for text rows") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq(
      (1L, Multimodal.encodeImageWith(16, 16, "png")(Multimodal.nearDupPixel(1L, 0, _, _, 16))),
      (2L, Multimodal.encodeImageWith(16, 16, "bmp")(Multimodal.nearDupPixel(1L, 0, _, _, 16))),
      (3L, "plain text payload".getBytes),
    ).toDF("id", "payload")
    val got = rows.select(col("id"),
      graft.functions.GraftFunctions.dhash64(col("payload")).as("h"))
      .orderBy("id").collect()
    assert(!got(0).isNullAt(1) && got(0).getLong(1) === got(1).getLong(1))
    assert(got(2).isNullAt(1))
    // stays inside whole-stage codegen (no CodegenFallback in the path) —
    // over a parquet-backed frame: a bare LocalTableScan computes
    // projections without ever entering a codegen stage, hiding the
    // property
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = docs
      .select(graft.functions.GraftFunctions.dhash64(col("text").cast("binary")))
      .queryExecution.executedPlan
    val inCodegen = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.collect { case p: org.apache.spark.sql.execution.ProjectExec => p }.nonEmpty => w
    }
    assert(inCodegen.nonEmpty, plan.toString)
  }

  test("WAV: canonical round-trip; FOREIGN python-wave interop; chunk skipping; rejects") {
    // 1. self round-trip: encode → decode is the identity
    val samples = Array.tabulate(300)(i => Multimodal.wavSample(7L, i))
    val Some((rate, ch, got)) =
      Multimodal.decodeWavPcm16(Multimodal.encodeWavPcm16(samples, 8000))
    assert(rate === 8000 && ch === 1 && got.toSeq === samples.toSeq)

    // 2. FOREIGN writer: python's stdlib `wave` module (an independent
    //    RIFF implementation) writes stereo PCM16; our parser must read
    //    it back sample-exact. Same independent-encoder discipline as
    //    the TIFF/zarr foreign fixtures.
    val dir = java.nio.file.Files.createTempDirectory("graft_wav")
    val wavPath = dir.resolve("foreign.wav")
    val py =
      s"""
         |import wave, struct
         |w = wave.open(${"\"" + wavPath.toString + "\""}, 'wb')
         |w.setnchannels(2); w.setsampwidth(2); w.setframerate(44100)
         |frames = b''.join(struct.pack('<hh', (i * 13) % 2048 - 1024, -((i * 7) % 512))
         |                  for i in range(200))
         |w.writeframes(frames); w.close()
         |""".stripMargin
    val rc = scala.sys.process.Process(Seq("python3", "-c", py)).!(
      scala.sys.process.ProcessLogger(_ => ()))
    assert(rc === 0, "python wave writer failed")
    val foreign = java.nio.file.Files.readAllBytes(wavPath)
    val Some((fRate, fCh, fS)) = Multimodal.decodeWavPcm16(foreign)
    assert(fRate === 44100 && fCh === 2 && fS.length === 400)
    for (i <- 0 until 200) {
      assert(fS(2 * i) === (i * 13) % 2048 - 1024)
      assert(fS(2 * i + 1) === -((i * 7) % 512))
    }

    // 3. chunk walking: an inserted odd-length junk chunk (with its spec
    //    padding byte) between fmt and data must be skipped cleanly
    val canon = Multimodal.encodeWavPcm16(samples, 8000)
    val junkBody = Array[Byte](1, 2, 3) // odd length → 1 pad byte
    val bb = java.nio.ByteBuffer
      .allocate(canon.length + 8 + junkBody.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(canon, 0, 36) // RIFF header + fmt chunk
    bb.put("junk".getBytes("US-ASCII")).putInt(junkBody.length).put(junkBody).put(0.toByte)
    bb.put(canon, 36, canon.length - 36) // data chunk
    val withJunk = bb.array()
    // patch the RIFF size field for the inserted bytes
    val newRiff = canon.length - 8 + 8 + junkBody.length + 1
    withJunk(4) = (newRiff & 0xff).toByte; withJunk(5) = ((newRiff >> 8) & 0xff).toByte
    withJunk(6) = ((newRiff >> 16) & 0xff).toByte; withJunk(7) = ((newRiff >> 24) & 0xff).toByte
    val Some((_, _, skipped)) = Multimodal.decodeWavPcm16(withJunk)
    assert(skipped.toSeq === samples.toSeq)

    // 4. rejects: 8-bit sampwidth, non-PCM format tag, truncated, non-WAV
    val py8 =
      s"""
         |import wave
         |w = wave.open(${"\"" + dir.resolve("w8.wav").toString + "\""}, 'wb')
         |w.setnchannels(1); w.setsampwidth(1); w.setframerate(8000)
         |w.writeframes(bytes(range(64))); w.close()
         |""".stripMargin
    assert(scala.sys.process.Process(Seq("python3", "-c", py8)).!(
      scala.sys.process.ProcessLogger(_ => ())) === 0)
    assert(Multimodal.decodeWavPcm16(
      java.nio.file.Files.readAllBytes(dir.resolve("w8.wav"))).isEmpty)
    val nonPcm = canon.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    assert(Multimodal.decodeWavPcm16(nonPcm).isEmpty)
    assert(Multimodal.decodeWavPcm16(canon.take(40)).isEmpty)
    assert(Multimodal.decodeWavPcm16("not audio at all".getBytes).isEmpty)
  }

  test("AVI: canonical round-trip incl. padded stride; FOREIGN python fixture; rejects") {
    // 1. self round-trip at a PADDED width (w=5 → row 15, stride 16):
    //    bottom-up flip + padding must reproduce top-down bytes exactly
    val (w, h) = (5, 3)
    val frames = (0 until 2).map(f => Array.tabulate(w * 3 * h)(i => ((f * 50 + i) % 256).toByte))
    val Some((dw, dh, us, got)) =
      Multimodal.decodeAviRgb24(Multimodal.encodeAviRgb24(frames, w, h, fps = 10))
    assert(dw === w && dh === h && us === 100000)
    assert(got.length === 2)
    got.zip(frames).foreach { case (g, e) =>
      assert(g.toSeq === e.map(_ & 0xff).toSeq)
    }

    // 2. FOREIGN fixture: independent python struct writer with JUNK +
    //    idx1 chunks and its own byte formula — parse sample-exact
    val dir = java.nio.file.Files.createTempDirectory("graft_avi")
    val avi = dir.resolve("foreign.avi")
    val rc = scala.sys.process.Process(Seq(
      "python3", "tools/gen_avi_fixture.py", avi.toString, "7", "5", "4", "25")).!(
      scala.sys.process.ProcessLogger(_ => ()))
    assert(rc === 0, "gen_avi_fixture.py failed")
    val Some((fw, fh, fus, ff)) =
      Multimodal.decodeAviRgb24(java.nio.file.Files.readAllBytes(avi))
    assert(fw === 7 && fh === 5 && fus === 1000000 / 25 && ff.length === 4)
    for (f <- 0 until 4; i <- 0 until 7 * 3 * 5)
      assert(ff(f)(i) === (7 * f + 3 * i) % 251, s"frame $f byte $i")

    // 3. rejects: compressed stream (biCompression != 0), wrong frame
    //    size, truncated, non-AVI RIFF (a WAV), garbage
    val canon = Multimodal.encodeAviRgb24(frames, w, h, fps = 10)
    // strf's biCompression field: locate the strf chunk by FourCC; its
    // body (BITMAPINFOHEADER) starts at +8, biCompression at body+16
    val strfOff = canon.indexOfSlice("strf".getBytes("US-ASCII"))
    assert(strfOff > 0)
    val rle = canon.clone(); rle(strfOff + 8 + 16) = 1
    assert(Multimodal.decodeAviRgb24(rle).isEmpty)
    assert(Multimodal.decodeAviRgb24(canon.take(60)).isEmpty)
    assert(Multimodal.decodeAviRgb24(
      Multimodal.encodeWavPcm16(Array(1, 2, 3), 8000)).isEmpty)
    assert(Multimodal.decodeAviRgb24("definitely not a video".getBytes).isEmpty)
  }

  test("videoFrameFeatures decodes an AVI corpus distributedly (the mm_decode_avi shape)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 8)
    val out = Multimodal.videoFrameFeatures(
        Multimodal.syntheticAvis(docs, nFrames = 3, w = 16, h = 4))
      .orderBy(col("id"), col("frame_idx")).collect()
    assert(out.length === 24)
    out.foreach { r =>
      val id = r.getLong(0); val f = r.getInt(1)
      val expect = (0 until 192).map(Multimodal.aviByte(id, f, _))
      assert(r.getInt(2) === 16 && r.getInt(3) === 4)
      assert(r.getLong(4) === 192L)
      assert(r.getLong(5) === expect.map(_.toLong).sum)
      assert(r.getLong(6) === expect.min.toLong)
      assert(r.getLong(7) === expect.max.toLong)
    }
  }

  test("media parsers never throw on hostile bytes (fuzz: wild corpora contain garbage)") {
    // deterministic xorshift fuzz corpus: random blobs, truncations of
    // VALID media at every interesting boundary, and bit-flipped valid
    // media — a decoder that throws instead of returning None/null would
    // kill a 100 TB scan on its first corrupt object
    var seed = 0x9e3779b97f4a7c15L
    def nextBytes(n: Int): Array[Byte] = Array.fill(n) {
      seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
      seed.toByte
    }
    val wav = Multimodal.encodeWavPcm16(Array.tabulate(100)(Multimodal.wavSample(3L, _)), 8000)
    val avi = Multimodal.encodeAviRgb24(
      Seq(Array.tabulate(48)(i => Multimodal.aviByte(3L, 0, i).toByte)), 4, 4, 10)
    val png = Multimodal.encodeImage(3L, 5, 4, "png")
    val cases: Seq[Array[Byte]] =
      (0 until 200).map(_ => nextBytes(1 + (seed.toInt & 0x3ff).abs)) ++
        (0 until wav.length by 7).map(wav.take) ++
        (0 until avi.length by 11).map(avi.take) ++
        (0 until png.length by 13).map(png.take) ++
        Seq(wav, avi, png).flatMap { v =>
          (0 until v.length by 17).map { i =>
            val m = v.clone(); m(i) = (m(i) ^ 0x5a).toByte; m
          }
        } ++
        Seq(Array.emptyByteArray)
    cases.foreach { bytes =>
      // must complete without throwing; Option/None and null are both fine
      Multimodal.decodeWavPcm16(bytes)
      Multimodal.decodeAviRgb24(bytes)
      Multimodal.decodeGray(bytes)
      Multimodal.dhash64(bytes)
    }
    assert(cases.length > 300)
  }

  test("audioFeatures decodes a WAV corpus distributedly (the mm_decode_wav shape)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 10)
    val out = Multimodal.audioFeatures(Multimodal.syntheticWavs(docs, nSamples = 480))
      .orderBy(col("id")).collect()
    assert(out.length === 10)
    out.foreach { r =>
      val id = r.getLong(0)
      val expect = (0 until 480).map(Multimodal.wavSample(id, _))
      assert(r.getInt(1) === 8000 && r.getInt(2) === 1)
      assert(r.getLong(3) === 480L)
      assert(r.getLong(4) === expect.map(_.toLong).sum)
      assert(r.getLong(5) === expect.min.toLong)
      assert(r.getLong(6) === expect.max.toLong)
    }
  }
  test("audio fingerprint: twins within 3 bits, unrelated clips >= 5 bits, all pairs probed") {
    def fp(samples: Array[Int]): Long =
      Multimodal.audioFp64(Multimodal.encodeWavPcm16(samples, 8000)).longValue()
    val clips = scala.collection.mutable.Map[Long, Long]()
    for (id <- 0L until 40L) {
      val base = Array.tabulate(576)(i => Multimodal.audioTone(id, i))
      clips(id) = fp(base)
      if (id % 5 == 0) clips(id + 1000) = fp(base.map(_ * 2))
      if (id % 7 == 0) {
        val dithered = base.clone()
        for (i <- 128 until 192) dithered(i) += (i * 7) % 401 - 200
        clips(id + 2000) = fp(dithered)
      }
    }
    val ids = clips.keys.toSeq.sorted
    for (ai <- ids.indices; bi <- (ai + 1) until ids.length) {
      val (a, b) = (ids(ai), ids(bi))
      val d = java.lang.Long.bitCount(clips(a) ^ clips(b))
      if (a % 1000 == b % 1000) assert(d <= 3, s"twin pair ($a,$b) at hamming $d")
      else assert(d >= 5, s"unrelated pair ($a,$b) at hamming $d")
    }
    // amplitude scaling is EXACTLY invariant (not just within 3)
    val base0 = Array.tabulate(576)(i => Multimodal.audioTone(3, i))
    assert(fp(base0) === fp(base0.map(_ * 3)))
  }

  test("audio fingerprint: undecodable / stereo / short payloads are null, not faked") {
    assert(Multimodal.audioFp64(Array[Byte](1, 2, 3)) == null)
    val stereo = Multimodal.encodeWavPcm16(Array.fill(1200)(5), 8000, channels = 2)
    assert(Multimodal.audioFp64(stereo) == null)
    val short = Multimodal.encodeWavPcm16(Array.fill(100)(5), 8000)
    assert(Multimodal.audioFp64(short) == null)
  }

  test("video fingerprint: twins within 3 bits, unrelated clips >= 5 bits, all pairs probed") {
    def clip(id: Long, variant: Int, fps: Int): Array[Byte] = {
      val frames = (0 until 2).map(f =>
        Array.tabulate(16 * 16 * 3)(i => Multimodal.videoNearDupByte(id, variant, f, i).toByte))
      Multimodal.encodeAviRgb24(frames, 16, 16, fps)
    }
    def fp(b: Array[Byte]): Long = Multimodal.videoFp64(b).longValue()
    val clips = scala.collection.mutable.Map[Long, Long]()
    for (id <- 0L until 40L) {
      clips(id) = fp(clip(id, 0, 10))
      if (id % 5 == 0) clips(id + 1000) = fp(clip(id, 0, 25)) // container re-encode
      if (id % 7 == 0) clips(id + 2000) = fp(clip(id, 1, 10)) // frame-0 tweak
    }
    val ids = clips.keys.toSeq.sorted
    for (ai <- ids.indices; bi <- (ai + 1) until ids.length) {
      val (a, b) = (ids(ai), ids(bi))
      val d = java.lang.Long.bitCount(clips(a) ^ clips(b))
      if (a % 1000 == b % 1000) assert(d <= 3, s"twin pair ($a,$b) at hamming $d")
      else assert(d >= 5, s"unrelated pair ($a,$b) at hamming $d")
    }
  }

  test("video fingerprint: undecodable and frameless payloads are null, not faked") {
    assert(Multimodal.videoFp64(Array[Byte](1, 2, 3)) == null)
    // a decodable WAV is not an AVI
    assert(Multimodal.videoFp64(Multimodal.encodeWavPcm16(Array.fill(64)(1), 8000)) == null)
  }
}
