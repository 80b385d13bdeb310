package graft.volume

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._
import java.nio.file.{Files, Paths}

/** graft.volume.Tiff vs FOREIGN classic-TIFF files the engine never
  * wrote: fixtures come from tools/gen_tiff_fixture.py, an INDEPENDENT
  * pure-stdlib (struct + zlib) encoder written from the TIFF 6.0 spec —
  * the same independence discipline as ZarrInteropSpec. Covers classic
  * magic-42 parsing, both byte orders, multi-strip assembly, deflate,
  * and 8/16/32-bit signed/unsigned grayscale.
  */
class TiffForeignSpec extends AnyFunSuite with SparkSpec {

  private val gen = "tools/gen_tiff_fixture.py"
  private lazy val havePython =
    try Process(Seq("python3", "-c", "import struct, zlib")).!(ProcessLogger(_ => ())) == 0
    catch { case _: Throwable => false }

  private def fixture(name: String, args: String*): String = {
    val out = Files.createTempDirectory("graft_tiff_foreign").resolve(name).toString
    val cmd = Seq("python3", gen, out) ++ args
    assert(Process(cmd).!(ProcessLogger(_ => ())) == 0, s"fixture gen failed: $cmd")
    out
  }

  /** The generator's wrapped grid value for (z,y,x) at a dtype width. */
  private def expected(z: Long, y: Long, x: Long, bits: Int, signed: Boolean): Long = {
    var v = (z / 4) * 100 + (y / 4) * 10 + (x / 4)
    v &= (1L << bits) - 1
    if (signed && v >= (1L << (bits - 1))) v -= 1L << bits
    v
  }

  private def checkVolume(path: String, bits: Int, signed: Boolean,
      elementType: String): Unit = {
    val vol = Tiff.read(spark, path)
    assert(vol.meta.elementType === elementType)
    assert((vol.meta.dimZ, vol.meta.dimY, vol.meta.dimX) === (16L, 16L, 16L))
    val rows = vol.toVoxels.collect()
    assert(rows.length === 4096)
    rows.foreach { r =>
      val (z, y, x) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) === expected(z, y, x, bits, signed), s"voxel ($z,$y,$x)")
    }
  }

  test("classic LE uint16, multi-strip (rps=5), deflate — the gate configuration") {
    assume(havePython, "python3 not available")
    checkVolume(fixture("le16.tif"), bits = 16, signed = false, elementType = "MET_USHORT")
  }

  test("classic BIG-ENDIAN uint16, single-strip, uncompressed") {
    assume(havePython, "python3 not available")
    checkVolume(fixture("be16.tif", "--endian", "be", "--compress", "0", "--rps", "16"),
      bits = 16, signed = false, elementType = "MET_USHORT")
  }

  test("classic LE uint8, one strip PER ROW, deflate") {
    assume(havePython, "python3 not available")
    checkVolume(fixture("u8.tif", "--bits", "8", "--rps", "1"),
      bits = 8, signed = false, elementType = "MET_UCHAR")
  }

  test("classic BE int32 signed, multi-strip, deflate") {
    assume(havePython, "python3 not available")
    checkVolume(fixture("i32.tif", "--bits", "32", "--signed", "--endian", "be"),
      bits = 32, signed = true, elementType = "MET_INT")
  }

  test("ancillary tags (RATIONAL resolutions, ASCII software) are skipped, not fatal") {
    assume(havePython, "python3 not available")
    // real writers (tifffile included) add resolution + software tags;
    // their field types (RATIONAL, ASCII) must be stepped over without
    // the reader trying to decode them
    checkVolume(fixture("anc.tif", "--ancillary"),
      bits = 16, signed = false, elementType = "MET_USHORT")
  }

  test("FOREIGN BigTIFF (magic 43): multi-strip deflate LE + single-strip BE") {
    assume(havePython, "python3 not available")
    checkVolume(fixture("big_le.tif", "--bigtiff"),
      bits = 16, signed = false, elementType = "MET_USHORT")
    checkVolume(fixture("big_be.tif", "--bigtiff", "--endian", "be",
        "--compress", "0", "--rps", "16"),
      bits = 16, signed = false, elementType = "MET_USHORT")
  }

  test("Tiff.read also accepts the engine's own BigTIFF export") {
    val grid = graft.queries.VolumeQueries.grid(spark)
    val vol = ChunkVolume.fromVoxels(grid, 16, 16, 16, 5, 6, 7)
    val path = Files.createTempDirectory("graft_tiff_own").resolve("own.tif").toString
    BigTiff.write(vol, path)
    // the general reader and the own-format reader agree bit-for-bit
    val viaTiff = Tiff.read(spark, path).toVoxels.orderBy("z", "y", "x").collect()
    val viaBig = BigTiff.read(spark, path).toVoxels.orderBy("z", "y", "x").collect()
    assert(viaTiff.toSeq === viaBig.toSeq)
    assert(viaTiff.length === 4096)
  }

  test("fail-loud boundaries: tiled layout and unsupported compression are rejected by name") {
    // hand-build a minimal classic-LE IFD with a TileWidth tag
    def classicWith(tags: Seq[(Int, Int, Long)]): String = {
      val bb = java.nio.ByteBuffer.allocate(512).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
      bb.putShort(tags.length.toShort)
      tags.foreach { case (tag, tpe, v) =>
        bb.putShort(tag.toShort).putShort(tpe.toShort).putInt(1).putInt(v.toInt)
      }
      bb.putInt(0)
      val p = Files.createTempDirectory("graft_tiff_bad").resolve("bad.tif")
      Files.write(p, java.util.Arrays.copyOf(bb.array(), bb.position()))
      p.toString
    }
    val base = Seq((256, 4, 16L), (257, 4, 16L), (258, 3, 16L),
      (273, 4, 8L), (279, 4, 512L))
    val tiled = intercept[IllegalArgumentException] {
      Tiff.parseMeta(classicWith(base :+ ((322, 4, 16L))))
    }
    assert(tiled.getMessage.contains("tiled"))
    val lzw = intercept[IllegalArgumentException] {
      Tiff.parseMeta(classicWith(base :+ ((259, 3, 5L))))
    }
    assert(lzw.getMessage.contains("Compression=5"))
  }
}
