package graft.volume

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** MHD header parsing + chunk planning semantics vs the reference
  * (parse_mhd / mhd_memmap / choose_chunks, upscale_streaming.py:23–74).
  */
class MhdSpec extends AnyFunSuite {

  private def writeMhd(dir: java.nio.file.Path, name: String, body: String): String = {
    val p = dir.resolve(name)
    Files.writeString(p, body)
    p.toString
  }

  test("parse: X Y Z header order flips to (Z,Y,X) shape; spacing; endianness") {
    val dir = Files.createTempDirectory("mhd")
    val path = writeMhd(dir, "fix.mhd",
      """ObjectType = Image
        |NDims = 3
        |DimSize = 40 32 24
        |ElementType = MET_UINT
        |ElementSpacing = 25.0 25.0 25.0
        |ByteOrderMSB = False
        |ElementDataFile = fixture_annotation.raw
        |""".stripMargin)
    val m = MhdMeta.parse(path)
    assert(m.dimX === 40 && m.dimY === 32 && m.dimZ === 24)
    assert(m.shapeZyx === ((24L, 32L, 40L)))
    assert(m.elementType === "MET_UINT" && m.bytesPerVoxel === 4)
    assert(!m.byteOrderMsb && m.isUnsigned && !m.isFloating)
    assert(m.spacingXyz === ((25.0, 25.0, 25.0)))
    // the Hadoop-FS port anchors sibling resolution on the (possibly
    // scheme-qualified) .mhd directory; a bare local path stays bare or
    // gains a file: scheme, and either form must name the same file
    assert(m.rawPath.stripPrefix("file:") === dir.resolve("fixture_annotation.raw").toString)
  }

  test("parse: comma-separated dims, MSB true, default spacing") {
    val dir = Files.createTempDirectory("mhd")
    val path = writeMhd(dir, "msb.mhd",
      """DimSize = 4, 5, 6
        |ElementType = MET_USHORT
        |ByteOrderMSB = True
        |ElementDataFile = x.raw
        |""".stripMargin)
    val m = MhdMeta.parse(path)
    assert(m.shapeZyx === ((6L, 5L, 4L)))
    assert(m.byteOrderMsb && m.bytesPerVoxel === 2)
    assert(m.spacingXyz === ((1.0, 1.0, 1.0)))
  }

  test("parse: missing required fields rejected") {
    val dir = Files.createTempDirectory("mhd")
    val path = writeMhd(dir, "bad.mhd", "DimSize = 1 1 1\nElementType = MET_UCHAR\n")
    val e = intercept[IllegalArgumentException](MhdMeta.parse(path))
    assert(e.getMessage.contains("ElementDataFile"))
  }

  test("dtype map covers the reference universe") {
    assert(MhdMeta.BytesPerVoxel === Map(
      "MET_UCHAR" -> 1, "MET_CHAR" -> 1, "MET_USHORT" -> 2, "MET_SHORT" -> 2,
      "MET_UINT" -> 4, "MET_INT" -> 4, "MET_FLOAT" -> 4, "MET_DOUBLE" -> 8))
  }

  test("chooseChunks reproduces the reference's recorded plan for the real atlas") {
    // Screenshots/upscale_streaming.png: (456,320,528) uint32 @128MB → (37,320,528)
    assert(ChunkPlanner.chooseChunks((456L, 320L, 528L), 4, 128) === ((37, 320, 528)))
    // degenerate shapes clamp to >= 1
    assert(ChunkPlanner.chooseChunks((1L, 1L, 1L), 8, 128) === ((1, 1, 1)))
  }

  test("estimateOutputGb matches the reference arithmetic (×15 ≈ 1.04 TB logical)") {
    val gb = ChunkPlanner.estimateOutputGb((456L, 320L, 528L), 4, 15, pyramidLevels = 1)
    // 456*320*528 * 15^3 * 4 bytes = 1.0401e12 B = 968.69 GiB
    assert(math.abs(gb - 968.69) < 0.01)
    val withPyr = ChunkPlanner.estimateOutputGb((456L, 320L, 528L), 4, 15, pyramidLevels = 3)
    assert(math.abs(withPyr - gb * 8.0 / 7.0) < 0.01)
  }

  test("physical metadata report (print_metadata.py)") {
    val m = MhdMeta(528, 320, 456, "MET_UINT", (25.0, 25.0, 25.0), byteOrderMsb = false, "x.raw", ".")
    val (pz, py, px) = m.physicalSizeMmZyx
    assert(math.abs(pz - 11.4) < 1e-9 && math.abs(py - 8.0) < 1e-9 && math.abs(px - 13.2) < 1e-9)
    val report = ChunkPlanner.metadataReport(m)
    assert(report.contains("MET_UINT") && report.contains("(528, 320, 456)"))
  }

  test("admission guards (upscale_streaming_enhance.py:331-341)") {
    import ChunkPlanner._
    assert(guard(scale = 2, estGb = 10, maxGb = 100, pyramidLevels = 1, force = false) === Admitted)
    guard(scale = 21, estGb = 10, maxGb = 100, pyramidLevels = 1, force = false) match {
      case Rejected(rs) => assert(rs.exists(_.contains("scale=21")))
      case other => fail(s"expected rejection, got $other")
    }
    guard(scale = 2, estGb = 500, maxGb = 100, pyramidLevels = 4, force = false) match {
      case Rejected(rs) => assert(rs.size === 2)
      case other => fail(s"expected rejection, got $other")
    }
    assert(guard(scale = 21, estGb = 500, maxGb = 100, pyramidLevels = 4, force = true) === Admitted)
  }

  test("plan report (dry-run EXPLAIN analog) carries the key facts") {
    val m = MhdMeta(528, 320, 456, "MET_UINT", (25.0, 25.0, 25.0), byteOrderMsb = false, "x.raw", ".")
    val r = ChunkPlanner.planReport(m, scale = 15, chunkMb = 128, chunks = (37, 320, 528),
      mode = "labels", pyramidLevels = 1, outPath = "/tmp/out", compressor = "zstd")
    assert(r.contains("(456, 320, 528)"))
    assert(r.contains("(6840, 4800, 7920)"))
    assert(r.contains("968.69 GB"))
  }
}
