package graft.volume

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Cross-implementation interop: exchanges zarr v2 stores with an
  * INDEPENDENT reader/writer of the spec (python + numpy + stdlib zlib —
  * the exact byte semantics python-zarr's Zlib codec uses), proving the
  * on-disk format is really zarr and not merely zarr-shaped. Skipped when
  * python3/numpy is unavailable.
  */
class ZarrInteropSpec extends AnyFunSuite with SparkSpec {

  private def havePython: Boolean =
    try Process(Seq("python3", "-c", "import numpy")).!(ProcessLogger(_ => ())) == 0
    catch { case _: Exception => false }

  private val (dz, dy, dx) = (5L, 4L, 6L)

  private lazy val vol = {
    val vox = spark.range(dz * dy * dx).selectExpr(
      s"id div ${dy * dx} as z",
      s"(id div $dx) % $dy as y",
      s"id % $dx as x",
      s"(id * 13) % 251 as label")
    ChunkVolume.fromVoxels(vox, dz, dy, dx, 2, 3, 4)
  }

  test("python (numpy+zlib) reads a ZarrStore-written array bit-exactly") {
    assume(havePython, "python3+numpy not available")
    val dir = Files.createTempDirectory("zarr_py").toString + "/out.zarr"
    ZarrStore.write(vol, dir, ZarrStore.Zlib(5))
    // independent reader: parse .zarray, inflate each chunk, assemble the
    // array, compare against the same deterministic formula
    val script =
      s"""
         |import json, zlib, sys
         |import numpy as np
         |d = "$dir"
         |za = json.load(open(d + "/.zarray"))
         |assert za["zarr_format"] == 2 and za["order"] == "C"
         |assert za["compressor"] == {"id": "zlib", "level": 5}, za["compressor"]
         |Z, Y, X = za["shape"]; cz, cy, cx = za["chunks"]
         |dt = np.dtype(za["dtype"])
         |assert dt == np.dtype("<u4"), dt
         |arr = np.zeros((Z, Y, X), dtype=dt)
         |for iz in range((Z + cz - 1) // cz):
         |    for iy in range((Y + cy - 1) // cy):
         |        for ix in range((X + cx - 1) // cx):
         |            raw = zlib.decompress(open(f"{d}/{iz}.{iy}.{ix}", "rb").read())
         |            blk = np.frombuffer(raw, dtype=dt).reshape(cz, cy, cx)
         |            z0, y0, x0 = iz * cz, iy * cy, ix * cx
         |            nz, ny, nx = min(cz, Z - z0), min(cy, Y - y0), min(cx, X - x0)
         |            arr[z0:z0+nz, y0:y0+ny, x0:x0+nx] = blk[:nz, :ny, :nx]
         |ids = np.arange(Z * Y * X).reshape(Z, Y, X)
         |expect = (ids * 13) % 251
         |assert (arr == expect).all(), "voxel mismatch"
         |print("PY_READ_OK")
         |""".stripMargin
    val out = Process(Seq("python3", "-c", script)).!!
    assert(out.contains("PY_READ_OK"))
  }

  test("python independently decodes a blosc-container chunk (zlib, byte-shuffle)") {
    assume(havePython, "python3+numpy not available")
    val dir = Files.createTempDirectory("zarr_blosc").toString + "/b.zarr"
    ZarrStore.write(vol, dir, ZarrStore.BloscCodec("zlib", 5, shuffle = 1))
    // independent C-Blosc v1 reader: parse the 16-byte header, per-block
    // offsets, [csize][payload] blocks, zlib inflate, byte-unshuffle —
    // written from the public format spec, sharing no code with the engine
    val script =
      s"""
         |import json, zlib, struct
         |import numpy as np
         |d = "$dir"
         |za = json.load(open(d + "/.zarray"))
         |assert za["compressor"]["id"] == "blosc" and za["compressor"]["cname"] == "zlib"
         |assert za["compressor"]["shuffle"] == 1
         |Z, Y, X = za["shape"]; cz, cy, cx = za["chunks"]
         |dt = np.dtype(za["dtype"]); T = dt.itemsize
         |def blosc_decode(buf):
         |    ver, verlz, flags, tsize = buf[0], buf[1], buf[2], buf[3]
         |    nbytes, blocksize, cbytes = struct.unpack_from("<iii", buf, 4)
         |    assert tsize == T and flags & 0x4 == 0
         |    if flags & 0x2:  # memcpyed
         |        return buf[16:16+nbytes]
         |    assert flags >> 5 == 3, "zlib inner codec expected"
         |    nblocks = max(1, -(-nbytes // blocksize))
         |    bstarts = struct.unpack_from("<%di" % nblocks, buf, 16)
         |    out = bytearray(nbytes)
         |    for b in range(nblocks):
         |        off = b * blocksize
         |        ne = min(blocksize, nbytes - off)
         |        p = bstarts[b]
         |        csize = struct.unpack_from("<i", buf, p)[0]
         |        payload = buf[p+4:p+4+csize]
         |        plain = bytes(payload) if csize == ne else zlib.decompress(payload)
         |        assert len(plain) == ne
         |        if flags & 0x1:  # byte unshuffle
         |            n = ne // T
         |            arr = np.frombuffer(plain[:n*T], dtype=np.uint8).reshape(T, n)
         |            out[off:off+n*T] = arr.T.tobytes()
         |            out[off+n*T:off+ne] = plain[n*T:]
         |        else:
         |            out[off:off+ne] = plain
         |    return bytes(out)
         |arr = np.zeros((Z, Y, X), dtype=dt)
         |for iz in range(-(-Z//cz)):
         |    for iy in range(-(-Y//cy)):
         |        for ix in range(-(-X//cx)):
         |            raw = blosc_decode(open(f"{d}/{iz}.{iy}.{ix}", "rb").read())
         |            blk = np.frombuffer(raw, dtype=dt).reshape(cz, cy, cx)
         |            z0, y0, x0 = iz*cz, iy*cy, ix*cx
         |            nz, ny, nx = min(cz, Z-z0), min(cy, Y-y0), min(cx, X-x0)
         |            arr[z0:z0+nz, y0:y0+ny, x0:x0+nx] = blk[:nz, :ny, :nx]
         |ids = np.arange(Z * Y * X).reshape(Z, Y, X)
         |assert (arr == (ids * 13) % 251).all(), "voxel mismatch"
         |print("PY_BLOSC_OK")
         |""".stripMargin
    val out = Process(Seq("python3", "-c", script)).!!
    assert(out.contains("PY_BLOSC_OK"))
  }

  test("ZarrStore reads a python-written blosc container (zlib, byte-shuffle)") {
    assume(havePython, "python3+numpy not available")
    val dir = Files.createTempDirectory("zarr_blosc2").toString + "/in.zarr"
    Files.createDirectories(Paths.get(dir))
    // independent writer of the same container format
    val script =
      s"""
         |import json, zlib, struct
         |import numpy as np
         |d = "$dir"
         |Z, Y, X = $dz, $dy, $dx
         |cz, cy, cx = 2, 3, 4
         |T = 4
         |ids = np.arange(Z * Y * X).reshape(Z, Y, X)
         |arr = ((ids * 13) % 251).astype("<u4")
         |json.dump({"zarr_format": 2, "shape": [Z, Y, X], "chunks": [cz, cy, cx],
         |           "dtype": "<u4",
         |           "compressor": {"id": "blosc", "cname": "zlib", "clevel": 5,
         |                          "shuffle": 1, "blocksize": 0},
         |           "fill_value": 0, "order": "C", "filters": None},
         |          open(d + "/.zarray", "w"))
         |def blosc_encode(raw):
         |    n = len(raw) // T
         |    shuf = np.frombuffer(raw[:n*T], dtype=np.uint8).reshape(n, T).T.tobytes() + raw[n*T:]
         |    comp = zlib.compress(shuf, 5)
         |    payload = comp if len(comp) < len(raw) else shuf
         |    csize = len(payload) if len(comp) < len(raw) else len(raw)
         |    # single block; flags: shuffle | zlib<<5
         |    head = bytes([2, 1, 0x1 | (3 << 5), T])
         |    head += struct.pack("<iii", len(raw), len(raw), 16 + 4 + 4 + len(payload))
         |    head += struct.pack("<i", 20)  # one bstart: 16 hdr + 4 offset entry
         |    return head + struct.pack("<i", csize) + payload
         |pad = np.zeros((cz, cy, cx), dtype="<u4")
         |for iz in range(-(-Z//cz)):
         |    for iy in range(-(-Y//cy)):
         |        for ix in range(-(-X//cx)):
         |            blk = pad.copy()
         |            z0, y0, x0 = iz*cz, iy*cy, ix*cx
         |            nz, ny, nx = min(cz, Z-z0), min(cy, Y-y0), min(cx, X-x0)
         |            blk[:nz, :ny, :nx] = arr[z0:z0+nz, y0:y0+ny, x0:x0+nx]
         |            open(f"{d}/{iz}.{iy}.{ix}", "wb").write(blosc_encode(blk.tobytes()))
         |print("PY_BLOSC_WRITE_OK")
         |""".stripMargin
    assert(Process(Seq("python3", "-c", script)).!!.contains("PY_BLOSC_WRITE_OK"))
    val back = ZarrStore.read(spark, dir)
    assert(back.meta.elementType === "MET_UINT")
    val got = back.toVoxels.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    for (z <- 0L until dz; y <- 0L until dy; x <- 0L until dx) {
      val id = (z * dy + y) * dx + x
      assert(got((z, y, x)) === (id * 13) % 251, s"voxel ($z,$y,$x)")
    }
  }

  test("ZarrStore reads a python (numpy+zlib) written array bit-exactly") {
    assume(havePython, "python3+numpy not available")
    val dir = Files.createTempDirectory("zarr_py2").toString + "/in.zarr"
    Files.createDirectories(Paths.get(dir))
    // independent writer: same formula, big-endian dtype + an absent
    // chunk (0.0.0) to exercise fill_value semantics
    val script =
      s"""
         |import json, zlib
         |import numpy as np
         |d = "$dir"
         |Z, Y, X = $dz, $dy, $dx
         |cz, cy, cx = 2, 3, 4
         |ids = np.arange(Z * Y * X).reshape(Z, Y, X)
         |arr = ((ids * 13) % 251).astype(">u4")
         |json.dump({"zarr_format": 2, "shape": [Z, Y, X], "chunks": [cz, cy, cx],
         |           "dtype": ">u4", "compressor": {"id": "zlib", "level": 1},
         |           "fill_value": 0, "order": "C", "filters": None},
         |          open(d + "/.zarray", "w"))
         |for iz in range((Z + cz - 1) // cz):
         |    for iy in range((Y + cy - 1) // cy):
         |        for ix in range((X + cx - 1) // cx):
         |            if (iz, iy, ix) == (0, 0, 0):
         |                continue  # absent chunk = fill_value
         |            blk = np.zeros((cz, cy, cx), dtype=">u4")
         |            z0, y0, x0 = iz * cz, iy * cy, ix * cx
         |            nz, ny, nx = min(cz, Z - z0), min(cy, Y - y0), min(cx, X - x0)
         |            blk[:nz, :ny, :nx] = arr[z0:z0+nz, y0:y0+ny, x0:x0+nx]
         |            open(f"{d}/{iz}.{iy}.{ix}", "wb").write(zlib.compress(blk.tobytes(), 1))
         |print("PY_WRITE_OK")
         |""".stripMargin
    assert(Process(Seq("python3", "-c", script)).!!.contains("PY_WRITE_OK"))
    val back = ZarrStore.read(spark, dir)
    assert(back.meta.elementType === "MET_UINT")
    val got = back.toVoxels.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    for (z <- 0L until dz; y <- 0L until dy; x <- 0L until dx) {
      val id = (z * dy + y) * dx + x
      val expect = if (z < 2 && y < 3 && x < 4) 0L else (id * 13) % 251
      assert(got((z, y, x)) === expect, s"voxel ($z,$y,$x)")
    }
  }
}
