package graft.volume

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The ×15 bench's NGFF-sharded sink (VolumeBench.upscaleZarr3s),
  * validated at ×2 scale on the real bench fixture: the sharded array
  * must read back voxel-exact against the formula the fixture encodes —
  * the same correctness the v2-zarr bench sink carries, so the new
  * bench row times equivalent verified work.
  */
class VolumeBenchZarr3sSpec extends AnyFunSuite with SparkSpec {

  test("upscaleZarr3s at x2: sharded output decodes to the upscaled label formula") {
    val work = Files.createTempDirectory("graft_z3s_bench").toString
    val mhd = VolumeBench.ensureFixture(work)
    val out = s"$work/x2_zarr3s"
    val secs = VolumeBench.upscaleZarr3s(spark, mhd, 2, out)
    assert(secs > 0)
    val vol = Zarr3Store.read(spark, out)
    val m = vol.meta
    assert((m.dimZ, m.dimY, m.dimX) ===
      (VolumeBench.DimZ * 2, VolumeBench.DimY * 2, VolumeBench.DimX * 2))
    // spot-check decoded voxels across shards against label(z/2, y/2, x/2)
    val pts = Seq(
      (0L, 0L, 0L), (911L, 639L, 1055L), (455L, 320L, 528L),
      (120L, 100L, 700L), (333L, 555L, 222L))
    pts.foreach { case (z, y, x) =>
      val got = vol.pointLookup(z, y, x)
      assert(got === Some(VolumeBench.label(z / 2, y / 2, x / 2)),
        s"voxel ($z,$y,$x)")
    }
    // the sink really sharded: chunk files live under c/ and the
    // metadata declares sharding_indexed
    val meta = Files.readString(java.nio.file.Paths.get(s"$out/zarr.json"))
    assert(meta.contains("sharding_indexed"))
  }
}
