package graft.volume

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 6-neighbor morphology (erode/dilate/open) and the region-analysis
  * rollups (props / surface / adjacency / MIP): hand-pinned boundary
  * semantics, the chunk form == voxel form equivalence the shared gate
  * oracle relies on, and closed-form checks on a solid cube.
  */
class MorphRegionSpec extends AnyFunSuite with SparkSpec {

  private val D = 8L

  /** A single solid 4³ foreground cube (label 7) at [2,6)³ inside an 8³
    * volume of background 0.
    */
  private def cube: DataFrame =
    spark.range(D * D * D).select(
      expr(s"id div ${D * D}").as("z"),
      expr(s"(id div $D) % $D").as("y"),
      expr(s"id % $D").as("x"),
    ).withColumn("label",
      when(col("z").between(2, 5) && col("y").between(2, 5) && col("x").between(2, 5), lit(7L))
        .otherwise(lit(0L)))

  private def collectVox(df: DataFrame): Map[(Long, Long, Long), Long] =
    df.select("z", "y", "x", df.columns.last).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap

  test("erode6 shrinks the 4-cube to the 2-cube core; dilate6 grows it by the cross") {
    val er = collectVox(VoxelOps.erode6(cube, D, D, D))
    assert(er.size === D * D * D)
    // survivors: voxels whose whole cross is foreground = the [3,5)³ core
    assert(er.count(_._2 == 7L) === 8)
    assert(er((3, 3, 3)) === 7L && er((4, 4, 4)) === 7L)
    assert(er((2, 3, 3)) === 0L)

    val dl = collectVox(VoxelOps.dilate6(cube, D, D, D))
    // dilation adds one cross-voxel per face voxel: 4³ + 6 faces · 4² = 160
    assert(dl.count(_._2 == 7L) === 64 + 6 * 16)
    assert(dl((1, 3, 3)) === 7L && dl((2, 2, 2)) === 7L)
    assert(dl((1, 1, 3)) === 0L) // edge-diagonal is NOT in the cross
  }

  test("erode6 zero-pads the volume border: a full volume erodes to 0 on its shell") {
    val full = spark.range(27).select(
      expr("id div 9").as("z"), expr("(id div 3) % 3").as("y"),
      expr("id % 3").as("x")).withColumn("label", lit(5L))
    val er = collectVox(VoxelOps.erode6(full, 3, 3, 3))
    assert(er((1, 1, 1)) === 5L) // only the center has a full in-volume cross
    assert(er.count(_._2 == 5L) === 1)
  }

  test("open6 removes an isolated voxel but keeps the bulk cube") {
    val speckled = cube.withColumn("label",
      when(col("z") === 0 && col("y") === 0 && col("x") === 0, lit(9L)).otherwise(col("label")))
    val op = collectVox(VoxelOps.open6(speckled, D, D, D))
    assert(op((0, 0, 0)) === 0L) // speckle gone
    assert(op((3, 3, 3)) === 7L) // bulk interior survives
    // opening of the solid cube = dilate(2-cube core) — 8 + 6·4 = 32 voxels
    assert(op.count(_._2 == 7L) === 32)
  }

  test("chunk forms equal voxel forms on a non-aligned chunk grid") {
    val vol = ChunkVolume.fromVoxels(cube, D, D, D, 3, 5, 7)
    assert(collectVox(vol.erodeVoxels) === collectVox(VoxelOps.erode6(cube, D, D, D)))
    assert(collectVox(vol.dilateVoxels) === collectVox(VoxelOps.dilate6(cube, D, D, D)))
  }

  test("regionSurface: closed forms for the solid cube and the background") {
    val surf = VoxelOps.regionSurface(cube).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 4³ cube: 6 faces · 16 voxels each
    assert(surf(7L) === ((64L, 96L)))
    // background: 8³−4³ voxels; exposed = outer hull 6·64 + cube hull 96
    assert(surf(0L) === ((448L, 6 * 64L + 96L)))
  }

  test("regionAdjacency: cube touches only background, with face count = cube surface") {
    val adj = VoxelOps.regionAdjacency(cube).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(adj === Map((0L, 7L) -> 96L))
  }

  test("regionProps: count, bbox, and fixed-point centroid of the cube") {
    val row = VoxelOps.regionProps(cube).filter(col("label") === 7L).collect()(0)
    val m = row.getValuesMap[Long](Seq("n_voxels", "z_min", "z_max", "y_min",
      "y_max", "x_min", "x_max", "cz_e4", "cy_e4", "cx_e4"))
    assert(m("n_voxels") === 64L)
    assert((m("z_min"), m("z_max"), m("y_min"), m("y_max"), m("x_min"), m("x_max"))
      === ((2L, 5L, 2L, 5L, 2L, 5L)))
    // centroid = 3.5 exactly → 35000 in e4 fixed point
    assert((m("cz_e4"), m("cy_e4"), m("cx_e4")) === ((35000L, 35000L, 35000L)))
  }

  test("erosionDepth: hand depths on the solid cube; cap saturates; bg stays 0") {
    val d = collectVox(VoxelOps.erosionDepth(cube, D, D, D, cap = 3))
    assert(d((2, 3, 3)) === 1L) // cube face
    assert(d((3, 3, 3)) === 2L) // core: manhattan distance 2 to background
    assert(d((0, 0, 0)) === 0L) // background
    // a 4-cube has no voxel deeper than 2, so cap 3 never saturates here;
    // a full volume saturates: center of an all-fg 8³ cube at cap 3 → 3
    val full = cube.withColumn("label", lit(1L))
    val df = collectVox(VoxelOps.erosionDepth(full, D, D, D, cap = 3))
    assert(df((4, 4, 4)) === 3L) // >= 3 away from the border → capped
    assert(df((0, 4, 4)) === 1L) // volume border counts as background
  }

  test("chunk erosionDepth (one deep halo) == voxel form; thin-chunk guard fails loud") {
    val vol = ChunkVolume.fromVoxels(cube, D, D, D, 4, 4, 4)
    assert(collectVox(vol.erosionDepthVoxels(cap = 3))
      === collectVox(VoxelOps.erosionDepth(cube, D, D, D, cap = 3)))
    // (3,5,7) on 8³ leaves a 1-thick x-remainder < cap-1 = 2 → reject
    val thin = ChunkVolume.fromVoxels(cube, D, D, D, 3, 5, 7)
    val ex = intercept[IllegalArgumentException](thin.erosionDepthVoxels(cap = 3))
    assert(ex.getMessage.contains("rechunk"))
  }

  test("regionStatsAgainst: chunk form == voxel form; grid mismatch fails loud") {
    // intensity = linear voxel id mod 97 — exact integers, hand-checkable
    val intensity = cube.select(col("z"), col("y"), col("x"),
      ((col("z") * 64 + col("y") * 8 + col("x")) % 97).as("intensity"))
    val voxel = VoxelOps.regionIntensityStats(cube, intensity)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val chunk = ChunkVolume.fromVoxels(cube, D, D, D, 3, 5, 7)
      .regionStatsAgainst(ChunkVolume.fromVoxels(
        intensity.withColumnRenamed("intensity", "label"), D, D, D, 3, 5, 7))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(chunk === voxel)
    assert(voxel(7L)._1 === 64L) // the 4³ cube's voxel count
    // different chunk grids must be rejected, not silently mis-zipped
    val other = ChunkVolume.fromVoxels(
      intensity.withColumnRenamed("intensity", "label"), D, D, D, 4, 4, 4)
    intercept[IllegalArgumentException] {
      ChunkVolume.fromVoxels(cube, D, D, D, 3, 5, 7).regionStatsAgainst(other)
    }
  }

  test("opening is idempotent: open(open(x)) == open(x)") {
    val once = collectVox(VoxelOps.open6(cube, D, D, D))
    val twice = collectVox(VoxelOps.open6(
      VoxelOps.open6(cube, D, D, D), D, D, D))
    assert(twice === once)
  }

  test("cropVoxels: chunk-pruned box read equals the filtered voxel table; chunk filter prunes") {
    val vol = ChunkVolume.fromVoxels(cube, D, D, D, 3, 5, 7)
    val crop = vol.cropVoxels(2, 6, 1, 7, 3, 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    val expect = collectVox(cube.filter(
      col("z").between(2, 5) && col("y").between(1, 6) && col("x").between(3, 7)))
    assert(crop === expect)
    // pruning: a 1-voxel ROI touches exactly one chunk of the grid
    val one = vol.chunks.filter(c => c.z0 < 1 && 0 < c.z0 + c.nz
      && c.y0 < 1 && 0 < c.y0 + c.ny && c.x0 < 1 && 0 < c.x0 + c.nx).count()
    assert(one === 1)
    intercept[IllegalArgumentException](vol.cropVoxels(5, 5, 0, 1, 0, 1))
  }

  test("mipZ: projection keeps the max label per (y,x) column") {
    val mip = VoxelOps.mipZ(cube).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(mip((3, 3)) === 7L)
    assert(mip((0, 0)) === 0L)
    assert(mip.size === D * D)
  }
}
