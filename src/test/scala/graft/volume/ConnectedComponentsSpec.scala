package graft.volume

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of 3D connected-component labeling (both forms):
  * 6-connectivity only (no diagonals, no wrap across the volume
  * boundary), component label = MIN linear voxel id in the component,
  * and chunkForm ≡ voxelForm on the same mask regardless of the chunk
  * grid (including faces that carry multiple distinct local components).
  */
class ConnectedComponentsSpec extends AnyFunSuite with SparkSpec {

  private val D = 8L

  /** Reference CC on the driver: BFS over the 6-neighborhood. */
  private def referenceCc(mask: Set[(Long, Long, Long)]): Map[(Long, Long, Long), Long] = {
    def lin(p: (Long, Long, Long)) = (p._1 * D + p._2) * D + p._3
    val out = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    val seen = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for (start <- mask.toSeq.sortBy(lin)) if (!seen(start)) {
      val comp = scala.collection.mutable.Set(start)
      var frontier = List(start)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap { case (z, y, x) =>
          Seq((z + 1, y, x), (z - 1, y, x), (z, y + 1, x), (z, y - 1, x), (z, y, x + 1), (z, y, x - 1))
            .filter(p => mask(p) && !comp(p))
        }.distinct
        comp ++= frontier
      }
      val label = comp.map(lin).min
      comp.foreach { p => out(p) = label; seen += p }
    }
    out.toMap
  }

  /** md5-derived percolation mask (same algebra as the gate, smaller cube). */
  private def mask: Set[(Long, Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (for {
      z <- 0L until D; y <- 0L until D; x <- 0L until D
      hex = md.digest(s"${z}_${y}_${x}".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if hex.head <= '5'
    } yield (z, y, x)).toSet
  }

  private def maskDf = {
    val rows = mask.toSeq.sortBy(identity)
    spark.createDataFrame(rows.map(p => (p._1, p._2, p._3))).toDF("z", "y", "x")
  }

  private def collectCc(df: org.apache.spark.sql.DataFrame): Map[(Long, Long, Long), Long] =
    df.select(col("z").cast("long"), col("y").cast("long"), col("x").cast("long"),
      col("component").cast("long"))
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap

  test("voxelForm matches a driver-side BFS reference on a percolation mask") {
    val got = collectCc(ConnectedComponents.voxelForm(maskDf, D, D, D))
    assert(got === referenceCc(mask))
  }

  test("chunkForm matches voxelForm on the same mask across two chunk grids") {
    val ref = referenceCc(mask)
    val maskSet = mask
    for ((cz, cy, cx) <- Seq((3, 4, 5), (8, 8, 8))) {
      val rows = for (z <- 0L until D; y <- 0L until D; x <- 0L until D)
        yield (z, y, x, if (maskSet((z, y, x))) 1L else 0L)
      val labeled = spark.createDataFrame(rows).toDF("z", "y", "x", "label")
      val vol = ChunkVolume.fromVoxels(labeled, D, D, D, cz, cy, cx)
      val got = collectCc(ConnectedComponents.chunkForm(vol, _ != 0L))
      assert(got === ref, s"chunk grid ($cz,$cy,$cx)")
    }
  }

  test("6-connectivity: diagonals do not connect; no wrap across the boundary") {
    // two voxels touching only diagonally + a pair on opposite x faces of
    // the same row — 4 voxels, 4 distinct components
    val pts = Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 0L), (3L, 3L, D - 1))
    val df = spark.createDataFrame(pts).toDF("z", "y", "x")
    val got = collectCc(ConnectedComponents.voxelForm(df, D, D, D))
    assert(got.values.toSet.size === 4)
    // each labels itself with its own linear id
    pts.foreach { case (z, y, x) => assert(got((z, y, x)) === (z * D + y) * D + x) }
  }

  test("a component spanning >2 chunks along one axis gets one label") {
    // a straight line through the whole cube crosses every chunk boundary
    val pts = (0L until D).map(x => (4L, 4L, x))
    val labeled = spark.range(D * D * D).select(
      expr(s"id div ${D * D}").as("z"),
      expr(s"(id div $D) % $D").as("y"),
      expr(s"id % $D").as("x"))
      .withColumn("label", when(col("z") === 4 && col("y") === 4, 1L).otherwise(0L))
    val vol = ChunkVolume.fromVoxels(labeled, D, D, D, 3, 3, 3)
    val got = collectCc(ConnectedComponents.chunkForm(vol, _ != 0L))
    assert(got.keySet === pts.toSet)
    assert(got.values.toSet === Set((4L * D + 4L) * D + 0L))
  }

  test("despeckle drops exactly the components below the size floor") {
    val ref = referenceCc(mask)
    val sizeOf = ref.values.groupBy(identity).map { case (c, vs) => c -> vs.size }
    val expect = ref.filter { case (_, c) => sizeOf(c) >= 4 }
    val got = collectCc(ConnectedComponents.despeckle(
      ConnectedComponents.voxelForm(maskDf, D, D, D), 4L))
    assert(got === expect)
    assert(got.size < ref.size) // the floor actually bites on this mask
  }

  test("localReps: within-chunk union-find collapses to min global voxel id") {
    // 1×2×4 chunk at origin of an 8³ volume, pattern [1,1,0,1 / 0,1,0,1]:
    // fg cells (0,0,0),(0,0,1),(0,1,1) form one component (min id 0);
    // (0,0,3),(0,1,3) another (min id 3)
    val data = Array[Byte](1, 1, 0, 1, 0, 1, 0, 1)
    val reps = ConnectedComponents.localReps(
      data, 1, 2, 4, 1, true, 0L, 0L, 0L, D, D, _ != 0L)
    assert(reps.toSeq === Seq(0L, 0L, -1L, 3L, -1L, 0L, -1L, 3L))
  }
}
